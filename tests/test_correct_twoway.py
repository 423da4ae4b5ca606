"""Two-way gap traversal, fragment model, and CorrectAln stats
(ref correct_alignment.c traverse_two_way2 / gap bounds /
correct_aln_stats)."""

import numpy as np

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.align import correct as AC
from mccortex_tpu.links import thread as lthread

from util import random_dna, seq_to_codes
from test_graph_build import batchify


def build_g(inputs, k, ncols=1):
    return gbuild.build(batchify(inputs), k, ncols=ncols)


def _alt(c):
    return "ACGT"[("ACGT".index(c) + 1) % 4]


def _degrees(seqs, k, km):
    """(out_degree, in_degree) of kmer `km` (read orientation) in the
    pure-python reference graph."""
    from graph_ref import build_ref_graph
    from util import revcomp_str
    ref = build_ref_graph(seqs, k)
    rc = revcomp_str(km)
    key, o = (km, 0) if km <= rc else (rc, 1)
    e = ref[key][1][0]
    out = bin((e >> (4 * o)) & 15).count("1")
    inn = bin((e >> (4 * (1 - o))) & 15).count("1")
    return out, inn


def make_twoway_fixture(k=11, seed=800):
    """Genome with a read gap over [50, 80); inside the gap a forward
    fork at px (the left-to-right walker halts there) and a forward
    merge at py < px (the right-to-left walker halts there).  One-way
    cannot bridge from either side; two-way meets at the fork node
    (ref correct_alignment.c:222 node equality check)."""
    while True:
        genome = random_dna(130, seed=seed)
        py, px = 55, 66
        fork_read = genome[px - 2:px + k] + _alt(genome[px + k])
        merge_read = _alt(genome[py - 1]) + genome[py:py + k + 2]
        g = build_g([(genome, 0), (fork_read, 0), (merge_read, 0)], k)
        bad = genome[:50] + "N" * 30 + genome[80:]
        # sanity: the constructed branches must not collide with real
        # genome kmers (would change the junction structure); rebuild
        # with a different seed if the random genome is degenerate
        seed += 1
        outd = _degrees(
            [(genome, 0), (fork_read, 0), (merge_read, 0)], k,
            genome[px:px + k])[0]
        ind = _degrees(
            [(genome, 0), (fork_read, 0), (merge_read, 0)], k,
            genome[py:py + k])[1]
        if outd == 2 and ind == 2:
            return g, genome, bad


def test_two_way_bridges_where_one_way_cannot():
    k = 11
    g, genome, bad = make_twoway_fixture(k)
    arr = np.asarray(seq_to_codes(bad)[None])

    st1 = AC.CorrectAlnStats()
    res1 = AC.correct_batch(g, None, arr, one_way=True, aln_stats=st1)
    assert res1[0].nfixed == 0
    assert st1.num_gap_attempts == 2       # forward try + backward try
    assert st1.num_gap_successes == 0

    st2 = AC.CorrectAlnStats()
    res2 = AC.correct_batch(g, None, arr, one_way=False, aln_stats=st2)
    assert res2[0].nfixed == 1
    assert res2[0].seq == genome
    assert st2.num_gap_successes == 1
    # mid-gap histogram: exp == act == 40 lost kmer slots
    assert st2.gap_err_histgrm[40, 40] == 1


def test_two_way_matches_one_way_on_simple_gap():
    k = 11
    genome = random_dna(200, seed=810)
    g = build_g([(genome, 0)] * 2, k)
    pos = 100
    bad = genome[:pos] + _alt(genome[pos]) + genome[pos + 1:]
    arr = np.asarray(seq_to_codes(bad)[None])
    res1 = AC.correct_batch(g, None, arr, one_way=True)
    res2 = AC.correct_batch(g, None, arr, one_way=False)
    assert res1[0].seq == genome
    assert res2[0].seq == genome


def test_reverse_one_way_bridges_forward_dead_end():
    # fork near the left anchor only: forward halts immediately, but the
    # backward walker reaches the left anchor (ref traverse_one_way's
    # second attempt, correct_alignment.c:316-326)
    k = 11
    seed = 830
    while True:
        genome = random_dna(130, seed=seed)
        seed += 1
        px = 53      # fork just right of the left anchor
        fork_read = genome[px - 2:px + k] + _alt(genome[px + k])
        if _degrees([(genome, 0), (fork_read, 0)], k,
                    genome[px:px + k])[0] == 2:
            break
    g = build_g([(genome, 0), (fork_read, 0)], k)
    bad = genome[:50] + "N" * 30 + genome[80:]
    arr = np.asarray(seq_to_codes(bad)[None])
    st = AC.CorrectAlnStats()
    res = AC.correct_batch(g, None, arr, one_way=True, aln_stats=st)
    assert res[0].nfixed == 1
    assert res[0].seq == genome
    assert st.num_gap_attempts == 2        # fwd failed, then rev worked


def test_insert_gap_frag_len_min_rejects():
    k = 11
    genome = random_dna(260, seed=820)
    g = build_g([(genome, 0)] * 2, k)
    from util import revcomp_str
    r1 = genome[:80]
    r2 = revcomp_str(genome[160:240])   # reverse-strand mate
    c1 = seq_to_codes(r1)[None]
    c2 = seq_to_codes(r2)[None]
    rows, mate_col = lthread.pair_to_rows(c1, c2)
    st = AC.CorrectAlnStats()
    res = AC.correct_batch(g, None, rows, mate_col=mate_col,
                           frag_len_max=400, aln_stats=st)
    assert res[0].nfixed == 1
    assert st.num_ins_traversed == 1
    # fragment histogram records ~240bp fragment
    frags = np.nonzero(st.fraglen_histgrm)[0]
    assert len(frags) == 1 and 200 <= frags[0] <= 280

    st2 = AC.CorrectAlnStats()
    res2 = AC.correct_batch(g, None, rows, mate_col=mate_col,
                            frag_len_min=350, frag_len_max=400,
                            aln_stats=st2)
    assert res2[0].nfixed == 0
    # both the forward and the backward one-way attempts bridge but are
    # too short (two stats updates, as in ref traverse_one_way)
    assert st2.num_gaps_too_short == 2


def test_stats_csv_dumps(tmp_path):
    st = AC.CorrectAlnStats()
    st.add_gap(3, 5)
    st.add_mp(10, 50, 50, 11)
    gp = str(tmp_path / "gaps.csv")
    fp = str(tmp_path / "frags.csv")
    st.dump_gaps(gp)
    st.dump_fraglen(fp)
    lines = open(gp).read().splitlines()
    assert lines[0].startswith(".\tgraph_0\tgraph_1")
    assert len(lines) == AC.MAX_GAP_HIST + 1
    row3 = lines[1 + 3].split("\t")
    assert row3[0] == "read_3" and row3[1 + 5] == "1"
    flines = open(fp).read().splitlines()
    assert flines[0] == "fraglen_bases\tcount"
    # fraglen = 50+50+10-11+1 = 100
    assert flines[1 + 100].split("\t")[1].strip() == "1"


def test_cli_thread_two_way_and_hists(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from test_ctx_io import write_fasta
    k = 11
    genome = random_dna(200, seed=840)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [genome] * 3)
    bad = genome[:90] + _alt(genome[90]) + genome[91:]
    bad_fa = str(tmp_path / "bad.fa")
    write_fasta(bad_fa, [bad])
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "l.ctp.gz")
    gh = str(tmp_path / "gaps.csv")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq", fa, ctx]) == 0
    assert mctx(["thread", "--seq", bad_fa, "-o", ctp, "--two-way",
                 "-g", gh, ctx]) == 0
    lines = open(gh).read().splitlines()
    assert len(lines) == AC.MAX_GAP_HIST + 1
    total = sum(int(x) for ln in lines[1:]
                for x in ln.split("\t")[1:])
    assert total == 1


def test_correct_pairs_fixes_both_mates():
    from util import seq_to_codes, revcomp_str
    k = 11
    genome = random_dna(260, seed=2000)
    g = build_g([(genome, 0)] * 2, k)
    r1 = genome[:80]
    r2raw = revcomp_str(genome[160:240])
    # one substitution in each mate
    b1 = _alt(r1[40]); r1e = r1[:40] + b1 + r1[41:]
    b2 = _alt(r2raw[30]); r2e = r2raw[:30] + b2 + r2raw[31:]
    c1 = seq_to_codes(r1e)[None]
    c2 = seq_to_codes(r2e)[None]
    m1, m2 = AC.correct_pairs(g, None, c1, c2, frag_len_max=400)
    assert m1[0].seq == r1
    assert m2[0].seq == r2raw
    assert m1[0].nfixed >= 1 and m2[0].nfixed >= 1
    # mate lengths preserved; display uppercase where corrected
    assert len(m1[0].display) == len(r1)
    assert len(m2[0].display) == len(r2raw)


def test_cli_correct_seq2(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from test_ctx_io import write_fasta
    from util import revcomp_str
    k = 11
    genome = random_dna(260, seed=2100)
    fa = str(tmp_path / "good.fa")
    write_fasta(fa, [genome] * 2)
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq", fa, ctx]) == 0
    r1 = genome[:80]
    r2 = revcomp_str(genome[160:240])
    r1e = r1[:40] + _alt(r1[40]) + r1[41:]
    fa1 = str(tmp_path / "r1.fa"); write_fasta(fa1, [r1e])
    fa2 = str(tmp_path / "r2.fa"); write_fasta(fa2, [r2])
    out = str(tmp_path / "fixed.fa")
    assert mctx(["correct", "--seq2", fa1, fa2, "-o", out,
                 "-L", "400", ctx]) == 0
    seqs = [l.strip() for l in open(out) if not l.startswith(">")]
    assert seqs[0] == r1            # mate 1 corrected
    assert seqs[1].upper() == r2    # mate 2 unchanged content
