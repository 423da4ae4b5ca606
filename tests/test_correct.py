"""Gap-filling correction tests (parallels ref corrected_aln tests)."""

import numpy as np
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.align import correct as AC
from mccortex_tpu.links import thread as lthread

from util import random_dna, revcomp_str, seq_to_codes
from test_graph_build import batchify
from test_ctx_io import write_fasta


def build_g(inputs, k, ncols=1):
    return gbuild.build(batchify(inputs), k, ncols=ncols)


def mutate(seq, pos, rng=None):
    alt = "ACGT"[("ACGT".index(seq[pos]) + 1) % 4]
    return seq[:pos] + alt + seq[pos + 1:]


def test_correct_single_substitution():
    k = 11
    genome = random_dna(200, seed=700)
    g = build_g([(genome, 0)] * 3, k)
    bad = mutate(genome, 100)
    arr = np.asarray(seq_to_codes(bad)[None])
    res = AC.correct_batch(g, None, arr)
    assert res[0].ngaps == 1 and res[0].nfixed == 1
    assert res[0].seq == genome
    assert res[0].display == genome  # fully corrected, all uppercase


def test_correct_uncorrectable_lowercased():
    k = 11
    genome = random_dna(150, seed=710)
    g = build_g([(genome, 0)], k)
    # error creates a gap the graph cannot bridge with matching length:
    # delete 30 bases from the read (fill length mismatch > tolerance)
    bad = genome[:60] + genome[95:]
    arr = np.asarray(seq_to_codes(bad)[None])
    res = AC.correct_batch(g, None, arr)
    assert res[0].ngaps == 1
    if res[0].nfixed == 0:
        assert any(c.islower() for c in res[0].display)


def test_correct_two_errors():
    k = 11
    genome = random_dna(300, seed=720)
    g = build_g([(genome, 0)] * 2, k)
    bad = mutate(mutate(genome, 80), 200)
    arr = np.asarray(seq_to_codes(bad)[None])
    res = AC.correct_batch(g, None, arr)
    assert res[0].nfixed == 2
    assert res[0].seq == genome


def test_thread_gapfill_restores_links():
    # errory reads: plain threading loses junction info at errors;
    # gap-filled threading recovers it
    k = 9
    m = random_dna(40, seed=730)
    a1, b1 = random_dna(30, seed=731), random_dna(30, seed=732)
    a2, b2 = random_dna(30, seed=733), random_dna(30, seed=734)
    r1, r2 = a1 + m + b1, a2 + m + b2
    g = build_g([(r1, 0), (r2, 0)], k)
    # reads with an error in the middle of the shared segment
    r1e = mutate(r1, len(a1) + 20)
    r2e = mutate(r2, len(a2) + 20)
    plain = lthread.thread_reads(g, batchify([(r1e, 0), (r2e, 0)]), 1)
    filled = lthread.thread_reads_gapfill(
        g, batchify([(r1e, 0), (r2e, 0)]), 1)
    # gap-filled threading must produce links spanning the whole insert
    assert filled.nlinks >= plain.nlinks
    from mccortex_tpu.links import walk as lwalk
    from test_links import row_of, canon
    seed = row_of(g, a1[:k])
    c1, _ = lwalk.assemble_contigs_linked(g, filled, np.array([seed]))
    assert canon(c1[0]) == canon(r1)


def test_cli_correct(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    k = 11
    genome = random_dna(250, seed=740)
    fa = str(tmp_path / "good.fa")
    write_fasta(fa, [genome] * 3)
    ctx = str(tmp_path / "g.ctx")
    bad_fa = str(tmp_path / "bad.fa")
    write_fasta(bad_fa, [mutate(genome, 120)])
    out = str(tmp_path / "fixed.fa")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, ctx]) == 0
    assert mctx(["correct", "--seq", bad_fa, "-o", out, ctx]) == 0
    fixed = [l.strip() for l in open(out) if not l.startswith(">")]
    assert fixed[0] == genome


def test_cli_links_clean(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctp as ctpio
    from mccortex_tpu.cli.commands import _load_graph
    k = 9
    m = random_dna(30, seed=750)
    r1 = random_dna(20, seed=751) + m + random_dna(20, seed=752)
    r2 = random_dna(20, seed=753) + m + random_dna(20, seed=754)
    fa = str(tmp_path / "r.fa")
    # r1 seen 3x, r2 once
    write_fasta(fa, [r1, r1, r1, r2])
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "l.ctp.gz")
    cleaned = str(tmp_path / "lc.ctp.gz")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, ctx]) == 0
    assert mctx(["thread", "--seq", fa, "-o", ctp, ctx]) == 0
    assert mctx(["links", "--clean", "2", "-o", cleaned, ctx, ctp]) == 0
    h, g = _load_graph(ctx)
    before = ctpio.load_ctp(ctp, g)
    after = ctpio.load_ctp(cleaned, g)
    assert after.nlinks < before.nlinks
    assert (np.asarray(after.nseen).sum(axis=1) >= 2).all()


def test_gap_fill_context_priming_resolves_fork():
    """A gap whose in-gap fork is resolvable ONLY by a link picked up
    upstream of the gap (ref graph_walker_prime, max_context=200).

    Links attach just outside junctions (fw at merge-1, rv at fork+1),
    so to defeat the un-primed walkers BOTH gap-edge attach nodes must
    carry tied (conflicting, same pickup age) links while an older
    resolving link sits further upstream:

      s1 = u + S + z1     (the read's true route)
      s2 = v + S + z2     (ties the fw links at the in-S attach node)
      s4 = w + S[3:] + z1 (creates merge M2 at S[3]; ties the rv links
                           at fork+1)

    err = M2 + k - 1 = the S-exit fork position: the free forward
    walker seeds at M2-1 holding only the {z1,z2} tie; the free
    backward walker seeds at fork+1 holding only the tied rv links.
    The primed forward walker also carries s1's OLDER link from
    merge1-1 (unique u context) and the oldest-age vote resolves z1."""
    from util import random_dna, seq_to_codes
    from test_links import build_g, thread_all
    from mccortex_tpu.align import correct as C
    k = 11
    S = random_dna(24, seed=901)
    u = random_dna(60, seed=902)[:-1] + "G"
    v = random_dna(60, seed=903)[:-1] + "T"
    z1 = "A" + random_dna(59, seed=904)
    z2 = "C" + random_dna(59, seed=905)
    w4 = random_dna(60, seed=906)[:-1] + "C"
    S = S[:2] + "A" + S[3:]          # S[2] != w4[-1] (real merge M2)
    s1 = u + S + z1
    s2 = v + S + z2
    s4 = w4 + S[3:] + z1
    g = build_g([(s1, 0), (s2, 0), (s4, 0)], k)
    links = thread_all(g, [(s1, 0), (s2, 0), (s4, 0)])

    err_pos = len(u) + 13            # = M2 + k - 1 = S-exit fork
    base = s1[err_pos]
    alt = "ACGT"[("ACGT".index(base) + 1) % 4]
    read = s1[:err_pos] + alt + s1[err_pos + 1:]
    codes = seq_to_codes(read)[None, :]

    stats = C.CorrectAlnStats()
    out = C.correct_batch(g, links, codes, colour=None,
                          aln_stats=stats)
    assert stats.num_mid_traversed == 1, stats.summary()
    assert out[0].seq == s1          # corrected onto the z1 branch

    stats0 = C.CorrectAlnStats()
    C.correct_batch(g, links, codes, colour=None, max_context=0,
                    aln_stats=stats0)
    assert stats0.num_mid_traversed == 0, stats0.summary()


def test_gap_fill_end_check_rejects_disagreeing_bridge():
    """use_end_check (default on, ref graph_walker_agrees_contig): after
    bridging, the walker's continued link-informed choices must agree
    with the read's post-gap aligned nodes.  A chimeric read (u+S+z2
    against links u+S+z1 / v+S+z2) bridges fine inside the shared S,
    but the u-context link then picks z1 while the read has z2 — the
    bridge is rejected with end_check, accepted without."""
    from util import random_dna, seq_to_codes
    from test_links import build_g, thread_all
    from mccortex_tpu.align import correct as C
    k = 11
    S = random_dna(30, seed=910)
    u = random_dna(60, seed=911)
    v = random_dna(60, seed=912)
    z1 = "A" + random_dna(59, seed=913)
    z2 = "C" + random_dna(59, seed=914)
    s1 = u + S + z1
    s2 = v + S + z2
    g = build_g([(s1, 0), (s2, 0)], k)
    links = thread_all(g, [(s1, 0), (s2, 0)])

    chim = u + S + z2
    err = 60 + 20
    alt = "ACGT"[("ACGT".index(chim[err]) + 1) % 4]
    read = chim[:err] + alt + chim[err + 1:]
    codes = seq_to_codes(read)[None, :]

    st1 = C.CorrectAlnStats()
    C.correct_batch(g, links, codes, colour=None, aln_stats=st1)
    assert st1.num_mid_traversed == 0, st1.summary()
    assert st1.num_paths_disagreed >= 1

    st0 = C.CorrectAlnStats()
    out0 = C.correct_batch(g, links, codes, colour=None,
                           end_check=False, aln_stats=st0)
    assert st0.num_mid_traversed == 1, st0.summary()
    assert out0[0].seq == chim


def test_gap_fill_end_check_two_way():
    """Two-way traversal applies the same agreement check (ref
    traverse_two_way2 do_paths_check): the chimeric read's bridge is
    rejected with end_check, accepted without."""
    from util import random_dna, seq_to_codes
    from test_links import build_g, thread_all
    from mccortex_tpu.align import correct as C
    k = 11
    S = random_dna(30, seed=910)
    u = random_dna(60, seed=911)
    v = random_dna(60, seed=912)
    z1 = "A" + random_dna(59, seed=913)
    z2 = "C" + random_dna(59, seed=914)
    g = build_g([(u + S + z1, 0), (v + S + z2, 0)], k)
    links = thread_all(g, [(u + S + z1, 0), (v + S + z2, 0)])
    chim = u + S + z2
    err = 60 + 20
    alt = "ACGT"[("ACGT".index(chim[err]) + 1) % 4]
    read = chim[:err] + alt + chim[err + 1:]
    codes = seq_to_codes(read)[None, :]
    st = C.CorrectAlnStats()
    C.correct_batch(g, links, codes, colour=None, one_way=False,
                    aln_stats=st)
    assert st.num_mid_traversed == 0 and st.num_paths_disagreed >= 1
    st0 = C.CorrectAlnStats()
    out = C.correct_batch(g, links, codes, colour=None, one_way=False,
                          end_check=False, aln_stats=st0)
    assert st0.num_mid_traversed == 1
    assert out[0].seq == chim
