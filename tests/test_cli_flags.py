"""Tests for the ref cmd.c general options + round-3 flag parity sweep
(ctx_* option surfaces: fq-offset, matepair, rmsubstr links, ploidy
rules, out-fmt, degree symbols, -N limits)."""

import gzip

import numpy as np
import pytest

from mccortex_tpu.cli.main import main as mctx

from util import random_dna, revcomp_str, seq_to_codes
from test_ctx_io import write_fasta


def write_fastq(path, seqs, quals, offset=33):
    with open(path, "w") as fh:
        for i, (s, q) in enumerate(zip(seqs, quals)):
            qs = "".join(chr(x + offset) for x in q)
            fh.write(f"@r{i}\n{s}\n+\n{qs}\n")


def test_fq_offset_auto_detect_64(tmp_path):
    """A phred+64 FASTQ (all qual chars >= '@') must auto-detect and
    give the same graph as the equivalent phred+33 file under -Q."""
    k = 11
    s = random_dna(120, seed=600)
    # low-quality tail: last 40 bases get q=2, rest q=35
    q = [35] * 80 + [2] * 40
    fq33 = str(tmp_path / "r33.fq")
    fq64 = str(tmp_path / "r64.fq")
    write_fastq(fq33, [s], [q], offset=33)
    write_fastq(fq64, [s], [q], offset=64)
    c33 = str(tmp_path / "a.ctx")
    c64 = str(tmp_path / "b.ctx")
    assert mctx(["build", "-k", str(k), "-Q", "10", "-s", "x",
                 "-1", fq33, c33]) == 0
    assert mctx(["build", "-k", str(k), "-Q", "10", "-s", "x",
                 "-1", fq64, c64]) == 0
    a = open(c33, "rb").read()
    b = open(c64, "rb").read()
    assert a == b
    # and the cutoff actually removed the low-quality tail's kmers
    full = str(tmp_path / "c.ctx")
    assert mctx(["build", "-k", str(k), "-s", "x", "-1", fq33,
                 full]) == 0
    assert len(open(full, "rb").read()) > len(a)


def test_mate_normalize_orientations():
    """All four --matepair orientations describe the same fragment; the
    normalised pair must be identical."""
    from mccortex_tpu.io import seqio
    s1 = seq_to_codes(random_dna(40, seed=601))[None, :]
    s2 = seq_to_codes(random_dna(40, seed=602))[None, :]
    rc = seqio._rc_codes
    # ground truth fragment convention: FR = (r1 fwd, r2 revstrand)
    base = seqio.mate_normalize(s1, s2, "FR")
    # FF presents (F1, F2fwd); RF presents (rc(F1), F2fwd): both must
    # normalise back to the FR pair
    got_ff = seqio.mate_normalize(s1, rc(s2), "FF")
    got_rf = seqio.mate_normalize(rc(s1), rc(s2), "RF")
    for got in (got_ff, got_rf):
        assert np.array_equal(got[0], base[0])
        assert np.array_equal(got[1], base[1])
    # RR is treated like FF (only mate-RELATIVE orientation matters,
    # ref seq_reader.c:497-500 maps RR -> no change in FF convention):
    # the mapping is rc on mate 2
    got_rr = seqio.mate_normalize(s1, s2, "RR")
    assert np.array_equal(got_rr[0], s1)
    assert np.array_equal(got_rr[1], rc(s2))


def test_rmsubstr_store_prefix_removal():
    """{A, C, CG, CGC} at one vertex -> {A, CGC}
    (ref gpath_subset.c:106 example)."""
    import jax.numpy as jnp
    from mccortex_tpu.links import store as lstore
    juncs = np.zeros((4, 4), np.uint8)
    codes = {"A": 0, "C": 1, "G": 2}
    seqs = ["A", "C", "CG", "CGC"]
    nj = np.array([len(s) for s in seqs])
    for i, s in enumerate(seqs):
        for j, ch in enumerate(s):
            juncs[i, j] = codes[ch]
    packed = lstore.pack_juncs(juncs, nj, 1)
    N = 4
    ls = lstore.LinkStore(
        offsets=jnp.asarray(np.concatenate(
            [[0], [4] * (2 * N)]).astype(np.int32)),
        seq=jnp.asarray(packed),
        nj=jnp.asarray(nj.astype(np.int32)),
        nseen=jnp.asarray(np.ones((4, 1), np.uint32)))
    out = lstore.rmsubstr_store(ls)
    assert out.nlinks == 2
    kept = set()
    outnj = np.asarray(out.nj)
    outseq = np.asarray(out.seq)
    for i in range(2):
        s = ""
        for j in range(int(outnj[i])):
            s += "ACGT"[(int(outseq[i, 0]) >> (62 - 2 * j)) & 3]
        kept.add(s)
    assert kept == {"A", "CGC"}


def test_vcfgeno_ploidy_matcher():
    from mccortex_tpu.calls.vcfgeno import ploidy_matcher
    look = ploidy_matcher([".:.:2", ".:Y:0", "John,Tom:X,Y:1"],
                          ["John", "Anna", "Tom"])
    assert look(1, "chr1") == 2      # Anna autosome
    assert look(1, "Y") == 0         # Anna Y
    assert look(0, "Y") == 1         # John Y (later rule overrides)
    assert look(0, "X") == 1         # John X
    assert look(1, "X") == 2         # Anna X


def test_calls2vcf_out_fmt_bcf(tmp_path):
    """-O bcf writes a BCF2.2 our own reader round-trips."""
    from mccortex_tpu.io import vcf as vcfio
    from mccortex_tpu.io import bcf as bcfio
    ref = random_dna(400, seed=603)
    alt = "ACGT"[("ACGT".index(ref[200]) + 1) % 4]
    donor = ref[:200] + alt + ref[201:]
    k = 11
    fa_ref = str(tmp_path / "ref.fa")
    write_fasta(fa_ref, [ref])
    fa_d = str(tmp_path / "d.fa")
    write_fasta(fa_d, [donor])
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "-s", "ref", "-1", fa_ref,
                 "-s", "d", "-1", fa_d, ctx]) == 0
    bub = str(tmp_path / "bub.txt.gz")
    assert mctx(["bubbles", "-o", bub, ctx]) == 0
    out = str(tmp_path / "calls.bcf")
    assert mctx(["calls2vcf", "-o", out, "-O", "bcf", bub,
                 fa_ref]) == 0
    back = bcfio.read_bcf(out)
    assert len(back.records) == 1
    r = back.records[0]
    assert r.pos == 200 and r.ref == ref[200] and r.alts == [alt]
    # ubcf (uncompressed) reads back identically
    out2 = str(tmp_path / "calls.ubcf.bcf")
    assert mctx(["calls2vcf", "-o", out2, "-O", "ubcf", bub,
                 fa_ref]) == 0
    assert open(out2, "rb").read()[:5] == b"BCF\x02\x02"


def test_coverage_degree_symbols(tmp_path, capsys):
    k = 11
    a = random_dna(80, seed=604)
    fa = str(tmp_path / "a.fa")
    write_fasta(fa, [a])
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "-s", "s", "-1", fa, ctx]) == 0
    assert mctx(["coverage", "-1", fa, "-E", ctx]) == 0
    lines = capsys.readouterr().out.splitlines()
    deg = lines[2]   # >name, covg line, degree line
    npos = len(a) - k + 1
    assert len(deg) == npos
    # linear contig: interior kmers are 11 ('-'), the two ends have a
    # missing in/out edge
    assert deg[0] == "/" and deg[-1] == "\\"
    assert set(deg[1:-1]) == {"-"}


def test_contigs_ncontigs_limit(tmp_path, capsys):
    k = 11
    fa = str(tmp_path / "a.fa")
    write_fasta(fa, [random_dna(300, seed=605)])
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "-s", "s", "-1", fa, ctx]) == 0
    assert mctx(["contigs", "-N", "1", "-r", ctx]) == 0
    out = capsys.readouterr().out
    assert out.count(">contig") == 1


def test_unitigs_out_and_points(tmp_path):
    k = 11
    fa = str(tmp_path / "a.fa")
    write_fasta(fa, [random_dna(120, seed=606)])
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "-s", "s", "-1", fa, ctx]) == 0
    out = str(tmp_path / "u.dot")
    assert mctx(["unitigs", "-d", "-P", "-o", out, ctx]) == 0
    txt = open(out).read()
    assert "shape=point" in txt and "digraph" in txt
    # force refusal on rewrite without -f
    assert mctx(["unitigs", "-d", "-o", out, ctx]) != 0


def test_thread_zero_paths(tmp_path):
    from mccortex_tpu.io import ctp as ctpio
    from mccortex_tpu.cli.commands import _load_graph
    k = 9
    m = random_dna(30, seed=607)
    r1 = random_dna(20, seed=608) + m + random_dna(20, seed=609)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [r1, r1])
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "l.ctp.gz")
    ctp2 = str(tmp_path / "l2.ctp.gz")
    assert mctx(["build", "-k", str(k), "-s", "s", "-1", fa, ctx]) == 0
    assert mctx(["thread", "-1", fa, "-o", ctp, ctx]) == 0
    # re-thread the same reads with -p + -0: counts must equal a fresh
    # thread (not doubled)
    assert mctx(["thread", "-1", fa, "-o", ctp2, "-p", ctp, "-0",
                 ctx]) == 0
    h, g = _load_graph(ctx)
    fresh = ctpio.load_ctp(ctp, g)
    rethreaded = ctpio.load_ctp(ctp2, g)
    assert (np.asarray(rethreaded.nseen).sum()
            == np.asarray(fresh.nseen).sum())


def test_build_graph_input_colours(tmp_path):
    """build -g <in.ctx> slots the file's colours in CLI order."""
    from mccortex_tpu.io import ctx as ctxio
    k = 11
    a = random_dna(100, seed=610)
    b = random_dna(100, seed=611)
    fa_a = str(tmp_path / "a.fa")
    fa_b = str(tmp_path / "b.fa")
    write_fasta(fa_a, [a])
    write_fasta(fa_b, [b])
    ca = str(tmp_path / "a.ctx")
    both = str(tmp_path / "both.ctx")
    assert mctx(["build", "-k", str(k), "-s", "A", "-1", fa_a,
                 ca]) == 0
    assert mctx(["build", "-k", str(k), "-g", ca, "-s", "B", "-1",
                 fa_b, both]) == 0
    h, keys, covg, edges = ctxio.read_ctx(both)
    assert h.ncols == 2
    assert h.ginfo[0].sample_name == "A"
    assert h.ginfo[1].sample_name == "B"
    # colour 0 only covers a's kmers, colour 1 only b's
    ha, ka, ca_, _ = ctxio.read_ctx(ca)
    assert (covg[:, 0] > 0).sum() == len(ka)


def test_multi_graph_inputs(tmp_path, capsys):
    """Commands taking '<in.ctx> [in2.ctx ...]' load every file with
    colours concatenated (ref graphs_load.c)."""
    k = 11
    a = random_dna(100, seed=620)
    b = random_dna(100, seed=621)
    fa_a = str(tmp_path / "a.fa")
    fa_b = str(tmp_path / "b.fa")
    write_fasta(fa_a, [a])
    write_fasta(fa_b, [b])
    ca = str(tmp_path / "a.ctx")
    cb = str(tmp_path / "b.ctx")
    assert mctx(["build", "-k", str(k), "-s", "A", "-1", fa_a, ca]) == 0
    assert mctx(["build", "-k", str(k), "-s", "B", "-1", fa_b, cb]) == 0
    # coverage over both graphs: one covg line per colour
    assert mctx(["coverage", "-1", fa_a, ca, cb]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith(">")
    covs0 = [int(x) for x in out[1].split()]
    covs1 = [int(x) for x in out[2].split()]
    assert all(c == 1 for c in covs0)       # colour A covers read a
    assert all(c == 0 for c in covs1)       # colour B does not


def test_thread_use_new_paths():
    """-u/--use-new-paths (ref ctx_thread -u): links from earlier
    batches become visible to later batches' gap walkers.  A clean read
    in batch 1 creates the link that resolves the errory read's in-gap
    fork in batch 2; default (off, like the ref's split read/write
    stores) leaves the gap unbridged."""
    from test_links import build_g
    from mccortex_tpu.links import thread as lthread
    from mccortex_tpu.align.correct import CorrectAlnStats
    k = 11
    S = random_dna(14, seed=920)           # short: gap covers merge+fork
    u = random_dna(60, seed=921)[:-1] + "G"
    v = random_dna(60, seed=922)[:-1] + "T"
    z1 = "A" + random_dna(59, seed=923)
    z2 = "C" + random_dna(59, seed=924)
    s1 = u + S + z1
    s2 = v + S + z2
    g = build_g([(s1, 0), (s2, 0)], k)
    err = 60 + 6
    alt = "ACGT"[("ACGT".index(s1[err]) + 1) % 4]
    bad = s1[:err] + alt + s1[err + 1:]
    b1 = seq_to_codes(s1)[None, :]
    b2 = seq_to_codes(bad)[None, :]

    st0 = CorrectAlnStats()
    lthread.thread_reads_gapfill(g, [(b1, 0), (b2, 0)], 1,
                                 use_new_paths=False, aln_stats=st0)
    assert st0.num_mid_traversed == 0, st0.summary()

    st1 = CorrectAlnStats()
    lthread.thread_reads_gapfill(g, [(b1, 0), (b2, 0)], 1,
                                 use_new_paths=True, aln_stats=st1)
    assert st1.num_mid_traversed == 1, st1.summary()


def test_loop_repeat_reconstruction(tmp_path):
    """Ref tests/loop: a read through a 4x tandem repeat (10bp unit,
    k=9) is exactly reconstructible from the graph + links — the
    RepeatWalker must traverse the loop the recorded number of times,
    no more, no fewer."""
    from mccortex_tpu.utils.dna import revcomp
    seq = "CGTTAATCCT" + "ATTGAGTTCA" * 4 + "CTGGTCACGG"
    fa = str(tmp_path / "seq.fa")
    open(fa, "w").write(f">s\n{seq}\n")
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "l.ctp.gz")
    out = str(tmp_path / "regen.fa")
    assert mctx(["build", "-k", "9", "-s", "LoopTest", "-1", fa,
                 ctx]) == 0
    assert mctx(["thread", "-1", fa, "-o", ctp, ctx]) == 0
    assert mctx(["contigs", "--no-missing-check", "-o", out,
                 "-p", ctp, ctx]) == 0
    contigs = [l.strip() for l in open(out) if not l.startswith(">")]
    assert any(c in (seq, revcomp(seq)) for c in contigs), contigs


def test_long_record_chunking_no_truncation(tmp_path):
    """Sequences longer than the reader row width must NOT be truncated
    (chromosome-length FASTA records, long reads): they are emitted as
    overlapping chunks preserving every kmer and edge, with exactly one
    duplicate kmer observation per seam when overlap=k."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from graph_ref import build_ref_graph
    from test_graph_build import graph_to_dict
    from mccortex_tpu.io import seqio
    from mccortex_tpu.graph import build as gbuild
    k = 31
    ref = random_dna(3000, seed=640)
    fa = str(tmp_path / "long.fa")
    open(fa, "w").write(f">c\n{ref}\n")
    batches = [(c, 0) for c, _q, _ in
               seqio.read_batches_native([fa], overlap=k)]
    assert sum(b.shape[0] for b, _ in batches) == 3   # 3 chunks
    g = gbuild.build(batches, k, ncols=1)
    refd = build_ref_graph([(ref, 0)], k, ncols=1)
    got = graph_to_dict(g, k)
    assert set(got) == set(refd)
    assert all(got[x][1] == refd[x][1] for x in refd)      # edges
    dups = sum(got[x][0][0] - refd[x][0][0] for x in refd)
    assert dups == 2                                       # 2 seams
    # the CLI end-to-end: graph from the FASTA covers the whole genome
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "-s", "s", "-1", fa, ctx]) == 0
    from mccortex_tpu.io import ctx as ctxio
    h, keys, covg, edges = ctxio.read_ctx(ctx)
    assert len(keys) == len(refd)
