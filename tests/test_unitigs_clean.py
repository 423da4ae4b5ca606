"""Unitig decomposition, cleaning and infer-edges tests.

Parallels ref src/tests/{supernode,cleaning,infer_edges} suites, checked
against the independent python walker in graph_ref.ref_unitigs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.graph import store as gstore
from mccortex_tpu.graph import unitigs as U
from mccortex_tpu.graph import clean as C
from mccortex_tpu.graph import prune as P
from mccortex_tpu.graph import infer_edges as IE

from util import random_dna, revcomp_str, seq_to_codes
from graph_ref import build_ref_graph, ref_unitigs
from test_graph_build import batchify, graph_to_dict


def build_g(inputs, k, ncols=1):
    return gbuild.build(batchify(inputs), k, ncols=ncols)


def canon(seqs):
    return {min(s, revcomp_str(s)) for s in seqs}


@pytest.mark.parametrize("k", [5, 11, 31])
def test_single_read_one_unitig(k):
    seq = random_dna(80, seed=k + 1)
    g = build_g([(seq, 0)], k)
    unis = U.extract_unitigs(g)
    ref = ref_unitigs(build_ref_graph([(seq, 0)], k), k)
    assert canon(unis) == ref
    # typically the read has no repeats -> one unitig equal to the read
    if len(ref) == 1:
        assert canon(unis) == {min(seq, revcomp_str(seq))}


def test_fork_splits_unitigs():
    k = 7
    stem = random_dna(30, seed=10)
    a = stem + "A" + random_dna(20, seed=11)
    b = stem + "C" + random_dna(20, seed=12)
    g = build_g([(a, 0), (b, 0)], k)
    ref = ref_unitigs(build_ref_graph([(a, 0), (b, 0)], k), k)
    assert canon(U.extract_unitigs(g)) == ref
    assert len(ref) >= 3  # stem + two branches


@pytest.mark.parametrize("seed", range(6))
def test_random_multi_read_unitigs(seed):
    k = 9
    reads = [random_dna(60, seed=seed * 10 + i) for i in range(4)]
    # overlap some reads to create joins/forks
    reads.append(reads[0][20:] + reads[1][:20])
    inputs = [(r, 0) for r in reads]
    g = build_g(inputs, k)
    ref = ref_unitigs(build_ref_graph(inputs, k), k)
    assert canon(U.extract_unitigs(g)) == ref


def test_cycle_unitig():
    k = 5
    # circular sequence: wrap a random seq by k-1
    core = "ACGGTCAGTACCTTGGCAAT"
    seq = core + core[:k]  # k-base overlap closes the cycle
    g = build_g([(seq, 0)], k)
    uv, median, is_tip, ext = U.unitig_stats(g)
    n = int(g.n)
    cyc = np.asarray(uv.is_cycle)[:n]
    assert cyc.all()  # every kmer on the cycle
    assert int(np.asarray(uv.length)[:n].max()) == n
    unis = U.extract_unitigs(g)
    assert len(unis) == 1 and len(unis[0]) == len(core) + k - 1


def test_clean_low_covg_unitig():
    k = 11
    good = random_dna(120, seed=21)
    noise = random_dna(40, seed=22)
    inputs = [(good, 0)] * 3 + [(noise, 0)]
    g = build_g(inputs, k)
    g2 = C.clean_graph(g, covg_threshold=2)
    ref = build_ref_graph([(good, 0)] * 3, k)
    got = graph_to_dict(g2, k)
    assert set(got) == set(ref)
    # coverage preserved for kept kmers
    for km in got:
        assert got[km][0] == ref[km][0]


def test_clean_tips():
    k = 7
    main = random_dna(100, seed=31)
    # a short tip: branches off mid-way with a couple of bases
    tip = main[40:40 + k - 1] + "T" + "A"
    if tip[k - 1] == main[40 + k - 1]:
        tip = main[40:40 + k - 1] + "C" + "A"
    inputs = [(main, 0), (tip, 0)]
    g = build_g(inputs, k)
    uv, median, is_tip, ext = U.unitig_stats(g)
    assert bool(np.asarray(is_tip)[:int(g.n)].any())
    g2 = C.clean_graph(g, min_keep_tip=2 * k)
    # tip kmers gone; main path intact... main's own ends are also tips
    # (whole graph ends), so only the *short* tip is removed
    ref_main = build_ref_graph([(main, 0)], k)
    got = graph_to_dict(g2, k)
    assert set(got) == set(ref_main)
    # edge symmetry preserved after pruning
    from mccortex_tpu.utils import checks
    keys, covg, edges = gstore.to_host(g2)
    assert checks.check_graph_arrays(k, keys, covg, edges) == []


def test_threshold_fit_poisson_mixture():
    rng = np.random.default_rng(0)
    # errors: ~Poisson(0.6) truncated>0, real: Poisson(25)
    err = rng.poisson(0.6, 30000)
    real = rng.poisson(25, 20000)
    covgs = np.concatenate([err[err > 0], real[real > 0]])
    hist = np.bincount(covgs, minlength=100).astype(np.uint64)
    hist[0] = 0
    cutoff, a, b, fp, fn = C.pick_kmer_threshold(hist)
    assert 2 <= cutoff <= 12
    assert fp < 0.05 and fn < 0.05


def test_infer_edges_pop():
    k = 9
    seq = random_dna(60, seed=41)
    # colour 0 sees the whole seq; colour 1 sees two halves (no edge
    # between them at the junction kmers)
    left, right = seq[:35], seq[35 - k + 1:]
    inputs = [(seq, 0), (left, 1), (right, 1)]
    g = build_g(inputs, k, ncols=2)
    g2 = IE.infer_edges(g, pop_only=True)
    # now colour 1 must have the same edges as colour 0 wherever both
    # kmers are present in colour 1
    d = graph_to_dict(g2, k)
    ref_full = build_ref_graph([(seq, 0), (seq, 1)], k)
    for km, (cov, edg) in d.items():
        if cov[1] > 0:
            assert edg[1] == ref_full[km][1][1], km
    # check symmetry still holds
    from mccortex_tpu.utils import checks
    keys, covg, edges = gstore.to_host(g2)
    assert checks.check_graph_arrays(k, keys, covg, edges) == []


def test_prune_mask_basic():
    k = 7
    seq = random_dna(50, seed=51)
    g = build_g([(seq, 0)], k)
    n = int(g.n)
    keep = jnp.ones(g.capacity, bool).at[0].set(False)
    g2 = P.prune_to_mask(g, keep)
    assert int(g2.n) == n - 1
    keys, covg, edges = gstore.to_host(g2)
    from mccortex_tpu.utils import checks
    assert checks.check_graph_arrays(k, keys, covg, edges) == []


def test_cli_clean_unitigs(tmp_path, capsys):
    from mccortex_tpu.cli.main import main as mctx
    from test_ctx_io import write_fasta
    k = 11
    good = random_dna(150, seed=61)
    noise = random_dna(40, seed=62)
    fa = str(tmp_path / "in.fa")
    write_fasta(fa, [good] * 3 + [noise])
    raw = str(tmp_path / "raw.ctx")
    cln = str(tmp_path / "clean.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, raw]) == 0
    assert mctx(["clean", "--unitigs", "2", "-o", cln, raw]) == 0
    assert mctx(["check", cln]) == 0
    capsys.readouterr()
    assert mctx(["unitigs", cln]) == 0
    out = capsys.readouterr().out
    seqs = [l for l in out.splitlines() if l and not l.startswith(">")]
    assert canon(seqs) == {min(good, revcomp_str(good))}
    # GFA output
    assert mctx(["unitigs", "--gfa", cln]) == 0
    gfa = capsys.readouterr().out
    assert gfa.startswith("H\t") and "S\tunitig0\t" in gfa


def test_gfa_links(tmp_path, capsys):
    from mccortex_tpu.cli.main import main as mctx
    from test_ctx_io import write_fasta
    k = 7
    stem = random_dna(30, seed=70)
    a = stem + "A" + random_dna(20, seed=71)
    b = stem + "C" + random_dna(20, seed=72)
    fa = str(tmp_path / "in.fa")
    write_fasta(fa, [a, b])
    raw = str(tmp_path / "raw.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, raw]) == 0
    capsys.readouterr()
    assert mctx(["unitigs", "--gfa", raw]) == 0
    gfa = capsys.readouterr().out
    n_seg = sum(1 for l in gfa.splitlines() if l.startswith("S\t"))
    n_link = sum(1 for l in gfa.splitlines() if l.startswith("L\t"))
    assert n_seg >= 3 and n_link >= 2  # fork: stem connects to 2 branches


def test_cleaning_histogram_csvs(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from test_ctx_io import write_fasta
    k = 9
    genome = random_dna(120, seed=1100)
    err = random_dna(30, seed=1101)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [genome] * 3 + [err])
    ctx = str(tmp_path / "g.ctx")
    out = str(tmp_path / "c.ctx")
    cb, ca = str(tmp_path / "cb.csv"), str(tmp_path / "ca.csv")
    lb = str(tmp_path / "lb.csv")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq", fa, ctx]) == 0
    assert mctx(["clean", "--unitigs", "2", "-c", cb, "-C", ca,
                 "-l", lb, "-o", out, ctx]) == 0
    blines = open(cb).read().splitlines()
    assert blines[0] == "Covg,NumKmers,NumUnitigs"
    hist = {int(l.split(",")[0]): int(l.split(",")[1])
            for l in blines[1:]}
    assert hist.get(3, 0) > 0 and hist.get(1, 0) > 0
    alines = open(ca).read().splitlines()
    ahist = {int(l.split(",")[0]): int(l.split(",")[1])
             for l in alines[1:]}
    assert ahist.get(1, 0) == 0         # covg-1 kmers cleaned away
    llines = open(lb).read().splitlines()
    assert llines[0] == "UnitigKmerLength,bp,Count"


def test_adjacency_free_paths_match(monkeypatch):
    """successors/clear_dangling_edges direct probe sweeps (used above
    ADJ_FREE_N kmers, where the flat adjacency would OOM) must equal the
    adjacency-backed paths."""
    from mccortex_tpu.graph import adjacency as adjmod
    rng = np.random.default_rng(77)
    k = 9
    seqs = [(random_dna(200, seed=77 + i), 0) for i in range(6)]
    g = gbuild.build(batchify(seqs), k, ncols=1)
    uedges = gstore.union_edges(g)

    adj = adjmod.get_adjacency(g)
    succ_adj = np.asarray(U._successors_from_adj(uedges, adj))
    succ_dir = np.asarray(U._successors_direct(g.keys, uedges, k))
    np.testing.assert_array_equal(succ_adj, succ_dir)

    keep = jnp.asarray(rng.integers(0, 2, g.capacity, np.uint8) > 0)
    e_adj = np.asarray(P._clear_dangling_adj(g.edges, keep, adj))
    e_dir = np.asarray(P._clear_dangling_direct(g.keys, g.edges, keep, k))
    np.testing.assert_array_equal(e_adj, e_dir)

    # and the public entry points pick the direct path at scale
    monkeypatch.setattr(adjmod, "ADJ_FREE_N", 1)
    adjmod._cache_store.clear()
    succ_pub = np.asarray(U.successors(g.keys, uedges, k))
    np.testing.assert_array_equal(succ_adj, succ_pub)


def test_pd_step_chunked_matches_packed():
    """The single-program chunked doubling pass (used above V=96M,
    r5 100Mb clean OOM fix) must produce exactly the packed pass's
    output, including the clamped-overlap tail chunk."""
    import numpy as np
    import jax.numpy as jnp
    from mccortex_tpu.graph import unitigs as U
    rng = np.random.default_rng(5)
    for V in (7, 64, 101):
        succ = rng.integers(-1, V, V).astype(np.int32)
        pk = U._pd_init(jnp.asarray(succ))
        ref, ch_ref = U._pd_step_packed(pk)
        for nch in (2, 3, 5):
            out, ch = U._pd_step_chunked(pk, nch)
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(ref))
            # overlap may double-count changes but never invent or
            # lose convergence: zero iff the packed count is zero
            assert (int(ch) == 0) == (int(ch_ref) == 0)
