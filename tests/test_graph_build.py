"""Graph store + build tests vs the pure-Python reference builder.

Parallels ref src/tests/{hash_table_tests.c, build_graph tests}: build
tiny graphs from string literals, assert kmer sets, coverage and edges.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.constants import nwords
from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.graph import store as gstore
from mccortex_tpu.ops import kmer as K
from mccortex_tpu.ops import sorted as sops

from util import random_dna, seq_to_codes, words_to_kmer, kmer_to_words
from graph_ref import build_ref_graph


def batchify(seqs_cols, pad_to=None):
    """[(seq, colour)] -> [(codes (B,L), colour)] grouped by colour."""
    by_col = {}
    for s, c in seqs_cols:
        by_col.setdefault(c, []).append(s)
    L = pad_to or max(len(s) for s, _ in seqs_cols)
    out = []
    for c, seqs in by_col.items():
        codes = np.stack([seq_to_codes(s, pad_to=L) for s in seqs])
        out.append((codes, c))
    return out


def graph_to_dict(g, k):
    keys, covg, edges = gstore.to_host(g)
    return {words_to_kmer(keys[i], k): (covg[i].tolist(), edges[i].tolist())
            for i in range(len(keys))}


@pytest.mark.parametrize("k", [5, 21, 31, 33])
def test_build_single_colour(k):
    seq = random_dna(200, seed=k)
    ref = build_ref_graph([(seq, 0)], k)
    g = gbuild.build(batchify([(seq, 0)]), k, ncols=1)
    got = graph_to_dict(g, k)
    assert got == ref
    assert int(g.n) == len(ref)


def test_build_multi_colour_and_revcmp_merge():
    k = 11
    s0 = random_dna(150, seed=1)
    s1 = random_dna(150, seed=2)
    # colour 1 also sees s0 reverse-complemented: same keys, covg doubled
    from util import revcomp_str
    inputs = [(s0, 0), (s1, 1), (revcomp_str(s0), 1)]
    ref = build_ref_graph(inputs, k)
    g = gbuild.build(batchify(inputs), k, ncols=2)
    assert graph_to_dict(g, k) == ref


def test_build_with_n_bases():
    k = 7
    seq = "ACGTACGTTTNGGCATCAGTCNNACGGCATCA"
    ref = build_ref_graph([(seq, 0)], k)
    g = gbuild.build(batchify([(seq, 0)]), k, ncols=1)
    assert graph_to_dict(g, k) == ref


def test_build_repeated_kmers_coverage():
    k = 5
    seq = "AAAAAAAAAA"  # all AAAAA, key TTTTT... no: key = AAAAA (lex min)
    g = gbuild.build(batchify([(seq, 0)]), k, ncols=1)
    ref = build_ref_graph([(seq, 0)], k)
    assert graph_to_dict(g, k) == ref
    assert int(g.n) == 1


def test_lookup_found_and_missing():
    k = 11
    seq = random_dna(300, seed=42)
    g = gbuild.build(batchify([(seq, 0)]), k, ncols=1)
    # all real kmers are found
    codes = jnp.asarray(seq_to_codes(seq)[None])
    kmers, valid = K.rolling_kmers(codes, k)
    keys, _ = K.canonical(kmers, k)
    idx, found = gstore.lookup(g, keys[0])
    found_np = np.asarray(found)
    valid_np = np.asarray(valid[0])
    assert (found_np == valid_np).all()
    # looked-up slots hold the queried keys
    keys_np = np.asarray(keys[0])
    store_keys = np.asarray(g.keys)
    got = store_keys[np.asarray(idx)][valid_np]
    np.testing.assert_array_equal(got, keys_np[valid_np])
    # unseen kmer is not found
    other = random_dna(k, seed=4242)
    while other in seq:
        other = random_dna(k, seed=None)
    okey, _ = K.canonical(K.pack_kmers(jnp.asarray(seq_to_codes(other)[None]), k), k)
    _, f2 = gstore.lookup(g, okey)
    assert not bool(f2[0])


def test_merge_records_grows_graph():
    k = 11
    s0, s1 = random_dna(100, seed=7), random_dna(100, seed=8)
    g0 = gbuild.build(batchify([(s0, 0)]), k, ncols=1, capacity=2048)
    keys, covg, edges, nu = gbuild.count_batch(
        jnp.asarray(batchify([(s1, 0)])[0][0]), k, 1, 0)
    g = gstore.merge_records(g0, keys, covg, edges)
    ref = build_ref_graph([(s0, 0), (s1, 0)], k)
    assert graph_to_dict(g, k) == ref


def test_quality_masking():
    k = 7
    seq = random_dna(60, seed=9)
    quals = np.full(60, 30, np.uint8)
    quals[20:25] = 3  # below cutoff
    masked = gbuild.mask_reads(jnp.asarray(seq_to_codes(seq)[None]),
                               jnp.asarray(quals[None]), fq_cutoff=10)
    expect = seq[:20] + "N" * 5 + seq[25:]
    ref = build_ref_graph([(expect, 0)], k)
    g = gbuild.build([(np.asarray(masked), 0)], k, ncols=1)
    assert graph_to_dict(g, k) == ref


def test_homopolymer_masking():
    k = 5
    seq = "ACGTC" + "A" * 8 + "GTCAGCATG"
    masked = gbuild.mask_reads(jnp.asarray(seq_to_codes(seq)[None]),
                               None, hp_cutoff=6)
    got = np.asarray(masked)[0]
    # the 8-base A run must be gone; shorter runs survive
    s = "".join("ACGTN"[min(b, 4)] for b in got)
    assert "AAAAAA" not in s
    assert s.startswith("ACGTC")


def test_pcr_dup_filter():
    from mccortex_tpu.graph.build import PcrDupFilter
    k = 11
    s1 = random_dna(60, seed=960)
    s2 = random_dna(60, seed=961)
    f = PcrDupFilter(k)
    b1 = np.stack([seq_to_codes(s1), seq_to_codes(s2)])
    keep = f.filter_batch(b1)
    assert keep.all()
    # exact duplicate start -> dropped; new read kept
    s3 = random_dna(60, seed=962)
    b2 = np.stack([seq_to_codes(s1), seq_to_codes(s3)])
    keep2 = f.filter_batch(b2)
    assert not keep2[0] and keep2[1]
    # same start kmer in the OTHER orientation is not a duplicate
    from util import revcomp_str
    rc = revcomp_str(s1[:k]) + random_dna(40, seed=963)
    keep3 = f.filter_batch(np.stack([seq_to_codes(rc)]))
    assert keep3[0]


def test_pcr_pair_filter():
    from mccortex_tpu.graph.build import PcrDupFilter
    k = 9
    r1 = random_dna(40, seed=970)
    r2 = random_dna(40, seed=971)
    other = random_dna(40, seed=972)
    f = PcrDupFilter(k)
    keep = f.filter_batch(np.stack([seq_to_codes(r1)]),
                          np.stack([seq_to_codes(r2)]))
    assert keep.all()
    # both starts seen -> dropped
    keep2 = f.filter_batch(np.stack([seq_to_codes(r1)]),
                           np.stack([seq_to_codes(r2)]))
    assert not keep2[0]
    # only one start seen -> kept (ref: ALL start kmers must be seen)
    keep3 = f.filter_batch(np.stack([seq_to_codes(r1)]),
                           np.stack([seq_to_codes(other)]))
    assert keep3[0]


def test_pcr_filter_matches_sequential_reference():
    # fuzz the vectorised PcrDupFilter against a literal sequential
    # re-implementation of ref build_graph.c:35-96
    from mccortex_tpu.graph.build import PcrDupFilter
    from mccortex_tpu.utils import npkmer as npk
    rng = np.random.default_rng(77)
    k = 7

    def ref_filter(batches, pairs):
        seen = {}
        keeps = []
        for bi, (b1, b2) in enumerate(zip(batches, pairs)):
            keep = np.ones(len(b1), bool)
            for i in range(len(b1)):
                infos = []
                for b in ([b1[i]] if b2 is None else [b1[i], b2[i]]):
                    if (b[:k] < 4).all() and len(b) >= k:
                        km, valid = npk.rolling_kmers_np(b[:k], k)
                        key, o = npk.canonical_np(km, k)
                        infos.append((key[0].tobytes(), int(o[0])))
                if not infos:
                    continue
                if all((seen.get(key, 0) >> o) & 1 for key, o in infos):
                    keep[i] = False
                else:
                    for key, o in infos:
                        seen[key] = seen.get(key, 0) | (1 << o)
            keeps.append(keep)
        return keeps

    # small alphabet of starts to force collisions; some invalid reads
    starts = [rng.integers(0, 4, k).astype(np.uint8) for _ in range(6)]
    def mk_batch(n, with_invalid=True):
        rows = np.full((n, 20), 0, np.uint8)
        for i in range(n):
            s = starts[rng.integers(0, len(starts))]
            rows[i, :k] = s
            rows[i, k:] = rng.integers(0, 4, 20 - k)
            if with_invalid and rng.random() < 0.15:
                rows[i, rng.integers(0, k)] = 4
        return rows

    # single-end batches
    f = PcrDupFilter(k)
    batches = [mk_batch(12) for _ in range(4)]
    got = [f.filter_batch(b) for b in batches]
    want = ref_filter(batches, [None] * 4)
    for g_, w in zip(got, want):
        np.testing.assert_array_equal(g_, w)

    # paired-end batches
    f2 = PcrDupFilter(k)
    b1s = [mk_batch(10) for _ in range(3)]
    b2s = [mk_batch(10) for _ in range(3)]
    got = [f2.filter_batch(a, b) for a, b in zip(b1s, b2s)]
    seen = {}
    # sequential reference for pairs
    def ref_pairs():
        keeps = []
        for a, b in zip(b1s, b2s):
            keep = np.ones(len(a), bool)
            for i in range(len(a)):
                infos = []
                for rr in (a[i], b[i]):
                    if (rr[:k] < 4).all():
                        km, _v = npk.rolling_kmers_np(rr[:k], k)
                        key, o = npk.canonical_np(km, k)
                        infos.append((key[0].tobytes(), int(o[0])))
                if not infos:
                    continue
                if all((seen.get(x, 0) >> o) & 1 for x, o in infos):
                    keep[i] = False
                else:
                    for x, o in infos:
                        seen[x] = seen.get(x, 0) | (1 << o)
            keeps.append(keep)
        return keeps
    want = ref_pairs()
    for g_, w in zip(got, want):
        np.testing.assert_array_equal(g_, w)


def test_build_seqi_pair_aware_pcr(tmp_path):
    # interleaved PE file: a pair is dropped only when BOTH mates'
    # start kmers were seen (ref build_graph.c:62)
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctx as ictx
    from util import random_dna
    k = 11
    r1 = random_dna(40, seed=1500)
    r2 = random_dna(40, seed=1501)
    r3 = random_dna(40, seed=1502)
    fa = str(tmp_path / "i.fa")
    with open(fa, "w") as f:
        # pair A, exact duplicate pair A (dropped), half-dup pair (kept)
        for i, s in enumerate([r1, r2, r1, r2, r1, r3]):
            f.write(f">p{i}\n{s}\n")
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--remove-pcr", "--seqi", fa, ctx]) == 0
    h, keys, covg, edges = ictx.read_ctx(ctx)
    # pair (r1, r3): r1 start seen, r3 start not -> pair kept; covg of
    # r1's kmers is 2 (dup pair removed), r3's kmers present
    from mccortex_tpu.utils import npkmer as npk
    kk, _, _ = npk.seq_canonical_keys(r3[:k], k)
    present = (keys == kk[0]).all(axis=1).any()
    assert present
    kk1, _, _ = npk.seq_canonical_keys(r1[:k], k)
    row = np.nonzero((keys == kk1[0]).all(axis=1))[0]
    assert covg[row[0], 0] == 2


def test_build_intersect(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctx as ictx
    from util import random_dna
    from test_ctx_io import write_fasta
    k = 11
    shared = random_dna(60, seed=1800)
    a = random_dna(60, seed=1801) + shared
    b = random_dna(60, seed=1802) + shared
    fa_a = str(tmp_path / "a.fa"); write_fasta(fa_a, [a])
    fa_b = str(tmp_path / "b.fa"); write_fasta(fa_b, [b])
    cb = str(tmp_path / "b.ctx")
    out = str(tmp_path / "ab.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "b",
                 "--seq", fa_b, cb]) == 0
    assert mctx(["build", "-k", str(k), "--sample", "a",
                 "--intersect", cb, "--seq", fa_a, out]) == 0
    h, keys, covg, edges = ictx.read_ctx(out)
    hb, kb, _, _ = ictx.read_ctx(cb)
    kbs = set(map(tuple, kb.tolist()))
    assert len(keys) >= 60 - k + 1
    assert all(tuple(x) in kbs for x in keys.tolist())
    assert h.ginfo[0].cleaning.is_graph_intersection


def test_native_merge_matches_numpy():
    from mccortex_tpu.graph import build as gb
    from mccortex_tpu.ops import sorted as sops
    rng = np.random.default_rng(31)

    def mk(n_live, cap, C, seed):
        r = np.random.default_rng(seed)
        keys = np.sort(np.unique(
            r.integers(0, 1 << 44, n_live).astype(np.uint64)))
        n_live = keys.shape[0]
        out_k = np.full((cap, 1), np.uint64(0xFFFFFFFFFFFFFFFF))
        out_k[:n_live, 0] = keys
        covg = np.zeros((cap, C), np.uint32)
        covg[:n_live] = r.integers(1, 1 << 30, (n_live, C))
        edges = np.zeros((cap, C), np.uint8)
        edges[:n_live] = r.integers(0, 256, (n_live, C))
        return out_k, covg, edges

    for C in (1, 3):
        a = mk(900, 1200, C, 300 + C)
        b = mk(700, 1200, C, 400 + C)
        nat = gb._merge2_native(*a, *b)
        assert nat is not None
        # numpy reference path (bypass the native shortcut)
        import unittest.mock as mock
        with mock.patch.object(gb, "_merge2_native",
                               lambda *args: None):
            ref = gb._merge2_np(*a, *b)
        for x, y in zip(nat, ref):
            np.testing.assert_array_equal(x, y)
    # covg saturation at u32 max
    a = mk(10, 16, 1, 500)
    b = (a[0].copy(), a[1].copy(), a[2].copy())
    a[1][:10] = 0xFFFFFFF0
    b[1][:10] = 0x20
    nat = gb._merge2_native(*a, *b)
    assert (nat[1][:10] == 0xFFFFFFFF).all()


def test_packed_host_batch_matches_direct():
    """2-bit host packing (H2D reduction, ROUND5): count_batch_host
    must equal count_batch_best on the same codes, incl. N bases and
    non-multiple-of-4/8 read lengths."""
    import jax.numpy as jnp
    rng = np.random.default_rng(77)
    for L in (33, 70, 150):
        codes = rng.integers(0, 4, size=(6, L), dtype=np.uint8)
        codes[0, L // 2] = 4
        codes[3, 1] = 4
        o1 = gbuild.count_batch_host(codes, 11, 2, 1)
        o2 = gbuild.count_batch_best(jnp.asarray(codes), 11, 2, 1)
        for a, b in zip(o1, o2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # packing round-trip unit props
    codes = rng.integers(0, 4, size=(4, 50), dtype=np.uint8)
    packed, nmask, L = gbuild.pack_reads_np(codes)
    assert nmask is None and packed.shape == (4, 13) and L == 50
    dec = np.asarray(gbuild.unpack_reads(jnp.asarray(packed), None, L))
    np.testing.assert_array_equal(dec, codes)


def test_lazy_device_merge_matches_plain(monkeypatch):
    """The lazy LSM fold (ROUND5: merge compaction deferred to the next
    fold so the count fetch overlaps later epochs) must produce the
    same graph as the eager host path.  MCTX_FORCE_DEV_MERGE routes the
    CPU run through the device-merge branch (merge_sorted_fused in
    interpret mode) so _resolve/_merge_items lazy plumbing is actually
    exercised: multiple batches force folds at equal levels plus the
    final-assembly resolution of a still-lazy stack item."""
    rng = np.random.default_rng(4242)
    k = 11
    reads = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(24)]
    batches = [batchify([(r, 0) for r in reads[i:i + 4]])[0]
               for i in range(0, 24, 4)]
    g_plain = gbuild.build(iter(batches), k, ncols=1)
    monkeypatch.setenv("MCTX_FORCE_DEV_MERGE", "1")
    g_lazy = gbuild.build(iter(batches), k, ncols=1)
    assert int(g_plain.n) == int(g_lazy.n)
    assert graph_to_dict(gstore.compacted(g_plain), k) == \
        graph_to_dict(gstore.compacted(g_lazy), k)


def test_batch_epoch_oom_self_heal(monkeypatch):
    """A RESOURCE_EXHAUSTED batch epoch must self-heal (resolve lazy
    merges + retry), and a second failure must split the batch — the
    graph must come out identical either way (joint-calling C=10 hit
    this in r5c: lazy merge inputs idled in HBM while the next epoch
    failed to allocate)."""
    import jax
    rng = np.random.default_rng(99)
    k = 11
    reads = ["".join(rng.choice(list("ACGT"), size=60))
             for _ in range(16)]
    batches = [batchify([(r, 0) for r in reads[i:i + 4]])[0]
               for i in range(0, 16, 4)]
    g_plain = gbuild.build(iter(batches), k, ncols=1)

    real = gbuild.count_batch_host
    fails = {"n": 2}   # first call heals+retries; retry fails -> split

    def flaky(bases_np, k_, ncols_, colour_):
        if fails["n"] > 0 and bases_np.shape[0] == 4:
            fails["n"] -= 1
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: injected")
        return real(bases_np, k_, ncols_, colour_)

    monkeypatch.setattr(gbuild, "count_batch_host", flaky)
    g_heal = gbuild.build(iter(batches), k, ncols=1)
    assert fails["n"] == 0
    assert int(g_plain.n) == int(g_heal.n)
    assert graph_to_dict(gstore.compacted(g_plain), k) == \
        graph_to_dict(gstore.compacted(g_heal), k)


def test_rank_scatter_merge_matches_plain(monkeypatch):
    """With the 160M host gate off (round 5), oversized merges route to
    the on-device rank-scatter (_merge2).  Force that branch on CPU
    (MERGE_MP_CEIL=0) and assert the graph equals the plain build."""
    rng = np.random.default_rng(1717)
    k = 11
    reads = ["".join(rng.choice(list("ACGT"), size=60))
             for _ in range(24)]
    batches = [batchify([(r, 0) for r in reads[i:i + 4]])[0]
               for i in range(0, 24, 4)]
    g_plain = gbuild.build(iter(batches), k, ncols=1)
    monkeypatch.setenv("MCTX_FORCE_DEV_MERGE", "1")
    monkeypatch.setattr(gbuild, "MERGE_MP_CEIL", 0)
    monkeypatch.setattr(gbuild, "MERGE_RANK_CEIL", 1 << 62)
    g_rank = gbuild.build(iter(batches), k, ncols=1)
    assert int(g_plain.n) == int(g_rank.n)
    assert graph_to_dict(gstore.compacted(g_plain), k) == \
        graph_to_dict(gstore.compacted(g_rank), k)
