"""Property tests for the Pallas segreduce_compact kernel (interpret
mode on CPU) against an independent numpy reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.ops.pallas import segreduce as sr


def ref_segreduce(keys_cols: np.ndarray, edges: np.ndarray):
    """keys_cols: (M, NK) int32 plane columns (sorted records, sentinel
    -1 rows at the end).  Returns unique live rows, covg, edge-OR."""
    live = ~(keys_cols == -1).all(axis=1)
    kv = keys_cols[live]
    ev = edges[live]
    if kv.shape[0] == 0:
        return np.zeros((0, keys_cols.shape[1]), np.int32), \
            np.zeros(0, np.int32), np.zeros(0, np.int32)
    change = np.ones(kv.shape[0], bool)
    change[1:] = (kv[1:] != kv[:-1]).any(axis=1)
    seg = np.cumsum(change) - 1
    nseg = seg[-1] + 1
    uk = kv[change]
    covg = np.bincount(seg, minlength=nseg).astype(np.int32)
    eo = np.zeros(nseg, np.int32)
    np.bitwise_or.at(eo, seg, ev)
    return uk, covg, eo


def run_case(keys_cols, edges):
    M, NK = keys_cols.shape
    planes = tuple(jnp.asarray(keys_cols[:, p]) for p in range(NK))
    ok, oc, oe, n = sr.segreduce_compact(
        planes, jnp.asarray(edges), interpret=True)
    n = int(n)
    got_k = np.stack([np.asarray(p)[:n] for p in ok], axis=1)
    got_c = np.asarray(oc)[:n]
    got_e = np.asarray(oe)[:n]
    uk, covg, eo = ref_segreduce(keys_cols, edges)
    assert n == uk.shape[0], (n, uk.shape[0])
    np.testing.assert_array_equal(got_k, uk)
    np.testing.assert_array_equal(got_c, covg)
    np.testing.assert_array_equal(got_e, eo)
    # tail is sentinel / zero
    tail = np.asarray(ok[0])[n:]
    assert (tail == -1).all()
    assert (np.asarray(oc)[n:] == 0).all()


def make_sorted(rng, M, n_unique, max_dup, nk=1, sent_frac=0.3):
    n_sent = int(M * sent_frac)
    n_live = M - n_sent
    uniq = np.sort(rng.choice(1 << 20, size=n_unique, replace=False))
    reps = rng.integers(1, max_dup + 1, size=n_unique)
    vals = np.repeat(uniq, reps)[:n_live]
    if vals.shape[0] < n_live:
        extra = np.full(n_live - vals.shape[0], uniq[-1])
        vals = np.concatenate([vals, extra])
    vals = np.sort(vals)
    cols = np.full((M, nk), -1, np.int32)
    for p in range(nk):
        # spread bits across planes; plane 0 most significant
        cols[:n_live, p] = ((vals >> (8 * (nk - 1 - p))) &
                            0xFFFFF).astype(np.int32)
    edges = np.zeros(M, np.int32)
    edges[:n_live] = rng.integers(0, 256, size=n_live)
    return cols, edges


M = sr.BLK * 2


def test_basic_random():
    rng = np.random.default_rng(0)
    cols, edges = make_sorted(rng, M, 5000, 6)
    run_case(cols, edges)


def test_all_unique():
    rng = np.random.default_rng(1)
    cols, edges = make_sorted(rng, M, 60000, 1, sent_frac=0.1)
    run_case(cols, edges)


def test_heavy_duplication():
    rng = np.random.default_rng(2)
    cols, edges = make_sorted(rng, M, 40, 4000, sent_frac=0.05)
    run_case(cols, edges)


def test_single_giant_run_crossing_blocks():
    cols = np.full((M, 1), -1, np.int32)
    n_live = sr.BLK + 777       # run crosses the block boundary
    cols[:n_live, 0] = 42
    edges = np.zeros(M, np.int32)
    edges[:n_live] = 1 << (np.arange(n_live) % 8)
    run_case(cols, edges)


def test_all_sentinel():
    cols = np.full((M, 1), -1, np.int32)
    edges = np.zeros(M, np.int32)
    run_case(cols, edges)


def test_no_sentinel_tail_flush():
    # fully live input: the pending run must be flushed at the end
    rng = np.random.default_rng(3)
    cols, edges = make_sorted(rng, M, 3000, 40, sent_frac=0.0)
    run_case(cols, edges)


def test_run_boundary_at_block_edge():
    cols = np.full((M, 1), -1, np.int32)
    cols[:sr.BLK, 0] = 7        # run ends exactly at block boundary
    cols[sr.BLK:sr.BLK + 100, 0] = 9
    edges = np.zeros(M, np.int32)
    edges[:sr.BLK] = 3
    edges[sr.BLK:sr.BLK + 100] = 8
    run_case(cols, edges)


def test_alternating_singletons():
    n_live = sr.BLK + 321
    cols = np.full((M, 1), -1, np.int32)
    cols[:n_live, 0] = np.arange(n_live, dtype=np.int32)
    edges = np.zeros(M, np.int32)
    edges[:n_live] = np.arange(n_live) % 251
    run_case(cols, edges)


def test_two_key_planes():
    rng = np.random.default_rng(4)
    cols, edges = make_sorted(rng, M, 4000, 8, nk=2)
    # re-sort lexicographically by (plane0, plane1) among live rows
    live = ~(cols == -1).all(axis=1)
    lv = cols[live]
    order = np.lexsort((lv[:, 1], lv[:, 0]))
    cols[:lv.shape[0]] = lv[order]
    run_case(cols, edges)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz(seed):
    rng = np.random.default_rng(100 + seed)
    nu = int(rng.integers(1, 50000))
    md = int(rng.integers(1, 300))
    sf = float(rng.uniform(0, 0.6))
    cols, edges = make_sorted(rng, M, nu, md, sent_frac=sf)
    run_case(cols, edges)


def test_count_batch_fused_matches_xla():
    import jax.numpy as jnp
    from mccortex_tpu.graph import build as gb
    rng = np.random.default_rng(7)
    B, L, k = 256, 128, 21
    bases = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    bases[rng.random((B, L)) < 0.02] = 4          # invalid bases
    ka, ca, ea, na = gb.count_batch(jnp.asarray(bases), k, 2, 1)
    kb, cb, eb, nb = gb.count_batch_fused(jnp.asarray(bases), k, 2, 1,
                                          interpret=True)
    assert int(na) == int(nb)
    n = int(na)
    np.testing.assert_array_equal(np.asarray(ka)[:n], np.asarray(kb)[:n])
    np.testing.assert_array_equal(np.asarray(ca)[:n], np.asarray(cb)[:n])
    np.testing.assert_array_equal(np.asarray(ea)[:n], np.asarray(eb)[:n])


def test_count_batch_fused_k63_two_words():
    import jax.numpy as jnp
    from mccortex_tpu.graph import build as gb
    rng = np.random.default_rng(8)
    B, L, k = 64, 160, 63
    bases = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    ka, ca, ea, na = gb.count_batch(jnp.asarray(bases), k, 1, 0)
    kb, cb, eb, nb = gb.count_batch_fused(jnp.asarray(bases), k, 1, 0,
                                          interpret=True)
    assert int(na) == int(nb)
    n = int(na)
    np.testing.assert_array_equal(np.asarray(ka)[:n], np.asarray(kb)[:n])
    np.testing.assert_array_equal(np.asarray(ca)[:n], np.asarray(cb)[:n])
    np.testing.assert_array_equal(np.asarray(ea)[:n], np.asarray(eb)[:n])


def test_merge_sorted_fused_matches_merge2():
    import jax.numpy as jnp
    from mccortex_tpu.graph import build as gb
    from mccortex_tpu.ops import sorted as sops
    rng = np.random.default_rng(21)

    def mk(n_live, cap, C, seed):
        r = np.random.default_rng(seed)
        keys = np.sort(np.unique(
            r.integers(0, 1 << 40, n_live).astype(np.uint64)))
        n_live = keys.shape[0]
        out_k = np.full((cap, 1), np.uint64(0xFFFFFFFFFFFFFFFF))
        out_k[:n_live, 0] = keys
        covg = np.zeros((cap, C), np.uint32)
        covg[:n_live] = r.integers(1, 100, (n_live, C))
        edges = np.zeros((cap, C), np.uint8)
        edges[:n_live] = r.integers(0, 256, (n_live, C))
        return (jnp.asarray(out_k), jnp.asarray(covg),
                jnp.asarray(edges))

    for C in (1, 2):
        ak, ac, ae = mk(700, 1024, C, 100 + C)
        bk, bc, be = mk(600, 1024, C, 200 + C)
        mk1, mc1, me1 = gb._merge2(ak, ac, ae, bk, bc, be)
        mk2, mc2, me2, n2 = gb.merge_sorted_fused(
            ak, ac, ae, bk, bc, be, interpret=True)
        k1 = np.asarray(mk1); k2 = np.asarray(mk2)
        live1 = ~(k1 == np.uint64(0xFFFFFFFFFFFFFFFF)).all(axis=1)
        live2 = ~(k2 == np.uint64(0xFFFFFFFFFFFFFFFF)).all(axis=1)
        assert live1.sum() == live2.sum() == int(n2)
        np.testing.assert_array_equal(k1[live1], k2[live2])
        np.testing.assert_array_equal(np.asarray(mc1)[live1],
                                      np.asarray(mc2)[live2])
        np.testing.assert_array_equal(np.asarray(me1)[live1],
                                      np.asarray(me2)[live2])
