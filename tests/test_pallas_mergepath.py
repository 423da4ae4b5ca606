"""merge_path_planes exactness vs a lexsort reference (interpret mode).

Key planes must match element-for-element; payload planes as multisets
(the merge is not stable, consumers aggregate per key)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.ops.pallas import mergepath as mp

LANES = 128
rng = np.random.default_rng(42)


def _mk(M, np_, nk, blk, dup):
    hi = 50 if dup else (1 << 31)
    keys = rng.integers(0, hi, size=(nk, M), dtype=np.uint64).astype(
        np.uint32)
    vals = rng.integers(0, 1 << 31, size=(np_ - nk, M),
                        dtype=np.uint64).astype(np.uint32)
    planes = list(keys) + list(vals)
    order = np.lexsort(tuple(keys[p] for p in range(nk - 1, -1, -1)))
    planes = [x[order] for x in planes]
    padn = (-M) % blk
    return [np.concatenate(
        [x, np.full(padn, 0xFFFFFFFF if i < nk else 0, np.uint32)])
        for i, x in enumerate(planes)]


def _ref_merge(pa, pb, nk):
    allp = [np.concatenate([a, b]) for a, b in zip(pa, pb)]
    order = np.lexsort(tuple(allp[p] for p in range(nk - 1, -1, -1)))
    return [x[order] for x in allp]


@pytest.mark.parametrize("Ma,Mb,np_,nk,dup", [
    (131072, 131072, 3, 2, False),
    (262144, 131072, 3, 2, False),      # asymmetric
    (131072, 131072, 3, 2, True),       # heavy duplicates
    (196608, 65536, 4, 2, False),       # merge-record shape (W=1, C=1)
    (300000, 70000, 3, 2, False),       # ragged (sentinel padding)
    (300000, 70000, 3, 2, True),
    (131072, 131072, 5, 4, False),      # W=2 keys
])
def test_merge_path_matches_reference(Ma, Mb, np_, nk, dup):
    blk = mp._r_blk_for(np_) * LANES
    pa = _mk(Ma, np_, nk, blk, dup)
    pb = _mk(Mb, np_, nk, blk, dup)
    out = mp.merge_path_planes(tuple(jnp.asarray(x) for x in pa),
                               tuple(jnp.asarray(x) for x in pb),
                               num_keys=nk, interpret=True)
    out = [np.asarray(o) for o in out]
    ref = _ref_merge(pa, pb, nk)
    for p in range(nk):
        np.testing.assert_array_equal(out[p], ref[p])
    ao = np.lexsort(tuple(np.stack(out)[::-1]))
    ar = np.lexsort(tuple(np.stack(ref)[::-1]))
    for p in range(np_):
        np.testing.assert_array_equal(out[p][ao], ref[p][ar])


@pytest.mark.parametrize("W,C", [(1, 1), (2, 2)])
def test_merge_sorted_fused_mp_matches_lax(W, C):
    from mccortex_tpu.graph import build as gb
    from mccortex_tpu.ops import sorted as sops

    def mk(n, seed):
        r = np.random.default_rng(seed)
        keys = np.unique(
            r.integers(0, 1 << 61, size=(n, W), dtype=np.uint64), axis=0)
        keys = keys[np.lexsort(tuple(keys[:, w]
                                     for w in range(W - 1, -1, -1)))]
        m = keys.shape[0]
        covg = r.integers(1, 100, size=(m, C), dtype=np.uint64).astype(
            np.uint32)
        edges = r.integers(0, 256, size=(m, C), dtype=np.uint64).astype(
            np.uint8)
        pad = 1 << int(np.ceil(np.log2(m)))
        ko = np.full((pad, W), np.uint64(2**64 - 1))
        ko[:m] = keys
        co = np.zeros((pad, C), np.uint32)
        co[:m] = covg
        eo = np.zeros((pad, C), np.uint8)
        eo[:m] = edges
        return jnp.asarray(ko), jnp.asarray(co), jnp.asarray(eo)

    ak, ac, ae = mk(9000, 1)
    bk, bc, be = mk(5000, 2)
    k1, c1, e1, n1 = gb.merge_sorted_fused(ak, ac, ae, bk, bc, be,
                                           sort_impl=None,
                                           interpret=True)
    k2, c2, e2, n2 = gb.merge_sorted_fused(ak, ac, ae, bk, bc, be,
                                           sort_impl="mp",
                                           interpret=True)
    n = int(n1)
    assert int(n2) == n
    np.testing.assert_array_equal(np.asarray(k1)[:n], np.asarray(k2)[:n])
    np.testing.assert_array_equal(np.asarray(c1)[:n], np.asarray(c2)[:n])
    np.testing.assert_array_equal(np.asarray(e1)[:n], np.asarray(e2)[:n])


def test_sort_planes_mp_matches_lax():
    import jax
    np_, nk = 3, 2
    blk = mp._r_blk_for(np_) * LANES
    M_live = 5 * blk + 12345
    M = 8 * blk
    planes = [rng.integers(0, 1 << 31, M_live, dtype=np.uint64).astype(
        np.uint32) for _ in range(np_)]
    planes = [np.concatenate(
        [x, np.full(M - M_live, 0xFFFFFFFF if p < nk else 0, np.uint32)])
        for p, x in enumerate(planes)]
    out = mp.sort_planes_mp(tuple(jnp.asarray(x) for x in planes),
                            num_keys=nk, interpret=True)
    ref = jax.lax.sort(tuple(jnp.asarray(x) for x in planes),
                       num_keys=nk)
    for p in range(nk):
        np.testing.assert_array_equal(np.asarray(out[p]),
                                      np.asarray(ref[p]))
    ao = np.lexsort(tuple(np.stack([np.asarray(o) for o in out])[::-1]))
    ar = np.lexsort(tuple(np.stack([np.asarray(r) for r in ref])[::-1]))
    for p in range(np_):
        np.testing.assert_array_equal(np.asarray(out[p])[ao],
                                      np.asarray(ref[p])[ar])


def test_count_batch_fused_mp_matches_lax():
    from mccortex_tpu.graph import build as gb
    r = np.random.default_rng(5)
    bases = jnp.asarray(r.integers(0, 4, size=(512, 150), dtype=np.uint8))
    k1, c1, e1, n1 = gb.count_batch_fused(bases, 31, 1, 0,
                                          sort_impl=None, interpret=True)
    k2, c2, e2, n2 = gb.count_batch_fused(bases, 31, 1, 0,
                                          sort_impl="mp", interpret=True)
    n = int(n1)
    assert int(n2) == n
    np.testing.assert_array_equal(np.asarray(k1)[:n], np.asarray(k2)[:n])
    np.testing.assert_array_equal(np.asarray(c1)[:n], np.asarray(c2)[:n])
    np.testing.assert_array_equal(np.asarray(e1)[:n], np.asarray(e2)[:n])
