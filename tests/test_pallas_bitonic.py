"""Exactness tests for ops/pallas/bitonic (interpret mode on CPU),
mirroring the tests/test_pallas_segreduce.py pattern: every output must
equal jax.lax.sort on the same planes (up to ties, which are resolved
by comparing the full record tuple)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mccortex_tpu.ops.pallas import bitonic as B

R_TEST = 8                       # tiny blocks: 1024 elements
BLK_TEST = R_TEST * B.LANES


def _mk_planes(rng, M, np_, dup_frac=0.0, hi_bit=False):
    planes = []
    for p in range(np_):
        x = rng.integers(0, 1 << 32, size=M, dtype=np.uint64)
        if dup_frac:
            # heavy duplicates: sample keys from a tiny pool
            pool = rng.integers(0, 1 << 32, size=8, dtype=np.uint64)
            m = rng.random(M) < dup_frac
            x[m] = pool[rng.integers(0, 8, size=int(m.sum()))]
        if hi_bit:
            x |= 1 << 31          # exercise the unsigned order map
        planes.append(jnp.asarray(x.astype(np.uint32)))
    return planes


def _ref_sorted(planes, nk):
    outs = jax.lax.sort(tuple(planes), num_keys=nk)
    return [np.asarray(o) for o in outs]


def _records(planes_np):
    return list(zip(*[p.tolist() for p in planes_np]))


def _check_equal_up_to_ties(got, want, nk):
    """Key planes must match exactly; full record multisets must match
    (bitonic is unstable, so value planes may permute within ties)."""
    for p in range(nk):
        np.testing.assert_array_equal(got[p], want[p])
    assert sorted(_records(got)) == sorted(_records(want))


@pytest.mark.parametrize("nb,np_,nk", [(1, 1, 1), (1, 3, 2), (2, 3, 2),
                                       (4, 2, 1), (8, 3, 2), (4, 5, 4)])
def test_sort_matches_lax_sort(nb, np_, nk):
    rng = np.random.default_rng(100 * nb + np_)
    M = nb * BLK_TEST
    planes = _mk_planes(rng, M, np_, hi_bit=(nb % 2 == 0))
    got = [np.asarray(x) for x in B.sort_planes(
        tuple(planes), num_keys=nk, r_blk=R_TEST, interpret=True)]
    want = _ref_sorted(planes, nk)
    _check_equal_up_to_ties(got, want, nk)


def test_sort_with_sentinel_padding_and_dups():
    rng = np.random.default_rng(7)
    M = 4 * BLK_TEST
    planes = _mk_planes(rng, M, 3, dup_frac=0.6)
    # sentinel-pad a tail, as count_batch does
    sent = np.uint32(0xFFFFFFFF)
    for p in range(2):
        arr = np.asarray(planes[p]).copy()
        arr[-300:] = sent
        planes[p] = jnp.asarray(arr)
    got = [np.asarray(x) for x in B.sort_planes(
        tuple(planes), num_keys=2, r_blk=R_TEST, interpret=True)]
    want = _ref_sorted(planes, 2)
    _check_equal_up_to_ties(got, want, 2)
    # sentinels sorted to the end
    assert (got[0][-300:] == sent).all()


@pytest.mark.parametrize("nb_half,np_,nk", [(1, 3, 2), (2, 3, 2),
                                            (4, 2, 1)])
def test_merge_two_sorted_runs(nb_half, np_, nk):
    rng = np.random.default_rng(50 + nb_half)
    Mh = nb_half * BLK_TEST
    a = _mk_planes(rng, Mh, np_, dup_frac=0.3)
    b = _mk_planes(rng, Mh, np_)
    a = jax.lax.sort(tuple(a), num_keys=nk)
    b = jax.lax.sort(tuple(b), num_keys=nk)
    got = [np.asarray(x) for x in B.merge_planes(
        a, b, num_keys=nk, r_blk=R_TEST, interpret=True)]
    cat = [jnp.concatenate([x, y]) for x, y in zip(a, b)]
    want = _ref_sorted(cat, nk)
    _check_equal_up_to_ties(got, want, nk)


def test_sort_all_equal_keys():
    # degenerate: one key value everywhere (max-duplicate regime)
    M = 2 * BLK_TEST
    k0 = jnp.full((M,), 0xABCD1234, jnp.uint32)
    v = jnp.asarray(np.random.default_rng(3).integers(
        0, 1 << 32, M, np.uint64).astype(np.uint32))
    got = B.sort_planes((k0, v), num_keys=1, r_blk=R_TEST,
                        interpret=True)
    assert (np.asarray(got[0]) == 0xABCD1234).all()
    assert sorted(np.asarray(got[1]).tolist()) == \
        sorted(np.asarray(v).tolist())


@pytest.fixture
def small_blocks(monkeypatch):
    monkeypatch.setattr(B, "R_BLK", R_TEST)
    monkeypatch.setattr(B, "BLK", BLK_TEST)
    # fresh traces for the patched geometry
    jax.clear_caches()
    yield
    jax.clear_caches()


def test_count_batch_fused_bitonic_matches_lax(small_blocks):
    from mccortex_tpu.graph import build as gb
    rng = np.random.default_rng(11)
    k = 15
    bases = rng.integers(0, 4, size=(16, 64), dtype=np.uint8)
    ka, ca, ea, na = gb.count_batch_fused(jnp.asarray(bases), k, 2, 1,
                                          interpret=True,
                                          sort_impl="lax")
    kb, cb, eb, nb = gb.count_batch_fused(jnp.asarray(bases), k, 2, 1,
                                          interpret=True,
                                          sort_impl="bitonic")
    assert int(na) == int(nb)
    n = int(na)
    np.testing.assert_array_equal(np.asarray(ka)[:n], np.asarray(kb)[:n])
    np.testing.assert_array_equal(np.asarray(ca)[:n], np.asarray(cb)[:n])
    np.testing.assert_array_equal(np.asarray(ea)[:n], np.asarray(eb)[:n])


def test_merge_sorted_fused_bitonic_matches_lax(small_blocks):
    from mccortex_tpu.graph import build as gb
    from mccortex_tpu.ops import sorted as sops
    rng = np.random.default_rng(12)
    W, C, n, m = 1, 2, 700, 1100

    def mk(nr, cap):
        keys = np.full((cap, W), sops.SENTINEL64, np.uint64)
        keys[:nr, 0] = np.sort(rng.choice(1 << 40, nr, replace=False))
        covg = np.zeros((cap, C), np.uint32)
        covg[:nr] = rng.integers(1, 5, (nr, C))
        edges = np.zeros((cap, C), np.uint8)
        edges[:nr] = rng.integers(0, 256, (nr, C))
        return (jnp.asarray(keys), jnp.asarray(covg), jnp.asarray(edges))

    a = mk(700, 1024)
    b = mk(1100, 2048)
    la = gb.merge_sorted_fused(*a, *b, interpret=True, sort_impl="lax")
    bb = gb.merge_sorted_fused(*a, *b, interpret=True,
                               sort_impl="bitonic")
    assert int(la[3]) == int(bb[3])
    nn = int(la[3])
    for x, y in zip(la[:3], bb[:3]):
        np.testing.assert_array_equal(np.asarray(x)[:nn],
                                      np.asarray(y)[:nn])


def test_count_batch_fused_lax64_matches_lax():
    # "lax64": (hi, lo) u32 key pairs fused into u64 sort keys (half the
    # comparators); unsigned order must be identical to the plane sort.
    from mccortex_tpu.graph import build as gb
    rng = np.random.default_rng(13)
    for k in (15, 33):  # W=1 and W=2
        bases = rng.integers(0, 4, size=(16, 64), dtype=np.uint8)
        ka, ca, ea, na = gb.count_batch_fused(
            jnp.asarray(bases), k, 2, 1, interpret=True, sort_impl="lax")
        kb, cb, eb, nb = gb.count_batch_fused(
            jnp.asarray(bases), k, 2, 1, interpret=True,
            sort_impl="lax64")
        assert int(na) == int(nb)
        n = int(na)
        np.testing.assert_array_equal(np.asarray(ka)[:n],
                                      np.asarray(kb)[:n])
        np.testing.assert_array_equal(np.asarray(ca)[:n],
                                      np.asarray(cb)[:n])
        np.testing.assert_array_equal(np.asarray(ea)[:n],
                                      np.asarray(eb)[:n])


def test_merge_sorted_fused_lax64_matches_lax():
    from mccortex_tpu.graph import build as gb
    from mccortex_tpu.ops import sorted as sops
    rng = np.random.default_rng(14)
    W, C = 1, 2

    def mk(nr, cap):
        keys = np.full((cap, W), sops.SENTINEL64, np.uint64)
        keys[:nr, 0] = np.sort(rng.choice(1 << 40, nr, replace=False))
        covg = np.zeros((cap, C), np.uint32)
        covg[:nr] = rng.integers(1, 5, (nr, C))
        edges = np.zeros((cap, C), np.uint8)
        edges[:nr] = rng.integers(0, 256, (nr, C))
        return (jnp.asarray(keys), jnp.asarray(covg), jnp.asarray(edges))

    a = mk(700, 1024)
    b = mk(1100, 2048)
    la = gb.merge_sorted_fused(*a, *b, interpret=True, sort_impl="lax")
    lb = gb.merge_sorted_fused(*a, *b, interpret=True, sort_impl="lax64")
    assert int(la[3]) == int(lb[3])
    nn = int(la[3])
    for x, y in zip(la[:3], lb[:3]):
        np.testing.assert_array_equal(np.asarray(x)[:nn],
                                      np.asarray(y)[:nn])
