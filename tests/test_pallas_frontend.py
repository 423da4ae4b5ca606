"""Fused front-end kernel vs the XLA reads_to_records path."""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.ops.pallas import frontend as fe
from mccortex_tpu.graph import build as gb
from mccortex_tpu.ops import sorted as sops


@pytest.mark.parametrize("k", [11, 21, 31])
def test_matches_reads_to_records(k):
    rng = np.random.default_rng(1300 + k)
    B, L = 40, 100
    bases = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    bases[rng.random((B, L)) < 0.03] = 4
    bases[5, 60:] = 4                       # padded read
    keys, ebyte, valid = gb.reads_to_records(jnp.asarray(bases), k)
    khi, klo, eb, vd = fe.records_fused(jnp.asarray(bases), k,
                                        interpret=True)
    keys = np.asarray(keys)[..., 0]
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(vd).astype(bool), v)
    got_hi = np.asarray(khi).astype(np.uint32)[v]
    got_lo = np.asarray(klo).astype(np.uint32)[v]
    np.testing.assert_array_equal(got_hi,
                                  (keys[v] >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(got_lo, keys[v].astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(eb).astype(np.uint8)[v], np.asarray(ebyte)[v])
    # invalid windows are sentinel
    assert (np.asarray(khi)[~v] == -1).all()
    assert (np.asarray(eb)[~v] == 0).all()


@pytest.mark.parametrize("k", [33, 47, 63])
def test_matches_reads_to_records_two_words(k):
    """W=2 limb planes (VERDICT r2 item 8: k>31 fused front-end)."""
    rng = np.random.default_rng(1400 + k)
    B, L = 24, 150
    bases = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    bases[rng.random((B, L)) < 0.02] = 4
    bases[3, 100:] = 4
    keys, ebyte, valid = gb.reads_to_records(jnp.asarray(bases), k)
    p3, p2, p1, p0, eb, vd = fe.records_fused(jnp.asarray(bases), k,
                                              interpret=True)
    keys = np.asarray(keys)                 # (B, L, 2), word0 MSB
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(vd).astype(bool), v)
    w0, w1 = keys[..., 0], keys[..., 1]
    for plane, want in ((p3, w0 >> np.uint64(32)), (p2, w0),
                        (p1, w1 >> np.uint64(32)), (p0, w1)):
        np.testing.assert_array_equal(
            np.asarray(plane).astype(np.uint32)[v],
            want[v].astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(eb).astype(np.uint8)[v], np.asarray(ebyte)[v])
    assert (np.asarray(p3)[~v] == -1).all()
    assert (np.asarray(p0)[~v] == -1).all()


def test_count_batch_fused_uses_frontend_at_k63():
    """The fused epoch path must produce XLA-identical output at k=63
    through the W=2 front-end + sort + segreduce."""
    rng = np.random.default_rng(77)
    k = 63
    bases = jnp.asarray(rng.integers(0, 4, size=(12, 128), dtype=np.uint8))
    ka, ca, ea, na = gb.count_batch(bases, k, 1, 0)
    kb, cb, eb_, nb = gb.count_batch_fused(bases, k, 1, 0,
                                           interpret=True)
    assert int(na) == int(nb)
    n = int(na)
    np.testing.assert_array_equal(np.asarray(ka)[:n], np.asarray(kb)[:n])
    np.testing.assert_array_equal(np.asarray(ca)[:n], np.asarray(cb)[:n])
    np.testing.assert_array_equal(np.asarray(ea)[:n], np.asarray(eb_)[:n])
