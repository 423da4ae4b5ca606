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
