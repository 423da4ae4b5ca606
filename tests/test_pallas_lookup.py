"""Pallas DMA lookup kernel vs the sorted-store ground truth
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.ops.pallas import lookup as PL


@pytest.mark.parametrize("W", [1, 2])
def test_lookup_fused_matches_ground_truth(W):
    rng = np.random.default_rng(40 + W)
    n = 5000
    # valid canonical keys: word 0 below 2**62
    keys = rng.integers(0, 1 << 62, size=(n, W), dtype=np.uint64)
    keys = np.unique(keys, axis=0)
    n = len(keys)
    table, b_bits = PL.build_table128(keys)
    assert table.shape[1] == 128

    # queries: half present, half absent, plus sentinel padding
    nq = 3000
    present = keys[rng.integers(0, n, nq // 2)]
    absent = rng.integers(0, 1 << 62, size=(nq - nq // 2, W),
                          dtype=np.uint64)
    q = np.concatenate([present, absent])
    q[-3:] = np.uint64(0xFFFFFFFFFFFFFFFF)      # sentinels
    idx, found = PL.lookup_fused(jnp.asarray(table), jnp.asarray(q),
                                 b_bits, W, interpret=True)
    idx, found = np.asarray(idx), np.asarray(found)

    # ground truth by dict
    kd = {tuple(k): i for i, k in enumerate(keys)}
    for i in range(nq):
        t = tuple(q[i])
        if all(x == 0xFFFFFFFFFFFFFFFF for x in t):
            assert not found[i]
        elif t in kd:
            assert found[i] and idx[i] == kd[t], (i, idx[i], kd[t])
        else:
            assert not found[i], (i, t)


def test_build_table128_overflow_retry():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1 << 62, size=(4000, 1), dtype=np.uint64)
    keys = np.unique(keys, axis=0)
    # force tiny b_bits: must grow until no bucket overflows
    table, b_bits = PL.build_table128(keys, b_bits=1)
    S = PL.slots_for(1)
    B = table.shape[0]
    assert B == 1 << b_bits
    occ = (table[:, :S] != np.uint32(0xFFFFFFFF)).sum(axis=1)
    assert occ.max() <= S
    assert occ.sum() == len(keys)
