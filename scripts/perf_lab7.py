"""Perf lab 7 (round 5, VERDICT item 9): where does the epoch go?

Chained (RPC-free) timings of the fused front-end alone, the plane
sort alone, and the whole epoch, at several front-end tile sizes.
The round-4 breakdown fetch-timed each stage, paying the ~20 ms axon
round trip per stage — this lab chains iterations through a data
dependency instead, so per-stage numbers are honest device times.

Run on TPU: python scripts/perf_lab7.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import _tpu_wait
    _tpu_wait.arm_watchdog({"phase": "perf_lab7"})
    import jax
    _tpu_wait.wait_backend()
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401

    k = 31
    B, L = 32768, 256
    Lv = L - k + 1
    M = B * Lv
    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    iters = 10
    out = {"B": B, "L": L, "records": M}

    def chain(fn, x0):
        x = fn(bases, x0)
        int(x)
        x = fn(bases, x)
        int(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(bases, x)
        int(x)
        return (time.perf_counter() - t0) / iters

    # front-end alone at several tile sizes (fresh kernel per tile)
    from mccortex_tpu.ops.pallas import frontend as fe
    for tile in (256, 512, 1024, 2048):
        fe.TILE_B = tile
        try:
            @jax.jit
            def f_front(b, salt):
                shifted = jnp.roll(b, (salt % 7).astype(jnp.int32), 0)
                planes = fe.records_fused(shifted, k, with_valid=False)
                return (planes[0][0, 0].astype(jnp.int64)
                        + planes[2][0, 0].astype(jnp.int64))

            dt = chain(f_front, jnp.int64(0))
            out[f"front_ms_tile{tile}"] = round(dt * 1e3, 2)
            print(f"front tile={tile}: {dt*1e3:.2f} ms "
                  f"({M/dt/1e6:.0f}M rec/s)", file=_sys.stderr)
        except Exception as e:
            out[f"front_tile{tile}_error"] = str(e)[:160]
            print(f"front tile={tile} failed: {e}", file=_sys.stderr)
        finally:
            jax.clear_caches()
    fe.TILE_B = 256

    # sort alone: pre-made random planes of the epoch's exact shape
    ph = jnp.asarray(rng.integers(0, 1 << 31, M, np.int64),
                     jnp.uint32)
    plo = jnp.asarray(rng.integers(0, 1 << 31, M, np.int64),
                      jnp.uint32)
    pe_ = jnp.asarray(rng.integers(0, 256, M, np.int64), jnp.uint32)

    @jax.jit
    def f_sort(b, salt):
        h = ph ^ salt.astype(jnp.uint32)
        sh, sl, se = jax.lax.sort((h, plo, pe_), num_keys=2,
                                  is_stable=False)
        return sh[0].astype(jnp.int64)

    dt = chain(f_sort, jnp.int64(0))
    out["sort_ms"] = round(dt * 1e3, 2)
    print(f"sort(3 planes, 2 keys): {dt*1e3:.2f} ms", file=_sys.stderr)

    # sort volume model: XLA bitonic-ish, log2(M)*(log2(M)+1)/2 passes
    lg = int(np.ceil(np.log2(M)))
    passes = lg * (lg + 1) // 2
    vol_gb = passes * M * 12 / 1e9
    out["sort_model_passes"] = passes
    out["sort_model_traffic_gb"] = round(vol_gb, 1)

    # whole epoch
    from mccortex_tpu.graph.build import count_batch_best

    @jax.jit
    def f_epoch(b, salt):
        shifted = jnp.roll(b, (salt % 7).astype(jnp.int32), 0)
        _k, _c, _e, n = count_batch_best(shifted, k, 1, 0)
        return n

    dt = chain(f_epoch, jnp.int64(0))
    out["epoch_ms"] = round(dt * 1e3, 2)
    out["epoch_obs_per_s"] = round(M / dt)
    print(f"epoch: {dt*1e3:.2f} ms ({M/dt/1e6:.0f}M obs/s)",
          file=_sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
