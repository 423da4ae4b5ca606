"""Round-4 lab: merge-path kernel cost dissection on the real chip.

Questions:
  1. single-level merge: mergepath vs bitonic merge_planes vs lax re-sort
     at LSM-merge shapes (np_=4, nk=2; 4M+4M and 16M+16M records).
  2. where does mp time go: splits-only (XLA prep) vs full call.
  3. join-lookup at the E.coli scale_test shape (4.6M store, 1M queries).

Run ON THE TPU (one process at a time):
  JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache python scripts/perf_lab6.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def timed(fn, args, iters=6):
    outs = fn(*args)
    np.asarray(outs[0][:8] if isinstance(outs, (tuple, list)) else outs)
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = fn(*args)
    np.asarray(outs[0][:8] if isinstance(outs, (tuple, list)) else outs)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401
    from mccortex_tpu.ops.pallas import mergepath as mpk
    from mccortex_tpu.ops.pallas import bitonic as bt

    rng = np.random.default_rng(0)
    small = bool(_os.environ.get("MCTX_LAB_SMALL"))

    def mk_sorted(M, np_, nk):
        keys = [np.sort(rng.integers(0, 1 << 31, M, dtype=np.uint64)
                        .astype(np.uint32))]
        keys += [rng.integers(0, 1 << 31, M, dtype=np.uint64)
                 .astype(np.uint32) for _ in range(np_ - 1)]
        order = np.argsort(keys[0], kind="stable")
        return tuple(jnp.asarray(x[order] if i < nk else x)
                     for i, x in enumerate(keys))

    np_, nk = 4, 2
    for Mexp in ((22,) if small else (22, 24)):
        M = 1 << Mexp
        pa = mk_sorted(M, np_, nk)
        pb = mk_sorted(M, np_, nk)

        @jax.jit
        def f_mp(a, b):
            return mpk.merge_path_planes(a, b, num_keys=nk)

        @jax.jit
        def f_bt(a, b):
            return bt.merge_planes(a, b, num_keys=nk)

        @jax.jit
        def f_lax(a, b):
            cat = tuple(jnp.concatenate([x, y]) for x, y in zip(a, b))
            return jax.lax.sort(cat, num_keys=nk, is_stable=False)

        @jax.jit
        def f_splits(a, b):
            sa = mpk._to_sortable(list(a), nk)
            sb = mpk._to_sortable(list(b), nk)
            blk = mpk._r_blk_for(np_) * mpk.LANES
            NB = 2 * M // blk
            return mpk._splits(sa[:nk], sb[:nk], nk, NB, blk, M, M)

        for name, f in (("mp", f_mp), ("bitonic", f_bt), ("lax", f_lax),
                        ("splits-only", f_splits)):
            try:
                dt = timed(f, (pa, pb))
                print(f"merge {M >> 20}M+{M >> 20}M {name:12s} "
                      f"{dt * 1e3:8.2f} ms ({2 * M / dt / 1e6:7.1f} M rec/s)",
                      file=_sys.stderr)
            except Exception as e:
                print(f"merge {name}: FAILED {str(e)[:160]}",
                      file=_sys.stderr)

    # join lookup at the scale_test shape
    from mccortex_tpu.ops import sorted as sops
    from mccortex_tpu.ops import hashidx
    N = (1 << 18) if small else 4_600_000
    Q = (1 << 16) if small else (1 << 20)
    raw = np.unique(rng.integers(0, 1 << 62, size=N, dtype=np.uint64))
    store = jnp.asarray(np.sort(raw)[:, None])
    nkeys = store.shape[0]
    qks = [store[jnp.asarray(rng.integers(0, nkeys, Q))] for _ in range(4)]

    @jax.jit
    def f_join(s, q):
        i, f = sops.lookup_join(s, q)
        return (i * f).astype(jnp.int64).sum()

    table, b_bits = hashidx.get_index_for(store)

    @jax.jit
    def f_planar(t, q):
        i, f = hashidx.lookup_planar(t, q, b_bits, 1)
        return (i * f).astype(jnp.int64).sum()

    for name, f, a0 in (("join", f_join, store), ("planar", f_planar,
                                                  table)):
        np.asarray(f(a0, qks[0]))
        t0 = time.perf_counter()
        outs = [f(a0, q) for q in qks]
        vals = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / len(qks)
        assert all(v > 0 for v in vals)
        print(f"lookup {name:8s} N={nkeys} Q={Q}  {dt * 1e3:7.2f} ms "
              f"({Q / dt / 1e6:6.1f} M lk/s)", file=_sys.stderr)

    # H2D transfer bandwidth over the tunnel: decides whether 2-bit
    # host-side read packing (4x smaller batches) is worth building
    buf = np.ascontiguousarray(
        rng.integers(0, 4, size=(8192 if small else 32768, 1504),
                     dtype=np.uint8))
    dev = jax.devices()[0]
    jax.device_put(buf, dev).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(4):
        jax.device_put(buf, dev).block_until_ready()
    dt = (time.perf_counter() - t0) / 4
    print(f"h2d: {buf.nbytes / dt / 1e6:.0f} MB/s "
          f"({buf.nbytes >> 20}MB in {dt * 1e3:.0f} ms)",
          file=_sys.stderr)

    print("lab6 done", file=_sys.stderr)


if __name__ == "__main__":
    main()
