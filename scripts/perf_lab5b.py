"""Round-4 follow-up probes: is_stable=False sort cost, odd-even repair
pass cost, bitonic merge_planes cost at lookup shapes, and the EPR=32
planar lookup confirm.  TPU-only; host-fetch timed."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def timed_chain(fn, x0, iters=8):
    s = fn(x0)
    np.asarray(s)
    s = fn(s)
    np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    np.asarray(s)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401

    rng = np.random.default_rng(0)
    M = 32768 * 226
    hi = jnp.asarray(rng.integers(0, 1 << 32, M, dtype=np.uint64)
                     .astype(np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, M, dtype=np.uint64)
                     .astype(np.uint32))
    e32 = jnp.asarray(rng.integers(0, 256, M, dtype=np.uint32))

    def probe(name, mk, iters=8):
        def step(s):
            outs = mk(s)
            return outs[0][::1 << 20].astype(jnp.uint64).sum() + s
        f = jax.jit(step)
        dt = timed_chain(f, jnp.uint64(0), iters)
        print(f"{name:34s} {dt*1e3:7.2f} ms  "
              f"({M/dt/1e6:6.1f} M rec/s)", file=_sys.stderr)
        return dt

    probe("unstable 3pl nk=2", lambda s: jax.lax.sort(
        (hi + s.astype(jnp.uint32), lo, e32), num_keys=2,
        is_stable=False))
    probe("unstable u32key+2pl", lambda s: jax.lax.sort(
        (hi + s.astype(jnp.uint32), lo, e32), num_keys=1,
        is_stable=False))

    # odd-even repair pass cost: T masked passes over 3 planes
    def repair(planes, T):
        h, l, e = planes
        Mn = h.shape[0]
        par = (jnp.arange(Mn, dtype=jnp.uint32) & 1).astype(jnp.bool_)
        for p in range(T):
            off = bool(p & 1)
            hn = jnp.roll(h, -1)
            ln = jnp.roll(l, -1)
            en = jnp.roll(e, -1)
            is_left = (par != off)
            is_left = is_left.at[-1].set(False)
            swap = is_left & (h == hn) & (l > ln)
            swap_r = jnp.roll(swap, 1)
            l = jnp.where(swap, ln, jnp.where(swap_r, jnp.roll(l, 1), l))
            e = jnp.where(swap, en, jnp.where(swap_r, jnp.roll(e, 1), e))
        return h, l, e

    for T in (8, 32, 64):
        probe(f"repair T={T}", lambda s, T=T: repair(
            (hi + s.astype(jnp.uint32), lo, e32), T), iters=4)

    # violations check cost (hi equal & lo descending anywhere)
    def viol(s):
        h = hi + s.astype(jnp.uint32)
        v = (h[:-1] == h[1:]) & (lo[:-1] > lo[1:])
        return (v.sum().astype(jnp.uint64)[None] + s,)
    probe("violations check", viol)

    # full MSD pipeline estimate: sort nk=1 + repair 32 + check
    def msd(s):
        h, l, e = jax.lax.sort(
            (hi + s.astype(jnp.uint32), lo, e32), num_keys=1,
            is_stable=False)
        h, l, e = repair((h, l, e), 32)
        return (h,)
    probe("msd: u32sort+repair32", msd)

    # merge_planes at lookup shapes: 4M store + 4M queries
    from mccortex_tpu.ops.pallas import bitonic as bt
    Q = 1 << 22
    sh = jnp.asarray(rng.integers(0, 1 << 32, Q, dtype=np.uint64)
                     .astype(np.uint32))
    sl = jnp.asarray(rng.integers(0, 1 << 32, Q, dtype=np.uint64)
                     .astype(np.uint32))
    sp = jnp.asarray(np.arange(Q, dtype=np.uint32))

    @jax.jit
    def mp(s):
        a = jax.lax.sort((sh + s.astype(jnp.uint32), sl, sp), num_keys=2)
        b = jax.lax.sort((sh - s.astype(jnp.uint32), sl, sp), num_keys=2)
        m = bt.merge_planes(a, b, num_keys=2)
        return m[0][::1 << 20].astype(jnp.uint64).sum() + s

    dt = timed_chain(mp, jnp.uint64(0), 4)
    print(f"2x qsort(4M,nk=2) + merge_planes(8M)   {dt*1e3:7.2f} ms",
          file=_sys.stderr)

    # final-unsort sort: 8M u32key + 1 payload
    M8 = 2 * Q
    fh = jnp.asarray(rng.integers(0, 1 << 32, M8, dtype=np.uint64)
                     .astype(np.uint32))
    fv = jnp.asarray(rng.integers(0, 1 << 32, M8, dtype=np.uint64)
                     .astype(np.uint32))

    def fin(s):
        return jax.lax.sort((fh + s.astype(jnp.uint32), fv), num_keys=1,
                            is_stable=False)
    def stepf(s):
        outs = fin(s)
        return outs[0][::1 << 20].astype(jnp.uint64).sum() + s
    dt = timed_chain(jax.jit(stepf), jnp.uint64(0))
    print(f"unsort sort 8M u32key+1pl              {dt*1e3:7.2f} ms",
          file=_sys.stderr)

    print("lab5b done", file=_sys.stderr)


if __name__ == "__main__":
    main()
