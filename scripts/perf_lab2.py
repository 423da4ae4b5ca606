"""Perf lab 2: hierarchical row-gather lookup prototypes.

perf_lab.py showed the TPU cost model: dependent scalar gathers cost
~16ms per 1M (any array size), sorts are cheap (226M/s), VPU compare
passes are ~free.  Hypothesis: a 3-level search where the two lower
levels are ROW gathers (contiguous 128-lane reads) beats everything:

  R1  raw row-gather cost, (32K, 256) u32 rows
  H   3-level hierarchical lookup (512-way top compare + 2 row-gathers)
  H2  2-level (4096-way top compare + 1 row-gather of a 64-key tile)
  Gs  G-variant: merge-rank with .at[].set scatter-back

Run: JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache python scripts/perf_lab2.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np


def timeit(fn, q, iters=10):
    s = fn(q, 0)
    s.block_until_ready()
    s = fn(q, s)
    s.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(q, s)
    s.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 << 20)
    ap.add_argument("--q", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401

    N, Q = args.n, args.q
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1 << 62, size=N, dtype=np.uint64)
    raw.sort()
    hi = (raw >> 32).astype(np.uint32)
    lo = raw.astype(np.uint32)
    qsel = rng.integers(0, N, size=Q)
    qhi = jnp.asarray(hi[qsel])
    qlo = jnp.asarray(lo[qsel])

    # interleaved store tiles: row t = keys[64t:64t+64] as [hi,lo]*64
    TK = 64                      # keys per tile
    inter = np.empty(2 * N, np.uint32)
    inter[0::2] = hi
    inter[1::2] = lo
    store2d = jnp.asarray(inter.reshape(N // TK, 2 * TK))       # (_, 128)

    # router: every TK-th key; rows of RK router entries
    RK = 128                     # router entries per row
    r_hi, r_lo = hi[::TK], lo[::TK]                  # N/TK entries
    nrouter = len(r_hi)
    rinter = np.empty(2 * nrouter, np.uint32)
    rinter[0::2] = r_hi
    rinter[1::2] = r_lo
    router2d = jnp.asarray(rinter.reshape(nrouter // RK, 2 * RK))  # (_, 256)

    # top: every RK-th router entry = every TK*RK-th key
    t_hi = jnp.asarray(r_hi[::RK].copy())            # (ntop,)
    t_lo = jnp.asarray(r_lo[::RK].copy())
    ntop = t_hi.shape[0]

    dev = jax.devices()[0].platform
    print(f"device={dev} N={N} Q={Q} ntop={ntop} nrouter={nrouter}",
          flush=True)
    results = {}

    def report(name, dt):
        results[name] = Q / dt
        print(f"{name:30s} {dt*1e3:9.2f} ms  {Q/dt/1e6:9.2f} M/s",
              flush=True)

    only = set(args.only.split(",")) if args.only else None

    def want(tag):
        return only is None or tag in only

    def count_le(wh, wl, ah, al):
        """#entries (wh,wl) <= (ah,al); w* (..., E), a* (...)."""
        le = (wh < ah[..., None]) | ((wh == ah[..., None]) &
                                     (wl <= al[..., None]))
        return le.sum(axis=-1).astype(jnp.int32)

    # ---- R1: raw row-gather --------------------------------------------
    if want("R1"):
        ridx = jnp.asarray(rng.integers(0, N // TK, size=Q).astype(np.int32))

        @jax.jit
        def r1(ix, salt):
            ix2 = jnp.roll(ix, (salt % 3).astype(jnp.int32))
            return store2d[ix2].sum()
        report("R1 row-gather (x,128)", timeit(r1, ridx, args.iters))

        rix2 = jnp.asarray(
            rng.integers(0, nrouter // RK, size=Q).astype(np.int32))

        @jax.jit
        def r2(ix, salt):
            ix2 = jnp.roll(ix, (salt % 3).astype(jnp.int32))
            return router2d[ix2].sum()
        report("R1 row-gather (x,256)", timeit(r2, rix2, args.iters))

    # ---- H: 3-level hierarchical ---------------------------------------
    if want("H"):
        @jax.jit
        def strath(qh, salt):
            qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
            # level 1: count of top entries <= q  (ntop-way compare)
            c1 = count_le(t_hi[None, :], t_lo[None, :], qh2, qlo)
            r1i = jnp.clip(c1 - 1, 0, router2d.shape[0] - 1)
            # level 2: row-gather router row, count within
            rrow = router2d[r1i]                      # (Q, 2*RK)
            c2 = count_le(rrow[:, 0::2], rrow[:, 1::2], qh2, qlo)
            t = jnp.clip(r1i * RK + c2 - 1, 0, store2d.shape[0] - 1)
            # level 3: row-gather store tile, exact position
            srow = store2d[t]                         # (Q, 2*TK)
            eq = (srow[:, 0::2] == qh2[:, None]) & \
                 (srow[:, 1::2] == qlo[:, None])
            found = eq.any(axis=1)
            pos = jnp.argmax(eq, axis=1).astype(jnp.int32)
            idx = t * TK + pos
            return (idx + found.astype(jnp.int32)).sum()
        report("H 3-level (2 row-gathers)", timeit(strath, qhi, args.iters))

    # ---- H2: 2-level, bigger top compare -------------------------------
    if want("H2"):
        t2_hi = jnp.asarray(r_hi.copy())   # all router entries: N/64 = 64K
        t2_lo = jnp.asarray(r_lo.copy())

        @jax.jit
        def strath2(qh, salt):
            qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
            c1 = count_le(t2_hi[None, :], t2_lo[None, :], qh2, qlo)
            t = jnp.clip(c1 - 1, 0, store2d.shape[0] - 1)
            srow = store2d[t]
            eq = (srow[:, 0::2] == qh2[:, None]) & \
                 (srow[:, 1::2] == qlo[:, None])
            found = eq.any(axis=1)
            pos = jnp.argmax(eq, axis=1).astype(jnp.int32)
            idx = t * TK + pos
            return (idx + found.astype(jnp.int32)).sum()
        if N // TK <= (1 << 17):
            report("H2 2-level (1 row-gather)",
                   timeit(strath2, qhi, args.iters))

    # ---- Gs: merge-rank with set-scatter -------------------------------
    if want("G"):
        hi_j = jnp.asarray(hi)
        lo_j = jnp.asarray(lo)
        qid = jnp.arange(Q, dtype=jnp.int32)
        store_tag = jnp.full((N,), Q, jnp.int32)

        @jax.jit
        def gs(qh, salt):
            qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
            ch = jnp.concatenate([hi_j, qh2])
            cl = jnp.concatenate([lo_j, qlo])
            ct = jnp.concatenate([store_tag, qid])
            sh, sl, st = jax.lax.sort((ch, cl, ct), num_keys=2)
            is_store = st >= Q
            srank = jnp.cumsum(is_store.astype(jnp.int32))
            out = jnp.zeros((Q,), jnp.int32).at[st].set(
                jnp.where(is_store, 0, srank), mode="drop")
            return out.sum()
        report("Gs merge-rank set-scatter", timeit(gs, qhi, args.iters))

    print("---- summary (M lookups/s) ----")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:34s} {v/1e6:9.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())


def variants():
    """Tuning sweep over (TK, RK, ntop) for the H design."""
    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401
    N, Q = 4 << 20, 1 << 20
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1 << 62, size=N, dtype=np.uint64)
    raw.sort()
    hi = (raw >> 32).astype(np.uint32)
    lo = raw.astype(np.uint32)
    qsel = rng.integers(0, N, size=Q)
    qhi = jnp.asarray(hi[qsel])
    qlo = jnp.asarray(lo[qsel])

    def count_le(wh, wl, ah, al):
        le = (wh < ah[..., None]) | ((wh == ah[..., None]) &
                                     (wl <= al[..., None]))
        return le.sum(axis=-1).astype(jnp.int32)

    for TK, RK in ((128, 64), (128, 32), (64, 64), (256, 64),
                   (256, 32), (128, 16), (512, 32)):
        inter = np.empty(2 * N, np.uint32)
        inter[0::2] = hi
        inter[1::2] = lo
        store2d = jnp.asarray(inter.reshape(N // TK, 2 * TK))
        r_hi, r_lo = hi[::TK], lo[::TK]
        nrouter = len(r_hi)
        rinter = np.empty(2 * nrouter, np.uint32)
        rinter[0::2] = r_hi
        rinter[1::2] = r_lo
        router2d = jnp.asarray(rinter.reshape(nrouter // RK, 2 * RK))
        t_hi = jnp.asarray(r_hi[::RK].copy())
        t_lo = jnp.asarray(r_lo[::RK].copy())

        @jax.jit
        def strath(qh, salt, store2d=store2d, router2d=router2d,
                   t_hi=t_hi, t_lo=t_lo, TK=TK, RK=RK):
            qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
            c1 = count_le(t_hi[None, :], t_lo[None, :], qh2, qlo)
            r1i = jnp.clip(c1 - 1, 0, router2d.shape[0] - 1)
            rrow = router2d[r1i]
            c2 = count_le(rrow[:, 0::2], rrow[:, 1::2], qh2, qlo)
            t = jnp.clip(r1i * RK + c2 - 1, 0, store2d.shape[0] - 1)
            srow = store2d[t]
            eq = (srow[:, 0::2] == qh2[:, None]) & \
                 (srow[:, 1::2] == qlo[:, None])
            found = eq.any(axis=1)
            pos = jnp.argmax(eq, axis=1).astype(jnp.int32)
            idx = t * TK + pos
            return (idx + found.astype(jnp.int32)).sum()

        dt = timeit(strath, qhi, 10)
        ntop = int(t_hi.shape[0])
        print(f"H TK={TK:4d} RK={RK:4d} ntop={ntop:5d} "
              f"{dt*1e3:8.2f} ms {Q/dt/1e6:8.2f} M/s", flush=True)


if __name__ == "__main__" and "--variants" in sys.argv:
    variants()
    sys.exit(0)
