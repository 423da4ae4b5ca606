"""Perf lab 4: HONEST lookup shootout.

perf_lab2/3 used a chained roll+sum timing harness; the roll-invariant
sum made every iteration value-identical and something in the axon
path appears to elide repeat work (0.02ms/iter "measurements" vs 43ms
sync).  Here every dispatch gets a DISTINCT pre-staged query buffer and
we block once at the end: throughput-honest, pipelining allowed.

Contenders at N=4M store, Q per dispatch:
  BS   current sops.searchsorted_mw batched binary search
  H3   3-level hierarchical (512-way compare + 2 row gathers)
  PL   planar hashed-bucket (1 row gather + VPU compare)

Run: JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache python scripts/perf_lab4.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np


def splitmix64_np(x):
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def bench(name, fn, qs, Q):
    outs = [fn(q) for q in qs[:2]]       # compile + warm
    for o in outs:
        np.asarray(o)                    # force host fetch (honest sync)
    t0 = time.perf_counter()
    outs = [fn(q) for q in qs]
    vals = [np.asarray(o) for o in outs]
    del vals
    dt = (time.perf_counter() - t0) / len(qs)
    print(f"{name:34s} {dt*1e3:9.2f} ms  {Q/dt/1e6:9.2f} M/s", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 << 20)
    ap.add_argument("--q", type=int, default=1 << 20)
    ap.add_argument("--nbuf", type=int, default=8)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401
    from mccortex_tpu.ops import sorted as sops

    N, Q = args.n, args.q
    rng = np.random.default_rng(0)
    raw = np.unique(rng.integers(0, 1 << 62, size=N, dtype=np.uint64))
    N = len(raw)
    only = set(args.only.split(",")) if args.only else None

    def want(t):
        return only is None or t in only

    # distinct pre-staged query buffers
    qs_np = [raw[rng.integers(0, N, size=Q)] for _ in range(args.nbuf)]
    qs = [jnp.asarray(q) for q in qs_np]
    for q in qs:
        q.block_until_ready()
    print(f"device={jax.devices()[0].platform} N={N} Q={Q} "
          f"nbuf={args.nbuf}", flush=True)

    # ---- BS: current binary search ------------------------------------
    if want("BS"):
        store = jnp.asarray(raw[:, None])   # (N, 1) multiword layout

        @jax.jit
        def bs(store, q):
            idx, found = sops.lookup(store, q[:, None])
            return (idx * found).sum()

        bench("BS searchsorted_mw (W=1)", lambda q: bs(store, q), qs, Q)

    # ---- H3: hierarchical ---------------------------------------------
    if want("H3"):
        hi = (raw >> np.uint64(32)).astype(np.uint32)
        lo = raw.astype(np.uint32)
        TK, RK = 64, 128
        inter = np.empty(2 * N, np.uint32)
        inter[0::2] = hi
        inter[1::2] = lo
        npad = (-N) % TK
        if npad:
            inter = np.concatenate(
                [inter, np.full(2 * npad, 0xFFFFFFFF, np.uint32)])
        store2d = jnp.asarray(inter.reshape(-1, 2 * TK))
        r_hi, r_lo = hi[::TK], lo[::TK]
        nrouter = len(r_hi)
        rpad = (-nrouter) % RK
        if rpad:
            r_hi = np.concatenate([r_hi, np.full(rpad, 0xFFFFFFFF,
                                                 np.uint32)])
            r_lo = np.concatenate([r_lo, np.full(rpad, 0xFFFFFFFF,
                                                 np.uint32)])
        rinter = np.empty(2 * len(r_hi), np.uint32)
        rinter[0::2] = r_hi
        rinter[1::2] = r_lo
        router2d = jnp.asarray(rinter.reshape(-1, 2 * RK))
        t_hi = jnp.asarray(r_hi[::RK].copy())
        t_lo = jnp.asarray(r_lo[::RK].copy())

        def count_le(wh, wl, ah, al):
            le = (wh < ah[..., None]) | ((wh == ah[..., None]) &
                                         (wl <= al[..., None]))
            return le.sum(axis=-1).astype(jnp.int32)

        @jax.jit
        def h3(store2d, router2d, t_hi, t_lo, qr):
            qhi = (qr >> jnp.uint64(32)).astype(jnp.uint32)
            qlo = qr.astype(jnp.uint32)
            c1 = count_le(t_hi[None, :], t_lo[None, :], qhi, qlo)
            r1i = jnp.clip(c1 - 1, 0, router2d.shape[0] - 1)
            rrow = router2d[r1i]
            c2 = count_le(rrow[:, 0::2], rrow[:, 1::2], qhi, qlo)
            t = jnp.clip(r1i * RK + c2 - 1, 0, store2d.shape[0] - 1)
            srow = store2d[t]
            eq = (srow[:, 0::2] == qhi[:, None]) & \
                 (srow[:, 1::2] == qlo[:, None])
            found = eq.any(axis=1)
            pos = jnp.argmax(eq, axis=1).astype(jnp.int32)
            idx = t * TK + pos
            return (idx * found).sum()

        bench("H3 3-level hierarchical",
              lambda q: h3(store2d, router2d, t_hi, t_lo, q), qs, Q)

    # ---- PL: planar hashed bucket -------------------------------------
    if want("PL"):
        for EPR, m in ((64, 26), (128, 60)):
            h = splitmix64_np(raw)
            b = max(1, int(np.ceil(np.log2(N / m))))
            B = 1 << b
            bucket = (h >> np.uint64(64 - b)).astype(np.int64)
            order = np.argsort(bucket, kind="stable")
            sb = bucket[order]
            start = np.searchsorted(sb, np.arange(B))
            rank = np.arange(N) - start[sb]
            occ = np.bincount(bucket, minlength=B)
            if occ.max() > EPR:
                print(f"PL EPR={EPR}: overflow ({occ.max()}) -- skip")
                continue
            table = np.full((B, 3 * EPR), 0xFFFFFFFF, np.uint32)
            table[sb, rank] = (raw >> np.uint64(32)).astype(np.uint32)[order]
            table[sb, EPR + rank] = raw.astype(np.uint32)[order]
            table[sb, 2 * EPR + rank] = order.astype(np.uint32)
            table_j = jnp.asarray(table)

            def splitmix_j(x):
                x = x + jnp.uint64(0x9E3779B97F4A7C15)
                x = (x ^ (x >> jnp.uint64(30))) * \
                    jnp.uint64(0xBF58476D1CE4E5B9)
                x = (x ^ (x >> jnp.uint64(27))) * \
                    jnp.uint64(0x94D049BB133111EB)
                return x ^ (x >> jnp.uint64(31))

            import functools

            @functools.partial(jax.jit, static_argnames=("epr", "bb"))
            def pl(tab, qr, epr, bb):
                hh = splitmix_j(qr)
                bkt = (hh >> jnp.uint64(64 - bb)).astype(jnp.int32)
                row = tab[bkt]
                rhi, rlo = row[:, :epr], row[:, epr:2 * epr]
                ridx = row[:, 2 * epr:3 * epr]
                th = (qr >> jnp.uint64(32)).astype(jnp.uint32)
                tl = qr.astype(jnp.uint32)
                eq = (rhi == th[:, None]) & (rlo == tl[:, None])
                idx = (ridx * eq).sum(axis=1)
                return idx.sum()

            bench(f"PL planar bucket EPR={EPR} m~{m}",
                  lambda q: pl(table_j, q, EPR, b), qs, Q)

    # ---- MR: merge-rank lookup (sort-based) ---------------------------
    # concat store+query u32-pair keys, one stable lax.sort, cumsum of
    # store flags gives each query its searchsorted rank; optional
    # back-scatter restores query order.
    if want("MR"):
        hi32 = jnp.asarray((raw >> np.uint64(32)).astype(np.uint32))
        lo32 = jnp.asarray(raw.astype(np.uint32))
        store_tag = jnp.full((N,), -1, jnp.int32)
        qid = jnp.arange(Q, dtype=jnp.int32)

        @jax.jit
        def mr(hi32, lo32, qr):
            qh = (qr >> jnp.uint64(32)).astype(jnp.uint32)
            ql = qr.astype(jnp.uint32)
            ch = jnp.concatenate([hi32, qh])
            cl = jnp.concatenate([lo32, ql])
            ct = jnp.concatenate([store_tag, qid])
            sh, sl, st = jax.lax.sort((ch, cl, ct), num_keys=2)
            is_store = st < 0
            srank = jnp.cumsum(is_store.astype(jnp.int32))
            # exact-match test: element before a query at pos p is the
            # store key with rank srank[p]; compare keys at sorted pos.
            prev_h = jnp.concatenate([jnp.zeros((1,), jnp.uint32), sh[:-1]])
            prev_l = jnp.concatenate([jnp.zeros((1,), jnp.uint32), sl[:-1]])
            found_sorted = (prev_h == sh) & (prev_l == sl)
            idx_sorted = srank - 1
            out_idx = jnp.zeros((Q,), jnp.int32).at[
                jnp.where(is_store, Q, st)].add(
                    jnp.where(is_store, 0, idx_sorted), mode="drop")
            out_fnd = jnp.zeros((Q,), jnp.bool_).at[
                jnp.where(is_store, Q, st)].max(
                    jnp.where(is_store, False, found_sorted), mode="drop")
            return (out_idx * out_fnd).sum()

        bench("MR merge-rank (back-scatter)",
              lambda q: mr(hi32, lo32, q), qs, Q)

        @jax.jit
        def mrs(hi32, lo32, qr):
            qh = (qr >> jnp.uint64(32)).astype(jnp.uint32)
            ql = qr.astype(jnp.uint32)
            ch = jnp.concatenate([hi32, qh])
            cl = jnp.concatenate([lo32, ql])
            ct = jnp.concatenate([store_tag, qid])
            sh, sl, st = jax.lax.sort((ch, cl, ct), num_keys=2)
            is_store = st < 0
            srank = jnp.cumsum(is_store.astype(jnp.int32))
            return jnp.where(is_store, 0, srank).sum()

        bench("MRS merge-rank (sorted out)",
              lambda q: mrs(hi32, lo32, q), qs, Q)

    # ---- RG: raw row gather (upper bound) -----------------------------
    if want("RG"):
        table = rng.integers(0, 1 << 32, size=(N // 26, 192),
                             dtype=np.int64).astype(np.uint32)
        table_j = jnp.asarray(table)
        ixs = [jnp.asarray(rng.integers(0, N // 26, size=Q).astype(
            np.int32)) for _ in range(args.nbuf)]

        @jax.jit
        def rg(tab, ix):
            return tab[ix].sum()

        bench("RG raw row gather (x,192)",
              lambda q: rg(table_j, q), ixs, Q)

    return 0


if __name__ == "__main__":
    sys.exit(main())
