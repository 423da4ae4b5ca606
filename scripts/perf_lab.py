"""Perf lab: race batched-lookup strategies on the current device.

The round-1 lookup (u64 emulated jnp.searchsorted) measured 2.2M
lookups/s on TPU v5e — *slower than one CPU core*.  This script measures
candidate replacements honestly (dependency-chained iterations, final
host fetch) so we can pick the store layout for round 2:

  A  current: sops.lookup (u64 searchsorted)
  C  hand-rolled binary search over split (hi, lo) u32 arrays
  D  prefix-bucket direct index + contiguous window gather + compare
  E  prefix-bucket + fixed-step in-bucket binary search
  F  raw random-gather throughput (upper bound for gather-bound designs)
  S  sort-of-queries throughput (upper bound for sort-then-merge designs)

Run:  JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache python scripts/perf_lab.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time

import numpy as np


def timeit(fn, q, iters=10):
    """Chained timing: fn(q, salt)->scalar; salt feeds the next call."""
    s = fn(q, 0)
    s.block_until_ready()
    # second warmup with the CHAINED salt dtype (the result scalar's dtype
    # differs from python 0 -> that variant compiles here, not in the loop)
    s = fn(q, s)
    s.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(q, s)
    s.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 << 20, help="store size")
    ap.add_argument("--q", type=int, default=1 << 20, help="queries/batch")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401  (enables x64)
    from mccortex_tpu.ops import sorted as sops

    N, Q = args.n, args.q
    rng = np.random.default_rng(0)
    # synthetic canonical-ish keys: uniform over low 62 bits (k=31)
    raw = rng.integers(0, 1 << 62, size=N, dtype=np.uint64)
    raw.sort()
    keys64 = jnp.asarray(raw[:, None])  # (N, 1)
    hi32 = jnp.asarray((raw >> 32).astype(np.uint32))
    lo32 = jnp.asarray(raw.astype(np.uint32))
    qsel = rng.integers(0, N, size=Q)
    q64 = jnp.asarray(raw[qsel][:, None])
    qhi = jnp.asarray((raw[qsel] >> 32).astype(np.uint32))
    qlo = jnp.asarray(raw[qsel].astype(np.uint32))

    dev = jax.devices()[0].platform
    print(f"device={dev} N={N} Q={Q}", flush=True)
    results = {}

    def report(name, dt):
        results[name] = Q / dt
        print(f"{name:28s} {dt*1e3:9.2f} ms  {Q/dt/1e6:9.2f} M/s", flush=True)

    only = set(args.only.split(",")) if args.only else None

    def want(tag):
        return only is None or tag in only

    # ---- A: current u64 searchsorted ------------------------------------
    if want("A"):
        @jax.jit
        def stratA(qk, salt):
            q2 = jnp.roll(qk, (salt % 3).astype(jnp.int32), axis=0)
            idx, found = sops.lookup(keys64, q2)
            return (idx.astype(jnp.uint64) + found.astype(jnp.uint64)).sum()
        report("A u64 searchsorted", timeit(stratA, q64, args.iters))

    # ---- C: hand binary search on u32 pairs -----------------------------
    steps = int(np.ceil(np.log2(N))) + 1

    def bs32(qh, ql, lo0, hi0, nsteps):
        lo, hi = lo0, hi0
        for _ in range(nsteps):
            mid = (lo + hi) >> 1
            midc = jnp.clip(mid, 0, N - 1)
            kh = hi32[midc]
            kl = lo32[midc]
            less = (kh < qh) | ((kh == qh) & (kl < ql))
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        return lo

    if want("C"):
        @jax.jit
        def stratC(qh, salt):
            qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
            lo = bs32(qh2, qlo, jnp.zeros_like(qh, jnp.int32),
                      jnp.full(qh.shape, N, jnp.int32), steps)
            idxc = jnp.clip(lo, 0, N - 1)
            found = (hi32[idxc] == qh2) & (lo32[idxc] == qlo)
            return (lo + found.astype(jnp.int32)).sum()
        report("C u32-pair binsearch", timeit(stratC, qhi, args.iters))

    # ---- D: prefix bucket + window gather -------------------------------
    for b, Wn in ((20, 8), (20, 16), (18, 32)):
        if not want("D"):
            break
        prefixes = (jnp.arange((1 << b) + 1, dtype=jnp.uint64) <<
                    jnp.uint64(62 - b))
        offs = jnp.searchsorted(keys64[:, 0], prefixes).astype(jnp.int32)
        maxb = int(jnp.max(offs[1:] - offs[:-1]))
        interleaved = jnp.stack([hi32, lo32], axis=1).reshape(-1)  # (2N,)

        def mk(b=b, Wn=Wn, offs=offs):
            @jax.jit
            def stratD(qh, salt):
                # hi holds key bits 61..32 (low 30 bits of hi meaningful);
                # top-b key bits = hi >> (30 - b)
                qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
                pref = qh2 >> jnp.uint32(30 - b)
                start = offs[pref]
                win = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(
                        interleaved, (2 * s,), (2 * Wn,)))(
                            jnp.clip(start, 0, N - Wn))
                wh = win[:, 0::2]
                wl = win[:, 1::2]
                hit = (wh == qh2[:, None]) & (wl == qlo[:, None])
                found = hit.any(axis=1)
                off = jnp.argmax(hit, axis=1).astype(jnp.int32)
                idx = jnp.clip(start, 0, N - Wn) + off
                return (idx + found.astype(jnp.int32)).sum()
            return stratD
        dt = timeit(mk(), qhi, args.iters)
        report(f"D prefix b={b} win={Wn} (maxb={maxb})", dt)

    # ---- E: prefix bucket + fixed-step binsearch ------------------------
    for b, insteps in ((20, 5), (22, 4)):
        if not want("E"):
            break
        prefixes = (jnp.arange((1 << b) + 1, dtype=jnp.uint64) <<
                    jnp.uint64(62 - b))
        offs = jnp.searchsorted(keys64[:, 0], prefixes).astype(jnp.int32)
        maxb = int(jnp.max(offs[1:] - offs[:-1]))

        def mkE(b=b, insteps=insteps, offs=offs):
            @jax.jit
            def stratE(qh, salt):
                qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
                pref = qh2 >> jnp.uint32(30 - b)
                lo0 = offs[pref]
                hi0 = offs[pref + 1]
                lo = bs32(qh2, qlo, lo0, hi0, insteps)
                idxc = jnp.clip(lo, 0, N - 1)
                found = (hi32[idxc] == qh2) & (lo32[idxc] == qlo)
                return (lo + found.astype(jnp.int32)).sum()
            return stratE
        dt = timeit(mkE(), qhi, args.iters)
        report(f"E prefix b={b} steps={insteps} (maxb={maxb})", dt)

    # ---- F: raw gather baselines ---------------------------------------
    if want("F"):
        ridx = jnp.asarray(rng.integers(0, N, size=Q).astype(np.int32))

        @jax.jit
        def stratF1(ix, salt):
            ix2 = jnp.roll(ix, (salt % 3).astype(jnp.int32))
            return hi32[ix2].astype(jnp.uint32).sum()
        report("F 1 gather/query", timeit(stratF1, ridx, args.iters))

        @jax.jit
        def stratF8(ix, salt):
            ix2 = jnp.roll(ix, (salt % 3).astype(jnp.int32))
            acc = jnp.uint32(0)
            for s in range(8):
                acc = acc + hi32[(ix2 + s * 1017) % N].sum()
            return acc
        report("F 8 gathers/query", timeit(stratF8, ridx, args.iters))

        @jax.jit
        def stratFs(ix, salt):
            ix2 = jnp.clip(jnp.roll(ix, (salt % 3).astype(jnp.int32)), 0, N - 16)
            win = jax.vmap(
                lambda s: jax.lax.dynamic_slice(hi32, (s,), (16,)))(ix2)
            return win.sum()
        report("F 16-slice gather/query", timeit(stratFs, ridx, args.iters))

    # ---- G: merge-based exact lookup ------------------------------------
    # sort queries with id payload, concat with store keys, sort combined,
    # rank = cumsum of store-flags, scatter result back to query order.
    if want("G"):
        qid = jnp.arange(Q, dtype=jnp.int32)
        store_tag = jnp.full((N,), -1, jnp.int32)  # -1 marks store rows

        @jax.jit
        def stratG(qh, salt):
            qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
            ch = jnp.concatenate([hi32, qh2])
            cl = jnp.concatenate([lo32, qlo])
            ct = jnp.concatenate([store_tag, qid])
            sh, sl, st = jax.lax.sort((ch, cl, ct), num_keys=2)
            is_store = st < 0
            srank = jnp.cumsum(is_store.astype(jnp.int32))
            # for a query element at position p: #store keys <= it = srank[p]
            # searchsorted-left result = srank[p] (since store sorts before
            # equal-key queries when tag breaks ties... tag IS a sort key?
            # num_keys=2 -> ties broken by sort stability: store first)
            qpos = jnp.where(is_store, 0, srank)
            out = jnp.zeros((Q,), jnp.int32).at[
                jnp.where(is_store, Q, st)].add(qpos, mode="drop")
            return out.sum()
        report("G merge-rank lookup", timeit(stratG, qhi, args.iters))

        @jax.jit
        def stratG2(qh, salt):
            # same but results left in sorted-query order (no back-scatter)
            qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
            ch = jnp.concatenate([hi32, qh2])
            cl = jnp.concatenate([lo32, qlo])
            ct = jnp.concatenate([store_tag, qid])
            sh, sl, st = jax.lax.sort((ch, cl, ct), num_keys=2)
            is_store = st < 0
            srank = jnp.cumsum(is_store.astype(jnp.int32))
            return jnp.where(is_store, 0, srank).sum()
        report("G2 merge-rank, sorted out", timeit(stratG2, qhi,
                                                   args.iters))

    # ---- F1s: gather with sorted (coalesced) indices --------------------
    if want("F"):
        sidx = jnp.asarray(np.sort(rng.integers(0, N, size=Q)).astype(
            np.int32))

        @jax.jit
        def stratF1s(ix, salt):
            ix2 = jnp.roll(ix, (salt % 3).astype(jnp.int32))
            return hi32[ix2].astype(jnp.uint32).sum()
        report("F 1 sorted-gather/query", timeit(stratF1s, sidx,
                                                 args.iters))

    # ---- E24: bigger prefix table ---------------------------------------
    for b, insteps in ((24, 3),):
        if not want("E"):
            break
        prefixes = (jnp.arange((1 << b) + 1, dtype=jnp.uint64) <<
                    jnp.uint64(62 - b))
        offs = jnp.searchsorted(keys64[:, 0], prefixes).astype(jnp.int32)
        maxb = int(jnp.max(offs[1:] - offs[:-1]))

        def mkE2(b=b, insteps=insteps, offs=offs):
            @jax.jit
            def stratE2(qh, salt):
                qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
                pref = qh2 >> jnp.uint32(30 - b)
                lo0 = offs[pref]
                hi0 = offs[pref + 1]
                lo = bs32(qh2, qlo, lo0, hi0, insteps)
                idxc = jnp.clip(lo, 0, N - 1)
                found = (hi32[idxc] == qh2) & (lo32[idxc] == qlo)
                return (lo + found.astype(jnp.int32)).sum()
            return stratE2
        dt = timeit(mkE2(), qhi, args.iters)
        report(f"E prefix b={b} steps={insteps} (maxb={maxb})", dt)

    # ---- S: query sort throughput --------------------------------------
    if want("S"):
        @jax.jit
        def stratS(qh, salt):
            qh2 = jnp.roll(qh, (salt % 3).astype(jnp.int32))
            s = jax.lax.sort((qh2, qlo), num_keys=2)
            return s[0].astype(jnp.uint32).sum()
        report("S sort queries (u32 pair)", timeit(stratS, qhi, args.iters))

    print("---- summary (M lookups/s) ----")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:34s} {v/1e6:9.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
