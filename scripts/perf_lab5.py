"""Round-4 TPU perf lab: sort operand-cost probes, epoch A/Bs after the
record-slice change, and lookup-table row-width experiments.

All timings are host-fetch timed (np.asarray of a scalar reduction) —
the axon backend's block_until_ready does not synchronise (perf_lab4).
Chained-iteration loops amortise the ~20ms RPC the way bench.py does.

Run ON THE TPU (one process at a time):
  JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache python scripts/perf_lab5.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def timed_chain(fn, x0, iters=8):
    """fn: (state) -> state scalar-chained; returns s/iter."""
    import jax.numpy as jnp
    s = fn(x0)
    np.asarray(s)          # compile + sync
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
    import mccortex_tpu  # noqa: F401  (x64 on)
    from mccortex_tpu.graph import build as gb
    from mccortex_tpu.ops import kmer as kops

    small = bool(_os.environ.get("MCTX_LAB_SMALL"))
    rng = np.random.default_rng(0)
    B, L, k = (1024 if small else 32768), 256, 31
    M = B * (L - k + 1)            # 7.37M live records
    print(f"records M={M}", file=_sys.stderr)

    # ---- raw sort probes on synthetic planes --------------------------
    hi = jnp.asarray(rng.integers(0, 1 << 32, M, dtype=np.uint64)
                     .astype(np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, M, dtype=np.uint64)
                     .astype(np.uint32))
    e32 = jnp.asarray(rng.integers(0, 256, M, dtype=np.uint32))
    k64 = jnp.asarray(rng.integers(0, 1 << 62, M, dtype=np.uint64))

    def probe(name, mk):
        def step(s):
            outs = mk(s)
            return outs[0][::1 << 20].astype(jnp.uint64).sum() + s
        f = jax.jit(step)
        dt = timed_chain(f, jnp.uint64(0))
        print(f"sort {name:28s} {dt*1e3:7.2f} ms  "
              f"({M/dt/1e6:6.1f} M rec/s)", file=_sys.stderr)
        return dt

    probe("lax 3pl nk=2 (cur)", lambda s: jax.lax.sort(
        (hi + s.astype(jnp.uint32), lo, e32), num_keys=2))
    probe("lax64 u64+u32", lambda s: jax.lax.sort(
        (k64 + s, e32), num_keys=1))
    probe("u64 only", lambda s: (jax.lax.sort(k64 + s),))
    probe("u32 only", lambda s: (jax.lax.sort(
        hi + s.astype(jnp.uint32)),))
    probe("u32key + 1pl", lambda s: jax.lax.sort(
        (hi + s.astype(jnp.uint32), lo), num_keys=1))
    probe("u32key + 2pl", lambda s: jax.lax.sort(
        (hi + s.astype(jnp.uint32), lo, e32), num_keys=1))
    probe("i32 only", lambda s: (jax.lax.sort(
        (hi + s.astype(jnp.uint32)).astype(jnp.int32)),))
    probe("f32 only", lambda s: (jax.lax.sort(
        (hi + s.astype(jnp.uint32)).astype(jnp.float32)),))

    # batched independent row sorts: the sample-sort inner-loop cost.
    # M=7.37M doesn't split evenly by 256; use a 7.34M slice.
    for nrow in (64, 256, 1024):
        Mb = (M // (nrow * 128)) * nrow * 128
        k64b = k64[:Mb].reshape(nrow, Mb // nrow)
        e32b = e32[:Mb].reshape(nrow, Mb // nrow)
        probe(f"lax64 batched {nrow}rows", lambda s, a=k64b, b=e32b:
              tuple(x.reshape(-1) for x in jax.lax.sort(
                  (a + s, b), num_keys=1, dimension=-1)))

    # ---- epoch A/Bs ---------------------------------------------------
    bases = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))

    def epoch_fn(sort_impl):
        @jax.jit
        def ep(b, salt):
            shifted = jnp.roll(b, (salt % 7).astype(jnp.int32), axis=0)
            _k, _c, _e, n = gb.count_batch_fused(shifted, k, 1, 0,
                                                 sort_impl=sort_impl)
            return n
        return ep

    impls = () if jax.default_backend() == "cpu" else ("lax", "lax64")
    for impl in impls:
        ep = epoch_fn(impl)
        def step(s, ep=ep):
            return ep(bases, s)
        dt = timed_chain(jax.jit(step), jnp.int64(0), iters=10)
        kmers = B * (L - k + 1)
        print(f"epoch[{impl:6s}] {dt*1e3:7.2f} ms  "
              f"({kmers/dt/1e6:6.1f} M obs/s)", file=_sys.stderr)

    # ---- lookup row-width probes -------------------------------------
    # parametric re-implementation of hashidx build/lookup with EPR var.
    from mccortex_tpu.ops import hashidx as hx

    N_STORE = (1 << 16) if small else (4 << 20)
    raw = np.unique(rng.integers(0, 1 << 62, size=N_STORE,
                                 dtype=np.uint64))
    keys_np = np.sort(raw)[:, None]
    nkeys = keys_np.shape[0]
    Q = (1 << 16) if small else (1 << 22)
    qidx = [rng.integers(0, nkeys, Q) for _ in range(6)]

    def build_tab(epr, occ):
        n = nkeys
        b_bits = max(1, int(np.ceil(np.log2(n / occ))))
        h = hx._hash_np(keys_np)
        while True:
            Bb = 1 << b_bits
            bucket = (h >> np.uint64(64 - b_bits)).astype(np.int64)
            if np.bincount(bucket, minlength=Bb).max() <= epr:
                break
            b_bits += 1
        order = np.argsort(bucket, kind="stable")
        sb = bucket[order]
        start = np.searchsorted(sb, np.arange(1 << b_bits))
        rank = (np.arange(n) - start[sb]).astype(np.int64)
        P = 3
        tab = np.full((1 << b_bits, P * epr), 0xFFFFFFFF, np.uint32)
        kw = keys_np[order, 0]
        tab[sb, 0 * epr + rank] = (kw >> np.uint64(32)).astype(np.uint32)
        tab[sb, 1 * epr + rank] = kw.astype(np.uint32)
        tab[sb, 2 * epr + rank] = order.astype(np.uint32)
        return tab, b_bits

    def mk_lookup(epr, b_bits):
        import functools
        @jax.jit
        def lk(table, qk):
            q = qk.reshape((-1, 1))
            h = kops.kmer_hash(q)
            bkt = (h >> jnp.uint64(64 - b_bits)).astype(jnp.int32)
            row = table[bkt]
            qhi = (q[:, 0] >> jnp.uint64(32)).astype(jnp.uint32)
            qlo = q[:, 0].astype(jnp.uint32)
            eq = (row[:, 0:epr] == qhi[:, None]) & \
                 (row[:, epr:2 * epr] == qlo[:, None])
            found = eq.any(axis=-1)
            idx = jnp.where(eq, row[:, 2 * epr:], jnp.uint32(0)).max(
                axis=-1) * found
            return (idx.astype(jnp.int64)).sum()
        return lk

    for epr, occ in ((64, 26), (32, 13), (16, 6), (8, 3)):
        tab, b_bits = build_tab(epr, occ)
        tj = jnp.asarray(tab)
        qbufs = [jnp.asarray(keys_np[qi, 0]) for qi in qidx]
        for q in qbufs:
            q.block_until_ready()
        lk = mk_lookup(epr, b_bits)
        np.asarray(lk(tj, qbufs[0]))
        np.asarray(lk(tj, qbufs[1]))
        t0 = time.perf_counter()
        outs = [lk(tj, q) for q in qbufs]
        vals = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / len(qbufs)
        assert all(v > 0 for v in vals)
        print(f"lookup EPR={epr:2d} b_bits={b_bits} "
              f"tab={tab.nbytes>>20}MB  {dt*1e3:6.2f} ms  "
              f"({Q/dt/1e6:6.1f} M lk/s)", file=_sys.stderr)

    # fingerprint variant: 2 planes [fp32 | idx32], EPR=64; multi-match
    # rows fall back (counted); verify gather closes exactness.
    def build_fp(epr, occ):
        n = nkeys
        b_bits = max(1, int(np.ceil(np.log2(n / occ))))
        h = hx._hash_np(keys_np)
        while True:
            Bb = 1 << b_bits
            bucket = (h >> np.uint64(64 - b_bits)).astype(np.int64)
            if np.bincount(bucket, minlength=Bb).max() <= epr:
                break
            b_bits += 1
        order = np.argsort(bucket, kind="stable")
        sb = bucket[order]
        start = np.searchsorted(sb, np.arange(1 << b_bits))
        rank = (np.arange(n) - start[sb]).astype(np.int64)
        tab = np.full((1 << b_bits, 2 * epr), 0xFFFFFFFF, np.uint32)
        fp = hx._hash_np(keys_np, seed=1).astype(np.uint32)
        tab[sb, 0 * epr + rank] = fp[order]
        tab[sb, 1 * epr + rank] = order.astype(np.uint32)
        return tab, b_bits

    for epr, occ in ((64, 26), (32, 13)):
        tab, b_bits = build_fp(epr, occ)
        tj = jnp.asarray(tab)
        skj = jnp.asarray(keys_np)
        qbufs = [jnp.asarray(keys_np[qi, 0]) for qi in qidx]
        for q in qbufs:
            q.block_until_ready()

        @jax.jit
        def lkf(table, store_keys, qk, _b=b_bits, _e=epr):
            q = qk.reshape((-1, 1))
            h = kops.kmer_hash(q)
            bkt = (h >> jnp.uint64(64 - _b)).astype(jnp.int32)
            row = table[bkt]
            qfp = kops.kmer_hash(q, seed=1).astype(jnp.uint32)
            eq = row[:, 0:_e] == qfp[:, None]
            nmatch = eq.sum(axis=-1)
            idx = jnp.where(eq, row[:, _e:], jnp.uint32(0)).max(axis=-1)
            # verify: one element gather from the store
            cand = store_keys[idx.astype(jnp.int32), 0]
            found = (nmatch == 1) & (cand == q[:, 0])
            return (idx.astype(jnp.int64) * found).sum() + \
                (nmatch > 1).sum()
        np.asarray(lkf(tj, skj, qbufs[0]))
        np.asarray(lkf(tj, skj, qbufs[1]))
        t0 = time.perf_counter()
        outs = [lkf(tj, skj, q) for q in qbufs]
        vals = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / len(qbufs)
        print(f"lookup FP  EPR={epr:2d} b_bits={b_bits} "
              f"tab={tab.nbytes>>20}MB  {dt*1e3:6.2f} ms  "
              f"({Q/dt/1e6:6.1f} M lk/s)", file=_sys.stderr)

    print("lab5 done", file=_sys.stderr)


if __name__ == "__main__":
    main()
