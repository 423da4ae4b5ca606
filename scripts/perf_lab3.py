"""Perf lab 3: hashed-bucket lookup (direct-indexed, router-free).

perf_lab2 showed the 3-level hierarchical search reaches 28.9M/s but
spends ~15ms/M on the top-level compare.  If the store keeps a sidecar
table bucketed by a UNIFORM hash of the key, the bucket id is a bit
shift — zero gathers, zero compares — and lookup is exactly one row
gather (7.3ms/M measured) plus an in-row VPU compare:

  table (B, 256) u32, bucket = hash(key) >> (64 - log2(B))
  row entry r: [hi, lo, idx] at columns (3r, 3r+1, 3r+2), EPR = 85
  mean occupancy m = N/B chosen ~32 => P(overflow EPR) ~ 1e-15

Run: JAX_COMPILATION_CACHE_DIR=/tmp/mctx_tpu_cache python scripts/perf_lab3.py
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


def splitmix64_np(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 << 20)
    ap.add_argument("--q", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401

    N, Q = args.n, args.q
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1 << 62, size=N, dtype=np.uint64)
    raw = np.unique(raw)
    N = len(raw)
    qsel = rng.integers(0, N, size=Q)
    qraw = raw[qsel]

    h = splitmix64_np(raw)
    EPR = 85                      # entries per 256-u32 row (W=1: 3 u32/entry)
    b = max(1, int(np.ceil(np.log2(N / 32))))
    B = 1 << b
    shift = np.uint64(64 - b)
    bucket = (h >> shift).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    sb = bucket[order]
    start = np.searchsorted(sb, np.arange(B))
    rank = np.arange(N) - start[sb]
    occ = np.bincount(bucket, minlength=B)
    print(f"N={N} B={B} mean_occ={N/B:.1f} max_occ={occ.max()} EPR={EPR}",
          flush=True)
    assert occ.max() <= EPR

    table = np.full((B, 256), 0xFFFFFFFF, np.uint32)
    hi = (raw >> np.uint64(32)).astype(np.uint32)[order]
    lo = raw.astype(np.uint32)[order]
    idxs = order.astype(np.uint32)   # idx into the raw-sorted store
    table[sb, 3 * rank + 0] = hi
    table[sb, 3 * rank + 1] = lo
    table[sb, 3 * rank + 2] = idxs
    table_j = jnp.asarray(table)

    qh = jnp.asarray((qraw >> np.uint64(32)).astype(np.uint32))
    ql = jnp.asarray(qraw.astype(np.uint32))
    qhash = jnp.asarray(splitmix64_np(qraw))

    cols = np.arange(EPR)

    @jax.jit
    def bucket_lookup(qhash_in, salt):
        qh2 = jnp.roll(qhash_in, (salt % 3).astype(jnp.int32))
        bkt = (qh2 >> jnp.uint64(64 - b)).astype(jnp.int32)
        row = table_j[bkt]                      # (Q, 256) row gather
        rhi = row[:, 3 * cols]                  # (Q, EPR)
        rlo = row[:, 3 * cols + 1]
        eq = (rhi == qh[:, None]) & (rlo == ql[:, None])
        found = eq.any(axis=1)
        pos = jnp.argmax(eq, axis=1)
        idx = row[jnp.arange(row.shape[0]), 3 * pos + 2]
        return (idx * found).astype(jnp.uint32).sum()

    dt = timeit(bucket_lookup, qhash, args.iters)
    print(f"hashed-bucket lookup  {dt*1e3:9.2f} ms  {Q/dt/1e6:9.2f} M/s",
          flush=True)

    # variant: hash computed on device from the raw query (full pipeline)
    qraw_j = jnp.asarray(qraw)

    def splitmix_j(x):
        x = x + jnp.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
        return x ^ (x >> jnp.uint64(31))

    @jax.jit
    def full_lookup(qr, salt):
        qr2 = jnp.roll(qr, (salt % 3).astype(jnp.int32))
        hh = splitmix_j(qr2)
        bkt = (hh >> jnp.uint64(64 - b)).astype(jnp.int32)
        row = table_j[bkt]
        rhi = row[:, 3 * cols]
        rlo = row[:, 3 * cols + 1]
        th = (qr2 >> jnp.uint64(32)).astype(jnp.uint32)
        tl = qr2.astype(jnp.uint32)
        eq = (rhi == th[:, None]) & (rlo == tl[:, None])
        found = eq.any(axis=1)
        pos = jnp.argmax(eq, axis=1)
        idx = row[jnp.arange(row.shape[0]), 3 * pos + 2]
        return (idx * found).astype(jnp.uint32).sum()

    dt = timeit(full_lookup, qraw_j, args.iters)
    print(f"full (hash on device) {dt*1e3:9.2f} ms  {Q/dt/1e6:9.2f} M/s",
          flush=True)
    return 0




def planar():
    """Planar row layout: [hi x 64 | lo x 64 | idx x 64 (| pad)] so the
    three fields are contiguous lane slices; idx extracted as
    sum(idx * onehot) -- no second gather."""
    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401
    N, Q = 4 << 20, 1 << 20
    rng = np.random.default_rng(0)
    raw = np.unique(rng.integers(0, 1 << 62, size=N, dtype=np.uint64))
    N = len(raw)
    qraw = raw[rng.integers(0, N, size=Q)]
    h = splitmix64_np(raw)
    for EPR, pad in ((64, 64), (64, 0)):
        b = max(1, int(np.ceil(np.log2(N / 26))))
        B = 1 << b
        bucket = (h >> np.uint64(64 - b)).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        sb = bucket[order]
        start = np.searchsorted(sb, np.arange(B))
        rank = np.arange(N) - start[sb]
        occ = np.bincount(bucket, minlength=B)
        assert occ.max() <= EPR, occ.max()
        WROW = 3 * EPR + pad
        table = np.full((B, WROW), 0xFFFFFFFF, np.uint32)
        table[sb, rank] = (raw >> np.uint64(32)).astype(np.uint32)[order]
        table[sb, EPR + rank] = raw.astype(np.uint32)[order]
        table[sb, 2 * EPR + rank] = order.astype(np.uint32)
        table_j = jnp.asarray(table)
        qraw_j = jnp.asarray(qraw)

        def splitmix_j(x):
            x = x + jnp.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
            return x ^ (x >> jnp.uint64(31))

        @jax.jit
        def full_lookup_t(tab, qr, salt):
            qr2 = jnp.roll(qr, (salt % 3).astype(jnp.int32))
            hh = splitmix_j(qr2)
            bkt = (hh >> jnp.uint64(64 - b)).astype(jnp.int32)
            row = tab[bkt]
            rhi, rlo = row[:, :EPR], row[:, EPR:2 * EPR]
            ridx = row[:, 2 * EPR:3 * EPR]
            th = (qr2 >> jnp.uint64(32)).astype(jnp.uint32)
            tl = qr2.astype(jnp.uint32)
            eq = (rhi == th[:, None]) & (rlo == tl[:, None])
            idx = (ridx * eq).sum(axis=1).astype(jnp.uint32)
            return idx.sum()

        def full_lookup(qr, salt):
            return full_lookup_t(table_j, qr, salt)

        dt = timeit(full_lookup, qraw_j, 20)
        print(f"planar EPR={EPR} row={WROW}  {dt*1e3:9.2f} ms  "
              f"{Q/dt/1e6:9.2f} M/s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "planar":
        planar()
        sys.exit(0)
    sys.exit(main())
