"""Planar hashed-bucket lookup index: the batched-lookup fast path.

The store's ground truth stays a sorted (N, W) uint64 key array
(ops/sorted.py), but a binary search is ~log2(N) dependent HBM gathers
per query.  This sidecar index makes a batched lookup exactly ONE row
gather plus an in-row VPU compare — the TPU analogue of the reference's
single-probe hash table hit (ref: src/graph/hash_table.c:84
hash_table_find, :169 find_or_insert probe loop):

  table: (B, P*EPR) uint32, P = 2W+1 planes, laid out plane-major
         [w0_hi | w0_lo | w1_hi | w1_lo | ... | row_idx], each EPR wide.
  bucket(key) = kmer_hash(key) >> (64 - b_bits)      (B = 2**b_bits)

A query gathers its bucket row (contiguous, 128-lane aligned) and
compares all EPR entries per word-plane on the VPU.  Measured honestly
on v5e (scripts/perf_lab4.py, host-fetch timed): 62 M lookups/s at 4M
queries vs 2 M/s for the batched binary search — at, not below, the raw
row-gather ceiling.

Empty slots mark plane 0 (word-0 hi32) as 0xFFFFFFFF, which no valid
canonical kmer can have: k is odd, so word 0 carries at most 62 payload
bits (constants.py check_k).

Mean bucket occupancy targets OCC (~13) with EPR=32 slots; overflow
probability per bucket is tiny (Poisson tail past 32 at mean 13), and
the host build simply retries with twice the buckets if any bucket
overflows, so the index is exact — never lossy.

Row width (round 4, scripts/perf_lab5.py on v5e): the bucket-row gather
is row-ISSUE-rate bound (~60-70M rows/s), so halving the row from
EPR=64 (768B, 58.2M lk/s) to EPR=32 (384B, 67.2M lk/s) helps ~15% while
keeping total table bytes identical; EPR=16 leaves 48-lane rows that
fall off the vector path (18.9M lk/s — CLAUDE.md lane-alignment
landmine).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import kmer as kops

EPR = 32          # entries per row (per plane)
OCC = 13          # target mean occupancy
_EMPTY = np.uint32(0xFFFFFFFF)


def _hash_np(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Host mirror of kops.kmer_hash (must match bit-for-bit)."""
    gold = np.uint64(0x9E3779B97F4A7C15)
    c1 = np.uint64(0xBF58476D1CE4E5B9)
    c2 = np.uint64(0x94D049BB133111EB)

    def sm(x):
        with np.errstate(over="ignore"):
            x = x + gold
            x = (x ^ (x >> np.uint64(30))) * c1
            x = (x ^ (x >> np.uint64(27))) * c2
            return x ^ (x >> np.uint64(31))

    with np.errstate(over="ignore"):
        h = sm(keys[:, 0] ^ (np.uint64(seed) * gold))
        for w in range(1, keys.shape[1]):
            h = sm(h ^ keys[:, w])
    return h


def build_table(keys_np: np.ndarray, b_bits: int | None = None):
    """Build the planar table from live (n, W) uint64 keys (host numpy).

    Returns (table (B, P*EPR) uint32, b_bits).  Grows b_bits until no
    bucket exceeds EPR entries (expected zero retries at OCC=13).
    Very large stores (>32M keys) target a denser OCC=20 so the table
    stays within the HBM budget at 100M+ kmers.
    """
    n, W = keys_np.shape
    occ = OCC if n <= (32 << 20) else 20
    if b_bits is None:
        b_bits = max(1, int(np.ceil(np.log2(max(n, 1) / occ))) if n > occ
                     else 1)
        # max-load criterion: pre-bump b_bits until the EXPECTED number
        # of overflowing buckets B x P(Poisson(n/B) > EPR) is < 0.01 —
        # otherwise the overflow retry below wastes a full table build
        # at 100M+ keys (the old flat occupancy<=17 cutoff expected
        # ~2200 overflows at 100M keys, so the retry fired almost
        # always).  Chernoff upper bound on the Poisson tail keeps this
        # dependency-free and errs toward one extra doubling only near
        # the boundary.
        import math

        def _exp_overflow(bb):
            lam = n / (1 << bb)
            a = EPR + 1.0
            if lam <= 0:
                return 0.0
            return (1 << bb) * math.exp(a * math.log(math.e * lam / a)
                                        - lam)

        while _exp_overflow(b_bits) > 0.01:
            b_bits += 1
    h = _hash_np(keys_np)
    P = 2 * W + 1
    while True:
        B = 1 << b_bits
        bucket = (h >> np.uint64(64 - b_bits)).astype(np.int64)
        occ = np.bincount(bucket, minlength=B)
        if occ.max() <= EPR:
            break
        b_bits += 1
    order = np.argsort(bucket, kind="stable")
    sb = bucket[order]
    start = np.searchsorted(sb, np.arange(B))
    rank = (np.arange(n) - start[sb]).astype(np.int64)
    table = np.full((B, P * EPR), _EMPTY, np.uint32)
    for w in range(W):
        kw = keys_np[order, w]
        table[sb, (2 * w) * EPR + rank] = (kw >> np.uint64(32)).astype(
            np.uint32)
        table[sb, (2 * w + 1) * EPR + rank] = kw.astype(np.uint32)
    table[sb, 2 * W * EPR + rank] = order.astype(np.uint32)
    return table, b_bits


@functools.partial(jax.jit, static_argnames=("b_bits", "W"))
def lookup_planar(table: jnp.ndarray, queries: jnp.ndarray,
                  b_bits: int, W: int):
    """(idx, found) per query key (..., W) via one bucket-row gather.

    idx is the store row when found, else 0.  Sentinel queries (all-ones
    padding) are never found.  `table` MUST be a traced argument, not a
    closure constant (the axon remote-compile ships constants in the
    program body).
    """
    qshape = queries.shape[:-1]
    q = queries.reshape((-1, W))
    h = kops.kmer_hash(q)
    bkt = (h >> jnp.uint64(64 - b_bits)).astype(jnp.int32)
    row = table[bkt]                      # (Q, P*EPR) one gather
    eq = jnp.ones((q.shape[0], EPR), bool)
    for w in range(W):
        qhi = (q[:, w] >> jnp.uint64(32)).astype(jnp.uint32)
        qlo = q[:, w].astype(jnp.uint32)
        eq &= row[:, (2 * w) * EPR:(2 * w + 1) * EPR] == qhi[:, None]
        eq &= row[:, (2 * w + 1) * EPR:(2 * w + 2) * EPR] == qlo[:, None]
    # a sentinel query (0xFFFF... words) would match empty slots
    valid = ~jnp.all(q == jnp.uint64(0xFFFFFFFFFFFFFFFF), axis=-1)
    found = eq.any(axis=-1) & valid
    ridx = row[:, 2 * W * EPR:]
    idx = (jnp.where(eq, ridx, jnp.uint32(0)).max(axis=-1)
           * found).astype(jnp.int32)
    return idx.reshape(qshape), found.reshape(qshape)


# ---------------------------------------------------------------------------
# per-store cache (mirrors graph/adjacency.py's identity cache)
# ---------------------------------------------------------------------------

_cache_store: dict = {}

HCHUNK = 1 << 22   # queries per dispatch (bigger amortises better than
                   # sops.CHUNK; a (4M, P*EPR) row gather is fine on v5e)


def get_index_for(keys: jnp.ndarray):
    """Cached (table_jnp, b_bits) for a store's key buffer.  Keys beyond
    the live prefix are sentinels and are excluded by the host build."""
    ck = (id(keys), keys.shape)
    hit = _cache_store.get(ck)
    if hit is not None and hit[0] is keys:
        return hit[1], hit[2]
    keys_np = np.asarray(keys)
    live = ~np.all(keys_np == np.uint64(0xFFFFFFFFFFFFFFFF), axis=-1)
    nlive = int(live.sum())
    # live records are compacted at the front (store invariant)
    table, b_bits = build_table(keys_np[:nlive])
    table_j = jnp.asarray(table)
    if len(_cache_store) > 4:
        _cache_store.clear()
    _cache_store[ck] = (keys, table_j, b_bits)
    return table_j, b_bits


# "planar" = XLA bucket-row gather (lookup_planar); "fused" = the
# Pallas DMA-pipelined kernel (ops/pallas/lookup.py); "join" = the
# sort-merge-join (ops/sorted.lookup_join — no table at all); "auto"
# picks join for large batches against small/medium stores (the join
# re-sorts the store per HCHUNK of queries, so huge stores keep the
# planar row gather).  Module global read per call (host level, never
# inside jit).
# default "auto" since the round-4 on-chip A/B: join 97.9M lookups/s vs
# planar 65.8M at Q=4M against a 4M-kmer store
LOOKUP_IMPL = __import__("os").environ.get("MCTX_LOOKUP", "auto")

# auto mode cost model (on-chip, round 4): planar ~= Q * 15.2ns (row
# issue rate); join ~= (N+Q) * 5ns (sort+scans+unsort over the
# concatenation) -> join wins iff N < ~2Q.  Measured: Q=4M/N=4.2M join
# 97.9M lk/s vs planar 65.8M; Q=1M/N=4.6M join 15.1M vs planar 39.3M.
JOIN_MIN_Q = 1 << 20
JOIN_MAX_STORE = 32 << 20


def _pick_impl(n_store: int, n_queries: int) -> str:
    if LOOKUP_IMPL != "auto":
        return LOOKUP_IMPL
    # gate on the PER-DISPATCH batch: lookup() chunks joins at HCHUNK
    # queries, re-sorting the store each chunk, so the cost model must
    # compare the store against one chunk, not the whole batch
    q_dispatch = min(n_queries, HCHUNK)
    if (q_dispatch >= JOIN_MIN_Q and n_store <= JOIN_MAX_STORE
            and n_store < 2 * q_dispatch):
        return "join"
    return "planar"

_cache128: dict = {}


def get_index128_for(keys: jnp.ndarray):
    """Cached (table128, b_bits) for the Pallas lookup kernel."""
    ck = (id(keys), keys.shape)
    hit = _cache128.get(ck)
    if hit is not None and hit[0] is keys:
        return hit[1], hit[2]
    from .pallas import lookup as PLK
    keys_np = np.asarray(keys)
    live = ~np.all(keys_np == np.uint64(0xFFFFFFFFFFFFFFFF), axis=-1)
    table, b_bits = PLK.build_table128(keys_np[:int(live.sum())])
    table_j = jnp.asarray(table)
    if len(_cache128) > 4:
        _cache128.clear()
    _cache128[ck] = (keys, table_j, b_bits)
    return table_j, b_bits


def lookup(keys: jnp.ndarray, queries: jnp.ndarray):
    """Drop-in replacement for host-level sops.lookup(keys, queries):
    builds/fetches the planar index for `keys` and answers the batch in
    HCHUNK-sized dispatches.  NOT for use inside jit (index build and
    chunking are host-side); inside jit use sops.lookup or the
    adjacency cache."""
    W = keys.shape[1]
    impl = _pick_impl(keys.shape[0], queries.reshape((-1, W)).shape[0])
    if impl == "join":
        # sort-merge-join (ops/sorted.lookup_join): three bandwidth-bound
        # passes over store+queries, no table build at all — wins when
        # the batch is large relative to the store
        from . import sorted as sops
        qshape = queries.shape[:-1]
        q = queries.reshape((-1, W))
        N = q.shape[0]
        if N <= HCHUNK:
            idx, found = sops.lookup_join(keys, q)
            return idx.reshape(qshape), found.reshape(qshape)
        idxs, founds = [], []
        for s in range(0, N, HCHUNK):
            i, f = sops.lookup_join(keys, q[s:s + HCHUNK])
            idxs.append(i)
            founds.append(f)
        return (jnp.concatenate(idxs).reshape(qshape),
                jnp.concatenate(founds).reshape(qshape))
    if impl == "fused":
        from .pallas import lookup as PLK
        table, b_bits = get_index128_for(keys)
        qshape = queries.shape[:-1]
        q = queries.reshape((-1, W))
        N = q.shape[0]
        if N <= HCHUNK:
            idx, found = PLK.lookup_fused(table, q, b_bits, W)
            return idx.reshape(qshape), found.reshape(qshape)
        idxs, founds = [], []
        for s in range(0, N, HCHUNK):
            i, f = PLK.lookup_fused(table, q[s:s + HCHUNK], b_bits, W)
            idxs.append(i)
            founds.append(f)
        return (jnp.concatenate(idxs).reshape(qshape),
                jnp.concatenate(founds).reshape(qshape))
    table, b_bits = get_index_for(keys)
    # cap the per-dispatch bucket-row gather temp (chunk x P*EPR u32) at
    # ~0.8 GB ONLY when the resident table is itself large (100M+-kmer
    # stores); small stores keep the full HCHUNK the 62M/s tuning used
    P = 2 * W + 1
    chunk = HCHUNK
    if table.size * 4 > (2 << 30):
        chunk = min(HCHUNK, max(1 << 18, (800 << 20) // (P * EPR * 4)))
    qshape = queries.shape[:-1]
    q = queries.reshape((-1, W))
    N = q.shape[0]
    if N <= chunk:
        idx, found = lookup_planar(table, q, b_bits, W)
        return idx.reshape(qshape), found.reshape(qshape)
    idxs, founds = [], []
    for s in range(0, N, chunk):
        i, f = lookup_planar(table, q[s:s + chunk], b_bits, W)
        idxs.append(i)
        founds.append(f)
    return (jnp.concatenate(idxs).reshape(qshape),
            jnp.concatenate(founds).reshape(qshape))
