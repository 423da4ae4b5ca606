"""Sorted-array primitives: the TPU replacement for the reference's
open-addressing kmer hash table (ref: src/graph/hash_table.c).

The graph's kmer set lives as a sorted (N, W) uint64 key array; lookups are
batched binary searches, inserts are sort-merge epochs, duplicate records
are combined with segmented reductions.  Padding slots hold SENTINEL
(all-ones), which can never be a valid kmer (k odd => top bits of word 0
are always zero) and sorts after every real key.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .kmer import mw_lt, mw_eq

U64 = jnp.uint64
SENTINEL64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def sentinel(shape_prefix, W: int) -> jnp.ndarray:
    return jnp.full(tuple(shape_prefix) + (W,), SENTINEL64, dtype=U64)


def is_sentinel(keys: jnp.ndarray) -> jnp.ndarray:
    """True where a key slot is padding (all ones)."""
    return jnp.all(keys == SENTINEL64, axis=-1)


def sort_by_key(keys: jnp.ndarray, *vals):
    """Sort records by multiword key; returns (keys_sorted, vals_sorted...).

    keys: (N, W); vals: arrays with leading dim N (any trailing shape).
    Values ride along via an argsort permutation so dtypes/shapes are free.
    Each uint64 word is decomposed into (hi, lo) uint32 sort keys: TPU
    has no native 64-bit compare, so a 2W-key 32-bit lexicographic sort
    is much faster than an emulated W-key 64-bit one.

    NOT stable on ties: every caller aggregates equal keys afterwards
    (unique_reduce sum/OR), and is_stable=False is ~1.5x faster on TPU.
    """
    N, W = keys.shape
    iota = jnp.arange(N, dtype=jnp.int32)
    ops = ()
    for w in range(W):
        ops += ((keys[:, w] >> jnp.uint64(32)).astype(jnp.uint32),
                keys[:, w].astype(jnp.uint32))
    perm = jax.lax.sort(ops + (iota,), num_keys=2 * W,
                        is_stable=False)[-1]
    out_vals = tuple(v[perm] for v in vals)
    return (keys[perm],) + out_vals


def searchsorted_mw(sorted_keys: jnp.ndarray, queries: jnp.ndarray):
    """First index i with sorted_keys[i] >= query (side='left'), vectorised.

    sorted_keys: (M, W) ascending (sentinel padding at the end is fine);
    queries: (..., W).  Returns int32 (...,).

    Replaces hash probing (ref: hash_table.c:169 find_or_insert): a batched
    binary search is ~log2(M) gathers, fully vectorised on the VPU.
    """
    M, W = sorted_keys.shape
    if W == 1:
        # XLA's native searchsorted lowering beats the hand-rolled loop
        return jnp.searchsorted(
            sorted_keys[:, 0], queries[..., 0], side="left").astype(
                jnp.int32)
    qshape = queries.shape[:-1]
    lo = jnp.zeros(qshape, dtype=jnp.int32)
    hi = jnp.full(qshape, M, dtype=jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(M, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        kmid = sorted_keys[jnp.clip(mid, 0, M - 1)]
        less = mw_lt(kmid, queries)  # kmid < q
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


def lookup(sorted_keys: jnp.ndarray, queries: jnp.ndarray):
    """Return (idx, found) for each query key; idx is the slot of the key
    if found (else insertion point, clipped).  Sentinel queries -> not
    found."""
    M, W = sorted_keys.shape
    idx = searchsorted_mw(sorted_keys, queries)
    idxc = jnp.clip(idx, 0, M - 1)
    found = mw_eq(sorted_keys[idxc], queries) & ~is_sentinel(queries)
    return idxc, found


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def lookup_join(sorted_keys: jnp.ndarray, queries: jnp.ndarray,
                variant: str = "lax", interpret: bool = False):
    """Bulk exact lookup by sort-merge-join: (idx, found) per query, idx
    is the store row when found else 0.

    Replaces Q independent probes (one bucket-row gather each, the
    row-issue-rate-bound ceiling of ops/hashidx.py) with three
    bandwidth-bound passes: one unstable plane sort of the store+query
    concatenation, two keep-nearest associative scans, and one 1-key
    unsort sort.  Cost scales with (N+Q)*log, independent of query
    pattern — wins when the batch is large (Q within ~2x of N).
    TPU analogue of a sort-merge join; the reference's equivalent
    workload is the per-kmer probe loop (src/graph/hash_table.c:84).

    sorted_keys: (N, W) ascending with sentinel padding; queries (Q, W).

    variant="mp" replaces the concat sort with a merge-path pipeline
    (query-only mp sort + one-pass merge against the already-sorted
    store, mp unsort) — bench A/B'd; exact either way.
    """
    N, W = sorted_keys.shape
    q = queries.reshape((-1, W))
    Q = q.shape[0]
    u32 = jnp.uint32

    planes = ()
    for w in range(W):
        planes += (jnp.concatenate(
            [(sorted_keys[:, w] >> jnp.uint64(32)).astype(u32),
             (q[:, w] >> jnp.uint64(32)).astype(u32)]),)
        planes += (jnp.concatenate(
            [sorted_keys[:, w].astype(u32), q[:, w].astype(u32)]),)
    # payload: pos in low 31 bits, query flag in the top bit
    packed = jnp.concatenate(
        [jnp.arange(N, dtype=u32),
         jnp.arange(Q, dtype=u32) | u32(0x80000000)])
    if variant == "mp":
        from .pallas import mergepath as _mpk
        blk = _mpk._r_blk_for(2 * W + 1) * _mpk.LANES
        # store planes (already sorted) + pos payload, padded to blk
        spad = (-N) % blk
        sp = ()
        for w in range(W):
            sp += (_pad_u32((sorted_keys[:, w] >> jnp.uint64(32))
                            .astype(u32), spad, 0xFFFFFFFF),)
            sp += (_pad_u32(sorted_keys[:, w].astype(u32), spad,
                            0xFFFFFFFF),)
        sp += (_pad_u32(jnp.arange(N, dtype=u32), spad, 0),)
        # query planes mp-sorted (pad to blk * pow2)
        nruns = max(1, 1 << (max((Q + blk - 1) // blk, 1) - 1)
                    .bit_length())
        qpad = nruns * blk - Q
        qp = ()
        for w in range(W):
            qp += (_pad_u32((q[:, w] >> jnp.uint64(32)).astype(u32),
                            qpad, 0xFFFFFFFF),)
            qp += (_pad_u32(q[:, w].astype(u32), qpad, 0xFFFFFFFF),)
        # pad queries' packed payload with rank 0x7FFFFFFE: >= Q so it
        # slices off in the unsort, NOT all-ones so it never ties with
        # the kernel's masked-fill records.  The packed plane rides as
        # an extra KEY plane here: with a payload plane, live
        # sentinel-key rows tie with the kernel's +inf masked fills and
        # can lose their payload (a query rank) to a fill — as keys,
        # ties only happen between identical records.
        qp += (_pad_u32(jnp.arange(Q, dtype=u32) | u32(0x80000000),
                        qpad, 0xFFFFFFFE),)
        qs = _mpk.sort_planes_mp(qp, num_keys=2 * W + 1,
                                 interpret=interpret)
        out = _mpk.merge_path_planes(sp, qs, num_keys=2 * W + 1,
                                     interpret=interpret)
    else:
        out = jax.lax.sort(planes + (packed,), num_keys=2 * W,
                           is_stable=False)
    mkeys, mp = out[:2 * W], out[2 * W]
    is_store = (mp >> u32(31)) == u32(0)
    pos = mp & u32(0x7FFFFFFF)

    # a query matches iff its EQUAL-KEY RUN contains a store element
    # (store keys are unique, so at most one per run).  Segmented
    # max-propagation of (is_store ? pos : -1) by doubling passes with
    # boundary resets — the associative_scan pytree formulation OOM'd
    # the TPU AOT compiler at 8M records; this shifted-select pattern
    # (as sops.segmented_or / segreduce._seg_scan_fwd) compiles flat.
    Mm = pos.shape[0]
    bound = jnp.zeros((Mm,), bool)
    for i in range(2 * W):
        bound = bound | jnp.concatenate(
            [jnp.ones((1,), bool), mkeys[i][1:] != mkeys[i][:-1]])
    val0 = jnp.where(is_store, pos.astype(jnp.int32), -1)

    def seg_max(val, bnd):
        # inclusive forward segmented max scan
        f = bnd.astype(jnp.int32)
        v = val
        iota = jnp.arange(Mm, dtype=jnp.int32)
        d = 1
        while d < Mm:
            vd = jnp.concatenate([jnp.full(d, -1, jnp.int32), v[:-d]])
            fd = jnp.concatenate([jnp.zeros(d, jnp.int32), f[:-d]])
            before = iota < d
            take = (f == 0) & ~before
            v = jnp.where(take, jnp.maximum(v, vd), v)
            f = jnp.where(before, f, f | fd)
            d *= 2
        return v

    mf = seg_max(val0, bound)
    # backward: flip, with boundaries shifted to the run's other end
    bound_r = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.flip(bound[1:])])
    mb = jnp.flip(seg_max(jnp.flip(val0), bound_r))
    best = jnp.maximum(mf, mb)
    sent = jnp.ones_like(is_store)
    for i in range(2 * W):
        sent = sent & (mkeys[i] == u32(0xFFFFFFFF))
    found = (best >= 0) & ~is_store & ~sent
    idx = jnp.where(found, best, 0).astype(u32)

    # unsort: queries keep their rank, store rows sort last and are
    # sliced off
    rank = jnp.where(is_store, u32(0xFFFFFFFF), pos)
    res = idx | found.astype(u32) << u32(31)
    if variant == "mp":
        from .pallas import mergepath as _mpk
        blk = _mpk._r_blk_for(2) * _mpk.LANES
        Mm = rank.shape[0]
        nruns = max(1, 1 << (max((Mm + blk - 1) // blk, 1) - 1)
                    .bit_length())
        upad = nruns * blk - Mm
        # same key-not-payload trick for the unsort: rank is unique
        # among live rows, so (rank, res) as a 2-key sort never loses a
        # res to a masked fill; pad ranks 0xFFFFFFFE stay distinguishable
        # from fills
        rout = _mpk.sort_planes_mp(
            (_pad_u32(rank, upad, 0xFFFFFFFE), _pad_u32(res, upad, 0)),
            num_keys=2, interpret=interpret)[1]
    else:
        _, rout = jax.lax.sort((rank, res), num_keys=1, is_stable=False)
    rq = rout[:Q]
    return ((rq & u32(0x7FFFFFFF)).astype(jnp.int32).reshape(
                queries.shape[:-1]),
            ((rq >> u32(31)) == u32(1)).reshape(queries.shape[:-1]))


def _pad_u32(x, padn, fill):
    if padn == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full(padn, np.uint32(fill), jnp.uint32)])


def segment_bounds(sorted_keys: jnp.ndarray):
    """For sorted keys: (is_start, seg_id, nseg_incl_sentinel)."""
    N = sorted_keys.shape[0]
    neq = ~mw_eq(sorted_keys[1:], sorted_keys[:-1])
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    return is_start, seg_id


def segmented_or(vals: jnp.ndarray, seg_id: jnp.ndarray, num_segments: int):
    """Bitwise-OR of vals over segments.  vals: (N, ...) unsigned ints,
    seg_id ascending.  Memory-light: log2(N) shifted-OR passes (cumulative
    OR is monotone nondecreasing per element, so segment_max of the
    inclusive scan equals the segment OR)."""
    N = vals.shape[0]
    scan = vals
    d = 1
    while d < N:
        scan = _seg_or_pass(scan, seg_id, d)
        d *= 2
    return jax.ops.segment_max(scan, seg_id, num_segments=num_segments)


@functools.partial(jax.jit, static_argnames=("d",))
def _seg_or_pass(scan, seg_id, d: int):
    N = scan.shape[0]
    extra = scan.ndim - 1
    sid = seg_id.reshape((N,) + (1,) * extra)
    shifted = jnp.concatenate(
        [jnp.zeros_like(scan[:d]), scan[:-d]], axis=0)
    sseg = jnp.concatenate(
        [jnp.full_like(sid[:d], -1), sid[:-d]], axis=0)
    return scan | jnp.where(sseg == sid, shifted, jnp.zeros_like(shifted))


def unique_reduce_host(sorted_keys, covg, edges, num_out: int):
    """unique_reduce split into separate device executions (for inputs
    large enough that one fused program would trip relay watchdogs):
    bounds -> segment sums -> per-pass segmented OR -> compaction."""
    is_start, seg_id = _seg_bounds_jit(sorted_keys)
    valid_covg, valid_edges, valid = _mask_jit(sorted_keys, covg, edges)
    covg_out = _segsum_jit(valid_covg, seg_id, num_out)
    edges_out = segmented_or(valid_edges, seg_id, num_out)
    return _compact_jit(sorted_keys, covg, covg_out, edges_out, is_start,
                        seg_id, valid)


@jax.jit
def _seg_bounds_jit(sorted_keys):
    return segment_bounds(sorted_keys)


@jax.jit
def _mask_jit(sorted_keys, covg, edges):
    valid = ~is_sentinel(sorted_keys)
    return (covg * valid[:, None].astype(covg.dtype),
            edges * valid[:, None].astype(edges.dtype), valid)


@functools.partial(jax.jit, static_argnames=("num_out",))
def _segsum_jit(vals, seg_id, num_out: int):
    return jax.ops.segment_sum(vals, seg_id, num_segments=num_out)


@jax.jit
def _compact_jit(sorted_keys, covg, covg_out, edges_out, is_start, seg_id,
                 valid):
    num_out, W = covg_out.shape[0], sorted_keys.shape[1]
    keys_out = sentinel((num_out,), W)
    keys_out = keys_out.at[seg_id].set(
        jnp.where(valid[:, None], sorted_keys, keys_out[0]))
    n_unique = jnp.sum(is_start & valid)
    return (keys_out, covg_out.astype(covg.dtype),
            edges_out.astype(jnp.uint8), n_unique)


def unique_reduce(sorted_keys: jnp.ndarray, covg: jnp.ndarray,
                  edges: jnp.ndarray, num_out: int):
    """Combine duplicate adjacent keys: covg summed, edges OR-ed.

    sorted_keys: (N, W) ascending with sentinel padding last;
    covg: (N, C) uint32; edges: (N, C) uint8.
    Returns (keys (num_out, W), covg (num_out, C), edges (num_out, C),
    n_unique) — compacted to the front, sentinel padded.
    """
    N, W = sorted_keys.shape
    is_start, seg_id = segment_bounds(sorted_keys)
    valid = ~is_sentinel(sorted_keys)
    covg_out = jax.ops.segment_sum(
        covg * valid[:, None].astype(covg.dtype), seg_id,
        num_segments=num_out)
    edges_out = segmented_or(
        edges * valid[:, None].astype(edges.dtype), seg_id,
        num_segments=num_out)
    keys_out = sentinel((num_out,), W)
    keys_out = keys_out.at[seg_id].set(
        jnp.where(valid[:, None], sorted_keys, keys_out[0]))
    n_unique = jnp.sum(is_start & valid)
    return keys_out, covg_out.astype(covg.dtype), \
        edges_out.astype(edges.dtype), n_unique


CHUNK = 1 << 21  # single-op gather/scatter cap (larger faults v5e/axon)


def searchsorted_chunked(sorted_keys: jnp.ndarray, queries: jnp.ndarray,
                         side: str = "left") -> jnp.ndarray:
    """searchsorted with the query side processed in <=CHUNK pieces
    (device-op size cap; see pointer_doubling note in graph/unitigs.py)."""
    N = queries.shape[0]
    if N <= CHUNK:
        return _ss(sorted_keys, queries, side)
    outs = []
    for s in range(0, N, CHUNK):
        outs.append(_ss(sorted_keys, queries[s:s + CHUNK], side))
    return jnp.concatenate(outs)


def _ss(sorted_keys, queries, side):
    if side == "left":
        return searchsorted_mw(sorted_keys, queries)
    if sorted_keys.shape[1] == 1:
        return jnp.searchsorted(sorted_keys[:, 0], queries[..., 0],
                                side="right").astype(jnp.int32)
    from ..graph.build import _searchsorted_right
    return _searchsorted_right(sorted_keys, queries)


def scatter_chunked(dst: jnp.ndarray, idx: jnp.ndarray,
                    src: jnp.ndarray) -> jnp.ndarray:
    """dst.at[idx].set(src) applied in <=CHUNK pieces."""
    N = idx.shape[0]
    if N <= CHUNK:
        return dst.at[idx].set(src, mode="drop")
    for s in range(0, N, CHUNK):
        dst = dst.at[idx[s:s + CHUNK]].set(src[s:s + CHUNK], mode="drop")
    return dst
