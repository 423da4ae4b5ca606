"""Graph construction from reads: the TPU map-shuffle-reduce build.

Role of ref src/tools/build_graph.c (hot loop build_graph_from_str_mt,
build_graph.c:122): split reads on quality/N/homopolymer, extract every
kmer, canonicalise, count coverage and record edge bits between
consecutive kmers.  Here a whole read batch is processed as one fused
device computation (SURVEY.md §7 mapping 2): rolling extraction is
O(log k) vector passes, records are aggregated by sort + segmented
reduction instead of per-kmer hash probes + atomics.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import nwords
from ..ops import kmer as kops
from ..ops import sorted as sops
from . import store as gstore


def mask_reads(bases: jnp.ndarray, quals: jnp.ndarray | None = None,
               fq_cutoff: int = 0, hp_cutoff: int = 0) -> jnp.ndarray:
    """Apply quality/homopolymer masking by overwriting bases with the
    invalid code 4 (the reference instead splits reads at these points:
    ref seq_reader.h:25 seq_contig_start2 — masking a base is equivalent,
    it breaks every kmer window covering it).

    quals: phred+0 integer array same shape as bases (or None);
    fq_cutoff: bases with qual < cutoff masked (0 = off);
    hp_cutoff: mask bases in homopolymer runs >= cutoff (0 = off).
    """
    invalid = jnp.uint8(4)
    if quals is not None and fq_cutoff > 0:
        bases = jnp.where(quals < fq_cutoff, invalid, bases)
    if hp_cutoff > 0:
        # run length ending at i, computed with log2 doubling
        same_prev = jnp.concatenate(
            [jnp.zeros_like(bases[..., :1], dtype=bool),
             (bases[..., 1:] == bases[..., :-1]) & (bases[..., 1:] < 4)],
            axis=-1)
        # run[i] = number of consecutive same-prev ending at i
        run = same_prev.astype(jnp.int32)
        d = 1
        L = bases.shape[-1]
        while d < hp_cutoff:
            shifted = jnp.concatenate(
                [jnp.zeros_like(run[..., :d]), run[..., :-d]], axis=-1)
            run = jnp.where(run == d, run + shifted, run)
            d *= 2
        bases = jnp.where(run + 1 >= hp_cutoff, invalid, bases)
    return bases


@functools.partial(jax.jit, static_argnames=("k",))
def reads_to_records(bases: jnp.ndarray, k: int):
    """Extract (key, orient, edge_byte, valid) for every kmer occurrence.

    bases: (B, L) uint8 codes (4 = invalid/pad).
    Returns keys (B, L, W), edge bytes (B, L) uint8, valid (B, L) bool.

    Edge semantics (ref: db_node.h nuc_orient_to_edge, db_graph.c
    db_graph_add_edge): for the occurrence at position i with key
    orientation o, a following base b contributes bit (b + 4*o)
    — and a preceding base p contributes bit (comp(p) + 4*(1-o)), which
    is the symmetric half of the edge between kmers i-1 and i recorded
    from i's side.
    """
    B, L = bases.shape
    if L < k:   # no window fits: all records sentinel
        from ..ops import sorted as _so
        return (_so.sentinel((B, L), nwords(k)),
                jnp.zeros((B, L), jnp.uint8), jnp.zeros((B, L), bool))
    kmers, valid = kops.rolling_kmers(bases, k)
    keys, orient = kops.canonical(kmers, k)

    nxt = jnp.concatenate(
        [bases[:, k:], jnp.full((B, k), 4, dtype=bases.dtype)], axis=1)
    prv = jnp.concatenate(
        [jnp.full((B, 1), 4, dtype=bases.dtype), bases[:, :-1]], axis=1)
    valid_next = jnp.concatenate(
        [valid[:, 1:], jnp.zeros((B, 1), bool)], axis=1) & valid
    valid_prev = jnp.concatenate(
        [jnp.zeros((B, 1), bool), valid[:, :-1]], axis=1) & valid

    o = orient.astype(jnp.uint8)
    fw_bit = (jnp.uint8(1) << ((nxt & 3) + (o << 2))).astype(jnp.uint8)
    rv_bit = (jnp.uint8(1) << (((3 - (prv & 3)) & 3)
                               + ((1 - o) << 2))).astype(jnp.uint8)
    ebyte = jnp.where(valid_next, fw_bit, 0) | jnp.where(valid_prev, rv_bit, 0)
    keys = jnp.where(valid[..., None], keys, sops.sentinel((B, L), keys.shape[-1]))
    return keys, ebyte.astype(jnp.uint8), valid


@functools.partial(jax.jit, static_argnames=("k", "ncols", "colour"))
def count_batch(bases: jnp.ndarray, k: int, ncols: int, colour: int):
    """One build epoch: reads -> aggregated unique (keys, covg, edges).

    Returns (keys (M, W), covg (M, ncols), edges (M, ncols), n_unique)
    with M = B*L (static bound), compacted, sentinel padded, sorted.
    """
    B, L = bases.shape
    keys, ebyte, valid = reads_to_records(bases, k)
    # only the first L-k+1 positions can hold a valid window: slicing
    # them off statically cuts the sort volume ~12% at k=31 (24% at 63)
    Lv = max(L - k + 1, 1)
    M = B * Lv
    W = keys.shape[-1]
    flat_keys = keys[:, :Lv].reshape(M, W)
    covg = jnp.zeros((M, ncols), jnp.uint32)
    covg = covg.at[:, colour].set(
        valid[:, :Lv].reshape(M).astype(jnp.uint32))
    edges = jnp.zeros((M, ncols), jnp.uint8)
    edges = edges.at[:, colour].set(ebyte[:, :Lv].reshape(M))
    skeys, scovg, sedges = sops.sort_by_key(flat_keys, covg, edges)
    return sops.unique_reduce(skeys, scovg, sedges, M)


@functools.partial(jax.jit, static_argnames=("k", "ncols", "colour",
                                             "interpret", "sort_impl"))
def count_batch_fused(bases: jnp.ndarray, k: int, ncols: int, colour: int,
                      interpret: bool = False,
                      sort_impl: str | None = None):
    """count_batch with the aggregation on the Pallas segreduce kernel.

    Pipeline: rolling extraction -> 32-bit-plane key sort (the edge byte
    rides as a sort operand, so values never need a perm gather) ->
    ops/pallas/segreduce.segreduce_compact (covg/edge aggregation +
    stream compaction in one VMEM pass).  ~2.5x the XLA count_batch on
    v5e: the scatter/gather reduce passes it replaces are element-
    latency-bound (see segreduce.py).  Same contract as count_batch.
    """
    from ..ops.pallas import segreduce as _sr

    B, L = bases.shape
    # only the first L-k+1 positions can hold a valid window: slicing
    # them off statically cuts the sort volume ~12% at k=31 (24% at 63)
    Lv = max(L - k + 1, 1)
    M = B * Lv
    W = nwords(k)
    if W <= 2:
        # fused Pallas front-end: rolling pack + canonicalise + edges
        # in one VMEM pass (ops/pallas/frontend.py); limb planes for
        # k <= 63
        from ..ops.pallas import frontend as _fe
        planes = _fe.records_fused(bases, k, interpret=interpret,
                                   with_valid=False)
        bc0 = jax.lax.bitcast_convert_type
        ops = tuple(bc0(p[:, :Lv].reshape(M), jnp.uint32)
                    for p in planes[:2 * W])
        ops += (bc0(planes[2 * W][:, :Lv].reshape(M), jnp.uint32),)
    else:
        keys, ebyte, valid = reads_to_records(bases, k)
        flat = keys[:, :Lv].reshape(M, W)
        ops = ()
        for w in range(W):
            ops += ((flat[:, w] >> jnp.uint64(32)).astype(jnp.uint32),
                    flat[:, w].astype(jnp.uint32))
        ops += (ebyte[:, :Lv].reshape(M).astype(jnp.uint32),)
    sorted_ops = _sort_planes32(ops, num_keys=2 * W, impl=sort_impl,
                                interpret=interpret)
    Ms = sorted_ops[0].shape[0]          # >= M when the bitonic path pads
    bc = jax.lax.bitcast_convert_type
    kp = tuple(bc(p, jnp.int32) for p in sorted_ops[:2 * W])
    pad = (-Ms) % _sr.BLK
    if pad:
        kp = tuple(jnp.concatenate([p, jnp.full(pad, -1, jnp.int32)])
                   for p in kp)
    e32 = sorted_ops[2 * W].astype(jnp.int32)
    if pad:
        e32 = jnp.concatenate([e32, jnp.zeros(pad, jnp.int32)])
    ok, oc, oe, n = _sr.segreduce_compact(kp, e32, interpret=interpret)
    ok = [bc(p, jnp.uint32)[:M] for p in ok]
    keys_out = jnp.stack(
        [ok[2 * w].astype(jnp.uint64) << jnp.uint64(32)
         | ok[2 * w + 1].astype(jnp.uint64) for w in range(W)], axis=-1)
    covg = jnp.zeros((M, ncols), jnp.uint32)
    covg = covg.at[:, colour].set(bc(oc[:M], jnp.uint32))
    edges = jnp.zeros((M, ncols), jnp.uint8)
    edges = edges.at[:, colour].set(oe[:M].astype(jnp.uint8))
    return keys_out, covg, edges, n


def count_batch_best(bases, k: int, ncols: int, colour: int):
    """count_batch via the Pallas kernel on TPU, XLA elsewhere."""
    if jax.default_backend() == "cpu":
        return count_batch(bases, k, ncols, colour)
    return count_batch_fused(bases, k, ncols, colour,
                             sort_impl=SORT_IMPL)


# ---------------------------------------------------------------------------
# 2-bit read packing: host->device transfers carry 0.25 B/base (+1/8 B
# N-mask only when a batch actually has Ns) instead of 1 B/base.  The
# axon tunnel moves ~22 MB/s, so H2D dominated the end-to-end build
# (VERDICT r4 weak item 3: 21.5M obs/s e2e vs 318M in-epoch); on local
# hardware it still quarters PCIe traffic.  The device-side decode is
# two vector ops over the batch (~tens of µs against HBM), fused into
# the same program as the epoch.
# ---------------------------------------------------------------------------

def pack_reads_np(codes: np.ndarray):
    """(B, L) uint8 base codes (4 = N/pad) -> (packed (B, ceil(L/4))
    uint8, nmask (B, ceil(L/8)) uint8 | None, L).  Base j sits at bits
    2*(j%4) of packed byte j//4; nmask bit j%8 of byte j//8 marks an
    invalid base.  nmask is None when the batch has no invalid bases."""
    B, L = codes.shape
    L4 = -(-L // 4) * 4
    c = codes
    if L4 != L:
        c = np.concatenate(
            [c, np.zeros((B, L4 - L), np.uint8)], axis=1)
    q = (c & 3).reshape(B, L4 // 4, 4)
    packed = (q[:, :, 0] | (q[:, :, 1] << 2) | (q[:, :, 2] << 4)
              | (q[:, :, 3] << 6)).astype(np.uint8)
    if not (codes >= 4).any():
        return packed, None, L
    L8 = -(-L // 8) * 8
    m = (codes >= 4)
    if L8 != L:
        m = np.concatenate([m, np.zeros((B, L8 - L), bool)], axis=1)
    mb = m.reshape(B, L8 // 8, 8)
    nmask = np.zeros((B, L8 // 8), np.uint8)
    for j in range(8):
        nmask |= mb[:, :, j].astype(np.uint8) << j
    return packed, nmask, L


def unpack_reads(packed: jnp.ndarray, nmask, L: int) -> jnp.ndarray:
    """Inverse of pack_reads_np on device (traceable; L static)."""
    B = packed.shape[0]
    shifts = jnp.array([0, 2, 4, 6], jnp.uint8)
    codes = ((packed[:, :, None] >> shifts[None, None, :])
             & jnp.uint8(3)).reshape(B, -1)[:, :L]
    if nmask is not None:
        mshift = jnp.array(range(8), jnp.uint8)
        bad = ((nmask[:, :, None] >> mshift[None, None, :])
               & jnp.uint8(1)).reshape(B, -1)[:, :L]
        codes = jnp.where(bad != 0, jnp.uint8(4), codes)
    return codes.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("L", "k", "ncols",
                                             "colour"))
def _count_batch_packed(packed, nmask, L: int, k: int, ncols: int,
                        colour: int):
    bases = unpack_reads(packed, nmask, L)
    if jax.default_backend() == "cpu":
        return count_batch(bases, k, ncols, colour)
    return count_batch_fused(bases, k, ncols, colour,
                             sort_impl=SORT_IMPL)


def count_batch_host(bases_np: np.ndarray, k: int, ncols: int,
                     colour: int):
    """count_batch_best for a HOST batch: 2-bit pack on host, ship the
    packed planes, decode + epoch in one device program."""
    packed, nmask, L = pack_reads_np(np.asarray(bases_np))
    pd = jax.device_put(packed)
    nd = jax.device_put(nmask) if nmask is not None else None
    return _count_batch_packed(pd, nd, L, k, ncols, colour)


# Sort backend for the fused device paths: "lax" = jax.lax.sort,
# "bitonic" = ops/pallas/bitonic (fused-VMEM bitonic network).  Module
# global read at TRACE time — flip before the first call (bench A/Bs
# both; MCTX_SORT env overrides).
SORT_IMPL = __import__("os").environ.get("MCTX_SORT", "lax")


def _sort_planes32(ops, num_keys: int, impl: str | None = None,
                   interpret: bool = False):
    """Sort u32 planes by the first num_keys planes.  The bitonic path
    pads to a power-of-two multiple of its block (key pad = sentinel
    0xFFFFFFFF sorts last; value pad = 0) and returns the padded length
    — callers slice; the sorted live prefix is unaffected."""
    impl = impl or "lax"
    if impl == "lax64" and num_keys % 2:
        impl = "lax"   # pair fusion covers planes [0, 2*(num_keys//2));
                       # an odd key plane would be silently dropped
    if impl == "lax64":
        # halve the comparator key count: fuse (hi, lo) u32 pairs into
        # u64 keys for the sort, split back after (unsigned order is
        # identical; x64 mode keeps u64 native)
        fused = tuple(
            ops[2 * w].astype(jnp.uint64) << jnp.uint64(32)
            | ops[2 * w + 1].astype(jnp.uint64)
            for w in range(num_keys // 2)) + ops[num_keys:]
        out = jax.lax.sort(fused, num_keys=num_keys // 2,
                           is_stable=False)
        planes = ()
        for w in range(num_keys // 2):
            planes += ((out[w] >> jnp.uint64(32)).astype(jnp.uint32),
                       out[w].astype(jnp.uint32))
        return planes + out[num_keys // 2:]
    if impl == "mp":
        # merge-path sort: bitonic local runs + one-data-pass merge tree
        from ..ops.pallas import mergepath as _mpk
        M = ops[0].shape[0]
        blk = _mpk._r_blk_for(len(ops)) * _mpk.LANES
        nruns = max(1, 1 << (max((M + blk - 1) // blk, 1) - 1)
                    .bit_length())
        Mp = nruns * blk
        if Mp != M:
            ops = tuple(jnp.concatenate(
                [x, jnp.full(Mp - M,
                             0xFFFFFFFF if i < num_keys else 0,
                             jnp.uint32)])
                for i, x in enumerate(ops))
        return _mpk.sort_planes_mp(ops, num_keys=num_keys,
                                   interpret=interpret)
    if impl != "bitonic":
        # every consumer aggregates equal keys (segreduce sum/OR), so
        # tie order is free — is_stable=False cuts the 2-key sort from
        # 24.2ms to 16.0ms at 7.4M records on v5e (scripts/perf_lab5b)
        return jax.lax.sort(ops, num_keys=num_keys, is_stable=False)
    from ..ops.pallas import bitonic as _bt
    M = ops[0].shape[0]
    Mp = max(_bt.BLK, 1 << (M - 1).bit_length())
    if Mp != M:
        ops = tuple(jnp.concatenate(
            [x, jnp.full(Mp - M,
                         0xFFFFFFFF if i < num_keys else 0, jnp.uint32)])
            for i, x in enumerate(ops))
    return _bt.sort_planes(ops, num_keys=num_keys, interpret=interpret)


def _merge2(ak, ac, ae, bk, bc, be):
    """Merge two SORTED sentinel-padded record arrays by rank
    (searchsorted + scatter): O(n+m) memory and O(n log m) work — no
    sort scratch (XLA's TPU sort OOMs ~100M records).  HOST-orchestrated:
    each chunk/pass is its own device execution so no single program
    runs long enough to trip relay watchdogs."""
    n, m = ak.shape[0], bk.shape[0]
    ra = _add_iota(sops.searchsorted_chunked(bk, ak))
    rb = _add_iota(sops.searchsorted_chunked(ak, bk, side="right"))
    W, C = ak.shape[1], ac.shape[1]
    keys = sops.scatter_chunked(
        sops.scatter_chunked(sops.sentinel((n + m,), W), ra, ak), rb, bk)
    covg = sops.scatter_chunked(
        sops.scatter_chunked(jnp.zeros((n + m, C), ac.dtype), ra, ac),
        rb, bc)
    edges = sops.scatter_chunked(
        sops.scatter_chunked(jnp.zeros((n + m, C), ae.dtype), ra, ae),
        rb, be)
    ok, oc, oe, _ = sops.unique_reduce_host(keys, covg, edges, n + m)
    return ok, oc, oe


@jax.jit
def _add_iota(r):
    return jnp.arange(r.shape[0], dtype=jnp.int32) + r


def _searchsorted_right(sorted_keys, queries):
    from ..ops.kmer import mw_lt
    M, W = sorted_keys.shape
    if W == 1:
        return jnp.searchsorted(sorted_keys[:, 0], queries[..., 0],
                                side="right").astype(jnp.int32)
    qshape = queries.shape[:-1]
    lo = jnp.zeros(qshape, dtype=jnp.int32)
    hi = jnp.full(qshape, M, dtype=jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(M, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        kmid = sorted_keys[jnp.clip(mid, 0, M - 1)]
        le = ~mw_lt(queries, kmid)  # kmid <= q
        lo = jnp.where(le, mid + 1, lo)
        hi = jnp.where(le, hi, mid)
    return lo


# (round 4) merges never spill to host by level any more — the axon
# tunnel round trip dwarfed the merge itself at 100M records.  See
# the residency-aware ceilings below: oversized merges switch to the
# rank-scatter _merge2 and stay on device; the host native merge
# remains for already-numpy inputs and >160M-record totals.


def _to_np(item):
    lvl, kk, cc, ee = item
    return (lvl, np.asarray(kk), np.asarray(cc), np.asarray(ee))


def _merge2_np(ak, ac, ae, bk, bc, be):
    """Host merge of two sorted sentinel-padded record arrays.

    Uses the native C++ two-pointer merge (native/merge.cpp, ~5-10x the
    numpy pipeline at 100M records) when the library is available, the
    vectorised numpy path otherwise."""
    out = _merge2_native(ak, ac, ae, bk, bc, be)
    if out is not None:
        return out
    n, m = len(ak), len(bk)
    W, C = ak.shape[1], ac.shape[1]
    if W == 1:
        ra = np.arange(n) + np.searchsorted(bk[:, 0], ak[:, 0], "left")
        rb = np.arange(m) + np.searchsorted(ak[:, 0], bk[:, 0], "right")
    else:
        av = _np_keyview(ak)
        bv = _np_keyview(bk)
        ra = np.arange(n) + np.searchsorted(bv, av, "left")
        rb = np.arange(m) + np.searchsorted(av, bv, "right")
    keys = np.full((n + m, W), sops.SENTINEL64, np.uint64)
    covg = np.zeros((n + m, C), ac.dtype)
    edges = np.zeros((n + m, C), ae.dtype)
    keys[ra], keys[rb] = ak, bk
    covg[ra], covg[rb] = ac, bc
    edges[ra], edges[rb] = ae, be
    # combine duplicate adjacent keys
    same = (keys[1:] == keys[:-1]).all(axis=1)
    first = np.concatenate([[True], ~same])
    seg = np.cumsum(first) - 1
    U = int(seg[-1]) + 1
    cov_out = np.zeros((U, C), np.uint64)
    np.add.at(cov_out, seg, covg)
    edg_out = np.zeros((U, C), np.uint8)
    np.bitwise_or.at(edg_out, seg, edges)
    keys_out = np.full_like(keys, sops.SENTINEL64)
    keys_out[:U] = keys[first]
    covg2 = np.zeros_like(covg)
    covg2[:U] = np.minimum(cov_out, np.iinfo(np.uint32).max)
    edges2 = np.zeros_like(edges)
    edges2[:U] = edg_out
    return keys_out, covg2.astype(ac.dtype), edges2


def _merge2_native(ak, ac, ae, bk, bc, be):
    import ctypes
    from ..native import get_lib
    lib = get_lib()
    if lib is None:
        return None
    n, m = len(ak), len(bk)
    W, C = ak.shape[1], ac.shape[1]
    ak = np.ascontiguousarray(ak, np.uint64)
    bk = np.ascontiguousarray(bk, np.uint64)
    ac = np.ascontiguousarray(ac, np.uint32)
    bc = np.ascontiguousarray(bc, np.uint32)
    ae = np.ascontiguousarray(ae, np.uint8)
    be = np.ascontiguousarray(be, np.uint8)
    ok = np.full((n + m, W), sops.SENTINEL64, np.uint64)
    oc = np.zeros((n + m, C), np.uint32)
    oe = np.zeros((n + m, C), np.uint8)
    fn = lib.mctx_merge_records
    fn.restype = ctypes.c_long
    p64 = ctypes.POINTER(ctypes.c_uint64)
    p32 = ctypes.POINTER(ctypes.c_uint32)
    p8 = ctypes.POINTER(ctypes.c_uint8)
    nout = fn(ak.ctypes.data_as(p64), ac.ctypes.data_as(p32),
              ae.ctypes.data_as(p8), ctypes.c_long(n),
              bk.ctypes.data_as(p64), bc.ctypes.data_as(p32),
              be.ctypes.data_as(p8), ctypes.c_long(m),
              ctypes.c_int(W), ctypes.c_int(C),
              ok.ctypes.data_as(p64), oc.ctypes.data_as(p32),
              oe.ctypes.data_as(p8))
    if nout < 0:
        return None
    return ok, oc, oe


def _np_keyview(a):
    """Structured view for lexicographic multiword searchsorted."""
    W = a.shape[1]
    dt = np.dtype([(f"w{i}", ">u8") for i in range(W)])
    return np.ascontiguousarray(a.byteswap()).view(dt).reshape(-1)


def build(reads_batches, k: int, ncols: int = 1,
          capacity: int | None = None) -> gstore.DBGraph:
    """Build a graph from an iterable of (bases (B,L) np.uint8, colour).

    Host-side driver (role of ref build_graph.c:257 build_graph): each
    batch is aggregated on device, then folded into the store with
    binary-counter (LSM-style) merges.  Every device op has a FIXED
    shape per size level, so the whole build compiles O(log n_batches)
    programs; merges whose estimated temps + the resident LSM stack
    exceed the device ceilings use the O(n+m) rank-scatter path (still
    on device), then the host native merge as a last resort.
    """
    from collections import deque

    global _PROF
    prof = _BuildProf() if __import__("os").environ.get(
        "MCTX_BUILD_PROF") else None
    _PROF = prof

    stack = []  # [(level, keys, covg, edges)] — at most one per level
    # BUILD_DEPTH-deep dispatch pipeline: batches i+1..i+D are enqueued
    # before batch i's live count is consumed, and every count is
    # host-fetched ASYNCHRONOUSLY right after dispatch — on the axon
    # tunnel each blocking int(n) is a full RPC round trip, so the
    # fetches now overlap later epochs instead of serialising them
    # (VERDICT r2 item 3: close the end-to-end vs epoch gap).
    pending: deque = deque()

    def _resident_bytes(exclude=None):
        def _item_bytes(it):
            b = 0
            if not isinstance(it[1], np.ndarray):
                W_, C_ = it[1].shape[1], it[2].shape[1]
                b = it[1].shape[0] * (8 * W_ + 5 * C_)
            if len(it) == 6 and it[5] is not None:
                # lazy item: the un-fetched merge inputs are still
                # device-resident until _resolve drops them
                b += sum(_item_bytes(x) for x in it[5])
            return b

        tot = 0
        for it in stack:
            if it is not exclude:
                tot += _item_bytes(it)
        for (kk, cc, ee, _nu), _b, _c in pending:
            tot += kk.shape[0] * (8 * kk.shape[1] + 5 * cc.shape[1])
        return tot

    def fold(item):
        while stack and stack[-1][0] == item[0]:
            other = stack.pop()
            item = _merge_items(item, other,
                                resident_bytes=_resident_bytes())
        stack.append(item)
        # proactive residency relief: each lazy item retains its two
        # concrete inputs (~2x the stack's live bytes) until resolved.
        # Wide-C builds (joint calling) cross the chip's HBM on that
        # doubling alone — resolve early instead of OOM-thrashing
        if _resident_bytes() > RESIDENT_SOFT_MAX:
            _heal_residency()

    drains = [0]

    def _dispatch(bases, colour):
        if isinstance(bases, tuple) and len(bases) == 3:
            # pre-staged batch (packed_dev, nmask_dev|None, L): reads
            # already on device — measures the build pipeline without
            # ingest H2D (and serves callers that staged ahead)
            packed, nmask, L = bases
            return _count_batch_packed(packed, nmask, L, k, ncols,
                                       colour)
        if isinstance(bases, np.ndarray):
            # host batch: 2-bit pack -> 4x less H2D (tunnel/PCIe bound)
            return count_batch_host(bases, k, ncols, colour)
        return count_batch_best(jnp.asarray(bases), k, ncols, colour)

    def _heal_residency():
        # free device memory before a retry: resolve every lazy merge
        # item (their retained un-compacted inputs are the big
        # buffers).  Wide-C builds (joint calling, C=10: 5x the bytes
        # per record) hit this — the epoch program's own allocation
        # fails while lazy inputs idle in HBM.
        for i_ in range(len(stack)):
            stack[i_] = _resolve(stack[i_])

    def drain_one():
        out, bases_, colour_ = pending.popleft()
        keys, covg, edges, nu = out
        t0 = time.perf_counter() if prof else 0.0
        try:
            n_live = int(nu)
        except jax.errors.JaxRuntimeError as e:
            # async epoch failure surfaces at the count fetch; heal
            # residency and re-enter the batch through dispatch_batch
            # so a still-exhausted chip gets the split ladder too (the
            # r5d joint10 retry died at device_put with HBM full)
            if not _merge_should_fallback(e):
                raise
            print("[mctx] batch epoch exhausted HBM at drain; "
                  "resolving lazy merges and re-dispatching",
                  file=__import__("sys").stderr)
            _heal_residency()
            dispatch_batch(bases_, colour_, depth=1)
            return
        if prof:
            prof.add("count_fetch", time.perf_counter() - t0)
            drains[0] += 1
            if drains[0] % 16 == 1:
                try:
                    ms = jax.devices()[0].memory_stats() or {}
                    print("build-prof: drain %d hbm_in_use=%.2fGB" % (
                        drains[0],
                        ms.get("bytes_in_use", 0) / 2**30),
                        file=__import__("sys").stderr)
                except Exception:
                    pass
        fold(_compact_item(keys, covg, edges, n_live))

    def _split_rows(bases):
        if isinstance(bases, tuple) and len(bases) == 3:
            packed, nmask, L = bases
            h = packed.shape[0] // 2
            return ((packed[:h], None if nmask is None else nmask[:h],
                     L),
                    (packed[h:], None if nmask is None else nmask[h:],
                     L))
        h = bases.shape[0] // 2
        return bases[:h], bases[h:]

    def dispatch_batch(bases, colour, depth=0):
        try:
            out = _dispatch(bases, colour)
        except jax.errors.JaxRuntimeError as e:
            if not _merge_should_fallback(e):
                raise
            print("[mctx] batch epoch exhausted HBM; resolving lazy "
                  "merges and retrying",
                  file=__import__("sys").stderr)
            while pending:
                drain_one()
            _heal_residency()
            try:
                out = _dispatch(bases, colour)
            except jax.errors.JaxRuntimeError as e2:
                nrows = (bases[0] if isinstance(bases, tuple)
                         else bases).shape[0]
                if (not _merge_should_fallback(e2) or depth >= 4
                        or nrows < 2):
                    raise
                print("[mctx] still exhausted; splitting batch %d -> "
                      "2 x %d rows" % (nrows, nrows // 2),
                      file=__import__("sys").stderr)
                for half in _split_rows(bases):
                    dispatch_batch(half, colour, depth + 1)
                return
        _async_fetch(out[3])
        pending.append((out, bases, colour))
        if len(pending) >= BUILD_DEPTH:
            drain_one()

    for bases, colour in reads_batches:
        t0 = time.perf_counter() if prof else 0.0
        dispatch_batch(bases, colour)
        if prof:
            prof.add("batch_dispatch", time.perf_counter() - t0)
    while pending:
        drain_one()
    if not stack:
        return gstore.empty(k, capacity or 1024, ncols)
    item = stack.pop()
    while stack:
        item = _merge_items(item, stack.pop(),
                            resident_bytes=_resident_bytes())
    item = _resolve(item)
    _, keys, covg, edges = item
    t0 = time.perf_counter() if prof else 0.0
    if isinstance(keys, np.ndarray):
        live = ~(keys == sops.SENTINEL64).all(axis=1)
        n = int(live.sum())
        g = gstore.DBGraph(keys=jnp.asarray(keys),
                           covg=jnp.asarray(covg),
                           edges=jnp.asarray(edges),
                           n=jnp.asarray(n, jnp.int64), k=k)
    else:
        is_start, _ = sops.segment_bounds(keys)
        n = jnp.sum(is_start & ~sops.is_sentinel(keys))
        g = gstore.DBGraph(keys=keys, covg=covg, edges=edges,
                           n=n.astype(jnp.int64), k=k)
    if capacity and capacity != g.capacity:
        g = gstore.merge_records(gstore.empty(k, capacity, ncols),
                                 g.keys, g.covg, g.edges)
    g = gstore.compacted(g)
    if prof:
        g.keys.block_until_ready()
        prof.add("final_assembly", time.perf_counter() - t0)
        prof.report()
    return g


class _BuildProf:
    """Wall-clock breakdown of build() (enable with MCTX_BUILD_PROF=1).

    Host-side section timers; async device work charges to whichever
    section blocks on it (count-fetch / host-merge fetches), which is
    exactly the end-to-end attribution we need."""

    def __init__(self):
        self.t = {}
        self.n = {}

    def add(self, key, dt):
        self.t[key] = self.t.get(key, 0.0) + dt
        self.n[key] = self.n.get(key, 0) + 1

    def report(self):
        import sys
        tot = sum(self.t.values())
        for key in sorted(self.t, key=self.t.get, reverse=True):
            print("build-prof: %-16s %8.1fs  (%5.1f%%, n=%d)"
                  % (key, self.t[key], 100 * self.t[key] / max(tot, 1e-9),
                     self.n[key]), file=sys.stderr)


_PROF = None

MIN_LEVEL = 1 << 15
# epochs in flight before a live count is consumed: at depth 3 the r5b
# E.coli profile still blocked 21 ms per count fetch and 39 ms per lazy
# merge resolve (the transfers complete only after the producing
# program runs; a deeper queue hides that).  ~51 MB of pending epoch
# output per slot at the bench shape — trivial beside HBM.
BUILD_DEPTH = int(__import__("os").environ.get("MCTX_BUILD_DEPTH", 6))


def _async_fetch(n):
    """Start the device->host copy of a scalar without blocking; the
    later int(n) then completes from the in-flight transfer."""
    try:
        n.copy_to_host_async()
    except Exception:
        pass


def _compact_item(keys, covg, edges, n_live: int):
    """Slice a sorted sentinel-padded record array down to the next
    power-of-two capacity holding its live prefix.  The LSM previously
    carried full observation-sized tails through every merge; on
    duplicate-heavy (real-coverage) data the deduped live prefix is a
    small fraction, so merges now scale with UNIQUE kmers.  Power-of-two
    capacities keep the compiled-program count O(log n)."""
    cap = MIN_LEVEL
    while cap < n_live:
        cap *= 2
    cap = min(cap, keys.shape[0])
    return (cap, keys[:cap], covg[:cap], edges[:cap])


# Memory model of one device merge (bitonic path): padded input planes +
# merged planes + segreduce outputs + the original record arrays come to
# ~110 bytes per pow2-padded element at W=1,C=1.  Merges estimated over
# the budget use the rank-scatter _merge2 (O(n+m) memory, no sort
# scratch) and STAY ON DEVICE — round-tripping GBs through the axon
# tunnel is what made 100Mb-genome builds 20x slower than E.coli-sized
# ones (round-3 scale logs: host spills above the old 32M-record
# SPILL_LEVEL dominated wall-clock).

# below this size a full re-sort (lax) is fine; above it, exploiting
# input sortedness via the one-pass merge-path kernel wins and avoids
# the lax.sort scratch blowup (~100M records)
BITONIC_MERGE_MIN = int(__import__("os").environ.get(
    "MCTX_MERGE_MIN", 16 << 20))


def _merge_est_bytes(na, nb, W, C):
    # merge-path peak: padded input plane copies + merged output planes
    # (+ pallas double buffering) + segreduce outputs + the original
    # record arrays + compaction slack — all linear in na+nb.  The
    # first 100Mb run OOM'd a 64M+64M merge with a 75B/record model and
    # a 10GB budget (the LSM stack's other levels are also resident),
    # hence the fatter constant and 8GB default.
    return (4 * (2 * W + 2 * C) * 4 + 2 * (8 * W + 4 * C + C) + 12) \
        * (na + nb)


# blunt record-count gate forcing merges to the host native path.
# OFF by default since round 5: the r5c 100Mb profile showed the two
# >160M-record top merges cost 688s of spill fetch + 30s host merge +
# 82s re-upload through the ~22MB/s tunnel, while the rank-scatter
# estimate (46B/record ~ 8.3GB at 180M records) fits the 16GB chip —
# and the RESOURCE_EXHAUSTED self-heal chain makes an optimistic
# device attempt safe (worst case: one failed allocation, then the
# same host path).  Set MCTX_MERGE_HOST_MIN to restore a hard cutoff.
MERGE_HOST_MIN = int(__import__("os").environ.get(
    "MCTX_MERGE_HOST_MIN", 1 << 62))
# device ceilings for the two merge engines, counting estimated temps
# PLUS the resident LSM stack (passed by build's fold)
MERGE_MP_CEIL = int(__import__("os").environ.get(
    "MCTX_MERGE_MP_CEIL", 8 << 30))
MERGE_RANK_CEIL = int(__import__("os").environ.get(
    "MCTX_MERGE_RANK_CEIL", 13 << 30))
# soft cap on estimated device residency (stack + retained lazy
# inputs + pending epochs); above it build() resolves lazy merges
# eagerly to free the retained inputs
RESIDENT_SOFT_MAX = int(__import__("os").environ.get(
    "MCTX_RESIDENT_SOFT_MAX", 9 << 30))


def _rank_est_bytes(na, nb, W, C):
    # rank-scatter peak: inputs + scattered outputs + rank arrays +
    # unique_reduce temps — all linear, no sort scratch
    return (2 * (8 * W + 4 * C + C) + 8 + 12) * (na + nb)


# (W, C) record signatures whose fused merge program killed the
# compiler this process — routed straight to rank-scatter thereafter
_FUSED_MERGE_BAD: set = set()


def _merge_should_fallback(e) -> bool:
    """Errors the merge fallback chain self-heals: HBM exhaustion AND
    compiler death (the round-5 10-colour joint build hit an axon
    remote-compile HTTP 500 / tpu_compile_helper crash on the 22-plane
    C=10 merge program; rank-scatter compiles fine and produces the
    identical result, so falling back beats dying 80 minutes into a
    build)."""
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "remote_compile" in s
            or "tpu_compile_helper" in s or "INTERNAL" in s)


def _resolve(item):
    """Resolve a LAZY merge item — a 6-tuple carrying the un-compacted
    merge output, its in-flight live count, and the input items for the
    OOM retry — into the standard (cap, keys, covg, edges) tuple.

    The int(n) here completes a device->host transfer that started at
    merge dispatch; by the time the NEXT fold touches the item, later
    batch epochs have overlapped both the transfer and the merge's
    device work.  Blocking on every merge inline serialised the build
    at ~one tunnel round trip per fold (E.coli warm: 1.6s of 2.1s in
    merge stalls; VERDICT r4 weak item 3)."""
    if len(item) == 4:
        return item
    lvl, mk, mc, me, n, ab = item
    prof = _PROF
    t0 = time.perf_counter() if prof else 0.0
    try:
        n_live = int(n)
    except jax.errors.JaxRuntimeError as e:
        # async RESOURCE_EXHAUSTED surfaces at the deferred fetch: run
        # the same self-healing chain the eager path used, against the
        # retained inputs
        if not _merge_should_fallback(e) or ab is None:
            raise
        import sys as _sys
        a, b = ab
        print("[mctx] deferred merge of %d+%d records exhausted HBM; "
              "retrying via rank-scatter"
              % (a[1].shape[0], b[1].shape[0]), file=_sys.stderr)
        try:
            mk, mc, me = _merge2(a[1], a[2], a[3], b[1], b[2], b[3])
        except jax.errors.JaxRuntimeError as e2:
            if not _merge_should_fallback(e2):
                raise
            print("[mctx] rank-scatter also exhausted HBM; host "
                  "native merge", file=_sys.stderr)
            an, bn = _to_np(a), _to_np(b)
            mk, mc, me = _merge2_np(an[1], an[2], an[3],
                                    bn[1], bn[2], bn[3])
        if prof:
            prof.add("dev_merge_rank", time.perf_counter() - t0)
        return (mk.shape[0], mk, mc, me)
    if prof:
        prof.add("merge_resolve", time.perf_counter() - t0)
    return _compact_item(mk, mc, me, n_live)


def _merge_items(a, b, resident_bytes: int = 0):
    prof = _PROF
    a = _resolve(a)
    b = _resolve(b)
    lvl = max(a[0], b[0])
    host = isinstance(a[1], np.ndarray) or isinstance(b[1], np.ndarray) \
        or (a[1].shape[0] + b[1].shape[0]) > MERGE_HOST_MIN
    if host:
        t0 = time.perf_counter() if prof else 0.0
        a = _to_np(a)
        b = _to_np(b)
        if prof:
            prof.add("spill_fetch", time.perf_counter() - t0)
            t0 = time.perf_counter()
        mk, mc, me = _merge2_np(a[1], a[2], a[3], b[1], b[2], b[3])
        if prof:
            prof.add("host_merge", time.perf_counter() - t0)
        return (mk.shape[0], mk, mc, me)
    na, nb = a[1].shape[0], b[1].shape[0]
    W, C = a[1].shape[1], a[2].shape[1]
    force_dev = bool(__import__("os").environ.get(
        "MCTX_FORCE_DEV_MERGE"))           # CPU test hook (interpret)
    if jax.default_backend() != "cpu" or force_dev:
        t0 = time.perf_counter() if prof else 0.0
        if (_merge_est_bytes(na, nb, W, C) + resident_bytes
                > MERGE_MP_CEIL):
            if (_rank_est_bytes(na, nb, W, C) + resident_bytes
                    > MERGE_RANK_CEIL):
                # cannot fit beside the resident store at all: host
                return _merge_items(_to_np(a), b)
            # oversized merge: rank scatter, O(n+m) memory, on device.
            # Same self-healing as the mp branch below: the memory
            # model has underestimated twice already (ROUND4.md), so a
            # RESOURCE_EXHAUSTED here falls back to the host native
            # merge instead of crashing the build.
            try:
                mk, mc, me = _merge2(a[1], a[2], a[3], b[1], b[2], b[3])
            except jax.errors.JaxRuntimeError as e:
                if not _merge_should_fallback(e):
                    raise
                import sys as _sys
                print("[mctx] rank-scatter merge of %d+%d records "
                      "exhausted HBM; host native merge" % (na, nb),
                      file=_sys.stderr)
                an, bn = _to_np(a), _to_np(b)
                mk, mc, me = _merge2_np(an[1], an[2], an[3],
                                        bn[1], bn[2], bn[3])
            if prof:
                prof.add("dev_merge_rank", time.perf_counter() - t0)
            return (mk.shape[0], mk, mc, me)
        impl = SORT_IMPL
        if max(na, nb) >= BITONIC_MERGE_MIN and impl == "lax":
            impl = "mp"
        if (W, C) in _FUSED_MERGE_BAD:
            # a fused merge at this record signature already killed the
            # compiler this process (wide-C plane counts; r5 joint
            # build): go straight to rank-scatter, don't pay another
            # ~60s failing remote compile per LSM level
            mk, mc, me = _merge2(a[1], a[2], a[3], b[1], b[2], b[3])
            if prof:
                prof.add("dev_merge_rank", time.perf_counter() - t0)
            return (mk.shape[0], mk, mc, me)
        try:
            # NOTE: no buffer donation here — the RESOURCE_EXHAUSTED
            # fallback below must be able to retry with the same inputs
            mk, mc, me, n = merge_sorted_fused(a[1], a[2], a[3],
                                               b[1], b[2], b[3],
                                               sort_impl=impl,
                                               interpret=force_dev)
            _async_fetch(n)
        except jax.errors.JaxRuntimeError as e:
            if not _merge_should_fallback(e):
                raise
            if "RESOURCE_EXHAUSTED" not in str(e):
                _FUSED_MERGE_BAD.add((W, C))   # compiler death, not size
            # the static budget can't see the rest of the LSM stack's
            # residency — self-heal with the O(n+m) rank-scatter merge
            import sys as _sys
            print("[mctx] merge of %d+%d records failed (%s); "
                  "retrying via rank-scatter" % (na, nb, str(e)[:80]),
                  file=_sys.stderr)
            try:
                mk, mc, me = _merge2(a[1], a[2], a[3],
                                     b[1], b[2], b[3])
            except jax.errors.JaxRuntimeError as e2:
                if not _merge_should_fallback(e2):
                    raise
                print("[mctx] rank-scatter also exhausted HBM; host "
                      "native merge", file=_sys.stderr)
                an, bn = _to_np(a), _to_np(b)
                mk, mc, me = _merge2_np(an[1], an[2], an[3],
                                        bn[1], bn[2], bn[3])
            if prof:
                prof.add("dev_merge_rank", time.perf_counter() - t0)
            return (mk.shape[0], mk, mc, me)
        if prof:
            prof.add("dev_merge_l%d" % max(1, lvl).bit_length(),
                     time.perf_counter() - t0)
        # LAZY: compaction needs the live count on host; defer that
        # fetch to the next fold that touches this item (_resolve), so
        # the merge and its count transfer overlap later batch epochs.
        # The level key is the sum of the input capacities (a pow2 when
        # the fold rule merged equals), keeping the binary-counter
        # schedule deterministic without host data.  Inputs ride along
        # for the deferred-OOM retry.
        return (a[0] + b[0], mk, mc, me, n, (a, b))
    mk, mc, me = _merge2(a[1], a[2], a[3], b[1], b[2], b[3])
    return (mk.shape[0], mk, mc, me)


@functools.partial(jax.jit, static_argnames=("interpret", "sort_impl"))
def merge_sorted_fused(ak, ac, ae, bk, bc, be, interpret: bool = False,
                       sort_impl: str | None = None):
    """Device merge of two sorted sentinel-padded record arrays via
    concat -> 32-bit-plane sort -> Pallas segreduce (covg summed per
    colour, edges OR-ed).  Replaces _merge2's rank-scatter +
    segment-sum pipeline, whose element-granular scatters dominate
    end-to-end build wall-clock at genome scale (they are ~25x slower
    than sort+kernel at the same record count on v5e).

    With sort_impl == "mp" the inputs' sortedness is fully exploited:
    ops/pallas/mergepath merges in ONE data pass (merge-path block
    decomposition; no pow2-matched padding, so asymmetric merges cost
    their true size).  "bitonic" is the older clean-stage variant
    (log(M) passes)."""
    if sort_impl == "mp":
        from ..ops.pallas import mergepath as _mp
        W, C = ak.shape[1], ac.shape[1]
        np_ = 2 * W + 2 * C
        blk = _mp._r_blk_for(np_) * _mp.LANES

        def planes_padded(k_, c_, e_):
            ops = _record_planes(k_, c_, e_)
            n = ops[0].shape[0]
            padn = (-n) % blk
            if not padn:
                return ops
            return tuple(jnp.concatenate(
                [x, jnp.full(padn,
                             0xFFFFFFFF if i < 2 * W else 0, jnp.uint32)])
                for i, x in enumerate(ops))

        Ma, Mb = ak.shape[0], bk.shape[0]
        merged = _mp.merge_path_planes(planes_padded(ak, ac, ae),
                                       planes_padded(bk, bc, be),
                                       num_keys=2 * W,
                                       interpret=interpret)
        return _aggregate_sorted(merged, W, C, Ma + Mb,
                                 interpret=interpret)
    if sort_impl == "bitonic":
        from ..ops.pallas import bitonic as _bt
        Ma, Mb = ak.shape[0], bk.shape[0]
        Mp = max(_bt.BLK, 1 << (max(Ma, Mb) - 1).bit_length())
        W, C = ak.shape[1], ac.shape[1]

        def planes_padded(k_, c_, e_):
            ops = _record_planes(k_, c_, e_)
            n = ops[0].shape[0]
            if n == Mp:
                return ops
            return tuple(jnp.concatenate(
                [x, jnp.full(Mp - n,
                             0xFFFFFFFF if i < 2 * W else 0, jnp.uint32)])
                for i, x in enumerate(ops))

        merged = _bt.merge_planes(planes_padded(ak, ac, ae),
                                  planes_padded(bk, bc, be),
                                  num_keys=2 * W, interpret=interpret)
        return _aggregate_sorted(merged, W, C, Ma + Mb,
                                 interpret=interpret)
    return reduce_records_fused(
        jnp.concatenate([ak, bk]), jnp.concatenate([ac, bc]),
        jnp.concatenate([ae, be]), interpret=interpret,
        sort_impl=sort_impl)


def _record_planes(keys, covg, edges):
    """(M,W) u64 keys + (M,C) covg/edges -> tuple of u32 planes
    (key planes most significant first, then covg, then edges)."""
    W, C = keys.shape[1], covg.shape[1]
    ops = ()
    for w in range(W):
        ops += ((keys[:, w] >> jnp.uint64(32)).astype(jnp.uint32),
                keys[:, w].astype(jnp.uint32))
    for c in range(C):
        ops += (covg[:, c],)
    for c in range(C):
        ops += (edges[:, c].astype(jnp.uint32),)
    return ops


def _aggregate_sorted(sorted_ops, W, C, M_out, interpret=False):
    """Shared tail of reduce_records_fused/merge_sorted_fused: Pallas
    segreduce over already-sorted u32 planes, reassembled to (M_out, W)
    keys + (M_out, C) covg/edges + live count."""
    from ..ops.pallas import segreduce as _sr

    bc_ = jax.lax.bitcast_convert_type
    Ms = sorted_ops[0].shape[0]
    pad = (-Ms) % _sr.BLK

    def p32(x, fill):
        y = bc_(x, jnp.int32)
        if pad:
            y = jnp.concatenate([y, jnp.full(pad, fill, jnp.int32)])
        return y

    kp = tuple(p32(x, -1) for x in sorted_ops[:2 * W])
    sums = tuple(p32(x, 0) for x in sorted_ops[2 * W:2 * W + C])
    ors = tuple(p32(x, 0) for x in sorted_ops[2 * W + C:])
    okeys, _cnt, osums, oors, n = _sr.segreduce_compact_multi(
        kp, sums, ors, interpret=interpret)
    keys_out = jnp.stack(
        [bc_(okeys[2 * w], jnp.uint32)[:M_out].astype(jnp.uint64)
         << jnp.uint64(32)
         | bc_(okeys[2 * w + 1], jnp.uint32)[:M_out].astype(jnp.uint64)
         for w in range(W)], axis=-1)
    covg_out = jnp.stack(
        [bc_(osums[c], jnp.uint32)[:M_out] for c in range(C)], axis=-1)
    edges_out = jnp.stack(
        [oors[c][:M_out].astype(jnp.uint8) for c in range(C)], axis=-1)
    return keys_out, covg_out, edges_out, n


@functools.partial(jax.jit, static_argnames=("interpret", "sort_impl"))
def reduce_records_fused(keys, covg, edges, interpret: bool = False,
                         sort_impl: str | None = None):
    """Sort + aggregate one unaggregated record array on the Pallas
    kernel: (keys (M,W), covg (M,C), edges (M,C)) -> same shapes,
    sorted unique records at the front + live count.  The device
    replacement for sops.sort_by_key + unique_reduce everywhere a store
    is (re)built (graph/store.from_records / merge_records)."""
    M, W = keys.shape
    C = covg.shape[1]
    sorted_ops = _sort_planes32(_record_planes(keys, covg, edges),
                                num_keys=2 * W, impl=sort_impl,
                                interpret=interpret)
    return _aggregate_sorted(sorted_ops, W, C, M, interpret=interpret)


class PcrDupFilter:
    """PCR duplicate removal (ref build_graph.c:35-96): a read (or pair)
    is dropped iff ALL its start kmers were previously seen as read
    starts in the same orientation (2 bits per kmer, `readstrt`).

    Fully vectorised (VERDICT r1 item 6 — the per-read dict loop was the
    scale bomb): start kmers for a whole batch are computed on device;
    (key, orientation) tokens are matched against an LSM of sorted
    token runs with numpy searchsorted, and the within-batch sequential
    semantics ("seen by an earlier read in this stream") reduce to a
    min-read-index-per-token computation, exactly equivalent to the
    reference's sequential loop: a dropped read's tokens are already
    seen, so marking all reads' tokens equals marking kept reads' only.
    """

    def __init__(self, k: int):
        from ..constants import nwords
        self.k = k
        self.W = nwords(k)
        self._runs = []   # LSM: sorted void-token arrays

    def _tokens(self, keys: np.ndarray, orient: np.ndarray) -> np.ndarray:
        comb = np.concatenate(
            [keys, orient[:, None].astype(np.uint64)], axis=1)
        return np.ascontiguousarray(comb).view(
            np.dtype((np.void, 8 * (self.W + 1)))).ravel()

    def _in_store(self, toks: np.ndarray) -> np.ndarray:
        out = np.zeros(len(toks), bool)
        for run in self._runs:
            if len(run) == 0 or len(toks) == 0:
                continue
            i = np.minimum(np.searchsorted(run, toks), len(run) - 1)
            out |= run[i] == toks
        return out

    def _add(self, toks: np.ndarray):
        if len(toks) == 0:
            return
        self._runs.append(np.unique(toks))
        while len(self._runs) >= 2 and \
                len(self._runs[-1]) >= len(self._runs[-2]):
            b = self._runs.pop()
            a = self._runs.pop()
            self._runs.append(np.unique(np.concatenate([a, b])))

    def _start_info(self, bases: np.ndarray):
        bj = jnp.asarray(bases[:, :self.k])
        valid = (bases[:, :self.k] < 4).all(axis=1) & \
            (bases.shape[1] >= self.k)
        keys, orient = kops.canonical(kops.pack_kmers(bj, self.k), self.k)
        return np.asarray(keys), np.asarray(orient), valid

    def filter_batch(self, bases: np.ndarray,
                     bases2: np.ndarray | None = None) -> np.ndarray:
        """Returns keep mask.  For pairs, a pair is dropped only if BOTH
        mates' start kmers were seen (ref: all start kmers seen)."""
        N = len(bases)
        k1, o1, v1 = self._start_info(bases)
        t1 = self._tokens(k1, o1)
        sides = [(t1, v1)]
        if bases2 is not None:
            k2, o2, v2 = self._start_info(bases2)
            sides.append((self._tokens(k2, o2), v2))

        # min read index per token within this batch ("seen by an
        # earlier read in the stream")
        pool = np.concatenate([t[v] for t, v in sides])
        ridx = np.concatenate(
            [np.nonzero(v)[0] for _t, v in sides]).astype(np.int64)
        if len(pool):
            order = np.lexsort((ridx, pool))
            sp, sr = pool[order], ridx[order]
            first = np.ones(len(sp), bool)
            first[1:] = sp[1:] != sp[:-1]
            utok = sp[first]
            umin = sr[first]      # min read idx: lexsort is stable
        else:
            utok = pool
            umin = ridx

        def seen_of(t, v):
            seen = np.zeros(N, bool)
            if v.any():
                tv = t[v]
                s = self._in_store(tv)
                i = np.minimum(np.searchsorted(utok, tv),
                               max(len(utok) - 1, 0))
                if len(utok):
                    s |= (utok[i] == tv) & \
                        (umin[i] < np.nonzero(v)[0])
                seen[v] = s
            return seen

        seen1 = seen_of(*sides[0])
        if bases2 is None:
            all_seen = seen1 & v1
        else:
            seen2 = seen_of(*sides[1])
            v2 = sides[1][1]
            any_token = v1 | v2
            # AND over present tokens only (absent mate is neutral)
            all_seen = any_token & \
                np.where(v1, seen1, True) & np.where(v2, seen2, True)
        self._add(pool)
        return ~all_seen
