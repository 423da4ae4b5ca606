"""Unitigs via pointer-doubling (SURVEY.md §7 mapping 5).

Role of ref src/graph/db_unitig.c: identify maximal non-branching runs.
The reference walks each unitig sequentially per thread; here every kmer
is a pair of vertices (i, orient) in a functional digraph with in/out
degree <= 1 (chains + cycles), and unitig membership/ends/positions are
resolved for ALL kmers at once in O(log N) pointer-jumping passes.

Vertex encoding: v = 2*i + orient.  succ[v] = vertex one step along the
unitig in that orientation, or -1 when the unitig ends (junction, dead
end, hairpin or self-loop — matching db_unitig_extend's stop conditions,
db_unitig.c:100-120).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..ops import kmer as kops
from ..ops import sorted as sops
from . import edges as E
from . import store as gstore

# nibble (popcount==1) -> nucleotide
_NIB2NUC = np.array([0, 0, 1, 0, 2, 0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0],
                    dtype=np.uint8)


@struct.dataclass
class UnitigView:
    """Per-kmer unitig labelling."""
    succ: jnp.ndarray      # (2N,) int32, -1 = end of unitig
    end: jnp.ndarray       # (2N,) int32 terminal vertex (self-ref if end)
    dist: jnp.ndarray      # (2N,) int32 steps to end (cycle: UNSPECIFIED
                           # — the pointer-doubling early exit can leave
                           # a stale 2^t here; cycle lengths come from
                           # `length`, never from dist)
    uid: jnp.ndarray       # (N,) int32 unitig id (a representative vertex)
    is_cycle: jnp.ndarray  # (N,) bool
    length: jnp.ndarray    # (N,) int32 unitig length in kmers


def successors(keys: jnp.ndarray, uedges: jnp.ndarray, k: int,
               adj: jnp.ndarray | None = None) -> jnp.ndarray:
    """succ[(2N,)] for all kmer-orientation vertices.

    uedges: union (across colours) edge byte per kmer.  Built from the
    cached adjacency (one gather per vertex) when available.  Very large
    stores (> adjacency.ADJ_FREE_N kmers) with no cached adjacency use
    direct probe sweeps instead — materialising the flat (8N,) adjacency
    beside the planar lookup table OOMs one chip at 100M+ kmers."""
    from . import adjacency as adjmod
    if adj is None:
        adj = adjmod.cached_adjacency_for(keys, k)
    if adj is None and keys.shape[0] > adjmod.ADJ_FREE_N:
        return _successors_direct(keys, uedges, k)
    if adj is None:
        adj = adjmod.get_adjacency_for(keys, k)
    return _successors_from_adj(uedges, adj)


def _successors_direct(keys: jnp.ndarray, uedges: jnp.ndarray, k: int):
    """Adjacency-free succ: one probe+lookup sweep per orientation (only
    the single-out-edge base is probed)."""
    from . import adjacency as adjmod
    from ..ops import hashidx
    outs = []
    for o in (0, 1):
        nuc = _succ_nuc(uedges, o)
        key2, o2 = adjmod.probe_var(keys, nuc, k, o)
        j, found = hashidx.lookup(keys, key2)
        outs.append(_succ_from_lookup(uedges, j, found, o2, o))
    return _interleave2(outs[0], outs[1])


@functools.partial(jax.jit, static_argnames=("o",))
def _succ_nuc(uedges: jnp.ndarray, o: int):
    nib = E.with_orientation(uedges, jnp.full(uedges.shape,
                                              o, jnp.uint8))
    return jnp.asarray(_NIB2NUC)[nib.astype(jnp.int32)]


@functools.partial(jax.jit, static_argnames=("o",))
def _succ_from_lookup(uedges, j, found, o2, o: int):
    N = uedges.shape[0]
    pop4 = jnp.asarray(E.POPCOUNT4)
    idx = jnp.arange(N, dtype=jnp.int32)
    oarr = jnp.full((N,), o, jnp.uint8)
    nib = E.with_orientation(uedges, oarr)
    single = pop4[nib.astype(jnp.int32)] == 1
    o2 = o2.astype(jnp.uint8)
    jc = jnp.maximum(j.astype(jnp.int32), 0)
    nib_in = E.with_orientation(uedges[jc], (jnp.uint8(1) - o2))
    indeg1 = pop4[nib_in.astype(jnp.int32)] == 1
    ok = single & found & indeg1 & (jc != idx)
    return jnp.where(ok, jc * 2 + o2.astype(jnp.int32), jnp.int32(-1))


@jax.jit
def _interleave2(a, b):
    N = a.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    succ = jnp.full((2 * N,), -1, jnp.int32)
    succ = succ.at[idx * 2].set(a)
    succ = succ.at[idx * 2 + 1].set(b)
    return succ


@jax.jit
def _successors_from_adj(uedges: jnp.ndarray, adj: jnp.ndarray):
    N = uedges.shape[0]
    nib2nuc = jnp.asarray(_NIB2NUC)
    pop4 = jnp.asarray(E.POPCOUNT4)
    idx = jnp.arange(N, dtype=jnp.int32)
    out = []
    for o in (0, 1):
        oarr = jnp.full((N,), o, jnp.uint8)
        nib = E.with_orientation(uedges, oarr)
        single = pop4[nib.astype(jnp.int32)] == 1
        nuc = nib2nuc[nib.astype(jnp.int32)]
        from . import adjacency as adjmod
        nv = adjmod.adj_at(adj, idx * 2 + o, nuc)
        found = nv >= 0
        j = jnp.maximum(nv, 0) >> 1
        o2 = (jnp.maximum(nv, 0) & 1).astype(jnp.uint8)
        nib_in = E.with_orientation(uedges[j], (jnp.uint8(1) - o2))
        indeg1 = pop4[nib_in.astype(jnp.int32)] == 1
        ok = single & found & indeg1 & (j != idx)
        out.append(jnp.where(ok, j * 2 + o2.astype(jnp.int32),
                             jnp.int32(-1)))
    # interleave via strided 1-D scatters: an (N, 2) stack intermediate
    # would be lane-padded 2->128 on TPU (64x memory)
    succ = jnp.full((2 * N,), -1, jnp.int32)
    succ = succ.at[idx * 2].set(out[0])
    succ = succ.at[idx * 2 + 1].set(out[1])
    return succ


def pointer_doubling(succ: jnp.ndarray):
    """Resolve (end, dist, minvertex) for every vertex in O(log V) passes.

    For chain vertices `end` is the terminal vertex and `dist` the exact
    number of steps to it.  For cycle vertices (detected via
    succ[end] != -1) `minv` is the minimum vertex id on the whole cycle.

    The doubling loop runs on HOST with one jitted dispatch per pass:
    a single long-running device program trips the execution watchdog on
    relayed TPU backends ("kernel fault" at ~4M vertices), and per-pass
    dispatch also keeps each program small.

    Random gathers are the whole cost (~100M elem/s on v5e whatever the
    pattern — CLAUDE.md), so (p, d) are packed into ONE uint64 plane (one
    gather per pass instead of three) and the loop exits as soon as every
    chain has converged: the per-pass change count, fetched one pass
    behind (async, overlapping device work), is strictly decreasing while
    any chain is unconverged, so two equal consecutive counts mean only
    cycle vertices (which rotate forever) remain.  Cycle minima are then
    resolved on a compacted host subset — cycles are typically a
    vanishing fraction of real graphs.
    """
    V = succ.shape[0]
    iota = jnp.arange(V, dtype=jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(V, 2)))) + 1)
    pk = _pd_init(succ)
    # chunk the gather pass at very large V: the one-shot pass peaks at
    # ~4.5x the packed array (in + indices + gather-out + new) beside a
    # 100M+-kmer store and its lookup table (round-4 100Mb clean OOM)
    nch = max(1, V // (48 << 20)) if V > (96 << 20) else 1
    prev_cnt = None
    pending = None  # (cnt_dev,) fetched one pass behind
    for t in range(steps):
        if nch == 1:
            pk, changed = _pd_step_packed(pk)
        else:
            pk, changed = _pd_step_chunked(pk, nch)
        if pending is not None:
            cnt = int(pending)
            if prev_cnt is not None and cnt == prev_cnt:
                break
            prev_cnt = cnt
        try:
            changed.copy_to_host_async()
        except Exception:
            pass
        pending = changed
    p, d = _pd_unpack(pk)
    # cycle labels on the compacted subset (usually empty); fetch the
    # full mask only when a device-side any() says cycles exist — the
    # dense bool plane is V bytes of D2H (10s at V=235M on the tunnel)
    cyc_mask = _pd_cyc_mask(succ, p)
    m = iota
    if bool(jnp.any(cyc_mask)):
        cyc = np.asarray(cyc_mask)
        idx = np.nonzero(cyc)[0].astype(np.int64)
        sub_succ = np.asarray(succ)[idx]
        # remap into the compact set: every cycle successor is a cycle
        # vertex, so searchsorted is exact
        sub = np.searchsorted(idx, sub_succ)
        sub_m = idx.astype(np.int64)
        for _ in range(max(1, int(np.ceil(np.log2(max(len(idx), 2)))) + 1)):
            sub_m = np.minimum(sub_m, sub_m[sub])
            sub = sub[sub]
        m_np = np.arange(V, dtype=np.int32)
        m_np[idx] = sub_m.astype(np.int32)
        m = jnp.asarray(m_np)
    return p, d, m


_PD_DMASK = jnp.uint64(0xFFFFFFFF)


@jax.jit
def _pd_init(succ):
    V = succ.shape[0]
    iota = jnp.arange(V, dtype=jnp.int32)
    p = jnp.where(succ < 0, iota, succ)
    d = jnp.where(succ < 0, 0, 1)
    return (p.astype(jnp.uint64) << jnp.uint64(32)) | d.astype(jnp.uint64)


@jax.jit
def _pd_step_packed(pk):
    p = (pk >> jnp.uint64(32)).astype(jnp.int32)
    at = jnp.take(pk, p, mode="clip")
    d = jnp.minimum((pk & _PD_DMASK) + (at & _PD_DMASK), _PD_DMASK)
    new = (at & ~_PD_DMASK) | d
    return new, (new != pk).sum(dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("nch",))
def _pd_step_chunked(pk, nch: int):
    """One doubling pass in `nch` chunk sub-passes inside ONE program:
    chunk results land in a preallocated output via
    dynamic_update_slice, so peak memory is in + out + one chunk's
    gather temps.  The previous host-loop version held every chunk
    output AND their concatenation beside pk simultaneously — that
    (~3x the packed plane) OOM'd the r5c 100Mb clean at V=235M.
    Chunks are equal-sized with the start clamped to V-size: the tail
    overlap recomputes identical values (the pass is elementwise-pure
    in pk), and the changed count stays strictly decreasing while any
    chain is unconverged, which is all the caller's convergence test
    needs."""
    V = pk.shape[0]
    size = -(-V // nch)

    def body(c, carry):
        out, changed = carry
        start = jnp.minimum(c * size, V - size)
        seg = jax.lax.dynamic_slice(pk, (start,), (size,))
        p = (seg >> jnp.uint64(32)).astype(jnp.int32)
        at = jnp.take(pk, p, mode="clip")
        d = jnp.minimum((seg & _PD_DMASK) + (at & _PD_DMASK), _PD_DMASK)
        new = (at & ~_PD_DMASK) | d
        ch = (new != seg).sum(dtype=jnp.int32)
        return (jax.lax.dynamic_update_slice(out, new, (start,)),
                changed + ch)

    out, changed = jax.lax.fori_loop(
        0, nch, body, (jnp.zeros_like(pk), jnp.zeros((), jnp.int32)))
    return out, changed


@jax.jit
def _pd_unpack(pk):
    return ((pk >> jnp.uint64(32)).astype(jnp.int32),
            (pk & _PD_DMASK).astype(jnp.int32))


@jax.jit
def _pd_cyc_mask(succ, p):
    return jnp.take(succ, p, mode="clip") >= 0


def unitig_view(keys: jnp.ndarray, uedges: jnp.ndarray, k: int) -> UnitigView:
    """Host orchestrator: jitted successor build + per-pass pointer
    doubling + a jitted tail.  NOT one jit — a single fused program runs
    long enough to trip relayed-TPU execution watchdogs at scale."""
    succ = successors(keys, uedges, k)
    end, dist, minv = pointer_doubling(succ)
    return _view_finish(keys, succ, end, dist, minv)


_view_cache: dict = {}


def cached_unitig_view(keys: jnp.ndarray, uedges: jnp.ndarray,
                       k: int) -> UnitigView:
    """unitig_view memoised on the (keys, uedges) buffer identities —
    clean/contigs/bubbles on the same store share one pointer-doubling
    pass (the hop walker and unitig_stats both consume it)."""
    ck = (id(keys), id(uedges), k)
    hit = _view_cache.get(ck)
    if hit is not None and hit[0] is keys and hit[1] is uedges:
        return hit[2]
    uv = unitig_view(keys, uedges, k)
    if len(_view_cache) > 4:
        _view_cache.clear()
    _view_cache[ck] = (keys, uedges, uv)
    return uv


@jax.jit
def _view_finish(keys, succ, end, dist, minv) -> UnitigView:
    N = keys.shape[0]
    e0, e1 = end[0::2], end[1::2]
    d0, d1 = dist[0::2], dist[1::2]
    cyc = succ[e0] >= 0  # chains terminate at a vertex with no successor
    uid_chain = jnp.minimum(e0, e1)
    uid_cycle = jnp.minimum(minv[0::2], minv[1::2])
    uid = jnp.where(cyc, uid_cycle, uid_chain)
    length = jnp.where(cyc, jnp.int32(0), d0 + d1 + 1)
    # cycle length = number of kmers with this uid; fill below via segsum
    ones = (~sops.is_sentinel(keys)).astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, uid, num_segments=2 * N)
    length = jnp.where(cyc, counts[uid], length)
    return UnitigView(succ=succ, end=end, dist=dist, uid=uid,
                      is_cycle=cyc, length=length)


def unitig_stats(g: gstore.DBGraph, k: int | None = None):
    """(uid, length, median_sum_covg, is_tip, extdeg_sum) per kmer.

    median coverage = median over the unitig's kmers of per-kmer
    sum-across-colours coverage (ref clean_graph.c:388 uses
    gca_median of db_node_sum_covg).  Tip: external degree at the two
    ends sums to <= 1 (ref clean_graph.c:289 nodes_are_tip).
    """
    k = k or g.k
    uedges = gstore.cached_union_edges(g)
    uv = cached_unitig_view(g.keys, uedges, k)
    return _stats_finish(g.keys, g.covg, uedges, uv)


@jax.jit
def _stats_finish(keys, covg, uedges, uv):
    N = keys.shape[0]
    sumcovg = jnp.sum(covg, axis=1).astype(jnp.uint32)
    live = ~sops.is_sentinel(keys)

    # median: sort (uid, covg) then index the middle of each segment
    # (32-bit operands: TPU-native sort; very large stores use the
    # bitonic path — lax.sort scratch blows up past ~100M records)
    ops = (uv.uid.astype(jnp.uint32), sumcovg.astype(jnp.uint32),
           jnp.arange(N, dtype=jnp.int32).astype(jnp.uint32))
    if N > (64 << 20) and jax.default_backend() != "cpu":
        from . import build as _gb
        sorted_ops = _gb._sort_planes32(ops, num_keys=2, impl="bitonic")
        s_uid = sorted_ops[0][:N].astype(jnp.int32)
        s_covg = sorted_ops[1][:N]
    else:
        s_uid, s_covg, _ = jax.lax.sort(ops, num_keys=2, is_stable=False)
        s_uid = s_uid.astype(jnp.int32)
    # segment starts in the sorted-by-uid order
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s_uid[1:] != s_uid[:-1]])
    seg_start_pos = jnp.where(first, jnp.arange(N, dtype=jnp.int32), 0)
    start_of = jax.ops.segment_max(seg_start_pos, s_uid,
                                   num_segments=2 * N)
    ln = uv.length
    start = start_of[uv.uid]
    # gca_median: odd -> mid; even -> mean of two middles (integer div)
    mid_hi = start + ln // 2
    mid_lo = start + (ln - 1) // 2
    mid_hi = jnp.clip(mid_hi, 0, N - 1)
    mid_lo = jnp.clip(mid_lo, 0, N - 1)
    median = ((s_covg[mid_lo].astype(jnp.uint64)
               + s_covg[mid_hi]) // 2).astype(jnp.uint32)

    # external degree at the unitig's two ends
    pop4 = jnp.asarray(E.POPCOUNT4)
    v_end0, v_end1 = uv.end[0::2], uv.end[1::2]

    def extdeg(v):
        i, o = v >> 1, (v & 1).astype(jnp.uint8)
        nib = E.with_orientation(uedges[i], o)
        return pop4[nib.astype(jnp.int32)]

    ext = extdeg(v_end0) + extdeg(v_end1)
    # that double counts for length-1 unitigs? no: end0 != end1 for all
    # chains (two distinct terminal vertices even for a single kmer)
    is_tip = (~uv.is_cycle) & (ext <= 1) & live
    return uv, median, is_tip, ext


# ---------------------------------------------------------------------------
# host-side unitig sequence extraction (for `mctx unitigs` / FASTA dump)
# ---------------------------------------------------------------------------

def extract_unitigs(g: gstore.DBGraph):
    """Return a list of unitig sequences (strings), normalised like
    ref db_unitig_normalise: linear unitigs start from the end with the
    smaller kmer key; cycles start at their lowest kmer key in FORWARD
    orientation.  Order: by unitig id (deterministic)."""
    from ..utils.text import kmers_to_strings
    n = int(g.n)
    if n == 0:
        return []
    k = g.k
    uv = unitig_view(g.keys, gstore.union_edges(g), k)
    succ = np.asarray(uv.succ)
    end = np.asarray(uv.end)
    dist = np.asarray(uv.dist)
    uid = np.asarray(uv.uid)[:n]
    cyc = np.asarray(uv.is_cycle)[:n]
    length = np.asarray(uv.length)[:n]
    keys = np.asarray(g.keys)

    out = []
    # ---- chains, fully vectorised ordering
    chain_rows = np.nonzero(~cyc)[0]
    if len(chain_rows):
        e0, e1 = end[2 * chain_rows], end[2 * chain_rows + 1]
        k0, k1 = keys[e0 >> 1], keys[e1 >> 1]
        # lexicographic row compare: key(e0) < key(e1)
        lt = _rows_lt(k0, k1)
        eq = (k0 == k1).all(axis=1)
        # start end = smaller key; on tie choose orientation-1 end so the
        # single kmer is emitted FORWARD
        e_start = np.where(lt, e0, e1)
        tie_pick = np.where((e0 & 1) == 1, e0, e1)
        e_start = np.where(eq, tie_pick, e_start)
        e_target = np.where(e_start == e0, e1, e0)
        o_along = np.where(end[2 * chain_rows] == e_target, 0, 1)
        v_along = 2 * chain_rows + o_along
        pos = length[chain_rows] - 1 - dist[v_along]
        order = np.lexsort((pos, uid[chain_rows]))
        rows_o = chain_rows[order]
        oal = o_along[order]
        okm = np.asarray(kops.oriented(
            jnp.asarray(keys[rows_o]), jnp.asarray(oal.astype(np.uint8)), k))
        lastb = (okm[:, -1] & 3).astype(np.uint8)
        kstrs = kmers_to_strings(okm, k)
        u_sorted = uid[rows_o]
        starts = np.nonzero(np.concatenate(
            [[True], u_sorted[1:] != u_sorted[:-1]]))[0]
        bounds = np.append(starts, len(u_sorted))
        basechars = "ACGT"
        for s, e in zip(bounds[:-1], bounds[1:]):
            seq = kstrs[s] + "".join(basechars[b] for b in lastb[s + 1:e])
            out.append(seq)
    # ---- cycles: sequential walk per cycle (rare, usually small)
    cyc_rows = np.nonzero(cyc)[0]
    if len(cyc_rows):
        done = set()
        keyj = jnp.asarray(keys)
        for u in np.unique(uid[cyc_rows]):
            members = cyc_rows[uid[cyc_rows] == u]
            # start at lowest key, FORWARD (ref db_unitig_normalise cycle)
            mk = keys[members]
            lowest = members[_rows_argmin(mk)]
            v = 2 * int(lowest) + 0
            seq_nucs = []
            first = True
            while True:
                i, o = v >> 1, v & 1
                okm = np.asarray(kops.oriented(
                    keyj[i][None], jnp.asarray([o], dtype=jnp.uint8), g.k))[0]
                if first:
                    seq_nucs.append(kmers_to_strings(okm[None], g.k)[0])
                    first = False
                else:
                    seq_nucs.append("ACGT"[int(okm[-1] & 3)])
                v = int(succ[v])
                if v < 0 or (v >> 1) == int(lowest):
                    break
            out.append("".join(seq_nucs))
            done.add(u)
    return out


def _rows_lt(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Lexicographic row compare for (N, W) uint64."""
    W = a.shape[1]
    lt = a[:, W - 1] < b[:, W - 1]
    for w in range(W - 2, -1, -1):
        lt = (a[:, w] < b[:, w]) | ((a[:, w] == b[:, w]) & lt)
    return lt


def _rows_argmin(a: np.ndarray) -> int:
    best = 0
    for i in range(1, len(a)):
        if tuple(a[i]) < tuple(a[best]):
            best = i
    return best
