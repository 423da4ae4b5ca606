"""Batched graph traversal: the TPU replacement for GraphWalker.

Role of ref src/graph/graph_walker.c + repeat_walker.h: walk the graph
one node at a time, choosing at each junction via the 9-state decision
table (ref graph_step.h:10-47; choose spec graph_walker.c:371-520).
Instead of one sequential walker per thread, B walkers advance in
lockstep as SoA state under `jax.lax.while_loop`; halted walkers are
masked (SURVEY.md §7 mapping 3).

Cycle guard: the reference uses a visited bitset + bloom filter over
the walker state hash (ref repeat_walker.h:17-50).  Bit arrays scatter
poorly on a vector machine, so we use Brent's cycle-detection instead:
each walker keeps one checkpoint state hash and doubles the checkpoint
interval; a repeated hash is an exact cycle (detected within 2x its
period, vs the reference's ~1 extra lap before its bloom fires — both
truncate the walk inside the repeat).  O(1) state per walker, no
false-positive halts (modulo 2^-64 hash collisions), and the same
mechanism stays exact when link cursors join the state (links/walk.py).

Link-aware choosing (M4) extends the same step function with link
cursor state; see links/walk.py.
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

# GraphStep statuses (ref graph_step.h:10-21)
POPFWD = 0
COLFWD = 1
POPFRK_COLFWD = 2
NOCOVG = 3
NOCOLCOVG = 4
NOLINKS = 5
SPLIT_LINKS = 6
MISSING_LINKS = 7
USELINKS = 8
# extra halt reasons (assemble_contigs.c graphstep2assem)
HALT_CYCLE = 9
HALT_MAXLEN = 10
LOW_STEP_CONF = 11   # ref assemble_contigs.c low_step_confid
LOW_CUMUL_CONF = 12  # ref assemble_contigs.c low_cumul_confid

STATUS_STR = ["GoPopForward", "GoColForward", "GoPopForkColForward",
              "FailNoCovg", "FailNoColCovg", "FailNoLinks",
              "FailSplitLinks", "FailMissingLinks", "GoUseLinks",
              "HitCycle", "HitMaxLen", "LowStepConfidence",
              "LowCumulConfidence"]

@struct.dataclass
class WalkState:
    idx: jnp.ndarray      # (B,) int32 current node row
    orient: jnp.ndarray   # (B,) uint8
    okm: jnp.ndarray      # (B, W) oriented kmer (as read along the walk)
    active: jnp.ndarray   # (B,) bool
    status: jnp.ndarray   # (B,) int32 last step status / halt reason
    nsteps: jnp.ndarray   # (B,) int32
    brent_hash: jnp.ndarray   # (B,) uint64 checkpoint state hash
    brent_steps: jnp.ndarray  # (B,) int32 steps since checkpoint
    brent_limit: jnp.ndarray  # (B,) int32 current checkpoint interval
    out_bases: jnp.ndarray  # (B, Lmax) uint8 bases appended so far
    out_vert: jnp.ndarray   # (B, Lmax) int32 vertex (2*idx+orient) per step
    out_len: jnp.ndarray  # (B,) int32


def walk_init(g: gstore.DBGraph, seed_idx: jnp.ndarray,
              seed_orient: jnp.ndarray, max_len: int) -> WalkState:
    B = seed_idx.shape[0]
    okm = kops.oriented(g.keys[seed_idx], seed_orient, g.k)
    alive = ~sops.is_sentinel(g.keys[seed_idx])
    st = WalkState(
        idx=seed_idx.astype(jnp.int32),
        orient=seed_orient.astype(jnp.uint8),
        okm=okm,
        active=alive,
        status=jnp.zeros((B,), jnp.int32),
        nsteps=jnp.zeros((B,), jnp.int32),
        brent_hash=jnp.zeros((B,), jnp.uint64),
        brent_steps=jnp.zeros((B,), jnp.int32),
        brent_limit=jnp.ones((B,), jnp.int32),
        out_bases=jnp.zeros((B, max_len), jnp.uint8),
        out_vert=jnp.full((B, max_len), -1, jnp.int32),
        out_len=jnp.zeros((B,), jnp.int32))
    # seed state is the first Brent checkpoint
    return st.replace(brent_hash=_state_hash(st))


def _state_hash(st: WalkState) -> jnp.ndarray:
    """Walker state hash (ref graph_walker.c graph_walker_hash64): for a
    linkless walker this is a hash of (node, orient)."""
    h = kops.kmer_hash(st.okm)
    return h


def brent_update(st: WalkState, h: jnp.ndarray, moved: jnp.ndarray):
    """Brent cycle check for walkers that just moved to state hash h.
    Returns (new_state, cycle_detected)."""
    cyc = moved & (h == st.brent_hash)
    take_cp = moved & (st.brent_steps + 1 >= st.brent_limit)
    new_hash = jnp.where(take_cp, h, st.brent_hash)
    new_steps = jnp.where(moved,
                          jnp.where(take_cp, 0, st.brent_steps + 1),
                          st.brent_steps)
    new_limit = jnp.where(take_cp, st.brent_limit * 2, st.brent_limit)
    return st.replace(brent_hash=new_hash, brent_steps=new_steps,
                      brent_limit=new_limit), cyc


def _candidates(g: gstore.DBGraph, st: WalkState, colour: int | None,
                adj: jnp.ndarray | None = None):
    """Next-node candidates for each walker.

    Returns (pop_nib, col_nib): 4-bit masks of next bases with any-colour
    edges and with the walk colour's presence on the next node
    (ref graph_walker_choose's in-colour reduction; 'pop' = union).

    With a precomputed adjacency (graph/adjacency.py) each candidate is
    one gather; otherwise a batched binary search per base."""
    N = g.capacity
    uedges = gstore.union_edges(g)
    if adj is not None:
        return _candidates_at(uedges, g.covg, st.idx, st.orient, colour,
                              adj)
    pop_nib = E.with_orientation(uedges[st.idx], st.orient)
    col_bits = jnp.zeros_like(pop_nib)
    for n in range(4):
        nxt = kops.shift_append(st.okm, jnp.full(st.idx.shape, n, jnp.uint8),
                                g.k)
        key2, _ = kops.canonical(nxt, g.k)
        j, found = sops.lookup(g.keys, key2)
        if colour is None:
            incol = found
        else:
            incol = found & (g.covg[j, colour] > 0)
        col_bits = col_bits | (incol.astype(jnp.uint8) << n)
    col_nib = pop_nib & col_bits
    return pop_nib, col_nib


def _candidates_at(uedges, covg, idx, orient, colour: int | None,
                   adj: jnp.ndarray):
    """(pop_nib, col_nib) at explicit (idx, orient) positions via the
    adjacency cache (one gather per base)."""
    from . import adjacency as adjmod
    pop_nib = E.with_orientation(uedges[idx], orient)
    col_bits = jnp.zeros_like(pop_nib)
    v = idx * 2 + orient.astype(jnp.int32)
    for n in range(4):
        nv = adjmod.adj_at(adj, v, n)
        found = nv >= 0
        j = jnp.maximum(nv, 0) >> 1
        if colour is None:
            incol = found
        else:
            incol = found & (covg[j, colour] > 0)
        col_bits = col_bits | (incol.astype(jnp.uint8) << n)
    return pop_nib, pop_nib & col_bits


_POP4 = E.POPCOUNT4
_NIB2NUC = np.array([0, 0, 1, 0, 2, 0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0],
                    dtype=np.uint8)


def choose_linkless(pop_nib: jnp.ndarray, col_nib: jnp.ndarray):
    """The linkless decision table (graph_walker.c:371-460 states 0-5).

    Returns (nuc, go, status)."""
    pop4 = jnp.asarray(_POP4)
    nib2nuc = jnp.asarray(_NIB2NUC)
    npop = pop4[pop_nib.astype(jnp.int32)]
    ncol = pop4[col_nib.astype(jnp.int32)]
    status = jnp.select(
        [npop == 0,
         (npop == 1) & (ncol == 1),
         (npop == 1) & (ncol == 0),
         (npop > 1) & (ncol == 1),
         (npop > 1) & (ncol == 0)],
        [jnp.int32(NOCOVG), jnp.int32(COLFWD), jnp.int32(POPFWD),
         jnp.int32(POPFRK_COLFWD), jnp.int32(NOCOLCOVG)],
        jnp.int32(NOLINKS))
    # POPFWD: single pop choice not in colour — reference takes the step
    # (status POPFWD is a "success" state, graph_step.h:43)
    go = (status == COLFWD) | (status == POPFRK_COLFWD) | (status == POPFWD)
    pick_nib = jnp.where(status == POPFWD, pop_nib, col_nib)
    nuc = nib2nuc[pick_nib.astype(jnp.int32)]
    return nuc, go, status


@functools.partial(jax.jit, static_argnames=("colour", "max_steps"))
def walk(g: gstore.DBGraph, st: WalkState, colour: int | None,
         max_steps: int, adj: jnp.ndarray | None = None) -> WalkState:
    """Advance all walkers until halt or max_steps additional steps
    (relative to entry, so chunked callers reuse one compilation)."""
    start = st.nsteps

    def cond(st):
        return (st.active & (st.nsteps - start < max_steps)).any()

    def body(st):
        pop_nib, col_nib = _candidates(g, st, colour, adj)
        nuc, go, status = choose_linkless(pop_nib, col_nib)
        # advance where active & go
        adv = st.active & go
        nxt_okm = kops.shift_append(st.okm, nuc, g.k)
        if adj is not None:
            from . import adjacency as adjmod
            v = st.idx * 2 + st.orient.astype(jnp.int32)
            nv = adjmod.adj_at(adj, v, nuc)
            j = jnp.maximum(nv, 0) >> 1
            o2 = (jnp.maximum(nv, 0) & 1).astype(jnp.uint8)
        else:
            key2, o2 = kops.canonical(nxt_okm, g.k)
            j, found = sops.lookup(g.keys, key2)
        okm = jnp.where(adv[:, None], nxt_okm, st.okm)
        idx = jnp.where(adv, j, st.idx)
        orient = jnp.where(adv, o2, st.orient)
        new_st = st.replace(okm=okm, idx=idx,
                            orient=orient.astype(jnp.uint8))
        # cycle check on the NEW state (Brent)
        h = _state_hash(new_st)
        new_st, cyc = brent_update(new_st, h, adv)
        adv2 = adv & ~cyc
        # write output base
        B = st.idx.shape[0]
        Lmax = st.out_bases.shape[1]
        hit_max = adv2 & (st.out_len >= Lmax)
        writes = adv2 & ~hit_max
        pos = jnp.where(writes, st.out_len, Lmax)  # Lmax = OOB, dropped
        out_bases = new_st.out_bases.at[jnp.arange(B), pos].set(
            nuc, mode="drop")
        out_vert = new_st.out_vert.at[jnp.arange(B), pos].set(
            idx * 2 + orient.astype(jnp.int32), mode="drop")
        out_len = jnp.where(writes, st.out_len + 1, st.out_len)
        new_status = jnp.where(
            adv, jnp.where(cyc, HALT_CYCLE,
                           jnp.where(hit_max, HALT_MAXLEN, status)),
            jnp.where(st.active, status, st.status))
        active = st.active & go & ~cyc & ~hit_max
        return new_st.replace(
            out_bases=out_bases, out_vert=out_vert, out_len=out_len,
            status=new_status.astype(jnp.int32), active=active,
            nsteps=st.nsteps + st.active.astype(jnp.int32))

    return jax.lax.while_loop(cond, body, st)


def walk_chunked(g, st, colour, max_steps, adj=None, chunk=512):
    """Resumable walking: repeated bounded walk() dispatches so no single
    device execution runs long (relay watchdog; see ROUND1.md).

    The all-halted check runs one chunk BEHIND the dispatches: each
    chunk's `active.any()` is fetched asynchronously while the next
    chunk executes, so the per-chunk host RPC round trip overlaps device
    work (one speculative chunk on a fully-halted state is a masked
    no-op).  Matters on axon where a blocking fetch costs ~10-20 ms."""
    done = 0
    prev_active = None
    while done < max_steps:
        take = min(chunk, max_steps - done)
        st = walk(g, st, colour, max_steps=take, adj=adj)
        done += take
        act = st.active.any()
        try:
            act.copy_to_host_async()
        except Exception:
            pass
        if prev_active is not None and not bool(prev_active):
            break
        prev_active = act
    return st


# ---------------------------------------------------------------------------
# unitig-hop walker: junction-to-junction traversal
# ---------------------------------------------------------------------------
#
# The kmer-level walker above advances one base per while_loop iteration,
# so a 100kb contig costs 100k sequential dependent steps.  But between
# junctions the linkless walker's choice is forced (npop==1 is a "go"
# status whatever the colour — COLFWD or POPFWD), so the only real
# decisions happen at unitig ends.  The hop walker precomputes the unitig
# decomposition (graph/unitigs.py pointer doubling) and advances one
# WHOLE unitig per iteration: sequential depth = junctions crossed, not
# bases emitted (~1000x fewer device steps at E.coli scale).
#
# Cycle semantics match the reference's visited-set walker (ref
# repeat_walker.h: halt on first revisited (node, orient), emitting the
# step INTO the revisited node): each hop records (chain end, max dist
# covered); re-entering a covered chain halts at exactly the first
# previously-visited kmer.  This is *closer* to the reference than the
# kmer walker's Brent detection (which may overshoot within 2x the cycle
# period); Brent stays as a backstop for walks that overflow the
# visited-slot cap.

HOPS_PER_DISPATCH = 64
_GOLD = np.uint64(0x9E3779B97F4A7C15)


@struct.dataclass
class HopState:
    v: jnp.ndarray        # (B,) int32 entry vertex (not yet emitted)
    first: jnp.ndarray    # (B,) bool seed hop (no junction base)
    active: jnp.ndarray   # (B,) bool
    status: jnp.ndarray   # (B,) int32
    out_len: jnp.ndarray  # (B,) int32 bases emitted
    hop_v: jnp.ndarray    # (B, H) int32 first-emitting vertex per record
    hop_n: jnp.ndarray    # (B, H) int32 emit count per record
    hop_cnt: jnp.ndarray  # (B,) int32
    vis_e: jnp.ndarray    # (B, H) int32 visited chain-end vertices
    vis_p: jnp.ndarray    # (B, H) int32 max dist covered on that chain
    vis_cnt: jnp.ndarray  # (B,) int32
    brent_hash: jnp.ndarray   # (B,) uint64 backstop (visited-cap overflow)
    brent_steps: jnp.ndarray  # (B,) int32
    brent_limit: jnp.ndarray  # (B,) int32


def hop_init(seed_vert: jnp.ndarray, alive: jnp.ndarray,
             hop_cap: int) -> HopState:
    B = seed_vert.shape[0]
    H = hop_cap
    return HopState(
        v=seed_vert.astype(jnp.int32),
        first=jnp.ones((B,), bool),
        active=alive,
        status=jnp.zeros((B,), jnp.int32),
        out_len=jnp.zeros((B,), jnp.int32),
        hop_v=jnp.full((B, H), -1, jnp.int32),
        hop_n=jnp.zeros((B, H), jnp.int32),
        hop_cnt=jnp.zeros((B,), jnp.int32),
        vis_e=jnp.full((B, H), -2, jnp.int32),
        vis_p=jnp.full((B, H), -1, jnp.int32),
        vis_cnt=jnp.zeros((B,), jnp.int32),
        brent_hash=jnp.zeros((B,), jnp.uint64),
        brent_steps=jnp.zeros((B,), jnp.int32),
        brent_limit=jnp.ones((B,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("colour", "max_len",
                                             "nhops", "k"))
def _hop_block(keys, covg, uedges, adj, succ, end, dist, is_cyc, ulen,
               st: HopState, colour: int | None, max_len: int,
               nhops: int, k: int = 0) -> HopState:
    """Advance all hop walkers up to nhops junction hops.

    adj=None (very large stores, where the flat (8N,) adjacency would
    not fit beside the store) probes the 4 junction candidates with
    batched binary searches instead — junctions are rare, so the log(N)
    gathers cost nothing at hop granularity."""
    B = st.v.shape[0]
    H = st.vis_e.shape[1]
    ar = jnp.arange(B)
    slot = jnp.arange(H, dtype=jnp.int32)

    def body(carry):
        it, st = carry
        i = st.v >> 1
        e = end[st.v]
        p = dist[st.v]
        cyc_seed = st.first & is_cyc[i]
        # exact visited query: max dist already covered on this chain
        m = (st.vis_e == e[:, None]) & (slot[None, :] < st.vis_cnt[:, None])
        q = jnp.max(jnp.where(m, st.vis_p, -1), axis=1)
        # junction hop emits the junction base + the chain down to the
        # first already-visited kmer (dist q) or the chain end (q = -1)
        emit = jnp.where(
            st.first, p,
            jnp.maximum(1 + p - jnp.maximum(q, 0), 1))
        emit = jnp.where(cyc_seed, ulen[i], emit)
        room = max_len - st.out_len
        # record-buffer cap: halt rather than silently dropping emission
        # (each continuing hop emits >= 1 base, so H >= max_len never
        # trips this)
        cap = st.hop_cnt >= H
        trunc = (emit > room) | cap
        emit_c = jnp.where(cap, 0, jnp.minimum(emit, room))
        fe = jnp.where(st.first, succ[st.v], st.v)
        wr = st.active & (emit_c > 0)
        pos = jnp.where(wr, st.hop_cnt, H)
        hop_v = st.hop_v.at[ar, pos].set(fe, mode="drop")
        hop_n = st.hop_n.at[ar, pos].set(emit_c, mode="drop")
        hop_cnt = st.hop_cnt + wr
        out_len = st.out_len + jnp.where(st.active, emit_c, 0)
        vw = st.active & (st.vis_cnt < H) & ~cyc_seed
        vpos = jnp.where(vw, st.vis_cnt, H)
        vis_e = st.vis_e.at[ar, vpos].set(e, mode="drop")
        vis_p = st.vis_p.at[ar, vpos].set(p, mode="drop")
        vis_cnt = st.vis_cnt + vw
        halt_cyc = st.active & ((~st.first & (q >= 0)) | cyc_seed)
        halt_max = st.active & trunc & ~halt_cyc
        cont = st.active & ~halt_cyc & ~halt_max
        # junction choose at the chain end
        eo = (e & 1).astype(jnp.uint8)
        if adj is not None:
            pop_nib, col_nib = _candidates_at(
                uedges, covg, e >> 1, eo, colour, adj)
            nuc, go, jstatus = choose_linkless(pop_nib, col_nib)
            from . import adjacency as adjmod
            v2 = adjmod.adj_at(adj, e, nuc)
        else:
            okm_e = kops.oriented(keys[e >> 1], eo, k)
            pop_nib = E.with_orientation(uedges[e >> 1], eo)
            col_bits = jnp.zeros_like(pop_nib)
            cand_v = jnp.full((B, 4), -1, jnp.int32)
            for n in range(4):
                nxt = kops.shift_append(
                    okm_e, jnp.full((B,), n, jnp.uint8), k)
                key2, o2 = kops.canonical(nxt, k)
                j, found = sops.lookup(keys, key2)
                if colour is None:
                    incol = found
                else:
                    incol = found & (covg[j, colour] > 0)
                col_bits = col_bits | (incol.astype(jnp.uint8) << n)
                cand_v = cand_v.at[:, n].set(jnp.where(
                    found, j * 2 + o2.astype(jnp.int32), -1))
            nuc, go, jstatus = choose_linkless(pop_nib,
                                               pop_nib & col_bits)
            v2 = jnp.take_along_axis(
                cand_v, nuc.astype(jnp.int32)[:, None], axis=1)[:, 0]
        # Brent backstop over hop-entry vertices (fires only for walks
        # that overflowed the visited cap; visited halts first otherwise)
        h2 = (v2.astype(jnp.uint64) + jnp.uint64(1)) * _GOLD
        h2 = (h2 ^ (h2 >> jnp.uint64(31)))
        moved = cont & go
        bcyc = moved & (h2 == st.brent_hash)
        take_cp = moved & (st.brent_steps + 1 >= st.brent_limit)
        brent_hash = jnp.where(take_cp, h2, st.brent_hash)
        brent_steps = jnp.where(
            moved, jnp.where(take_cp, 0, st.brent_steps + 1),
            st.brent_steps)
        brent_limit = jnp.where(take_cp, st.brent_limit * 2,
                                st.brent_limit)
        active = cont & go & ~bcyc
        v_new = jnp.where(active, v2, st.v)
        status = jnp.where(
            halt_max, jnp.int32(HALT_MAXLEN),
            jnp.where(halt_cyc | bcyc, jnp.int32(HALT_CYCLE),
                      jnp.where(cont, jstatus, st.status)))
        return it + 1, st.replace(
            v=v_new, first=jnp.zeros_like(st.first), active=active,
            status=status, out_len=out_len, hop_v=hop_v, hop_n=hop_n,
            hop_cnt=hop_cnt, vis_e=vis_e, vis_p=vis_p, vis_cnt=vis_cnt,
            brent_hash=brent_hash, brent_steps=brent_steps,
            brent_limit=brent_limit)

    def cond(carry):
        it, st = carry
        return (it < nhops) & st.active.any()

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st))
    return st


_chars_cache: dict = {}


def cached_emit_chars(keys, k: int) -> np.ndarray:
    """Host copy of _emit_chars, memoised per store key buffer (CLI
    contigs reconstructs per seed batch)."""
    ck = id(keys)
    hit = _chars_cache.get(ck)
    if hit is not None and hit[0] is keys:
        return hit[1]
    chars = np.asarray(_emit_chars(keys, k))
    if len(_chars_cache) > 4:
        _chars_cache.clear()
    _chars_cache[ck] = (keys, chars)
    return chars


@functools.partial(jax.jit, static_argnames=("k",))
def _emit_chars(keys, k: int):
    """(2N,) uint8: the base emitted on arrival at each vertex (last
    nucleotide of the oriented kmer)."""
    N = keys.shape[0]
    last_fwd = (keys[:, -1] & jnp.uint64(3)).astype(jnp.uint8)
    last_rev = jnp.uint8(3) - kops.first_base(keys, k)
    out = jnp.zeros((2 * N,), jnp.uint8)
    idx = jnp.arange(N, dtype=jnp.int32)
    out = out.at[idx * 2].set(last_fwd)
    out = out.at[idx * 2 + 1].set(last_rev)
    return out


def hop_walk(g, uv, seed_vert: jnp.ndarray, colour: int | None,
             max_len: int, adj, uedges, hop_cap: int | None = None):
    """Run the hop walker to completion (chunked dispatches with a
    1-chunk-lookahead halt check, as walk_chunked).

    The hop/visited record buffers start at 2048 entries (a hop covers a
    whole unitig, so junction-dense graphs are the only way to need
    more before max_len bases are emitted); if any walker halts on the
    buffer cap short of max_len the whole batch is re-run with a grown
    cap — truncation is exact-detectable (cap halts leave
    out_len < max_len; genuine max_len halts always fill it), so this
    never silently shortens a contig (ADVICE r4 item 4)."""
    grow = hop_cap is None
    if hop_cap is None:
        hop_cap = min(HOP_CAP0, max_len + 2)
    while True:
        st = _hop_walk_once(g, uv, seed_vert, colour, max_len, adj,
                            uedges, hop_cap)
        if not grow or hop_cap >= max_len + 2:
            return st
        trunc = np.asarray((st.status == HALT_MAXLEN)
                           & (st.out_len < max_len)
                           & (st.hop_cnt >= hop_cap))
        if not trunc.any():
            return st
        hop_cap = min(hop_cap * 4, max_len + 2)


HOP_CAP0 = 2048  # initial hop/visited record-buffer entries per walker


def _hop_walk_once(g, uv, seed_vert, colour, max_len, adj, uedges,
                   hop_cap):
    alive = ~sops.is_sentinel(g.keys[seed_vert >> 1])
    st = hop_init(seed_vert, alive, hop_cap)
    i32 = lambda x: x.astype(jnp.int32)  # noqa: E731
    prev_active = None
    # every continuing hop emits >= 1 base, so max_len/1 bounds the hops
    max_iters = max_len + 2
    done = 0
    while done < max_iters:
        take = min(HOPS_PER_DISPATCH, max_iters - done)
        st = _hop_block(g.keys, g.covg, uedges, adj, i32(uv.succ),
                        i32(uv.end), i32(uv.dist), uv.is_cycle,
                        i32(uv.length), st, colour, max_len, take,
                        k=g.k)
        done += take
        act = st.active.any()
        try:
            act.copy_to_host_async()
        except Exception:
            pass
        if prev_active is not None and not bool(prev_active):
            break
        prev_active = act
    return st


_layout_cache: dict = {}


def _chain_layout(uv, chars_np):
    """Walk-order layout (vertices sorted by (end, -dist)) + chars,
    memoised per unitig view — CLI contigs reconstructs thousands of
    seed batches against one view."""
    ck = id(uv.succ)
    hit = _layout_cache.get(ck)
    if hit is not None and hit[0] is uv.succ:
        return hit[1]
    end = np.asarray(uv.end)
    dist = np.asarray(uv.dist)
    order = np.lexsort((-dist, end))
    layout = (end, dist, np.asarray(uv.is_cycle), order,
              chars_np[order],
              np.searchsorted(end[order], np.arange(end.shape[0])))
    if len(_layout_cache) > 4:
        _layout_cache.clear()
    _layout_cache[ck] = (uv.succ, layout)
    return layout


def _reconstruct_hops(uv, chars_np, hop_v, hop_n, hop_cnt):
    """Host assembly of emitted base runs from hop records.

    Chain hops are slices of a per-chain walk-order layout (vertices
    sorted by (end, -dist)); cycle hops follow succ directly."""
    succ = None
    end, dist, is_cyc, order, sorted_chars, run_start = \
        _chain_layout(uv, chars_np)
    B = hop_v.shape[0]
    out = []
    for b in range(B):
        parts = []
        for h in range(int(hop_cnt[b])):
            fe, cnt = int(hop_v[b, h]), int(hop_n[b, h])
            if fe < 0 or cnt <= 0:
                continue
            if is_cyc[fe >> 1]:
                if succ is None:
                    succ = np.asarray(uv.succ)
                vcur, buf = fe, []
                for _ in range(cnt):
                    buf.append(chars_np[vcur])
                    vcur = succ[vcur]
                parts.append(np.asarray(buf, np.uint8))
                continue
            e = end[fe]
            base = run_start[e]
            maxd = dist[order[base]]
            i0 = base + (maxd - dist[fe])
            parts.append(sorted_chars[i0:i0 + cnt])
        out.append(np.concatenate(parts) if parts
                   else np.zeros((0,), np.uint8))
    return out


def assemble_linkless_contigs(g: gstore.DBGraph, seed_rows: np.ndarray,
                              colour: int | None = 0,
                              max_len: int = 4096, mesh=None):
    """Pull a contig for each seed row via unitig hops: walk right from
    (seed, FORWARD) and left from (seed, REVERSE), join (ref
    assemble_contigs.c:88-119 without links/confidence).  Returns
    (contigs: list[str], stop_status: (B, 2) right/left halt codes).

    mesh: optional jax Mesh — the walk_dp scaling mode (graph arrays
    replicated, the seed batch sharded over the mesh axis); walkers are
    the parallel work, so contigs scale linearly with devices."""
    from ..utils.text import kmers_to_strings
    from . import unitigs as U
    from . import adjacency as adjmod
    B = len(seed_rows)
    if B == 0:
        return [], np.zeros((0, 2), np.int32)
    seeds_np = np.asarray(seed_rows, np.int64)
    B_orig = B
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P
        nd = mesh.devices.size
        Bp = -(-B // nd) * nd
        if Bp != B:
            seeds_np = np.concatenate(
                [seeds_np, np.full(Bp - B, seeds_np[0], np.int64)])
        seeds = jax.device_put(
            jnp.asarray(seeds_np, jnp.int32),
            NamedSharding(mesh, _P(mesh.axis_names[0])))
        B = Bp
    else:
        seeds = jnp.asarray(seeds_np, jnp.int32)
    adj = None
    if g.capacity <= adjmod.ADJ_FREE_N:
        adj = adjmod.get_adjacency(g)
    uedges = gstore.cached_union_edges(g)
    uv = U.cached_unitig_view(g.keys, uedges, g.k)
    chars_np = cached_emit_chars(g.keys, g.k)
    halves = []
    stats = []
    for o in (0, 1):
        st = hop_walk(g, uv, seeds * 2 + o, colour, max_len, adj, uedges)
        runs = _reconstruct_hops(uv, chars_np, np.asarray(st.hop_v),
                                 np.asarray(st.hop_n),
                                 np.asarray(st.hop_cnt))
        halves.append(runs)
        stats.append(np.asarray(st.status))
    seed_keys = np.asarray(g.keys)[np.asarray(seed_rows, np.int64)]
    seed_strs = kmers_to_strings(seed_keys, g.k)
    contigs = []
    basechars = "ACGT"
    for i in range(B_orig):
        right = "".join(basechars[b] for b in halves[0][i])
        left = "".join(basechars[3 - b] for b in halves[1][i][::-1])
        contigs.append(left + seed_strs[i] + right)
    return contigs, np.stack([stats[0][:B_orig], stats[1][:B_orig]],
                             axis=1)


def assemble_linkless_contigs_steps(g: gstore.DBGraph,
                                    seed_rows: np.ndarray,
                                    colour: int | None = 0,
                                    max_len: int = 4096):
    """Pull a contig for each seed row: walk right from (seed, FORWARD)
    and left from (seed, REVERSE), join (ref assemble_contigs.c:88-119
    without links/confidence).  Returns (contigs: list[str],
    stop_status: (B, 2) right/left halt codes) in seed order."""
    from ..utils.text import kmers_to_strings
    B = len(seed_rows)
    if B == 0:
        return [], np.zeros((0, 2), np.int32)
    seeds = jnp.asarray(seed_rows, jnp.int32)
    from . import adjacency as adjmod
    adj = adjmod.get_adjacency(g)
    halves = []
    stats = []
    for o in (0, 1):
        st = walk_init(g, seeds, jnp.full((B,), o, jnp.uint8), max_len)
        st = walk_chunked(g, st, colour, max_len + 1, adj=adj)
        halves.append((np.asarray(st.out_bases), np.asarray(st.out_len)))
        stats.append(np.asarray(st.status))
    seed_keys = np.asarray(g.keys)[seed_rows]
    seed_strs = kmers_to_strings(seed_keys, g.k)
    contigs = []
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    basechars = "ACGT"
    fw_b, fw_l = halves[0]
    rv_b, rv_l = halves[1]
    for i in range(B):
        right = "".join(basechars[b] for b in fw_b[i, :fw_l[i]])
        left_rc = "".join(basechars[b] for b in rv_b[i, :rv_l[i]])
        left = "".join(comp[c] for c in reversed(left_rc))
        contigs.append(left + seed_strs[i] + right)
    return contigs, np.stack([stats[0], stats[1]], axis=1)
