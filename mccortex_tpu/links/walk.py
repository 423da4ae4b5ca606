"""Link-aware batched traversal.

Extends graph/traverse.py with link-cursor state, mirroring the
reference walker semantics exactly (ref graph_walker.c):

  * links are picked up at every node whose vertex has links in the walk
    link-colour (pickup_paths :151), cursor age 0;
  * cursor ages increment when the walk passes a segment boundary — an
    out-fork the links resolved (is_fork) or an in-merge (other
    predecessors exist) (_gw_gseg_update :105-131);
  * at an in-colour fork, the cursors of greatest age vote: age must be
    >= 1 and all greatest-age cursors must agree (choose :452-476), else
    the walk halts with NOLINKS / SPLIT_LINKS;
  * on a resolved fork every cursor whose current base differs from the
    taken base dies; matching cursors consume one base
    (_graph_walker_force_jump :556-585).

Cursors live in fixed per-walker slot arrays (CMAX slots); overflow
pickups are dropped (the reference list is unbounded; CMAX is a knob).
Brent cycle detection hashes (node, orientation, cursor multiset) so
repeats are only cut when the full walker state repeats — same idea as
the reference's graph_walker_hash64 bloom (repeat_walker.h).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..ops import kmer as kops
from ..ops import sorted as sops
from ..graph import edges as E
from ..graph import store as gstore
from ..graph import traverse as T
from . import store as lstore

CMAX = 64   # cursor slots per walker
CMAX2 = 32  # counter-path slots per walker (missing-info check)
SMAX = 32   # graph-segment window per walker (ref gsegs; age window)
HOP_CAP = 512  # unitig-interior hop records per walker; when full the
               # walk gracefully degrades to per-node stepping

# cumulative dropped-pickup counts per walk context, surfaced so every
# entry point (contigs, bubbles, breakpoints, correct, server) reports
# bounded-slot honesty, not just contigs (ref lists are unbounded)
DROP_COUNTS: dict = {}


def report_drops(st: "LinkedWalkState", context: str) -> int:
    """Warn about link pickups dropped by the bounded cursor slots.

    Returns the drop count for this walk and accumulates it into
    DROP_COUNTS[context] so callers (e.g. CorrectAlnStats) can surface
    totals.  The reference keeps unbounded per-walker link lists; CMAX
    and the 16-pickups/node cap are capacity knobs, so any drop is a
    potential behavioural difference and must never be silent."""
    import sys
    nd = int(np.asarray(st.n_drop).sum())
    if nd:
        DROP_COUNTS[context] = DROP_COUNTS.get(context, 0) + nd
        print(f"[mctx] warning: {nd} link pickups dropped during "
              f"{context} (cursor slots full / >16 links per node) — "
              f"results may differ from the unbounded-list reference",
              file=sys.stderr)
    return nd


@struct.dataclass
class LinkedWalkState:
    base: T.WalkState
    cur_link: jnp.ndarray  # (B, CMAX) int32, -1 = empty
    cur_pos: jnp.ndarray   # (B, CMAX) int32
    cur_age: jnp.ndarray   # (B, CMAX) int32
    cntr_link: jnp.ndarray  # (B, CMAX2) int32 counter paths
    cntr_pos: jnp.ndarray   # (B, CMAX2) int32
    cntr_age: jnp.ndarray   # (B, CMAX2) int32
    # graph segments, index 0 = most recent (ref graph_walker.c gsegs;
    # a cursor of age a was picked up in segment a)
    seg_nodes: jnp.ndarray  # (B, SMAX) int32 nodes per segment
    seg_infork: jnp.ndarray  # (B, SMAX) bool segment began at an in-merge
    # confidence-model accumulators (ref assemble_contigs.c:100-117)
    cum_conf: jnp.ndarray   # (B,) float32 product of step confidences
    max_gap: jnp.ndarray    # (B,) int32 largest USELINKS gap (bp)
    # link-usage marking (ref graph_walker.c:576-579 used_paths)
    used: jnp.ndarray       # (nlinks,) bool
    # pickup-overflow honesty: links that could not be tracked because
    # the per-node pickup cap or the cursor/counter slot arrays were
    # full (the reference's lists are unbounded; these SLOTS are a knob,
    # so dropped pickups are counted and surfaced, never silent)
    n_drop: jnp.ndarray = None     # (B,) int32 dropped pickups
    # unitig-interior hop records (round 5): when a hopinfo is passed to
    # walk_linked, event-free interior stretches are skipped in one
    # update and recorded here; out_bases/out_vert gaps are filled on
    # host by fill_hop_outputs.  hop_v = entry vertex (the skipped
    # stretch is the next hop_n layout positions after it), hop_off =
    # the out_len offset the stretch occupies.
    hop_v: jnp.ndarray = None      # (B, HCAP) int32
    hop_n: jnp.ndarray = None      # (B, HCAP) int32
    hop_off: jnp.ndarray = None    # (B, HCAP) int32
    hop_cnt: jnp.ndarray = None    # (B,) int32


def linked_init(g: gstore.DBGraph, links: lstore.LinkStore,
                seed_idx, seed_orient, max_len: int,
                ctpcol: int = 0) -> LinkedWalkState:
    base = T.walk_init(g, seed_idx, seed_orient, max_len)
    B = seed_idx.shape[0]
    seg_nodes = jnp.zeros((B, SMAX), jnp.int32).at[:, 0].set(1)
    st = LinkedWalkState(
        base=base,
        cur_link=jnp.full((B, CMAX), -1, jnp.int32),
        cur_pos=jnp.zeros((B, CMAX), jnp.int32),
        cur_age=jnp.zeros((B, CMAX), jnp.int32),
        cntr_link=jnp.full((B, CMAX2), -1, jnp.int32),
        cntr_pos=jnp.zeros((B, CMAX2), jnp.int32),
        cntr_age=jnp.zeros((B, CMAX2), jnp.int32),
        seg_nodes=seg_nodes,
        seg_infork=jnp.zeros((B, SMAX), bool),
        cum_conf=jnp.ones((B,), jnp.float32),
        max_gap=jnp.zeros((B,), jnp.int32),
        used=jnp.zeros((max(links.nlinks, 1),), bool),
        n_drop=jnp.zeros((B,), jnp.int32),
        hop_v=jnp.zeros((B, HOP_CAP), jnp.int32),
        hop_n=jnp.zeros((B, HOP_CAP), jnp.int32),
        hop_off=jnp.zeros((B, HOP_CAP), jnp.int32),
        hop_cnt=jnp.zeros((B,), jnp.int32))
    # pick up links on the seed node itself (ref graph_walker_start ->
    # pickup via _graph_walker_force_jump on first move; the reference
    # picks up at start too via graph_walker_start's caller prime)
    st = _pickup(g, links, st, ctpcol)
    return st.replace(base=st.base.replace(
        brent_hash=_linked_hash(st)))


def _cursor_bases(links: lstore.LinkStore, st: LinkedWalkState):
    """Current junction base per cursor slot: (B, CMAX) uint8."""
    B = st.cur_link.shape[0]
    lid = jnp.clip(st.cur_link, 0, max(links.nlinks - 1, 0))
    flat = lid.reshape(-1)
    pos = st.cur_pos.reshape(-1)
    if links.nlinks == 0:
        return jnp.zeros((B, CMAX), jnp.uint8)
    return lstore.unpack_junc(links.seq[flat], pos).reshape(B, CMAX)


def _linked_hash(st: LinkedWalkState) -> jnp.ndarray:
    """Order-independent hash of (node, cursors, counter cursors)."""
    h = kops.kmer_hash(st.base.okm)
    for lk, ps, ag in ((st.cur_link, st.cur_pos, st.cur_age),
                       (st.cntr_link, st.cntr_pos, st.cntr_age)):
        live = lk >= 0
        ch = kops.splitmix64(
            lk.astype(jnp.uint64)
            ^ (ps.astype(jnp.uint64) << jnp.uint64(24))
            ^ (ag.astype(jnp.uint64) << jnp.uint64(48)))
        ch = jnp.where(live, ch, jnp.uint64(0))
        h = h ^ jax.lax.reduce(ch, jnp.uint64(0),
                               jax.lax.bitwise_xor, dimensions=(1,))
    return h


def _pickup(g: gstore.DBGraph, links: lstore.LinkStore,
            st: LinkedWalkState, ctpcol: int) -> LinkedWalkState:
    """Pick up links at the current node (age 0) into free slots."""
    if links.nlinks == 0:
        return st
    B = st.cur_link.shape[0]
    v = st.base.idx * 2 + st.base.orient.astype(jnp.int32)
    start = links.offsets[v]
    end = links.offsets[v + 1]
    navail = end - start
    cap = int(min(CMAX, 16))  # pickup at most 16 links per node
    cur_link, cur_pos, cur_age = st.cur_link, st.cur_pos, st.cur_age
    free = cur_link < 0
    # free-slot ranking per walker
    free_rank = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
    rows = jnp.arange(B)
    # links beyond the per-node pickup cap are never examined: count
    # them as (potentially) dropped
    n_drop = st.n_drop + jnp.where(
        st.base.active, jnp.clip(navail - cap, 0, None), 0
    ).astype(jnp.int32)
    for s in range(cap):
        lid = jnp.clip(start + s, 0, max(links.nlinks - 1, 0))
        ok = (s < navail) & st.base.active
        ok = ok & (links.nseen[lid, ctpcol] > 0)
        # slot = s-th free slot
        slot_match = free & (free_rank == s)
        has_slot = slot_match.any(axis=1)
        slot = jnp.argmax(slot_match, axis=1)
        n_drop = n_drop + (ok & ~has_slot).astype(jnp.int32)
        ok = ok & has_slot
        cur_link = cur_link.at[rows, slot].set(
            jnp.where(ok, lid.astype(jnp.int32), cur_link[rows, slot]))
        cur_pos = cur_pos.at[rows, slot].set(
            jnp.where(ok, 0, cur_pos[rows, slot]))
        cur_age = cur_age.at[rows, slot].set(
            jnp.where(ok, 0, cur_age[rows, slot]))
    return st.replace(cur_link=cur_link, cur_pos=cur_pos, cur_age=cur_age,
                      n_drop=n_drop)


def _cntr_bases(links: lstore.LinkStore, st: LinkedWalkState):
    B = st.cntr_link.shape[0]
    if links.nlinks == 0:
        return jnp.zeros((B, CMAX2), jnp.uint8)
    lid = jnp.clip(st.cntr_link, 0, max(links.nlinks - 1, 0))
    return lstore.unpack_junc(links.seq[lid.reshape(-1)],
                              st.cntr_pos.reshape(-1)).reshape(B, CMAX2)


def _pickup_counter(g, links, st: LinkedWalkState, adv, lost_nuc,
                    ctpcol: int, edge_colour: int):
    """Pick up counter paths at the new node's OTHER predecessors
    (ref graph_walker_add_counter_paths + pickup_paths counter mode)."""
    if links.nlinks == 0:
        return st
    b = st.base
    B = b.idx.shape[0]
    next_base = kops.last_base(b.okm)
    rev_o = jnp.uint8(1) - b.orient
    rev_okm = kops.oriented(g.keys[b.idx], rev_o, g.k)
    in_nib = E.with_orientation(g.edges[b.idx, edge_colour], rev_o)
    back_bit = (jnp.uint8(3) - lost_nuc) & 3
    pop4 = jnp.asarray(T._POP4)
    cl, cp, ca = st.cntr_link, st.cntr_pos, st.cntr_age
    cntr_drop = jnp.zeros((B,), jnp.int32)
    rows = jnp.arange(B)
    for n in range(4):
        has = ((in_nib >> n) & 1).astype(bool) & (back_bit != n) & adv
        if True:
            pk = kops.shift_append(rev_okm, jnp.full((B,), n, jnp.uint8),
                                   g.k)
            qkey, qo = kops.canonical(pk, g.k)
            qrow, qfound = sops.lookup(g.keys, qkey)
            # prev node oriented TOWARD the current node
            pv = qrow * 2 + (1 - qo.astype(jnp.int32))
            # filter-nuc0 applies when the prev node forks toward us
            pnib = E.with_orientation(
                g.edges[qrow, edge_colour],
                (jnp.uint8(1) - qo.astype(jnp.uint8)))
            filter0 = pop4[pnib.astype(jnp.int32)] > 1
            start = links.offsets[pv]
            navail = links.offsets[pv + 1] - start
            ok_node = has & qfound
            free = cl < 0
            free_rank = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
            cntr_drop = cntr_drop + jnp.where(
                ok_node, jnp.clip(navail - 8, 0, None), 0
            ).astype(jnp.int32)
            for s_ in range(8):
                lid = jnp.clip(start + s_, 0, links.nlinks - 1)
                base0 = lstore.unpack_junc(links.seq[lid],
                                           jnp.zeros((B,), jnp.int32))
                nj = links.nj[lid]
                want = ok_node & (s_ < navail) & \
                    (links.nseen[lid, ctpcol] > 0)
                pos0 = jnp.where(filter0, 1, 0)
                want = want & jnp.where(
                    filter0, (base0 == next_base) & (nj > 1),
                    jnp.ones_like(filter0))
                slot_match = free & (free_rank == s_)
                has_slot = slot_match.any(axis=1)
                slot = jnp.argmax(slot_match, axis=1)
                cntr_drop = cntr_drop + (want & ~has_slot).astype(
                    jnp.int32)
                want = want & has_slot
                cl = cl.at[rows, slot].set(
                    jnp.where(want, lid.astype(jnp.int32),
                              cl[rows, slot]))
                cp = cp.at[rows, slot].set(
                    jnp.where(want, pos0, cp[rows, slot]))
                ca = ca.at[rows, slot].set(
                    jnp.where(want, 0, ca[rows, slot]))
            free = cl < 0
            free_rank = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
    return st.replace(cntr_link=cl, cntr_pos=cp, cntr_age=ca,
                      n_drop=st.n_drop + cntr_drop)


def _path_gap(st: LinkedWalkState, live, bases, rep):
    """Distance between deciding junctions (ref graph_walker.c:491-496).

    choice_age = age of the oldest cursor disagreeing with the oldest
    cohort's base (0 if unanimous); the gap is the node count from the
    current position back through the first in-merge segment at age >=
    choice_age (gsegs index == age; our window is SMAX segments)."""
    B = bases.shape[0]
    disagree = live & (bases != rep[:, None])
    choice_age = jnp.max(jnp.where(disagree, st.cur_age, 0), axis=1)
    sidx = jnp.arange(SMAX)
    infork_ge = st.seg_infork & (sidx[None, :] >= choice_age[:, None])
    has_fk = infork_ge.any(axis=1)
    astar = jnp.where(has_fk, jnp.argmax(infork_ge, axis=1), SMAX - 1)
    cum = jnp.cumsum(st.seg_nodes, axis=1)
    return cum[jnp.arange(B), astar]


# ---------------------------------------------------------------------------
# unitig-interior hops (round 5, VERDICT item 5): links attach only at
# unitig heads/tails (thread.py attaches at merge-1 / fork+1, both
# junction-adjacent), cursor advancement happens only at in-colour
# forks (unitig tails), age bumps only at forks/in-merges, and a
# single-out-edge step always proceeds (POPFWD even out of colour) —
# so the stretch of chain vertices between events is walkable in ONE
# state update.  Event vertices = chain heads, chain tails, vertices
# carrying links (covers hand-written .ctp files that attach links
# anywhere), cycle unitigs and sentinels.
# ---------------------------------------------------------------------------

_hopinfo_cache: dict = {}


def get_hopinfo(g: gstore.DBGraph, links: lstore.LinkStore):
    """(jump (2N,) i32, tgt (2N,) i32) device arrays: jump[v] = number
    of event-free vertices following v along its unitig chain, tgt[v] =
    the vertex jump[v] positions ahead in walk order.  Cached per
    (store, links) identity; colour-independent."""
    from ..graph import traverse as T_
    from ..graph import unitigs as U_
    from ..graph import store as gstore_
    ck = (id(g.keys), id(links.offsets))
    hit = _hopinfo_cache.get(ck)
    if hit is not None and hit[0] is g.keys and hit[1] is links.offsets:
        return hit[2]
    uedges = gstore_.cached_union_edges(g)
    uv = U_.cached_unitig_view(g.keys, uedges, g.k)
    chars = T_.cached_emit_chars(g.keys, g.k)
    end, dist, is_cyc, order, sorted_chars, run_start = \
        T_._chain_layout(uv, chars)
    P2 = order.shape[0]
    pos_of = np.empty(P2, np.int64)
    pos_of[order] = np.arange(P2)
    deg = np.diff(np.asarray(links.offsets))
    has_link = np.zeros(P2, bool)
    has_link[:min(deg.shape[0], P2)] = deg[:P2] > 0
    tail = dist == 0
    head = pos_of == run_start[end]
    cyc_v = np.repeat(np.asarray(is_cyc, bool), 2)
    live = ~np.asarray(
        (np.asarray(g.keys) == np.uint64(sops.SENTINEL64)).all(axis=1))
    live_v = np.repeat(live, 2)
    event = head | tail | has_link | cyc_v | ~live_v

    ev_at_pos = event[order]
    idxs = np.arange(P2, dtype=np.int64)
    evpos = np.where(ev_at_pos, idxs, P2 + 1)
    sufmin = np.minimum.accumulate(evpos[::-1])[::-1]
    nse = np.empty(P2, np.int64)
    nse[:-1] = sufmin[1:]
    nse[-1] = P2 + 1
    jump_pos = np.clip(nse - idxs - 1, 0, None)
    jump_pos[tail[order]] = 0        # never jump across a chain end
    jump_pos[cyc_v[order]] = 0
    tgt_pos = np.clip(idxs + jump_pos, 0, P2 - 1)
    jump_v = np.zeros(P2, np.int32)
    tgt_v = np.zeros(P2, np.int32)
    jump_v[order] = jump_pos.astype(np.int32)
    tgt_v[order] = order[tgt_pos].astype(np.int32)
    info = (jnp.asarray(jump_v), jnp.asarray(tgt_v))
    if len(_hopinfo_cache) > 4:
        _hopinfo_cache.clear()
    _hopinfo_cache[ck] = (g.keys, links.offsets, info)
    return info


@functools.partial(jax.jit, static_argnames=("Lc",))
def _pack2_dev(ob, Lc: int):
    """(B, L) u8 base codes -> (B, Lc//4) u8, 4 codes/byte (Lc may
    exceed L by up to 3 when L is not a multiple of 4)."""
    if Lc > ob.shape[1]:
        ob = jnp.concatenate(
            [ob, jnp.zeros((ob.shape[0], Lc - ob.shape[1]), ob.dtype)],
            axis=1)
    q = (ob[:, :Lc].astype(jnp.uint32) & jnp.uint32(3)).reshape(
        ob.shape[0], Lc // 4, 4)
    return (q[:, :, 0] | (q[:, :, 1] << jnp.uint32(2))
            | (q[:, :, 2] << jnp.uint32(4))
            | (q[:, :, 3] << jnp.uint32(6))).astype(jnp.uint8)


def _unpack2_np(packed: np.ndarray, Lc: int) -> np.ndarray:
    shifts = np.array([0, 2, 4, 6], np.uint8)
    return ((packed[:, :, None] >> shifts) & 3).astype(np.uint8).reshape(
        packed.shape[0], -1)[:, :Lc]


def fill_hop_outputs(g: gstore.DBGraph, st: LinkedWalkState,
                     verts: bool = True, verts_cols: int | None = None):
    """Host: fill the out_bases/out_vert gaps left by interior hops
    from the unitig walk-order layout.  Returns (out_bases, out_vert)
    dense numpy arrays of width Lc = the pow2 bucket covering
    max(out_len) (NOT the full max_len buffer width).

    Transfer discipline: the raw buffers are (B, max_len); fetching
    them whole moved ~0.5 GB per 256-walker/200kb-cap assemble call —
    the entirety of the round-5 E.coli linked-contigs wall-clock over
    the ~22 MB/s axon tunnel.  Instead the live prefix is sliced on
    device (pow2 buckets keep the program count O(log)), the base
    plane crosses packed 2-bit (4x), and the 4x-wider vertex plane is
    fetched only when the caller needs it (verts=False skips it;
    verts_cols=C fetches just the first C columns — context priming
    reads only the head window)."""
    from ..graph import traverse as T_
    from ..graph import unitigs as U_
    from ..graph import store as gstore_
    ol = np.asarray(st.base.out_len)
    Lmax = st.base.out_bases.shape[1]
    Lc = 4
    while Lc < min(int(ol.max(initial=0)), Lmax):
        Lc *= 2
    Lc = min(Lc, -(-Lmax // 4) * 4)   # pow2 bucket, capped at ceil4(Lmax)
    ob = _unpack2_np(np.asarray(_pack2_dev(st.base.out_bases, Lc)), Lc)
    W = min(Lc, Lmax) if verts_cols is None else min(verts_cols, Lmax)
    if not verts or W == 0:
        ov = np.full((ob.shape[0], W), -1, np.int32) if verts else None
    else:
        ov = np.asarray(st.base.out_vert[:, :W]).copy()
    hc = np.asarray(st.hop_cnt)
    if hc.max(initial=0) == 0:
        return ob, ov
    uedges = gstore_.cached_union_edges(g)
    uv = U_.cached_unitig_view(g.keys, uedges, g.k)
    chars = T_.cached_emit_chars(g.keys, g.k)
    end, dist, is_cyc, order, sorted_chars, run_start = \
        T_._chain_layout(uv, chars)
    pos_of = np.empty(order.shape[0], np.int64)
    pos_of[order] = np.arange(order.shape[0])
    hv = np.asarray(st.hop_v)
    hn = np.asarray(st.hop_n)
    ho = np.asarray(st.hop_off)
    for b in range(ob.shape[0]):
        for h in range(int(hc[b])):
            v, n, off = int(hv[b, h]), int(hn[b, h]), int(ho[b, h])
            if n <= 0:
                continue
            p = pos_of[v]
            nb = min(n, Lc - off)
            if nb > 0:
                ob[b, off:off + nb] = sorted_chars[p + 1:p + 1 + nb]
            if ov is not None:
                nv = min(n, W - off)
                if nv > 0:
                    ov[b, off:off + nv] = order[p + 1:p + 1 + nv]
    return ob, ov


def _choose_linked(g, links, st: LinkedWalkState, pop_nib, col_nib,
                   missing_check: bool = False):
    """Full 9-state decision (graph_walker_choose)."""
    nuc0, go0, status0 = T.choose_linkless(pop_nib, col_nib)
    fork = status0 == T.NOLINKS  # in-colour fork: link logic engages
    live = st.cur_link >= 0
    bases = _cursor_bases(links, st)
    age = jnp.where(live, st.cur_age, -1)
    max_age = jnp.max(age, axis=1)
    has_curs = live.any(axis=1)
    # unanimity among max-age cursors
    is_oldest = live & (st.cur_age == max_age[:, None])
    # representative base of the oldest cohort
    first_idx = jnp.argmax(is_oldest, axis=1)
    rep = bases[jnp.arange(bases.shape[0]), first_idx]
    split = (is_oldest & (bases != rep[:, None])).any(axis=1)
    # the chosen base must be one of the in-colour candidates
    cand_ok = ((col_nib >> rep) & 1).astype(bool)
    # missing-information check (ref graph_walker_choose:497-504): every
    # in-colour candidate must be covered by some path or counter path
    if missing_check:
        taken = jnp.zeros_like(col_nib)
        pb = jnp.where(live, jnp.uint8(1) << bases, 0)
        for c in range(pb.shape[1]):
            taken = taken | pb[:, c]
        cb = _cntr_bases(links, st)
        clive = st.cntr_link >= 0
        cbb = jnp.where(clive, jnp.uint8(1) << cb, 0)
        for c in range(cbb.shape[1]):
            taken = taken | cbb[:, c]
        pop4 = jnp.asarray(T._POP4)
        missing = pop4[(taken & col_nib).astype(jnp.int32)] < \
            pop4[col_nib.astype(jnp.int32)]
    else:
        missing = jnp.zeros(col_nib.shape, bool)
    use = fork & has_curs & (max_age >= 1) & ~split & cand_ok & ~missing
    status = jnp.where(
        fork,
        jnp.where(~has_curs | (max_age < 1), jnp.int32(T.NOLINKS),
                  jnp.where(split, jnp.int32(T.SPLIT_LINKS),
                            jnp.where(missing,
                                      jnp.int32(T.MISSING_LINKS),
                                      jnp.where(cand_ok,
                                                jnp.int32(T.USELINKS),
                                                jnp.int32(T.SPLIT_LINKS))))),
        status0)
    nuc = jnp.where(use, rep, nuc0)
    go = jnp.where(fork, use, go0)
    path_gap = _path_gap(st, live, bases, rep)
    return nuc, go, status, path_gap


@functools.partial(jax.jit,
                   static_argnames=("colour", "ctpcol", "edge_colour",
                                    "max_steps", "missing_check",
                                    "min_step", "min_cumul",
                                    "track_used"))
def walk_linked(g: gstore.DBGraph, links: lstore.LinkStore,
                st: LinkedWalkState, colour: int | None,
                max_steps: int, ctpcol: int = 0,
                edge_colour: int = 0,
                missing_check: bool = False,
                adj: jnp.ndarray | None = None,
                conf_table: jnp.ndarray | None = None,
                min_step: float = -1.0, min_cumul: float = -1.0,
                track_used: bool = False,
                forced: jnp.ndarray | None = None,
                forced_n: jnp.ndarray | None = None,
                hopinfo=None) -> LinkedWalkState:
    """forced/forced_n: per-walker context priming (ref
    graph_walker_prime + graph_walker_traverse): for the first
    forced_n[i] steps, walker i takes forced[i, step] regardless of the
    choose outcome — links are picked up and cursors consumed/killed
    exactly as on a free walk (force_jump semantics).  The forced path
    must exist in the graph (callers prime along aligned read kmers);
    callers skip the first forced_n outputs.

    hopinfo: optional (jump, tgt) from get_hopinfo — event-free unitig
    interiors are crossed in one update, with hop records instead of
    per-step output writes (fill with fill_hop_outputs).  Incompatible
    with forced priming (prime first, then walk with hops)."""
    if hopinfo is not None and forced is not None:
        raise ValueError("hopinfo and forced priming are exclusive")
    start = st.base.nsteps

    def cond(st):
        return (st.base.active
                & (st.base.nsteps - start < max_steps)).any()

    def body(st):
        b = st.base
        pop_nib, col_nib = T._candidates(g, b, colour, adj)
        nuc, go, status, path_gap = _choose_linked(
            g, links, st, pop_nib, col_nib, missing_check)
        is_fork = status == T.USELINKS
        if forced is not None:
            fstep = b.nsteps - start
            take = b.active & (fstep < forced_n)
            fn = forced[jnp.arange(b.idx.shape[0]),
                        jnp.clip(fstep, 0, forced.shape[1] - 1)]
            nuc = jnp.where(take, fn, nuc).astype(jnp.uint8)
            go = go | take
            # cursors are consumed at in-colour forks on forced steps
            # too (ref _graph_walker_force_jump is_fork argument)
            cnt = ((col_nib & 1) + ((col_nib >> 1) & 1)
                   + ((col_nib >> 2) & 1) + ((col_nib >> 3) & 1))
            is_fork = jnp.where(take, cnt > 1, is_fork)
        adv = b.active & go
        lost_nuc = kops.first_base(b.okm, g.k)
        nxt_okm = kops.shift_append(b.okm, nuc, g.k)
        if adj is not None:
            from ..graph import adjacency as adjmod
            v = b.idx * 2 + b.orient.astype(jnp.int32)
            nv = adjmod.adj_at(adj, v, nuc)
            j = jnp.maximum(nv, 0) >> 1
            o2 = (jnp.maximum(nv, 0) & 1).astype(jnp.uint8)
        else:
            key2, o2 = kops.canonical(nxt_okm, g.k)
            j, found = sops.lookup(g.keys, key2)
        okm = jnp.where(adv[:, None], nxt_okm, b.okm)
        idx = jnp.where(adv, j, b.idx)
        orient = jnp.where(adv, o2, b.orient).astype(jnp.uint8)
        nb = b.replace(okm=okm, idx=idx, orient=orient)

        # 1) cursor advancement on resolved forks
        move_fork = adv & is_fork
        bases = _cursor_bases(links, st)
        live = st.cur_link >= 0
        match = bases == nuc[:, None]
        exhausted = st.cur_pos + 1 >= _nj_of(links, st)
        keep = live & jnp.where(move_fork[:, None], match & ~exhausted,
                                jnp.ones_like(match))
        cur_pos = jnp.where(move_fork[:, None] & keep,
                            st.cur_pos + 1, st.cur_pos)
        cur_link = jnp.where(keep, st.cur_link, -1)

        # 1b) counter cursors advance on forks too; die on mismatch or
        # when the NEXT position would be the last (force_jump :586-597)
        if missing_check:
            cbases = _cntr_bases(links, st)
            clive = st.cntr_link >= 0
            cmatch = (cbases == nuc[:, None]) & \
                (st.cntr_pos + 1 < _cnj_of(links, st))
            ckeep = clive & jnp.where(move_fork[:, None], cmatch,
                                      jnp.ones_like(cmatch))
            cntr_pos = jnp.where(move_fork[:, None] & ckeep,
                                 st.cntr_pos + 1, st.cntr_pos)
            cntr_link = jnp.where(ckeep, st.cntr_link, -1)
        else:
            cntr_pos, cntr_link = st.cntr_pos, st.cntr_link

        # 1c) a cursor that matched its LAST junction at a resolved fork
        # was followed start-to-end: mark its link used (ref
        # graph_walker.c:576-579)
        if track_used:
            done = live & move_fork[:, None] & match & exhausted
            lid = jnp.where(done, st.cur_link, st.used.shape[0])
            used = st.used.at[lid.reshape(-1)].set(True, mode="drop")
        else:
            used = st.used

        # 2) segment boundary: out-fork taken or in-merge at the new node
        rv_fork = _other_prev_exists(g, nb, lost_nuc, edge_colour) & adv
        bump = (move_fork | rv_fork)
        cur_age = jnp.where(bump[:, None] & (cur_link >= 0),
                            st.cur_age + 1, st.cur_age)
        # graph-segment window update (ref _gw_gseg_update): on a
        # boundary push a fresh segment (in_fork = rv_fork), then count
        # the node just stepped onto in the newest segment
        B_ = bump.shape[0]
        shift_nodes = jnp.concatenate(
            [jnp.zeros((B_, 1), jnp.int32), st.seg_nodes[:, :-1]], axis=1)
        shift_infork = jnp.concatenate(
            [rv_fork[:, None], st.seg_infork[:, :-1]], axis=1)
        seg_nodes = jnp.where(bump[:, None], shift_nodes, st.seg_nodes)
        seg_infork = jnp.where(bump[:, None], shift_infork,
                               st.seg_infork)
        seg_nodes = seg_nodes.at[:, 0].add(adv.astype(jnp.int32))

        # confidence model (ref assemble_contigs.c:100-117): on a
        # USELINKS step, gap = path_gap + k-1 + 2 bp; cumulative product
        if conf_table is not None:
            gap_bp = path_gap + (g.k - 1) + 2
            tlen = conf_table.shape[0]
            confid = jnp.where(
                gap_bp < tlen,
                conf_table[jnp.clip(gap_bp, 0, tlen - 1)].astype(
                    jnp.float32),
                jnp.float32(0.0))
            is_use = (status == T.USELINKS) & adv
            cum_conf = jnp.where(is_use, st.cum_conf * confid,
                                 st.cum_conf)
            max_gap = jnp.where(is_use,
                                jnp.maximum(st.max_gap, gap_bp),
                                st.max_gap)
            low_step = is_use & (confid < jnp.float32(min_step)) \
                if min_step >= 0 else jnp.zeros_like(is_use)
            low_cum = is_use & (cum_conf < jnp.float32(min_cumul)) \
                if min_cumul >= 0 else jnp.zeros_like(is_use)
        else:
            cum_conf, max_gap = st.cum_conf, st.max_gap
            low_step = jnp.zeros(adv.shape, bool)
            low_cum = jnp.zeros(adv.shape, bool)

        st2 = st.replace(base=nb, cur_link=cur_link, cur_pos=cur_pos,
                         cur_age=cur_age, cntr_link=cntr_link,
                         cntr_pos=cntr_pos, seg_nodes=seg_nodes,
                         seg_infork=seg_infork, cum_conf=cum_conf,
                         max_gap=max_gap, used=used)

        # 2b) counter pickup at the new node's other predecessors happens
        # BEFORE the age bump lands on them... the reference bumps all
        # ages (incl. just-added counters) when rv_fork fires
        # (_gw_gseg_update after add_counter_paths)
        if missing_check:
            st2 = _pickup_counter(g, links, st2, adv, lost_nuc, ctpcol,
                                  edge_colour)
        cntr_age = jnp.where(bump[:, None] & (st2.cntr_link >= 0),
                             st2.cntr_age + 1, st2.cntr_age)
        st2 = st2.replace(cntr_age=cntr_age)

        # 3) pick up links at the new node (only advancing walkers)
        st2 = st2.replace(base=st2.base.replace(active=adv))
        st2 = _pickup(g, links, st2, ctpcol)

        # 4) Brent cycle check on full linked state
        h = _linked_hash(st2)
        nb2, cyc = T.brent_update(st2.base, h, adv)
        adv2 = adv & ~cyc

        # 5) output base
        B = b.idx.shape[0]
        Lmax = b.out_bases.shape[1]
        hit_max = adv2 & (b.out_len >= Lmax)
        writes = adv2 & ~hit_max
        pos_w = jnp.where(writes, b.out_len, Lmax)
        out_bases = nb2.out_bases.at[jnp.arange(B), pos_w].set(
            nuc, mode="drop")
        out_vert = nb2.out_vert.at[jnp.arange(B), pos_w].set(
            idx * 2 + orient.astype(jnp.int32), mode="drop")
        out_len = jnp.where(writes, b.out_len + 1, b.out_len)
        new_status = jnp.where(
            adv, jnp.where(cyc, T.HALT_CYCLE,
                           jnp.where(hit_max, T.HALT_MAXLEN, status)),
            jnp.where(b.active, status, b.status))
        active = b.active & go & ~cyc & ~hit_max
        # confidence halts land AFTER the step is written (the reference
        # breaks after db_node_buf_add, assemble_contigs.c:100-117)
        new_status = jnp.where(
            low_step, jnp.int32(T.LOW_STEP_CONF),
            jnp.where(low_cum, jnp.int32(T.LOW_CUMUL_CONF), new_status))
        active = active & ~low_step & ~low_cum
        nb2 = nb2.replace(
            out_bases=out_bases, out_vert=out_vert, out_len=out_len,
            status=new_status.astype(jnp.int32), active=active,
            nsteps=b.nsteps + b.active.astype(jnp.int32))
        if hopinfo is not None:
            # unitig-interior hop: the node just arrived at had its
            # full arrival processing above; if the next jump[v]
            # vertices are event-free (no links, no degree changes, no
            # cycles) nothing in the linked state can change across
            # them — cross in one update and record a hop
            jump_arr, tgt_arr = hopinfo
            rowsB = jnp.arange(B)
            v_now = nb2.idx * 2 + nb2.orient.astype(jnp.int32)
            J = jump_arr[v_now]
            room_len = Lmax - nb2.out_len
            room_steps = max_steps - (nb2.nsteps - start)
            J = jnp.minimum(J, jnp.minimum(room_len, room_steps))
            can = (nb2.active & writes & (J > 0)
                   & (st2.hop_cnt < HOP_CAP))
            slot = jnp.clip(st2.hop_cnt, 0, HOP_CAP - 1)
            hop_v = st2.hop_v.at[rowsB, slot].set(
                jnp.where(can, v_now, st2.hop_v[rowsB, slot]))
            hop_n = st2.hop_n.at[rowsB, slot].set(
                jnp.where(can, J, st2.hop_n[rowsB, slot]))
            hop_off = st2.hop_off.at[rowsB, slot].set(
                jnp.where(can, nb2.out_len, st2.hop_off[rowsB, slot]))
            hop_cnt = st2.hop_cnt + can.astype(jnp.int32)
            Jw = jnp.where(can, J, 0)
            tgt = tgt_arr[v_now]
            new_idx = jnp.where(can, tgt >> 1, nb2.idx)
            new_or = jnp.where(can, (tgt & 1).astype(jnp.uint8),
                               nb2.orient)
            new_okm = jnp.where(
                can[:, None],
                kops.oriented(g.keys[new_idx], new_or, g.k), nb2.okm)
            nb2 = nb2.replace(idx=new_idx, orient=new_or, okm=new_okm,
                              out_len=nb2.out_len + Jw,
                              nsteps=nb2.nsteps + Jw)
            st2 = st2.replace(
                seg_nodes=st2.seg_nodes.at[:, 0].add(Jw),
                hop_v=hop_v, hop_n=hop_n, hop_off=hop_off,
                hop_cnt=hop_cnt)
        return st2.replace(base=nb2)

    return jax.lax.while_loop(cond, body, st)


def _nj_of(links: lstore.LinkStore, st: LinkedWalkState):
    if links.nlinks == 0:
        return jnp.ones_like(st.cur_pos)
    lid = jnp.clip(st.cur_link, 0, links.nlinks - 1)
    return links.nj[lid]


def _cnj_of(links: lstore.LinkStore, st: LinkedWalkState):
    if links.nlinks == 0:
        return jnp.ones_like(st.cntr_pos)
    lid = jnp.clip(st.cntr_link, 0, links.nlinks - 1)
    return links.nj[lid]


def _other_prev_exists(g, b, lost_nuc, edge_colour):
    """True where the (new) current node has in-colour predecessors other
    than the node we came from (ref db_graph_prev_nodes_with_mask)."""
    ebyte = g.edges[b.idx, edge_colour]
    in_nib = E.with_orientation(ebyte, jnp.uint8(1) - b.orient)
    back_bit = jnp.uint8(1) << ((jnp.uint8(3) - lost_nuc) & 3)
    rem = in_nib & (~back_bit)
    return rem > 0


def walk_linked_chunked(g, links, st, colour, max_steps, ctpcol=0,
                        missing_check=False, adj=None, chunk=512,
                        conf_table=None, min_step=-1.0, min_cumul=-1.0,
                        track_used=False, hopinfo=None):
    """Resumable linked walking (bounded per-dispatch execution).

    As in graph/traverse.walk_chunked, the all-halted check runs one
    chunk behind the dispatches so the per-chunk host fetch overlaps
    device work (a speculative chunk on a halted state is a no-op).

    With hopinfo, a chunk's nsteps budget covers hopped nodes too, so
    long contigs complete in a handful of dispatches."""
    done = 0
    prev_active = None
    while done < max_steps:
        take = min(chunk, max_steps - done)
        st = walk_linked(g, links, st, colour, max_steps=take,
                         ctpcol=ctpcol, missing_check=missing_check,
                         adj=adj, conf_table=conf_table,
                         min_step=min_step, min_cumul=min_cumul,
                         track_used=track_used, hopinfo=hopinfo)
        done += take
        act = st.base.active.any()
        try:
            act.copy_to_host_async()
        except Exception:
            pass
        if prev_active is not None and not bool(prev_active):
            break
        prev_active = act
    return st


def assemble_contigs_linked(g: gstore.DBGraph, links: lstore.LinkStore,
                            seed_rows: np.ndarray, colour: int | None = 0,
                            max_len: int = 4096, ctpcol: int = 0,
                            missing_check: bool = False):
    """Linked contig assembly (role of ref assemble_contigs.c with paths;
    no confidence model yet)."""
    from ..utils.text import kmers_to_strings
    B = len(seed_rows)
    if B == 0:
        return [], np.zeros((0, 2), np.int32)
    seeds = jnp.asarray(seed_rows, jnp.int32)
    from ..graph import adjacency as adjmod
    adj = adjmod.get_adjacency(g)
    hopinfo = get_hopinfo(g, links)
    halves, stats = [], []
    for o in (0, 1):
        st = linked_init(g, links, seeds, jnp.full((B,), o, jnp.uint8),
                         max_len, ctpcol)
        st = walk_linked_chunked(g, links, st, colour, max_len + 1,
                                 ctpcol=ctpcol,
                                 missing_check=missing_check, adj=adj,
                                 hopinfo=hopinfo, chunk=4096)
        ob, _ov = fill_hop_outputs(g, st, verts=False)
        halves.append((ob, np.asarray(st.base.out_len)))
        stats.append(np.asarray(st.base.status))
        report_drops(st, "contigs")
    seed_strs = kmers_to_strings(np.asarray(g.keys)[seed_rows], g.k)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    basechars = "ACGT"
    contigs = []
    fw_b, fw_l = halves[0]
    rv_b, rv_l = halves[1]
    for i in range(B):
        right = "".join(basechars[c] for c in fw_b[i, :fw_l[i]])
        left_rc = "".join(basechars[c] for c in rv_b[i, :rv_l[i]])
        left = "".join(comp[c] for c in reversed(left_rc))
        contigs.append(left + seed_strs[i] + right)
    return contigs, np.stack([stats[0], stats[1]], axis=1)


@functools.partial(jax.jit, static_argnames=("ctpcol", "edge_colour"))
def walk_along(g: gstore.DBGraph, links: lstore.LinkStore,
               st: LinkedWalkState, path_verts: jnp.ndarray,
               path_len: jnp.ndarray, ctpcol: int = 0,
               edge_colour: int = 0) -> LinkedWalkState:
    """Force-traverse each walker along its prescribed vertex path,
    picking up links and updating cursors (role of ref
    graph_walker_traverse / graph_walker_prime, graph_walker.c:709-726).

    path_verts: (B, C) vertices; st must already sit at path_verts[:,0]
    (with pickup done).  Walkers advance to path_verts[:, i] for
    i = 1..path_len-1; nothing is written to the output buffers.
    """
    B, C = path_verts.shape
    pop4 = jnp.asarray(T._POP4)

    def body(i, st):
        b = st.base
        on_path = (i < path_len) & b.active
        # is_fork: out-degree in the edge colour at the CURRENT node
        ebyte = g.edges[b.idx, edge_colour]
        nib = E.with_orientation(ebyte, b.orient)
        is_fork = pop4[nib.astype(jnp.int32)] > 1
        nxt_v = jnp.take_along_axis(
            path_verts, jnp.full((B, 1), i, jnp.int32), axis=1)[:, 0]
        j = jnp.maximum(nxt_v, 0) >> 1  # padded (-1) rows are masked off
        o2 = (jnp.maximum(nxt_v, 0) & 1).astype(jnp.uint8)
        okm2 = kops.oriented(g.keys[j], o2, g.k)
        nuc = kops.last_base(okm2)
        lost_nuc = kops.first_base(b.okm, g.k)
        adv = on_path & (nxt_v >= 0)
        nb = b.replace(
            okm=jnp.where(adv[:, None], okm2, b.okm),
            idx=jnp.where(adv, j.astype(jnp.int32), b.idx),
            orient=jnp.where(adv, o2, b.orient).astype(jnp.uint8))
        # cursor advancement at forks
        move_fork = adv & is_fork
        bases = _cursor_bases(links, st)
        live = st.cur_link >= 0
        match = bases == nuc[:, None]
        exhausted = st.cur_pos + 1 >= _nj_of(links, st)
        keep = live & jnp.where(move_fork[:, None], match & ~exhausted,
                                jnp.ones_like(match))
        cur_pos = jnp.where(move_fork[:, None] & keep, st.cur_pos + 1,
                            st.cur_pos)
        cur_link = jnp.where(keep, st.cur_link, -1)
        rv_fork = _other_prev_exists(g, nb, lost_nuc, edge_colour) & adv
        bump = move_fork | rv_fork
        cur_age = jnp.where(bump[:, None] & (cur_link >= 0),
                            st.cur_age + 1, st.cur_age)
        # keep the segment window in sync with ages during priming
        # (ref graph_walker_prime -> force_jump -> _gw_gseg_update)
        B_ = bump.shape[0]
        shift_nodes = jnp.concatenate(
            [jnp.zeros((B_, 1), jnp.int32), st.seg_nodes[:, :-1]], axis=1)
        shift_infork = jnp.concatenate(
            [rv_fork[:, None], st.seg_infork[:, :-1]], axis=1)
        seg_nodes = jnp.where(bump[:, None], shift_nodes, st.seg_nodes)
        seg_infork = jnp.where(bump[:, None], shift_infork,
                               st.seg_infork)
        seg_nodes = seg_nodes.at[:, 0].add(adv.astype(jnp.int32))
        st2 = st.replace(base=nb, cur_link=cur_link, cur_pos=cur_pos,
                         cur_age=cur_age, seg_nodes=seg_nodes,
                         seg_infork=seg_infork)
        # pickup at the new node (only for advancing walkers)
        saved_active = st2.base.active
        st2 = st2.replace(base=st2.base.replace(active=adv))
        st2 = _pickup(g, links, st2, ctpcol)
        st2 = st2.replace(base=st2.base.replace(active=saved_active))
        return st2

    st = jax.lax.fori_loop(1, C, body, st)
    return st.replace(base=st.base.replace(
        brent_hash=_linked_hash(st),
        brent_steps=jnp.zeros_like(st.base.brent_steps),
        brent_limit=jnp.ones_like(st.base.brent_limit)))


def assemble_contigs_primed(g: gstore.DBGraph, links: lstore.LinkStore,
                            seed_rows: np.ndarray, colour: int | None = 0,
                            max_len: int = 4096, ctpcol: int = 0,
                            max_context: int = 200,
                            missing_check: bool = False,
                            conf_table=None, min_step: float = -1.0,
                            min_cumul: float = -1.0,
                            track_used: bool = False,
                            return_extra: bool = False):
    """Contig assembly with direction-1 priming (ref assemble_contigs.c:
    88-90: after walking direction 0, the second direction's walker is
    primed along the reversed direction-0 path, so links picked up on
    the way resolve forks behind the seed)."""
    from ..utils.text import kmers_to_strings
    B = len(seed_rows)
    if B == 0:
        return [], np.zeros((0, 2), np.int32)
    seeds = jnp.asarray(seed_rows, jnp.int32)

    from ..graph import adjacency as adjmod
    adj = adjmod.get_adjacency(g)
    hopinfo = get_hopinfo(g, links)
    hop_chunk = 4096
    # direction 0: cold start at (seed, FORWARD)
    st0 = linked_init(g, links, seeds, jnp.zeros((B,), jnp.uint8),
                      max_len, ctpcol)
    st0 = walk_linked_chunked(g, links, st0, colour, max_len + 1,
                              ctpcol=ctpcol, missing_check=missing_check,
                              adj=adj, conf_table=conf_table,
                              min_step=min_step, min_cumul=min_cumul,
                              track_used=track_used, hopinfo=hopinfo,
                              chunk=hop_chunk)
    fw_l = np.asarray(st0.base.out_len)
    # direction 1 context: reversed direction-0 path (vertices flipped),
    # truncated to the last max_context nodes, ending AT the seed.  The
    # ctx chain reads only fw_v[:, :C-1], so only that head window of
    # the vertex plane crosses D2H (verts_cols)
    C = int(min(max_context, max(int(fw_l.max()), 0) + 1))
    fw_b, fw_v = fill_hop_outputs(g, st0, verts_cols=max(C - 1, 0))
    stat0 = np.asarray(st0.base.status)
    ctx_verts = np.full((B, max(C, 1)), -1, np.int32)
    ctx_len = np.zeros(B, np.int32)
    seed_v1 = (np.asarray(seed_rows) * 2 + 1).astype(np.int32)
    for b in range(B):
        L = int(fw_l[b])
        take = min(L, C - 1)
        # walk dir0 went seed -> v1 -> ... -> vL; reversed-with-flip:
        # flip(v_take) ... flip(v1), then the seed reversed
        chain = [int(v) ^ 1 for v in fw_v[b, :take][::-1].tolist()]
        path = chain + [int(seed_v1[b])]
        ctx_verts[b, :len(path)] = path
        ctx_len[b] = len(path)
    start_rows = jnp.asarray((ctx_verts[:, 0] >> 1).astype(np.int32))
    start_or = jnp.asarray((ctx_verts[:, 0] & 1).astype(np.uint8))
    st1 = linked_init(g, links, jnp.where(jnp.asarray(ctx_len) > 0,
                                          start_rows, seeds),
                      jnp.where(jnp.asarray(ctx_len) > 0, start_or,
                                jnp.ones((B,), jnp.uint8)),
                      max_len, ctpcol)
    st1 = walk_along(g, links, st1, jnp.asarray(ctx_verts),
                     jnp.asarray(ctx_len), ctpcol=ctpcol)
    st1 = walk_linked_chunked(g, links, st1, colour, max_len + 1,
                              ctpcol=ctpcol, missing_check=missing_check,
                              adj=adj, conf_table=conf_table,
                              min_step=min_step, min_cumul=min_cumul,
                              track_used=track_used, hopinfo=hopinfo,
                              chunk=hop_chunk)
    rv_b, _rv_v = fill_hop_outputs(g, st1, verts=False)
    rv_l = np.asarray(st1.base.out_len)
    stat1 = np.asarray(st1.base.status)

    seed_strs = kmers_to_strings(np.asarray(g.keys)[seed_rows], g.k)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    basechars = "ACGT"
    contigs = []
    for i in range(B):
        right = "".join(basechars[c] for c in fw_b[i, :fw_l[i]])
        left_rc = "".join(basechars[c] for c in rv_b[i, :rv_l[i]])
        left = "".join(comp[c] for c in reversed(left_rc))
        contigs.append(left + seed_strs[i] + right)
    stats = np.stack([stat0, stat1], axis=1)
    if return_extra:
        extra = {
            "cum_conf": np.stack([np.asarray(st0.cum_conf),
                                  np.asarray(st1.cum_conf)], axis=1),
            "max_gap": np.stack([np.asarray(st0.max_gap),
                                 np.asarray(st1.max_gap)], axis=1),
            "used": (np.asarray(st0.used) | np.asarray(st1.used)),
        }
        return contigs, stats, extra
    return contigs, stats


# ---------------------------------------------------------------------------
# link fetch: follow a link's junction choices through the graph
# (role of ref gpath_fetch, gpath_checks.c:199-234; also the machinery
# behind link-walkability health checks, gpath_checks_path_col :243)
# ---------------------------------------------------------------------------

def link_vertices(links: lstore.LinkStore, N: int) -> np.ndarray:
    """Vertex (2*row+orient) of every link id (host, from CSR offsets)."""
    offs = np.asarray(links.offsets)
    return np.repeat(np.arange(2 * N), np.diff(offs))


@functools.partial(jax.jit, static_argnames=("edge_colour", "max_steps"))
def _fetch_links_jit(g: gstore.DBGraph, links: lstore.LinkStore,
                     start_vert: jnp.ndarray, link_ids: jnp.ndarray,
                     edge_colour: int, max_steps: int,
                     adj: jnp.ndarray | None = None):
    B = start_vert.shape[0]
    pop4 = jnp.asarray(T._POP4)
    idx0 = start_vert >> 1
    or0 = (start_vert & 1).astype(jnp.uint8)
    nj = links.nj[link_ids] if links.nlinks else jnp.zeros((B,), jnp.int32)

    out_vert = jnp.full((B, max_steps + 1), -1, jnp.int32)
    out_vert = out_vert.at[:, 0].set(start_vert)

    def cond(s):
        return s["active"].any()

    def body(s):
        okm, idx, orient = s["okm"], s["idx"], s["orient"]
        nib = E.with_orientation(g.edges[idx, edge_colour], orient)
        outdeg = pop4[nib.astype(jnp.int32)]
        at_fork = outdeg > 1
        # junction base at the cursor for forks
        jb = lstore.unpack_junc(
            links.seq[jnp.clip(link_ids, 0, max(links.nlinks - 1, 0))],
            s["pos"]) if links.nlinks else jnp.zeros((B,), jnp.uint8)
        # single-edge base: lowest set bit of the nibble
        single = jnp.argmax(
            jnp.stack([(nib >> n) & 1 for n in range(4)], axis=1), axis=1
        ).astype(jnp.uint8)
        nuc = jnp.where(at_fork, jb, single)
        # the chosen base must exist as an edge (walkability condition)
        has_edge = ((nib >> nuc) & 1).astype(bool)
        adv = s["active"] & (outdeg > 0) & has_edge & \
            jnp.where(at_fork, s["pos"] < nj, True)
        nxt_okm = kops.shift_append(okm, nuc, g.k)
        if adj is not None:
            from ..graph import adjacency as adjmod
            v = idx * 2 + orient.astype(jnp.int32)
            nv = adjmod.adj_at(adj, v, nuc)
            j = jnp.maximum(nv, 0) >> 1
            o2 = (jnp.maximum(nv, 0) & 1).astype(jnp.uint8)
        else:
            key2, o2 = kops.canonical(nxt_okm, g.k)
            j, _found = sops.lookup(g.keys, key2)
        pos2 = jnp.where(adv & at_fork, s["pos"] + 1, s["pos"])
        ln2 = jnp.where(adv, s["len"] + 1, s["len"])
        ov = s["out_vert"].at[jnp.arange(B),
                              jnp.where(adv, ln2, max_steps + 1)].set(
            j * 2 + o2.astype(jnp.int32), mode="drop")
        # done once every junction is consumed (last junction node added)
        done = pos2 >= nj
        fail = s["active"] & ~adv
        return {
            "okm": jnp.where(adv[:, None], nxt_okm, okm),
            "idx": jnp.where(adv, j, idx),
            "orient": jnp.where(adv, o2, orient).astype(jnp.uint8),
            "pos": pos2, "len": ln2, "out_vert": ov,
            "active": adv & ~done & (ln2 < max_steps),
            "ok": s["ok"] & ~fail,
            "done": s["done"] | (adv & done),
        }

    okm0 = kops.oriented(g.keys[idx0], or0, g.k)
    init = {
        "okm": okm0, "idx": idx0.astype(jnp.int32), "orient": or0,
        "pos": jnp.zeros((B,), nj.dtype), "len": jnp.zeros((B,), jnp.int32),
        "out_vert": out_vert,
        "active": nj > 0, "ok": jnp.ones((B,), bool),
        "done": nj <= 0,
    }
    s = jax.lax.while_loop(cond, body, init)
    return s["out_vert"], s["len"] + 1, s["ok"] & s["done"]


def fetch_link_paths(g: gstore.DBGraph, links: lstore.LinkStore,
                     link_ids: np.ndarray, edge_colour: int = 0,
                     max_steps: int = 2048, adj=None):
    """Follow each link from its kmer through the graph.

    Returns (verts (B, max_steps+1) int32 padded -1, lens (B,), ok (B,))
    — ok means every junction was consumed with a matching edge
    (the link is "walkable", ref gpath_checks.c).
    """
    if len(link_ids) == 0:
        return (np.zeros((0, max_steps + 1), np.int32),
                np.zeros((0,), np.int32), np.zeros((0,), bool))
    lv = link_vertices(links, g.capacity)
    start = jnp.asarray(lv[np.asarray(link_ids)].astype(np.int32))
    v, ln, ok = _fetch_links_jit(g, links, start,
                                 jnp.asarray(link_ids, jnp.int32),
                                 edge_colour, max_steps, adj)
    return np.asarray(v), np.asarray(ln), np.asarray(ok)


def assemble_contigs_from_paths(g: gstore.DBGraph, links: lstore.LinkStore,
                                link_ids: np.ndarray, colour: int | None = 0,
                                max_len: int = 4096, ctpcol: int = 0,
                                missing_check: bool = False,
                                conf_table=None, min_step: float = -1.0,
                                min_cumul: float = -1.0):
    """Assemble contigs seeded from whole link paths (ref
    assemble_contigs.c:273-306 _assemble_from_paths: fetch the link's
    node path, prime the walker along it, extend both directions)."""
    from ..utils.text import kmers_to_strings
    from ..graph import adjacency as adjmod
    B = len(link_ids)
    if B == 0:
        return [], np.zeros((0, 2), np.int32)
    adj = adjmod.get_adjacency(g)
    verts, lens, ok = fetch_link_paths(g, links, link_ids,
                                       max_steps=max_len, adj=adj)
    Cw = verts.shape[1]

    # dir 0: prime along the fetched path, then extend
    s0 = jnp.asarray((verts[:, 0] >> 1).astype(np.int32))
    o0 = jnp.asarray((verts[:, 0] & 1).astype(np.uint8))
    st0 = linked_init(g, links, s0, o0, max_len, ctpcol)
    st0 = walk_along(g, links, st0, jnp.asarray(verts),
                     jnp.asarray(lens), ctpcol=ctpcol)
    st0 = walk_linked_chunked(g, links, st0, colour, max_len + 1,
                              ctpcol=ctpcol, missing_check=missing_check,
                              adj=adj, conf_table=conf_table,
                              min_step=min_step, min_cumul=min_cumul)
    fw_b = np.asarray(st0.base.out_bases)
    fw_l = np.asarray(st0.base.out_len)
    stat0 = np.asarray(st0.base.status)

    # dir 1: prime along the reversed-flipped path (ending at the start
    # vertex flipped; ref primes with the init_len seed-path nodes only)
    rv = np.full_like(verts, -1)
    rlens = lens.copy()
    for b in range(B):
        L = int(lens[b])
        rv[b, :L] = (verts[b, :L][::-1]) ^ 1
    s1 = jnp.asarray((rv[:, 0] >> 1).astype(np.int32))
    o1 = jnp.asarray((rv[:, 0] & 1).astype(np.uint8))
    st1 = linked_init(g, links, s1, o1, max_len, ctpcol)
    st1 = walk_along(g, links, st1, jnp.asarray(rv),
                     jnp.asarray(rlens), ctpcol=ctpcol)
    st1 = walk_linked_chunked(g, links, st1, colour, max_len + 1,
                              ctpcol=ctpcol, missing_check=missing_check,
                              adj=adj, conf_table=conf_table,
                              min_step=min_step, min_cumul=min_cumul)
    rv_b = np.asarray(st1.base.out_bases)
    rv_l = np.asarray(st1.base.out_len)
    stat1 = np.asarray(st1.base.status)

    # path string: seed kmer of vertex 0 + last bases of the rest
    rows = (np.maximum(verts, 0) >> 1).astype(np.int32)
    ors = (np.maximum(verts, 0) & 1).astype(np.uint8)
    lastb = np.asarray(kops.last_base(kops.oriented(
        g.keys[jnp.asarray(rows.reshape(-1))],
        jnp.asarray(ors.reshape(-1)), g.k))).reshape(B, Cw)
    seed_strs = kmers_to_strings(
        np.asarray(g.keys)[rows[:, 0]], g.k)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    basechars = "ACGT"
    contigs = []
    for i in range(B):
        L = int(lens[i])
        mid = seed_strs[i] + "".join(basechars[c]
                                     for c in lastb[i, 1:L])
        right = "".join(basechars[c] for c in fw_b[i, :fw_l[i]])
        left_rc = "".join(basechars[c] for c in rv_b[i, :rv_l[i]])
        left = "".join(comp[c] for c in reversed(left_rc))
        contigs.append(left + mid + right)
    return contigs, np.stack([stat0, stat1], axis=1)
