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
    pop_nib = E.with_orientation(uedges[st.idx], st.orient)
    col_bits = jnp.zeros_like(pop_nib)
    if adj is not None:
        from . import adjacency as adjmod
        v = st.idx * 2 + st.orient.astype(jnp.int32)
        for n in range(4):
            nv = adjmod.adj_at(adj, v, n)
            found = nv >= 0
            j = jnp.maximum(nv, 0) >> 1
            if colour is None:
                incol = found
            else:
                incol = found & (g.covg[j, colour] > 0)
            col_bits = col_bits | (incol.astype(jnp.uint8) << n)
        col_nib = pop_nib & col_bits
        return pop_nib, col_nib
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


def assemble_linkless_contigs(g: gstore.DBGraph, seed_rows: np.ndarray,
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
