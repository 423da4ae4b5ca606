"""Link threading: contigs/reads -> link records.

Role of ref src/tools/generate_paths.c (worker_contig_to_junctions :326,
_juncs_to_paths :153): walk each corrected contig through the graph,
record the junction-choice bases, and attach links:

  * at the node just BEFORE each in-junction (indegree > 1), oriented
    along the contig, carrying all FORWARD junction choices from that
    node on (fw juncs at positions >= p-1 for a merge at p);
  * symmetrically at the node just AFTER each out-junction, oriented
    against the contig, carrying the reverse-complemented choices of the
    preceding in-junctions (rv juncs at positions <= q+1 for a fork at
    q), in reverse order.

The whole batch of contigs is processed with vector ops; per-contig
junction lists are compacted with cumsum/scatter, and link sequences are
gathered as (link, junction-index) windows.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kmer as kops
from ..graph import edges as E
from ..graph import store as gstore
from . import store as lstore


class ThreadStats:
    """Per-colour corrected-contig length histogram collected while
    threading (role of ref correct_aln_stats.c:81 cap_contig); saved
    into the .ctp header and consumed by the contigs confidence model."""

    def __init__(self, ncols: int):
        self.contig_hists = [dict() for _ in range(ncols)]

    def add_contig(self, colour: int, len_bp: int, n: int = 1):
        h = self.contig_hists[colour]
        h[len_bp] = h.get(len_bp, 0) + n

    def add_run_lengths(self, colour: int, lens_bp):
        for x in lens_bp:
            self.add_contig(colour, int(x))


def _record_valid_runs(stats, colour, valid: np.ndarray, k: int):
    """Record the length (bp) of each contiguous valid run per read."""
    if stats is None:
        return
    v = np.asarray(valid)
    B = v.shape[0]
    pad = np.zeros((B, 1), bool)
    d = np.diff(np.concatenate([pad, v, pad], axis=1).astype(np.int8),
                axis=1)
    starts = np.nonzero(d == 1)
    ends = np.nonzero(d == -1)
    lens = ends[1] - starts[1]
    stats.add_run_lengths(colour, lens + k - 1)


@functools.partial(jax.jit, static_argnames=("k",))
def _extract_canonical(bases: jnp.ndarray, k: int):
    kmers, valid = kops.rolling_kmers(bases, k)
    keys, orient = kops.canonical(kmers, k)
    return keys, orient, valid


@jax.jit
def _combine_valid(idx, valid, found):
    return idx.astype(jnp.int32), valid & found


def reads_to_node_paths(g: gstore.DBGraph, bases: jnp.ndarray, k: int):
    """Map reads (B, P) to node paths: (idx, orient, valid) per position.
    A position is valid if its kmer window is clean AND present in the
    graph.  Host-level: the store lookup goes through the planar
    hashed-bucket index (ops/hashidx.py), one row gather per kmer."""
    from ..ops import hashidx
    keys, orient, valid = _extract_canonical(bases, k)
    idx, found = hashidx.lookup(g.keys, keys)
    idx, valid = _combine_valid(idx, valid, found)
    return idx, orient, valid


@functools.partial(jax.jit, static_argnames=("k", "edge_colour"))
def junctions_of_paths(g: gstore.DBGraph, idx: jnp.ndarray,
                       orient: jnp.ndarray, valid: jnp.ndarray,
                       bases: jnp.ndarray, k: int, edge_colour: int = 0):
    """Per position: (is_fw_junc, fw_base, is_rv_junc, rv_base_raw).

    fw junction at i: outdeg>1 and position i+1 valid; choice base =
    last base of the oriented node at i+1.
    rv junction at i: indeg>1 and position i-1 valid; raw base = first
    base of the oriented node at i-1 (complemented later).
    (ref generate_paths.c:351-378).  Bases are derived from the node
    path itself so gap-bridged paths (whose bases differ from the read)
    work unchanged; `bases` is unused but kept for API stability.
    """
    B, P = idx.shape
    ebyte = g.edges[idx, edge_colour]
    outdeg = E.outdegree(ebyte, orient)
    indeg = E.indegree(ebyte, orient)
    nxt_valid = jnp.concatenate(
        [valid[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
    prv_valid = jnp.concatenate(
        [jnp.zeros((B, 1), bool), valid[:, :-1]], axis=1)
    is_fw = valid & nxt_valid & (outdeg > 1)
    is_rv = valid & prv_valid & (indeg > 1)
    okm = kops.oriented(g.keys[idx], orient, k)
    lastb = kops.last_base(okm)    # (B, P)
    firstb = kops.first_base(okm, k)
    # choice base for fw junc at i = last base of node i+1
    fw_base = jnp.concatenate(
        [lastb[:, 1:], jnp.zeros((B, 1), lastb.dtype)], axis=1) & 3
    # raw base for rv junc at i = first base of node i-1
    rv_base = jnp.concatenate(
        [jnp.zeros((B, 1), firstb.dtype), firstb[:, :-1]], axis=1) & 3
    return is_fw, fw_base, is_rv, rv_base


def thread_contigs(g: gstore.DBGraph, idx, orient, valid, bases,
                   colour: int, edge_colour: int = 0, jmax: int = 0):
    """Emit raw link records for a batch of node paths (host+device mix).

    Returns (rows, orients, juncs (L, Jmax) u8, nj, colours) numpy arrays
    ready for lstore.build_store.
    """
    k = g.k
    is_fw, fw_base, is_rv, rv_base = junctions_of_paths(
        g, idx, orient, valid, bases, k=k, edge_colour=edge_colour)
    is_fw = np.asarray(is_fw)
    is_rv = np.asarray(is_rv)
    fw_base = np.asarray(fw_base)
    rv_base = np.asarray(rv_base)
    idx = np.asarray(idx)
    orient = np.asarray(orient)
    valid = np.asarray(valid)

    rows_out, orients_out, junc_out, nj_out = [], [], [], []
    B, P = idx.shape
    for b in range(B):
        # split into contiguous valid runs (gaps split contigs, like the
        # reference's alignment gap handling before gap-filling)
        v = valid[b]
        run_starts = np.nonzero(v & ~np.concatenate([[False], v[:-1]]))[0]
        run_ends = np.nonzero(v & ~np.concatenate([v[1:], [False]]))[0]
        for s, e in zip(run_starts, run_ends):
            _thread_one(idx[b], orient[b], is_fw[b], fw_base[b],
                        is_rv[b], rv_base[b], s, e,
                        rows_out, orients_out, junc_out, nj_out)
    L = len(rows_out)
    if L == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros((0, 1), np.uint8), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    Jmax = max(nj_out)
    juncs = np.zeros((L, Jmax), np.uint8)
    for i, jb in enumerate(junc_out):
        juncs[i, :len(jb)] = jb
    return (np.array(rows_out), np.array(orients_out), juncs,
            np.array(nj_out), np.full(L, colour, np.int64))


def _thread_one(idx, orient, is_fw, fw_base, is_rv, rv_base, s, e,
                rows_out, orients_out, junc_out, nj_out):
    """Sequential per-contig link emission (ref _juncs_to_paths).  The
    runs are short (read length); the heavy lifting (lookups, degrees)
    happened on device."""
    pos_fw = [i for i in range(s, e + 1) if is_fw[i] and i + 1 <= e]
    pos_rv = [i for i in range(s, e + 1) if is_rv[i] and i > s]
    if not pos_fw or not pos_rv:
        return
    nuc_fw = [fw_base[i] for i in pos_fw]
    # rv choices: complement of read base before i, in DESCENDING pos
    nuc_rv = [(3 - rv_base[i]) & 3 for i in pos_rv]

    # FW links: for each merge at p (ascending), attach at p-1 along fw.
    # The loop breaks when no fw junction remains at pos >= p; the
    # backtrack then ALSO includes a junction exactly at the attach node
    # (ref _juncs_to_paths "bCD ... backtrack to add the 'F'" comment).
    for p in pos_rv:
        js = 0
        while js < len(pos_fw) and pos_fw[js] < p:
            js += 1
        if js == len(pos_fw):
            break
        js -= (js > 0 and pos_fw[js - 1] == p - 1)
        attach = p - 1
        rows_out.append(idx[attach])
        orients_out.append(orient[attach])
        junc_out.append(nuc_fw[js:])
        nj_out.append(len(nuc_fw) - js)

    # RV links: for each fork at q (descending), attach at q+1 against fw
    pos_rv_desc = pos_rv[::-1]
    nuc_rv_desc = nuc_rv[::-1]
    for q in pos_fw[::-1]:
        js = 0
        while js < len(pos_rv_desc) and pos_rv_desc[js] > q:
            js += 1
        if js == len(pos_rv_desc):
            break
        js -= (js > 0 and pos_rv_desc[js - 1] == q + 1)
        attach = q + 1
        rows_out.append(idx[attach])
        orients_out.append(1 - orient[attach])
        junc_out.append(nuc_rv_desc[js:])
        nj_out.append(len(nuc_rv_desc) - js)


def thread_reads(g: gstore.DBGraph, read_batches, ncols: int,
                 edge_colour: int = 0, stats=None) -> lstore.LinkStore:
    """Thread read batches [(bases (B,P) np.uint8, colour)] through the
    graph and build the deduplicated link store (role of ref
    generate_paths.c:499 generate_paths, without gap filling — reads
    split at missing/unclean kmers)."""
    all_recs = []
    for bases, colour in read_batches:
        bj = jnp.asarray(bases)
        idx, orient, valid = reads_to_node_paths(g, bj, g.k)
        _record_valid_runs(stats, colour, valid, g.k)
        recs = thread_contigs(g, idx, orient, valid, bj, colour,
                              edge_colour)
        if len(recs[0]):
            all_recs.append(recs)
    if not all_recs:
        return lstore.empty(g.capacity, ncols)
    Jmax = max(r[2].shape[1] for r in all_recs)

    def widen(j):
        out = np.zeros((j.shape[0], Jmax), np.uint8)
        out[:, :j.shape[1]] = j
        return out

    rows = np.concatenate([r[0] for r in all_recs])
    orients = np.concatenate([r[1] for r in all_recs])
    juncs = np.concatenate([widen(r[2]) for r in all_recs])
    njs = np.concatenate([r[3] for r in all_recs])
    cols = np.concatenate([r[4] for r in all_recs])
    return lstore.build_store(g.keys, rows, orients, juncs, njs, cols,
                              ncols)


def thread_reads_gapfill(g: gstore.DBGraph, read_batches, ncols: int,
                         links_prev=None, edge_colour: int = 0,
                         stats=None, one_way: bool = True,
                         gap_variance: float = 0.1,
                         gap_wiggle: float = 5,
                         max_context: int | None = None,
                         end_check: bool = True,
                         use_new_paths: bool = False,
                         aln_stats=None):
    """Threading with gap filling: bridge read gaps through the graph
    first (ref generate_paths.c uses correct_alignment), then extract
    junctions from the bridged node paths.

    use_new_paths (ref ctx_thread -u, default off like the ref's
    gpath_store_split_read_write): links emitted by earlier batches
    become visible to later batches' gap walkers (batch granularity
    here vs the ref's per-read)."""
    from ..align import correct as acorrect
    if max_context is None:
        max_context = acorrect.MAX_CONTEXT
    all_recs = []
    cur_links = links_prev
    for bases, colour in read_batches:
        corrected = acorrect.correct_batch(g, cur_links, bases,
                                           colour=edge_colour,
                                           one_way=one_way,
                                           gap_variance=gap_variance,
                                           gap_wiggle=gap_wiggle,
                                           max_context=max_context,
                                           end_check=end_check,
                                           aln_stats=aln_stats)
        # re-pack bridged paths into arrays
        paths = [c.verts for c in corrected if len(c.verts)]
        if not paths:
            continue
        if stats is not None:
            stats.add_run_lengths(colour,
                                  [len(p) + g.k - 1 for p in paths])
        P2 = max(len(p) for p in paths)
        Bc = len(paths)
        idx = np.zeros((Bc, P2), np.int32)
        orient = np.zeros((Bc, P2), np.uint8)
        valid = np.zeros((Bc, P2), bool)
        for i, p in enumerate(paths):
            ok = p >= 0
            idx[i, :len(p)] = np.where(ok, p >> 1, 0)
            orient[i, :len(p)] = np.where(ok, p & 1, 0)
            valid[i, :len(p)] = ok
        recs = thread_contigs(g, jnp.asarray(idx), jnp.asarray(orient),
                              jnp.asarray(valid), None, colour,
                              edge_colour)
        if len(recs[0]):
            all_recs.append(recs)
            if use_new_paths:
                built = _store_from_recs(g, all_recs, ncols)
                cur_links = built if links_prev is None else \
                    lstore.merge_stores(links_prev, built, g.capacity)
    if not all_recs:
        return lstore.empty(g.capacity, ncols)
    return _store_from_recs(g, all_recs, ncols)


def _store_from_recs(g, all_recs, ncols):
    Jmax = max(r[2].shape[1] for r in all_recs)

    def widen(j):
        out = np.zeros((j.shape[0], Jmax), np.uint8)
        out[:, :j.shape[1]] = j
        return out

    rows = np.concatenate([r[0] for r in all_recs])
    orients = np.concatenate([r[1] for r in all_recs])
    juncs = np.concatenate([widen(r[2]) for r in all_recs])
    njs = np.concatenate([r[3] for r in all_recs])
    cols = np.concatenate([r[4] for r in all_recs])
    return lstore.build_store(g.keys, rows, orients, juncs, njs, cols,
                              ncols)


def pair_to_rows(codes1: np.ndarray, codes2: np.ndarray):
    """Lay out mate pairs as r1 + [invalid] + revcomp(r2) rows.
    Returns (rows (B, L1+1+L2) uint8, mate_col)."""
    B, L1 = codes1.shape
    _, L2 = codes2.shape
    rc2 = np.where(codes2 < 4, 3 - codes2, 4)[:, ::-1]
    rows = np.full((B, L1 + 1 + L2), 4, np.uint8)
    rows[:, :L1] = codes1
    rows[:, L1 + 1:] = rc2
    return rows, L1


def thread_reads_pe(g: gstore.DBGraph, pair_batches, ncols: int,
                    links_prev=None, edge_colour: int = 0,
                    frag_len_min: int = 0, frag_len_max: int = 1000,
                    stats=None, one_way: bool = True,
                    max_context: int | None = None,
                    end_check: bool = True, aln_stats=None):
    """Paired-end threading: mates joined through the graph across the
    insert gap (ref generate_paths PE mode), then junction extraction
    over the combined paths — links span whole fragments."""
    from ..align import correct as acorrect
    if max_context is None:
        max_context = acorrect.MAX_CONTEXT
    all_recs = []
    for codes1, codes2, colour in pair_batches:
        rows, mate_col = pair_to_rows(codes1, codes2)
        corrected = acorrect.correct_batch(
            g, links_prev, rows, colour=edge_colour,
            mate_col=mate_col, frag_len_min=frag_len_min,
            frag_len_max=frag_len_max, one_way=one_way,
            max_context=max_context, end_check=end_check,
            aln_stats=aln_stats)
        paths = [c.verts for c in corrected if len(c.verts)]
        if not paths:
            continue
        if stats is not None:
            stats.add_run_lengths(colour,
                                  [len(p) + g.k - 1 for p in paths])
        P2 = max(len(p) for p in paths)
        Bc = len(paths)
        idx = np.zeros((Bc, P2), np.int32)
        orient = np.zeros((Bc, P2), np.uint8)
        valid = np.zeros((Bc, P2), bool)
        for i, p in enumerate(paths):
            ok = p >= 0
            idx[i, :len(p)] = np.where(ok, p >> 1, 0)
            orient[i, :len(p)] = np.where(ok, p & 1, 0)
            valid[i, :len(p)] = ok
        recs = thread_contigs(g, jnp.asarray(idx), jnp.asarray(orient),
                              jnp.asarray(valid), None, colour,
                              edge_colour)
        if len(recs[0]):
            all_recs.append(recs)
    if not all_recs:
        return lstore.empty(g.capacity, ncols)
    Jmax = max(r[2].shape[1] for r in all_recs)

    def widen(j):
        out = np.zeros((j.shape[0], Jmax), np.uint8)
        out[:, :j.shape[1]] = j
        return out

    rows_ = np.concatenate([r[0] for r in all_recs])
    orients = np.concatenate([r[1] for r in all_recs])
    juncs = np.concatenate([widen(r[2]) for r in all_recs])
    njs = np.concatenate([r[3] for r in all_recs])
    cols = np.concatenate([r[4] for r in all_recs])
    return lstore.build_store(g.keys, rows_, orients, juncs, njs, cols,
                              ncols)
