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


@functools.partial(jax.jit, static_argnames=("L", "k"))
def _extract_canonical_packed(packed, nmask, L: int, k: int):
    from ..graph import build as gbuild
    bases = gbuild.unpack_reads(packed, nmask, L)
    kmers, valid = kops.rolling_kmers(bases, k)
    keys, orient = kops.canonical(kmers, k)
    return keys, orient, valid


@jax.jit
def _combine_valid(idx, valid, found):
    return idx.astype(jnp.int32), valid & found


def reads_to_node_paths(g: gstore.DBGraph, bases, k: int):
    """Map reads (B, P) to node paths: (idx, orient, valid) per position.
    A position is valid if its kmer window is clean AND present in the
    graph.  Host-level: the store lookup goes through the planar
    hashed-bucket index (ops/hashidx.py), one row gather per kmer.

    Host numpy batches ship 2-bit packed (+N-mask when needed) and
    decode inside the extraction program — 4x less H2D on the
    tunnel/PCIe-bound ingest, same as the build path."""
    from ..ops import hashidx
    if isinstance(bases, np.ndarray):
        from ..graph import build as gbuild
        packed, nmask, L = gbuild.pack_reads_np(bases)
        nd = jax.device_put(nmask) if nmask is not None else None
        keys, orient, valid = _extract_canonical_packed(
            jax.device_put(packed), nd, L, k)
    else:
        keys, orient, valid = _extract_canonical(bases, k)
    idx, found = hashidx.lookup(g.keys, keys)
    idx, valid = _combine_valid(idx, valid, found)
    return idx, orient, valid


@functools.partial(jax.jit, static_argnames=("k", "edge_colour", "cap"))
def _junction_records(g: gstore.DBGraph, idx: jnp.ndarray,
                      orient: jnp.ndarray, valid: jnp.ndarray,
                      k: int, edge_colour: int, cap: int):
    """Compact junction/run-boundary records for a batch of node paths.

    fw junction at i: outdeg>1 and position i+1 valid; choice base =
    last base of the oriented node at i+1.
    rv junction at i: indeg>1 and position i-1 valid; raw base = first
    base of the oriented node at i-1 (complemented later).
    (ref generate_paths.c:351-378.)

    Only positions that are junctions or valid-run boundaries are
    emitted (ascending flat order), each carrying the neighbour verts
    the host attach loops need — the dense (B, P) planes never cross
    the device boundary (over the TPU tunnel they were ~39 MB per 32k
    read batch; records are a few thousand).  Returns
    (n_true, pos_flat, flags[fw|rv<<1|start<<2|end<<3], fw_base,
    rv_base, vert_prev, vert_next); entries past n_true are padding,
    and n_true > cap means the record buffer overflowed (caller grows
    and retries — the computation is pure).
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
    start = valid & ~prv_valid
    end = valid & ~nxt_valid
    okm = kops.oriented(g.keys[idx], orient, k)
    lastb = (kops.last_base(okm) & 3).astype(jnp.uint8)
    firstb = (kops.first_base(okm, k) & 3).astype(jnp.uint8)
    # choice base for fw junc at i = last base of node i+1
    fw_base = jnp.concatenate(
        [lastb[:, 1:], jnp.zeros((B, 1), jnp.uint8)], axis=1)
    # raw base for rv junc at i = first base of node i-1
    rv_base = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint8), firstb[:, :-1]], axis=1)
    vert = idx.astype(jnp.int32) * 2 + orient.astype(jnp.int32)
    vprev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), vert[:, :-1]], axis=1)
    vnext = jnp.concatenate(
        [vert[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1)
    flags = (is_fw.astype(jnp.uint8)
             | (is_rv.astype(jnp.uint8) << 1)
             | (start.astype(jnp.uint8) << 2)
             | (end.astype(jnp.uint8) << 3))
    mask = flags > 0
    n = jnp.sum(mask, dtype=jnp.int32)
    sel = jnp.nonzero(mask.reshape(-1), size=cap, fill_value=B * P)[0]
    selc = jnp.minimum(sel, B * P - 1).astype(jnp.int32)

    def take(a):
        return a.reshape(-1)[selc]

    pos = jnp.where(sel == B * P, -1, sel).astype(jnp.int32)
    return (n, pos, take(flags), take(fw_base), take(rv_base),
            take(vprev), take(vnext))


# record-buffer size hint carried across batches (same density ->
# one compile); grown to the next pow2 on overflow
_REC_CAP_HINT = [4096]


def _jr_cap_for(nrows: int, jmax: int = 0) -> int:
    # every valid run emits >= 2 boundary records, so size the first
    # attempt from the batch (~4 records/read) — the flat default would
    # overflow (and recompile) on every first big batch
    cap = max(_REC_CAP_HINT[0],
              1 << (4 * max(int(nrows), 1) - 1).bit_length())
    if jmax:
        cap = max(cap, 1 << (int(jmax) - 1).bit_length())
    return cap


def thread_contigs(g: gstore.DBGraph, idx, orient, valid, bases,
                   colour: int, edge_colour: int = 0, jmax: int = 0):
    """Emit raw link records for a batch of node paths (host+device mix).

    `bases` is unused (junction bases derive from the node path itself
    so gap-bridged paths work unchanged); kept for API stability.
    Returns (rows, orients, juncs (L, Jmax) u8, nj, colours) numpy arrays
    ready for lstore.build_store.
    """
    k = g.k
    idx = jnp.asarray(idx)
    orient = jnp.asarray(orient)
    valid = jnp.asarray(valid)
    cap = _jr_cap_for(idx.shape[0], jmax)
    while True:
        n, pos, flags, fwb, rvb, vprev, vnext = _junction_records(
            g, idx, orient, valid, k=k, edge_colour=edge_colour, cap=cap)
        n = int(n)
        if n <= cap:
            break
        cap = 1 << (n - 1).bit_length()
    _REC_CAP_HINT[0] = max(_REC_CAP_HINT[0], cap)
    return _records_walk(n, pos, flags, fwb, rvb, vprev, vnext, colour)


def _records_walk(n, pos, flags, fwb, rvb, vprev, vnext, colour):
    """Host walk over fetched junction records -> raw link-record
    arrays (the sequential tail of thread_contigs, shared with the
    data-parallel path)."""
    pos = np.asarray(pos)[:n]
    flags = np.asarray(flags)[:n]
    fwb = np.asarray(fwb)[:n]
    rvb = np.asarray(rvb)[:n]
    vprev = np.asarray(vprev)[:n]
    vnext = np.asarray(vnext)[:n]

    rows_out, orients_out, junc_out, nj_out = [], [], [], []
    i = 0
    while i < n:
        # records of one valid run: start-flag record .. end-flag record
        fw_pos, fw_base, fw_att = [], [], []
        rv_pos, rv_att = [], []
        nuc_rv = []
        j = i
        while True:
            f = flags[j]
            if f & 1:
                fw_pos.append(int(pos[j]))
                fw_base.append(int(fwb[j]))
                fw_att.append(int(vnext[j]))
            if f & 2:
                rv_pos.append(int(pos[j]))
                nuc_rv.append((3 - int(rvb[j])) & 3)
                rv_att.append(int(vprev[j]))
            if f & 8:
                break
            j += 1
        _emit_run(fw_pos, fw_base, fw_att, rv_pos, nuc_rv, rv_att,
                  rows_out, orients_out, junc_out, nj_out)
        i = j + 1
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


def _emit_run(fw_pos, fw_base, fw_att, rv_pos, nuc_rv, rv_att,
              rows_out, orients_out, junc_out, nj_out):
    """Sequential per-contig link emission (ref _juncs_to_paths) over one
    valid run's junction records.  Positions are flat (row * P + p) —
    within a run all comparisons are same-row so flat order works.  The
    is_fw/is_rv definitions already bound junctions away from the run
    ends (nxt_valid/prv_valid + run maximality), so no edge filtering is
    needed here."""
    if not fw_pos or not rv_pos:
        return

    # FW links: for each merge at p (ascending), attach at p-1 along fw.
    # The loop breaks when no fw junction remains at pos >= p; the
    # backtrack then ALSO includes a junction exactly at the attach node
    # (ref _juncs_to_paths "bCD ... backtrack to add the 'F'" comment).
    for pi, p in enumerate(rv_pos):
        js = 0
        while js < len(fw_pos) and fw_pos[js] < p:
            js += 1
        if js == len(fw_pos):
            break
        js -= (js > 0 and fw_pos[js - 1] == p - 1)
        v = rv_att[pi]              # vert at p-1
        rows_out.append(v >> 1)
        orients_out.append(v & 1)
        junc_out.append(fw_base[js:])
        nj_out.append(len(fw_base) - js)

    # RV links: for each fork at q (descending), attach at q+1 against fw
    rv_pos_desc = rv_pos[::-1]
    nuc_rv_desc = nuc_rv[::-1]
    for qi in range(len(fw_pos) - 1, -1, -1):
        q = fw_pos[qi]
        js = 0
        while js < len(rv_pos_desc) and rv_pos_desc[js] > q:
            js += 1
        if js == len(rv_pos_desc):
            break
        js -= (js > 0 and rv_pos_desc[js - 1] == q + 1)
        v = fw_att[qi]              # vert at q+1
        rows_out.append(v >> 1)
        orients_out.append(1 - (v & 1))
        junc_out.append(nuc_rv_desc[js:])
        nj_out.append(len(nuc_rv_desc) - js)


def thread_reads(g: gstore.DBGraph, read_batches, ncols: int,
                 edge_colour: int = 0, stats=None,
                 devices=None) -> lstore.LinkStore:
    """Thread read batches [(bases (B,P) np.uint8, colour)] through the
    graph and build the deduplicated link store (role of ref
    generate_paths.c:499 generate_paths, without gap filling — reads
    split at missing/unclean kmers).

    devices: list of jax devices for data-parallel threading — the
    store is replicated, read batches round-robin across devices, all
    junction-record programs dispatched before any result is
    collected (the TPU-native form of the reference's per-thread
    generate_paths workers)."""
    if devices is not None and len(devices) > 1:
        return _thread_reads_dp(g, read_batches, ncols, edge_colour,
                                stats, devices)
    all_recs = []
    for bases, colour in read_batches:
        idx, orient, valid = reads_to_node_paths(
            g, np.asarray(bases), g.k)
        _record_valid_runs(stats, colour, valid, g.k)
        recs = thread_contigs(g, idx, orient, valid, None, colour,
                              edge_colour)
        if len(recs[0]):
            all_recs.append(recs)
    if not all_recs:
        return lstore.empty(g.capacity, ncols)
    return _store_from_recs(g, all_recs, ncols)


def _thread_reads_dp(g: gstore.DBGraph, read_batches, ncols: int,
                     edge_colour, stats, devices) -> lstore.LinkStore:
    """Data-parallel thread_reads: replicate (keys, covg, edges) on
    every device, round-robin the read batches, dispatch every batch's
    extraction + lookup + junction-records program asynchronously,
    then collect.  Identical records (and store) to the sequential
    path — only the dispatch schedule differs."""
    import jax as _jax
    from ..graph import build as gbuild
    from ..ops import hashidx
    nd = len(devices)
    gd = [gstore.DBGraph(keys=_jax.device_put(g.keys, d),
                         covg=_jax.device_put(g.covg, d),
                         edges=_jax.device_put(g.edges, d),
                         n=g.n, k=g.k) for d in devices]
    inflight = []
    for i, (bases, colour) in enumerate(read_batches):
        d = devices[i % nd]
        gdx = gd[i % nd]
        packed, nmask, L = gbuild.pack_reads_np(np.asarray(bases))
        pd_ = _jax.device_put(packed, d)
        nd_ = _jax.device_put(nmask, d) if nmask is not None else None
        keys_q, orient, valid = _extract_canonical_packed(
            pd_, nd_, L, g.k)
        idx, found = hashidx.lookup(gdx.keys, keys_q)
        idx, valid = _combine_valid(idx, valid, found)
        cap = _jr_cap_for(idx.shape[0])
        out = _junction_records(gdx, idx, orient, valid, k=g.k,
                                edge_colour=edge_colour, cap=cap)
        inflight.append((out, (gdx, idx, orient, valid), colour, cap))
    all_recs = []
    for out, ctx, colour, cap in inflight:
        _record_valid_runs(stats, colour, ctx[3], g.k)
        n = int(out[0])
        while n > cap:
            cap = 1 << (n - 1).bit_length()
            gdx, idx, orient, valid = ctx
            out = _junction_records(gdx, idx, orient, valid, k=g.k,
                                    edge_colour=edge_colour, cap=cap)
            n = int(out[0])
        _REC_CAP_HINT[0] = max(_REC_CAP_HINT[0], cap)
        recs = _records_walk(n, *out[1:], colour)
        if len(recs[0]):
            all_recs.append(recs)
    if not all_recs:
        return lstore.empty(g.capacity, ncols)
    return _store_from_recs(g, all_recs, ncols)


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
