"""LinkTree-equivalent link cleaning and inspection.

Role of ref src/paths/link_tree.{c,h} + src/commands/ctx_links.c: rebuild
each kmer's links as a 4-ary junction tree whose edges carry coverage
counts (sum of nseen of every link passing through the junction choice)
and distances (kmers from the root kmer), then

  - clean:      truncate every path at its first junction-edge with
                count < cutoff (ref link_tree.c:236-253 _ltree_clean_link);
                emitted links are the maximal surviving paths
                (ref :278-301 prefix suppression in _ltree_write_ctp_link)
  - list:       CSV of surviving edges as (SeqLen, Covg)
                (ref :259-274 ltree_write_list)
  - covg-hist:  dist x covg matrix over unique edges
                (ref :415-441 ltree_update_covg_hists)
  - threshold:  per-dist cleaning_pick_kmer_threshold, median suggested
                cutoff (ref ctx_links.c:83-116 print_suggest_cutoff)
  - plot:       DOT of one kmer's tree (ref :345-412 ltree_write_dot)

TPU-native design: instead of a per-kmer host trie, the whole link table
is processed at once.  Junction distances come from one batched device
trace (every link walked in lockstep); tree-edge identities are prefix
groups of the (vertex, junction-bases) sort order, so per-depth counts
are vectorised segment sums — no per-kmer python loop.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..graph import edges as E
from ..graph import store as gstore
from ..graph import traverse as T
from ..ops import kmer as kops
from . import store as lstore
from . import walk as lwalk

_BASECHARS = "ACGT"


def unpack_bases(seq: np.ndarray, nj: np.ndarray) -> np.ndarray:
    """Packed (L, JW) uint64 -> (L, Jmax) uint8 base codes, zero beyond
    nj (vectorised; counterpart of lstore.pack_juncs)."""
    L = seq.shape[0]
    jmax = int(nj.max()) if L else 1
    out = np.zeros((L, max(jmax, 1)), np.uint8)
    for p in range(jmax):
        w = p // 32
        sh = np.uint64(62 - 2 * (p % 32))
        out[:, p] = ((seq[:, w] >> sh) & np.uint64(3)).astype(np.uint8)
    mask = np.arange(out.shape[1])[None, :] < nj[:, None]
    return out * mask


@functools.partial(jax.jit, static_argnames=("edge_colour", "max_steps",
                                             "jcap", "record_bases"))
def _trace_jit(g: gstore.DBGraph, links: lstore.LinkStore,
               start_vert: jnp.ndarray, link_ids: jnp.ndarray,
               edge_colour: int, max_steps: int, jcap: int,
               record_bases: bool, adj: jnp.ndarray | None = None):
    """Walk each link's junction path; record the node index (== kmer
    distance from the root) of every junction (ref gpath_fetch,
    gpath_checks.c:199-234: juncpos[i] = index of i-th junction node)."""
    B = start_vert.shape[0]
    pop4 = jnp.asarray(T._POP4)
    idx0 = start_vert >> 1
    or0 = (start_vert & 1).astype(jnp.uint8)
    nj = links.nj[link_ids] if links.nlinks else jnp.zeros((B,), jnp.int32)

    def cond(s):
        return s["active"].any()

    def body(s):
        okm, idx, orient = s["okm"], s["idx"], s["orient"]
        nib = E.with_orientation(g.edges[idx, edge_colour], orient)
        outdeg = pop4[nib.astype(jnp.int32)]
        at_fork = outdeg > 1
        jb = lstore.unpack_junc(
            links.seq[jnp.clip(link_ids, 0, max(links.nlinks - 1, 0))],
            s["pos"]) if links.nlinks else jnp.zeros((B,), jnp.uint8)
        single = jnp.argmax(
            jnp.stack([(nib >> n) & 1 for n in range(4)], axis=1), axis=1
        ).astype(jnp.uint8)
        nuc = jnp.where(at_fork, jb, single)
        has_edge = ((nib >> nuc) & 1).astype(bool)
        adv = s["active"] & (outdeg > 0) & has_edge
        # record junction position: current node index == kmer distance
        rec = adv & at_fork
        jpos = s["jpos"].at[jnp.arange(B),
                            jnp.where(rec, s["pos"], jcap)].set(
            s["len"], mode="drop")
        nxt_okm = kops.shift_append(okm, nuc, g.k)
        if adj is not None:
            from ..graph import adjacency as adjmod
            v = idx * 2 + orient.astype(jnp.int32)
            nv = adjmod.adj_at(adj, v, nuc)
            j = jnp.maximum(nv, 0) >> 1
            o2 = (jnp.maximum(nv, 0) & 1).astype(jnp.uint8)
        else:
            from ..ops import sorted as sops
            key2, o2 = kops.canonical(nxt_okm, g.k)
            j, _found = sops.lookup(g.keys, key2)
        pos2 = jnp.where(rec, s["pos"] + 1, s["pos"])
        if record_bases:
            ob = s["bases"].at[jnp.arange(B),
                               jnp.where(adv, s["len"], max_steps)].set(
                nuc, mode="drop")
        else:
            ob = s["bases"]
        ln2 = jnp.where(adv, s["len"] + 1, s["len"])
        done = pos2 >= nj
        fail = s["active"] & ~adv
        return {
            "okm": jnp.where(adv[:, None], nxt_okm, okm),
            "idx": jnp.where(adv, j, idx),
            "orient": jnp.where(adv, o2, orient).astype(jnp.uint8),
            "pos": pos2, "len": ln2, "jpos": jpos, "bases": ob,
            "active": adv & ~done & (ln2 < max_steps),
            "ok": s["ok"] & ~fail,
            "done": s["done"] | (adv & done),
        }

    init = {
        "okm": kops.oriented(g.keys[idx0], or0, g.k),
        "idx": idx0.astype(jnp.int32), "orient": or0,
        "pos": jnp.zeros((B,), nj.dtype),
        "len": jnp.zeros((B,), jnp.int32),
        "jpos": jnp.full((B, jcap), -1, jnp.int32),
        "bases": (jnp.zeros((B, max_steps), jnp.uint8) if record_bases
                  else jnp.zeros((B, 1), jnp.uint8)),
        "active": nj > 0, "ok": jnp.ones((B,), bool),
        "done": nj <= 0,
    }
    s = jax.lax.while_loop(cond, body, init)
    ok = s["ok"] & s["done"]
    return s["jpos"], ok, s["bases"], s["len"]


def trace_juncpos(g: gstore.DBGraph, links: lstore.LinkStore,
                  edge_colour: int = 0, max_steps: int = 1024,
                  record_bases: bool = False, chunk: int = 1 << 17):
    """Junction node-distances for every link (batched device trace).

    Returns (jpos (L, Jmax) int32 with -1 padding, ok (L,) bool,
    bases (L, max_steps) uint8 or None, blen (L,) int32).
    ok is the reference's link-walkability condition (gpath_checks.c):
    every junction consumed at a real fork with a matching edge.
    """
    from ..graph import adjacency as adjmod
    L = links.nlinks
    nj = np.asarray(links.nj)
    jcap = max(int(nj.max()) if L else 1, 1)
    if L == 0:
        return (np.zeros((0, jcap), np.int32), np.zeros((0,), bool),
                np.zeros((0, max_steps), np.uint8) if record_bases else None,
                np.zeros((0,), np.int32))
    adj = adjmod.get_adjacency(g)
    lv = lwalk.link_vertices(links, g.capacity).astype(np.int32)
    jp_out = np.empty((L, jcap), np.int32)
    ok_out = np.empty((L,), bool)
    b_out = np.empty((L, max_steps), np.uint8) if record_bases else None
    bl_out = np.empty((L,), np.int32)
    for s in range(0, L, chunk):
        e = min(s + chunk, L)
        ids = jnp.arange(s, e, dtype=jnp.int32)
        jp, ok, bases, blen = _trace_jit(
            g, links, jnp.asarray(lv[s:e]), ids, edge_colour,
            max_steps, jcap, record_bases, adj)
        jp_out[s:e] = np.asarray(jp)
        ok_out[s:e] = np.asarray(ok)
        if record_bases:
            b_out[s:e] = np.asarray(bases)
        bl_out[s:e] = np.asarray(blen)
    return jp_out, ok_out, b_out, bl_out


class LinkTreeView:
    """Vectorised junction-tree view of a whole single-colour link set.

    Arrays are in a canonical sort order (vertex, junction bases); tree
    edges at depth j are contiguous groups of rows sharing the first
    j+1 junction bases.  `counts[:, j]` is the coverage of the link's
    j-th junction edge (sum of nseen over the group), `rep[:, j]` marks
    one representative row per unique edge.
    """

    def __init__(self, g: gstore.DBGraph, links: lstore.LinkStore,
                 jpos: np.ndarray | None = None):
        L = links.nlinks
        self.g = g
        self.links = links
        nj = np.asarray(links.nj).astype(np.int64)
        nseen = np.asarray(links.nseen)
        if nseen.shape[1] != 1:
            # a multi-colour store whose counts live in ONE colour (a
            # per-sample ctp saved against a multi-colour graph) is
            # effectively single-colour: use that column
            used = np.nonzero(nseen.sum(axis=0) > 0)[0]
            if len(used) > 1:
                raise ValueError(
                    "link cleaning requires a single-colour .ctp "
                    "(ref ctx_links.c: 'Can only clean a single "
                    "colour at a time')")
            col = int(used[0]) if len(used) else 0
            self.colour = col
            self.ncols = nseen.shape[1]
            nseen = nseen[:, col:col + 1]
        else:
            self.colour = 0
            self.ncols = 1
        verts = lwalk.link_vertices(links, g.capacity).astype(np.int64)
        bases = unpack_bases(np.asarray(links.seq), nj)
        Jmax = bases.shape[1]
        order = np.lexsort(tuple(bases[:, j] for j in range(Jmax - 1, -1, -1))
                           + (verts,))
        self.order = order
        self.verts = verts[order]
        self.nj = nj[order]
        self.bases = bases[order]
        self.w = nseen[order, 0].astype(np.uint64)
        self.jpos = jpos[order] if jpos is not None else None
        self.Jmax = Jmax
        self.L = L

        # per-depth prefix grouping: boundary_j = boundary_{j-1} OR base
        # j differs between consecutive rows
        counts = np.zeros((L, Jmax), np.uint64)
        rep = np.zeros((L, Jmax), bool)
        gid = np.zeros((L, Jmax), np.int64)
        if L:
            ng = self.verts[1:] != self.verts[:-1]
            for j in range(Jmax):
                ng = ng | (self.bases[1:, j] != self.bases[:-1, j])
                bj = np.concatenate([[True], ng])
                gj = np.cumsum(bj) - 1
                gid[:, j] = gj
                active = self.nj > j
                cnt = np.zeros(gj[-1] + 1, np.uint64)
                np.add.at(cnt, gj[active], self.w[active])
                counts[:, j] = np.where(active, cnt[gj], 0)
                ai = np.nonzero(active)[0]
                if len(ai):
                    ga = gj[ai]
                    firsts = np.concatenate([[True], ga[1:] != ga[:-1]])
                    rep[ai[firsts], j] = True
        self.counts = counts
        self.rep = rep
        self.gid = gid

    # -- cleaning ----------------------------------------------------

    def keep_lengths(self, cutoff: int) -> np.ndarray:
        """Per (sorted) link: junctions kept = first j with edge count
        < cutoff (ref _ltree_clean_link truncates root-down)."""
        active = np.arange(self.Jmax)[None, :] < self.nj[:, None]
        fail = active & (self.counts < np.uint64(cutoff))
        first_fail = np.argmax(fail, axis=1)
        has_fail = fail.any(axis=1)
        return np.where(has_fail, first_fail, self.nj).astype(np.int64)

    def clean(self, cutoff: int):
        """Truncate + suppress prefixes; returns (LinkStore, stats dict).

        Emitted links are the maximal surviving paths; their count is
        the coverage of their final junction edge (ref
        _ltree_write_ctp_link: leaves only, counts[base])."""
        L, Jmax = self.L, self.Jmax
        keep = self.keep_lengths(cutoff)
        emitted = np.zeros((L,), bool)
        count_out = np.zeros((L,), np.uint64)
        if L:
            # group max keep per depth
            t = keep
            pos = np.nonzero(t >= 1)[0]
            for j in range(Jmax):
                sel = np.nonzero(t == j + 1)[0]
                if len(sel) == 0:
                    continue
                gj = self.gid[:, j]
                gmax = np.zeros(gj[-1] + 1, np.int64)
                np.maximum.at(gmax, gj, t)
                ok = gmax[gj[sel]] <= j + 1
                # dedup truncated duplicates: first in (group, depth)
                gsel = gj[sel]
                first = np.concatenate([[True], gsel[1:] != gsel[:-1]])
                emitted[sel] = ok & first
                count_out[sel] = self.counts[sel, j]
            del pos
        eidx = np.nonzero(emitted)[0]
        tkeep = keep[eidx]
        new_bases = self.bases[eidx].copy()
        mask = np.arange(Jmax)[None, :] < tkeep[:, None]
        new_bases *= mask
        jwords = max(1, (int(tkeep.max()) + 31) // 32) if len(eidx) else 1
        seq = lstore.pack_juncs(new_bases, tkeep, jwords)
        counts1 = np.minimum(count_out[eidx],
                             np.iinfo(np.uint32).max).astype(np.uint32)
        # scatter back into the store's original colour column
        nseen = np.zeros((len(eidx), self.ncols), np.uint32)
        nseen[:, self.colour] = counts1
        store = lstore.assemble_csr(self.verts[eidx], seq, tkeep,
                                    nseen, self.g.capacity)
        stats = {
            "num_links": int(len(eidx)),
            "num_kmers_with_links":
                int(len(np.unique(self.verts[eidx] >> 1))),
            "num_link_bytes": int(((tkeep + 3) // 4).sum()),
        }
        return store, stats

    # -- inspection --------------------------------------------------

    def covg_hist(self, distsize: int, covgsize: int) -> np.ndarray:
        """hists[dist][covg]: unique tree edges at kmer-distance dist
        with coverage covg (covg capped; ref ltree_update_covg_hists)."""
        if self.jpos is None:
            raise ValueError("covg_hist requires traced junction positions")
        hists = np.zeros((distsize, covgsize), np.uint64)
        for j in range(self.Jmax):
            sel = self.rep[:, j]
            if not sel.any():
                continue
            d = self.jpos[sel, j]
            c = np.minimum(self.counts[sel, j],
                           np.uint64(covgsize - 1)).astype(np.int64)
            ok = (d >= 0) & (d < distsize)
            np.add.at(hists, (d[ok], c[ok]), 1)
        return hists

    def list_rows(self, keep: np.ndarray | None = None):
        """(SeqLen, Covg) per surviving unique edge (ref
        ltree_write_list; SeqLen = kmer_size + dist + 1).  If keep is
        given (post-clean), only edges on a kept path are listed."""
        if self.jpos is None:
            raise ValueError("list requires traced junction positions")
        out = []
        for j in range(self.Jmax):
            sel = self.rep[:, j].copy()
            if keep is not None and sel.any():
                gj = self.gid[:, j]
                gmax = np.zeros(gj[-1] + 1, np.int64)
                np.maximum.at(gmax, gj, keep)
                sel &= gmax[gj] > j
            if not sel.any():
                continue
            d = self.jpos[sel, j]
            out.append(np.stack(
                [self.g.k + d + 1, self.counts[sel, j].astype(np.int64)],
                axis=1))
        if not out:
            return np.zeros((0, 2), np.int64)
        return np.concatenate(out, axis=0)


def suggest_cutoff(hists: np.ndarray):
    """Auto-pick a cleaning threshold from a dist x covg matrix: run the
    kmer-cleaning threshold picker on each dist >= 1 row and take the
    median (ref ctx_links.c:83-116 print_suggest_cutoff)."""
    from ..graph.clean import pick_kmer_threshold
    distsize = hists.shape[0]
    cutoffs = np.zeros((distsize,), np.int64)
    sumcovgs = np.zeros((distsize,), np.int64)
    nfail = 0
    for d in range(1, distsize):
        sumcovgs[d] = int(hists[d].sum())
        row = hists[d].astype(np.float64)
        if len(row) < 10:
            row = np.concatenate([row, np.zeros(10 - len(row))])
        t = pick_kmer_threshold(row)[0]
        if t is None or t < 0:
            nfail += 1
            t = 0
        cutoffs[d] = t
    med = int(np.median(cutoffs[1:])) if distsize > 1 else 0
    return {"sumcovgs": sumcovgs[1:].tolist(),
            "cutoffs": cutoffs[1:].tolist(),
            "suggested_cutoff": med,
            "nthresh_failed": nfail}


def write_threshold_file(fh, sug: dict) -> None:
    fh.write("sumcovgs=" + ",".join(str(x) for x in sug["sumcovgs"]) + "\n")
    fh.write("cutoffs=" + ",".join(str(x) for x in sug["cutoffs"]) + "\n")
    fh.write(f"suggested_cutoff={sug['suggested_cutoff']}\n")


def write_dot(g: gstore.DBGraph, links: lstore.LinkStore, row: int,
              fh, edge_colour: int = 0) -> None:
    """DOT plot of one kmer's link tree (ref ltree_write_dot).

    Rebuilds the (tiny) trie for a single kmer host-side; node labels
    are the sequence runs between junctions, leaf labels the final
    junction base."""
    from ..utils.text import kmers_to_strings
    offs = np.asarray(links.offsets)
    sub_ids = np.concatenate([
        np.arange(offs[2 * row], offs[2 * row + 1]),
        np.arange(offs[2 * row + 1], offs[2 * row + 2])]).astype(np.int64)
    kstr = kmers_to_strings(np.asarray(g.keys[row:row + 1]), g.k)[0]
    fh.write("digraph G {\n")
    fh.write('  node [shape=none fontname="Courier New" fontsize=9]\n')
    fh.write('  edge [shape=none fontname="Courier New" fontsize=9]\n')
    if len(sub_ids) == 0:
        fh.write("}\n")
        return
    sub = lstore.LinkStore(
        offsets=jnp.asarray(np.array([0] * (2 * g.capacity + 1), np.int32)),
        seq=links.seq[jnp.asarray(sub_ids)],
        nj=links.nj[jnp.asarray(sub_ids)],
        nseen=links.nseen[jnp.asarray(sub_ids)])
    nj = np.asarray(sub.nj).astype(np.int64)
    nseen = np.asarray(sub.nseen).sum(axis=1).astype(np.int64)
    bases = unpack_bases(np.asarray(sub.seq), nj)
    n_fw = int(offs[2 * row + 1] - offs[2 * row])
    orients = (np.arange(len(sub_ids)) >= n_fw).astype(np.int64)
    # trace each link for jpos + path bases
    start = np.full((len(sub_ids),), 2 * row, np.int32) + \
        orients.astype(np.int32)
    from ..graph import adjacency as adjmod
    adj = adjmod.get_adjacency(g)
    jcap = max(int(nj.max()), 1)
    jp, ok, tb, bl = _trace_jit(
        g, sub, jnp.asarray(start),
        jnp.arange(len(sub_ids), dtype=jnp.int32),
        edge_colour, 512, jcap, True, adj)
    jp, tb = np.asarray(jp), np.asarray(tb)

    # build trie: node = (orient, prefix tuple); edges carry counts
    nodes = {}   # (orient, prefix) -> node id
    meta = {}    # id -> dict(seq, dist, children{base->child id or None},
                 #            counts{base->n})
    nid = [0]

    def get_node(orient, prefix, seq, dist):
        key = (orient, prefix)
        if key not in nodes:
            nodes[key] = nid[0]
            meta[nid[0]] = {"seq": seq, "dist": dist, "children": {},
                            "counts": {}}
            nid[0] += 1
        return nodes[key]

    roots = {}
    for li in range(len(sub_ids)):
        o = int(orients[li])
        prev = None
        for j in range(int(nj[li])):
            prefix = tuple(bases[li, :j])
            d = int(jp[li, j])
            if j == 0:
                seq = "".join(_BASECHARS[b] for b in tb[li, :d])
                node = get_node(o, prefix, seq, d)
                roots.setdefault(o, node)
            else:
                pd = int(jp[li, j - 1])
                seq = "".join(_BASECHARS[b] for b in tb[li, pd + 1:d])
                node = get_node(o, prefix, seq, d)
                m = meta[prev]
                m["children"][int(bases[li, j - 1])] = node
            b = int(bases[li, j])
            m = meta[node]
            m["counts"][b] = m["counts"].get(b, 0) + int(nseen[li])
            prev = node
        if prev is not None and int(nj[li]) > 0:
            meta[prev]["children"].setdefault(int(bases[li, nj[li] - 1]),
                                              None)
    for o in sorted(roots):
        tag = "fw" if o == 0 else "rv"
        fh.write(f'  kmer_{tag}[label="{kstr} ({"F" if o == 0 else "R"})"]'
                 "\n")
    for i, m in meta.items():
        label = m["seq"] if m["seq"] else "."
        fh.write(f'  node{i} [label="{label}"]\n')
        for b, cnt in m["counts"].items():
            if m["children"].get(b) is None:
                fh.write(f'  node{i}{_BASECHARS[b].lower()} '
                         f'[label="{_BASECHARS[b]}"]\n')
    for o in sorted(roots):
        tag = "fw" if o == 0 else "rv"
        fh.write(f"  kmer_{tag} -> node{roots[o]}\n")
    for i, m in meta.items():
        for b, cnt in sorted(m["counts"].items()):
            child = m["children"].get(b)
            if child is None:
                fh.write(f"  node{i} -> node{i}{_BASECHARS[b].lower()} "
                         f'[label=" {_BASECHARS[b]} {cnt}"]\n')
            else:
                fh.write(f"  node{i} -> node{child} "
                         f'[label=" {_BASECHARS[b]} {cnt}"]\n')
    fh.write("}\n")
