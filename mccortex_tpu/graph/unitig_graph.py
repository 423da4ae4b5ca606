"""Unitig-level graph export: GFA v1 and graphviz DOT.

Role of ref src/graph/unitig_graph.c (used by ctx_unitigs.c:26-31 for
--gfa/--dot output): unitigs become segments; links connect unitig ends
that share a (k-1)-overlap edge in the kmer graph.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import CHAR_TO_BASE
from ..ops import kmer as kops
from . import store as gstore
from . import edges as E


def unitig_links(g: gstore.DBGraph, seqs):
    """For unitig sequences, find directed links (i, side_i, j, side_j):
    side 0 = the unitig's start (left/5'), 1 = its end (right/3').
    A link (i, 1) -> (j, 0) means unitig i read forward continues into
    unitig j read forward, overlapping k-1 bases."""
    k = g.k
    # map each unitig's two terminal kmers to (unitig id, side, strand)
    first_keys, first_or, last_keys, last_or = [], [], [], []
    for s in seqs:
        fc = np.array([CHAR_TO_BASE[c] for c in s[:k].encode()], np.uint8)
        lc = np.array([CHAR_TO_BASE[c] for c in s[-k:].encode()], np.uint8)
        first_keys.append(fc)
        last_keys.append(lc)
    if not seqs:
        return []
    fk = kops.pack_kmers(jnp.asarray(np.stack(first_keys)), k)
    lk = kops.pack_kmers(jnp.asarray(np.stack(last_keys)), k)
    fkey, fo = kops.canonical(fk, k)
    lkey, lo = kops.canonical(lk, k)
    # index: key row -> (unitig, which end, orientation of seq at that end)
    end_index = {}
    for i in range(len(seqs)):
        end_index.setdefault(tuple(np.asarray(fkey)[i]), []).append(
            (i, 0, int(fo[i])))
        end_index.setdefault(tuple(np.asarray(lkey)[i]), []).append(
            (i, 1, int(lo[i])))

    uedges = np.asarray(gstore.union_edges(g))
    keys_np = np.asarray(g.keys)
    links = set()
    for i, s in enumerate(seqs):
        for side, okm_j, o_here in ((1, lk, lo), (0, fk, fo)):
            # walking out of this side: side 1 walks forward beyond the
            # last kmer; side 0 walks backward (reverse strand) from first
            kmer = np.asarray(okm_j)[i]
            if side == 0:
                kmer = np.asarray(kops.revcmp(jnp.asarray(kmer[None]), k))[0]
            key, orient = _canon_np(kmer, k)
            row = _find_row(keys_np, key)
            if row < 0:
                continue
            nib = (uedges[row] >> (4 * orient)) & 0xF
            for n in range(4):
                if not (nib >> n) & 1:
                    continue
                nxt = np.asarray(kops.shift_append(
                    jnp.asarray(kmer[None]),
                    jnp.asarray([n], dtype=jnp.uint8), k))[0]
                nkey, norient = _canon_np(nxt, k)
                for (j, jside, jor) in end_index.get(tuple(nkey), []):
                    # entering unitig j: if we arrive at its start kmer in
                    # the same orientation as the sequence, we read j
                    # forward (enter side 0); arriving at its end kmer
                    # opposite to sequence orientation reads j backward
                    enter_fwd = (jside == 0 and jor == norient)
                    enter_rev = (jside == 1 and jor != norient)
                    if enter_fwd or enter_rev:
                        links.add((i, side, j, 0 if enter_fwd else 1))
    return sorted(links)


def _canon_np(kmer, k):
    key, o = kops.canonical(jnp.asarray(kmer[None]), k)
    return np.asarray(key)[0], int(o[0])


def _find_row(keys_np, key):
    lo, hi = 0, len(keys_np)
    t = tuple(key)
    while lo < hi:
        mid = (lo + hi) // 2
        if tuple(keys_np[mid]) < t:
            lo = mid + 1
        else:
            hi = mid
    if lo < len(keys_np) and tuple(keys_np[lo]) == t:
        return lo
    return -1


def write_gfa(out, g: gstore.DBGraph, seqs):
    out.write("H\tVN:Z:1.0\n")
    for i, s in enumerate(seqs):
        out.write(f"S\tunitig{i}\t{s}\n")
    for (i, si, j, sj) in unitig_links(g, seqs):
        # side 1 -> forward out of i; entering side 0 -> forward into j
        oi = "+" if si == 1 else "-"
        oj = "+" if sj == 0 else "-"
        out.write(f"L\tunitig{i}\t{oi}\tunitig{j}\t{oj}\t{g.k - 1}M\n")


def write_dot(out, g: gstore.DBGraph, seqs, points: bool = False):
    """Graphviz output (ref ctx_unitigs.c --dot: nodes with :n/:s ports;
    --points draws unitigs as unlabelled points)."""
    out.write("digraph G {\n  edge [dir=both arrowhead=none arrowtail=none]\n")
    if points:
        out.write("  node [shape=point label=none]\n")
    for i, s in enumerate(seqs):
        if points:
            out.write(f"  unitig{i}\n")
        else:
            out.write(f"  unitig{i} [label=\"{s if len(s) <= 30 else str(len(s)) + 'bp'}\"]\n")
    for (i, si, j, sj) in unitig_links(g, seqs):
        pi = "e" if si == 1 else "w"
        pj = "w" if sj == 0 else "e"
        out.write(f"  unitig{i}:{pi} -> unitig{j}:{pj}\n")
    out.write("}\n")
