"""KOGraph: reference-position index (role of ref src/graph/kmer_occur.c).

Maps graph kmer rows to lists of (chrom, offset, strand) occurrences in a
reference genome.  TPU-native: one global sort of (row, packed-occur)
pairs into a CSR (same pattern as the link store), instead of per-kmer
linked lists.  Packing mirrors ref KOccur (kmer_occur.h:24-29):
orient(1) | chrom(30) | offset(32), minus the `next` flag (CSR offsets
replace it).

`strand`/orient: 0 if the kmer's canonical key appears forward in the
reference at that offset, 1 if reverse complemented.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..constants import CHAR_TO_BASE
from ..ops import kmer as kops
from ..ops import hashidx
from . import store as gstore


@struct.dataclass
class KOGraph:
    offsets: jnp.ndarray   # (N+1,) int32 CSR per kmer row
    chrom: jnp.ndarray     # (L,) int32
    pos: jnp.ndarray       # (L,) int64 0-based offset of kmer start
    orient: jnp.ndarray    # (L,) uint8

    @property
    def noccurs(self):
        return self.chrom.shape[0]


@dataclasses.dataclass
class RefGenome:
    names: list
    seqs: list

    @classmethod
    def from_fasta(cls, path):
        from ..io import seqio
        names, seqs = [], []
        for rd in seqio.parse_reads(path):
            names.append(rd.name)
            seqs.append(rd.seq.upper())
        return cls(names, seqs)


def build_kograph(g: gstore.DBGraph, ref: RefGenome) -> KOGraph:
    """Index every reference kmer that exists in the graph."""
    rows_all, chroms_all, pos_all, or_all = [], [], [], []
    for ci, seq in enumerate(ref.seqs):
        arr = CHAR_TO_BASE[np.frombuffer(seq.encode(), np.uint8)]
        if len(arr) < g.k:
            continue
        kmers, valid = kops.rolling_kmers(jnp.asarray(arr[None]), g.k)
        keys, orient = kops.canonical(kmers, g.k)
        idx, found = hashidx.lookup(g.keys, keys[0])
        hit = np.asarray(valid[0]) & np.asarray(found)
        p = np.nonzero(hit)[0]
        rows_all.append(np.asarray(idx)[p])
        chroms_all.append(np.full(len(p), ci, np.int32))
        pos_all.append(p.astype(np.int64))
        or_all.append(np.asarray(orient[0])[p])
    if not rows_all:
        return KOGraph(offsets=jnp.zeros((g.capacity + 1,), jnp.int32),
                       chrom=jnp.zeros((0,), jnp.int32),
                       pos=jnp.zeros((0,), jnp.int64),
                       orient=jnp.zeros((0,), jnp.uint8))
    rows = np.concatenate(rows_all)
    chroms = np.concatenate(chroms_all)
    poss = np.concatenate(pos_all)
    ors = np.concatenate(or_all)
    order = np.lexsort((poss, chroms, rows))
    rows, chroms, poss, ors = (rows[order], chroms[order], poss[order],
                               ors[order])
    counts = np.bincount(rows, minlength=g.capacity)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return KOGraph(offsets=jnp.asarray(offsets),
                   chrom=jnp.asarray(chroms),
                   pos=jnp.asarray(poss),
                   orient=jnp.asarray(ors.astype(np.uint8)))


def occurs(ko: KOGraph, rows: np.ndarray) -> np.ndarray:
    """True where the kmer row has >= 1 reference occurrence."""
    offs = np.asarray(ko.offsets)
    return offs[rows + 1] > offs[rows]


def occurs_mask(ko: KOGraph, N: int) -> np.ndarray:
    offs = np.asarray(ko.offsets)
    return np.diff(offs) > 0


def runs_of_path(ko: KOGraph, verts: np.ndarray, min_len: int = 1):
    """Assemble colinear reference runs along a vertex path
    (role of ref KOccurRun, kmer_occur.h:44-52 run-merge).

    verts: vertex (2*row+orient) sequence of a walked path.  Returns list
    of dicts {chrom, first, last, strand, qoffset, len} where qoffset is
    the index in the path where the run starts; strand 0 means ref
    positions increase along the path.
    """
    offs = np.asarray(ko.offsets)
    chrom = np.asarray(ko.chrom)
    pos = np.asarray(ko.pos)
    kor = np.asarray(ko.orient)
    out = []
    # active runs keyed by (chrom, strand, EXPECTED next ref pos) so
    # multiple concurrent runs on the same chrom+strand coexist — a
    # repetitive flank occurs at several ref positions at once (ref
    # kograph_filter_extend tracks each run individually)
    prev = {}  # key -> (q0, p_start)
    for qi, v in enumerate(verts):
        row, vo = v >> 1, v & 1
        cur = {}
        for e in range(offs[row], offs[row + 1]):
            # strand of this occurrence relative to the path direction:
            # occurrence orient is canonical-key vs ref; vo is key vs path
            strand = int(kor[e]) ^ int(vo)
            c, p0 = int(chrom[e]), int(pos[e])
            ext = prev.pop((c, strand, p0), None)
            nxt = p0 + 1 if strand == 0 else p0 - 1
            if ext is not None:
                cur[(c, strand, nxt)] = ext          # extend
            else:
                cur[(c, strand, nxt)] = (qi, p0)     # start new run
        # close runs not extended at this vertex
        for (c, strand, expect), (q0, p_start) in prev.items():
            p_last = expect - 1 if strand == 0 else expect + 1
            out.append(_mk_run((c, strand), p_start, p_last, q0, qi - q0))
        prev = cur
    for (c, strand, expect), (q0, p_start) in prev.items():
        p_last = expect - 1 if strand == 0 else expect + 1
        out.append(_mk_run((c, strand), p_start, p_last, q0,
                           len(verts) - q0))
    out.sort(key=lambda r: (r["qoffset"], r["chrom"], r["first"]))
    return [r for r in out if r["len"] >= min_len]


def _mk_run(keyp, p_start, p_last, q0, ln):
    c, strand = keyp
    return {"chrom": c, "first": p_start, "last": p_last,
            "strand": strand, "qoffset": q0, "len": ln}
