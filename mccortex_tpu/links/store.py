"""Link (path) store: CSR over kmer-orientation vertices.

Role of ref src/paths/gpath_store.{c,h} + gpath_hash.c: per-kmer lists of
links (junction-choice sequences with per-colour seen counts).  The
reference uses arena-allocated linked lists + a dedup hash with bucket
locks; TPU-native we sort all emitted link records once and keep a CSR:
vertex v = 2*kmer_row + orient -> [offsets[v], offsets[v+1]) rows of
(seq, nj, nseen[C]) (SURVEY.md §7 mapping 4).

Junction sequences are 2-bit packed into JW uint64 words, FIRST junction
in the top bits of word 0 (same big-endian convention as kmers) so that
lexicographic word compare equals junction-string compare.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct



@struct.dataclass
class LinkStore:
    offsets: jnp.ndarray  # (2N+1,) int32 CSR offsets per vertex
    seq: jnp.ndarray      # (L, JW) uint64 packed junction bases
    nj: jnp.ndarray       # (L,) int32 junction count
    nseen: jnp.ndarray    # (L, C) uint32 per-colour seen counts

    @property
    def nlinks(self) -> int:
        return self.seq.shape[0]

    @property
    def jwords(self) -> int:
        return self.seq.shape[1]

    @property
    def max_juncs(self) -> int:
        return self.seq.shape[1] * 32


def empty(N: int, ncols: int, jwords: int = 1) -> LinkStore:
    return LinkStore(
        offsets=jnp.zeros((2 * N + 1,), jnp.int32),
        seq=jnp.zeros((0, jwords), jnp.uint64),
        nj=jnp.zeros((0,), jnp.int32),
        nseen=jnp.zeros((0, ncols), jnp.uint32))


def pack_juncs(bases: np.ndarray, nj: np.ndarray, jwords: int) -> np.ndarray:
    """Pack junction base arrays (L, Jmax) uint8 (first junction first)
    into (L, jwords) uint64, first junction at the TOP of word 0; bases
    beyond nj are zeroed."""
    L, Jmax = bases.shape
    out = np.zeros((L, jwords), np.uint64)
    j = np.arange(Jmax)
    mask = j[None, :] < nj[:, None]
    b = np.where(mask, bases & 3, 0).astype(np.uint64)
    for idx in range(min(Jmax, jwords * 32)):
        w = idx // 32
        sh = np.uint64(62 - 2 * (idx % 32))
        out[:, w] |= b[:, idx] << sh
    return out


def unpack_junc(seq: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Junction base at position pos (device): seq (L_, JW), pos (L_,).
    pos 0 = first junction (top of word 0)."""
    w = (pos // 32).astype(jnp.int32)
    sh = (jnp.uint64(62) - jnp.uint64(2) * (pos % 32).astype(jnp.uint64))
    JW = seq.shape[1]
    w = jnp.clip(w, 0, JW - 1)
    words = jnp.take_along_axis(seq, w[:, None], axis=1)[:, 0]
    return ((words >> sh) & jnp.uint64(3)).astype(jnp.uint8)


def build_store(g_keys: jnp.ndarray, link_rows: np.ndarray,
                link_orients: np.ndarray, link_bases: np.ndarray,
                link_nj: np.ndarray, link_colours: np.ndarray,
                ncols: int) -> LinkStore:
    """Aggregate raw link records into a deduplicated CSR store.

    link_rows: (L,) kmer row in the graph store; link_orients: (L,) 0/1;
    link_bases: (L, Jmax) uint8 junction bases; link_nj: (L,) counts;
    link_colours: (L,) colour of each record.  Records with nj <= 0 are
    dropped.  Duplicate (vertex, seq) records are merged with per-colour
    nseen counts (role of ref gpath_hash_find_or_insert_mt).
    """
    N = g_keys.shape[0]
    keep = link_nj > 0
    rows = link_rows[keep].astype(np.int64)
    orients = link_orients[keep].astype(np.int64)
    bases = link_bases[keep]
    nj = link_nj[keep].astype(np.int64)
    cols = link_colours[keep].astype(np.int64)
    L = len(rows)
    jwords = max(1, int(np.ceil((nj.max() if L else 1) / 32)))
    seq = pack_juncs(bases, nj, jwords) if L else np.zeros((0, jwords),
                                                           np.uint64)
    vert = rows * 2 + orients
    # sort by (vertex, nj, seq words)
    order = np.lexsort(tuple(seq[:, w] for w in range(jwords - 1, -1, -1))
                       + (nj, vert))
    vert, nj, seq, cols = vert[order], nj[order], seq[order], cols[order]
    # unique (vertex, nj, seq)
    if L:
        same = (vert[1:] == vert[:-1]) & (nj[1:] == nj[:-1]) & \
            (seq[1:] == seq[:-1]).all(axis=1)
        first = np.concatenate([[True], ~same])
    else:
        first = np.zeros((0,), bool)
    uid = np.cumsum(first) - 1
    U = int(uid[-1]) + 1 if L else 0
    nseen = np.zeros((U, ncols), np.uint32)
    np.add.at(nseen, (uid, cols), 1)
    u_first = np.nonzero(first)[0]
    return assemble_csr(vert[u_first], seq[u_first], nj[u_first], nseen, N)


def assemble_csr(vert: np.ndarray, seq: np.ndarray, nj: np.ndarray,
                 nseen: np.ndarray, N: int) -> LinkStore:
    """Build the CSR store from unique link records sorted by vertex."""
    order = np.argsort(vert, kind="stable")
    vert, seq, nj, nseen = vert[order], seq[order], nj[order], nseen[order]
    counts = np.bincount(vert, minlength=2 * N)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return LinkStore(offsets=jnp.asarray(offsets),
                     seq=jnp.asarray(seq),
                     nj=jnp.asarray(nj.astype(np.int32)),
                     nseen=jnp.asarray(nseen.astype(np.uint32)))


def merge_stores(a: LinkStore, b: LinkStore, N: int) -> LinkStore:
    """Merge two link stores over the same graph (role of ref pjoin /
    gpath_reader_load accumulation)."""
    ncols = max(a.nseen.shape[1], b.nseen.shape[1])
    jw = max(a.jwords, b.jwords)

    def widen(s: LinkStore):
        seq = np.zeros((s.nlinks, jw), np.uint64)
        seq[:, :s.jwords] = np.asarray(s.seq)
        ns = np.zeros((s.nlinks, ncols), np.uint32)
        ns[:, :s.nseen.shape[1]] = np.asarray(s.nseen)
        # recover vertex of each link from offsets
        offs = np.asarray(s.offsets)
        verts = np.repeat(np.arange(2 * N), np.diff(offs))
        return verts, seq, np.asarray(s.nj), ns

    va, sa, ja, na = widen(a)
    vb, sb, jb, nb = widen(b)
    vert = np.concatenate([va, vb])
    seq = np.concatenate([sa, sb])
    nj = np.concatenate([ja, jb])
    ns = np.concatenate([na, nb])
    order = np.lexsort(tuple(seq[:, w] for w in range(jw - 1, -1, -1))
                       + (nj, vert))
    vert, seq, nj, ns = vert[order], seq[order], nj[order], ns[order]
    L = len(vert)
    if L:
        same = (vert[1:] == vert[:-1]) & (nj[1:] == nj[:-1]) & \
            (seq[1:] == seq[:-1]).all(axis=1)
        first = np.concatenate([[True], ~same])
    else:
        first = np.zeros((0,), bool)
    uid = np.cumsum(first) - 1
    U = int(uid[-1]) + 1 if L else 0
    nseen = np.zeros((U, ncols), np.uint64)
    np.add.at(nseen, (uid[:, None].repeat(ncols, 1),
                      np.arange(ncols)[None, :].repeat(L, 0)), ns)
    u = np.nonzero(first)[0]
    counts = np.bincount(vert[u], minlength=2 * N)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return LinkStore(offsets=jnp.asarray(offsets),
                     seq=jnp.asarray(seq[u]),
                     nj=jnp.asarray(nj[u].astype(np.int32)),
                     nseen=jnp.asarray(np.minimum(
                         nseen, np.iinfo(np.uint32).max).astype(np.uint32)))


def _prefix_eq(seq_i: np.ndarray, seq_j: np.ndarray, njj: int) -> bool:
    """True if the first njj junctions of both packed rows match."""
    full = njj // 32
    rem = njj % 32
    if full and not np.array_equal(seq_i[:full], seq_j[:full]):
        return False
    if rem:
        mask = np.uint64(0xFFFFFFFFFFFFFFFF) << np.uint64(64 - 2 * rem)
        return bool((seq_i[full] & mask) == (seq_j[full] & mask))
    return True


def rmsubstr_store(ls: LinkStore) -> LinkStore:
    """Remove redundant links (ref gpath_subset.c:106 rmsubstr,
    `pjoin -r`): within a vertex, exact duplicates merge their counts;
    a link that is a strict PREFIX of another loses the colours the
    longer link covers and is dropped once no colour remains.
    {A, C, CG, CGC} -> {A, CGC}."""
    L = ls.nlinks
    if L <= 1:
        return ls
    off = np.asarray(ls.offsets)
    seq = np.asarray(ls.seq)
    nj = np.asarray(ls.nj)
    nseen = np.asarray(ls.nseen).copy()
    keep = np.ones(L, bool)
    for v in np.nonzero(np.diff(off) > 1)[0]:
        s, e = int(off[v]), int(off[v + 1])
        idxs = sorted(range(s, e),
                      key=lambda t: (tuple(seq[t].tolist()), int(nj[t])))
        for a in range(len(idxs) - 1, 0, -1):
            i = idxs[a]
            if not keep[i]:
                continue
            for q in range(a - 1, -1, -1):
                j = idxs[q]
                if not keep[j]:
                    continue
                if nj[j] > nj[i] or not _prefix_eq(seq[i], seq[j],
                                                   int(nj[j])):
                    break
                if nj[j] == nj[i]:
                    # exact duplicate: steal counts
                    nseen[i] += nseen[j]
                    keep[j] = False
                else:
                    # j is a strict prefix of i: remove shared colours
                    nseen[j][nseen[i] > 0] = 0
                    if not nseen[j].any():
                        keep[j] = False
    if keep.all():
        return ls
    verts = np.repeat(np.arange(len(off) - 1), np.diff(off))
    counts = np.bincount(verts[keep], minlength=len(off) - 1)
    new_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return LinkStore(offsets=jnp.asarray(new_off),
                     seq=jnp.asarray(seq[keep]),
                     nj=jnp.asarray(nj[keep]),
                     nseen=jnp.asarray(nseen[keep]))
