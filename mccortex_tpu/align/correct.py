"""Read-to-graph alignment with gap filling.

Role of ref src/alignment/{db_alignment.c, correct_alignment.c}: split a
read into runs of graph-present kmers; bridge the sequencing-error gaps
between runs by walking the graph (with links) from the left anchor
until the right anchor kmer is re-acquired, accepting fills of length
N +- (N*0.1 + 5) (ref correct_alignment.h:17-19 gap tolerance).

TPU mapping: all gaps across a read batch become one batched linked
walk (one walker per gap, max steps = tolerance bound); acceptance and
path splicing happen on host.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..ops import kmer as kops
from ..ops import sorted as sops
from ..graph import store as gstore
from ..links import store as lstore
from ..links import thread as lthread
from ..links import walk as lwalk

GAP_VARIANCE = 0.1   # ref correct_aln_input defaults
GAP_WIGGLE = 5


def gap_tolerance(n: int) -> int:
    return int(n * GAP_VARIANCE + GAP_WIGGLE)


@dataclasses.dataclass
class CorrectedRead:
    verts: np.ndarray      # bridged node path vertices (2*row+orient)
    seq: str               # corrected sequence (bridged), uppercase
    display: str           # corrected seq with uncorrectable parts lower
    ngaps: int
    nfixed: int


def correct_batch(g: gstore.DBGraph, links: lstore.LinkStore | None,
                  bases: np.ndarray, colour: int | None = 0,
                  ctpcol: int = 0, mate_col: int | None = None,
                  frag_len_max: int = 1000):
    """Gap-fill a read batch.  Returns list[CorrectedRead] (empty entry
    for reads with no aligned kmer).

    mate_col: if set, rows are mate pairs laid out as
    r1 + [invalid] + revcomp(r2) with the break at this column; gaps
    spanning it are INSERT gaps bridged with fragment-length tolerance
    (<= frag_len_max steps, first re-acquisition wins — ref
    correct_alignment.c one-way insert-gap traversal bounded by
    frag_len, correct_alignment.h:37-43)."""
    k = g.k
    if links is None:
        links = lstore.empty(g.capacity, g.ncols)
    bj = jnp.asarray(bases)
    idx, orient, valid = lthread.reads_to_node_paths(g, bj, k)
    idx = np.asarray(idx)
    orient = np.asarray(orient)
    valid = np.asarray(valid)
    B, P = idx.shape

    # collect gaps: (read, left_anchor_pos, right_anchor_pos)
    gaps = []
    runs_by_read = []
    for b in range(B):
        v = valid[b]
        starts = np.nonzero(v & ~np.concatenate([[False], v[:-1]]))[0]
        ends = np.nonzero(v & ~np.concatenate([v[1:], [False]]))[0]
        runs = list(zip(starts.tolist(), ends.tolist()))
        runs_by_read.append(runs)
        for ri in range(len(runs) - 1):
            gaps.append((b, runs[ri][1], runs[ri + 1][0]))

    fills = {}
    if gaps:
        seed_rows = np.array([idx[b, l] for b, l, _ in gaps], np.int32)
        seed_or = np.array([orient[b, l] for b, l, _ in gaps], np.uint8)
        gaplens = np.array([r - l - 1 for b, l, r in gaps])
        is_ins = np.array([mate_col is not None and l < mate_col <= r
                           for b, l, r in gaps])
        max_err_steps = int(gaplens[~is_ins].max() + gap_tolerance(
            int(gaplens[~is_ins].max())) + 2) if (~is_ins).any() else 2
        max_steps = int(min(max(max_err_steps,
                                frag_len_max if is_ins.any() else 0),
                            4096))
        st = lwalk.linked_init(g, links, jnp.asarray(seed_rows),
                               jnp.asarray(seed_or), max_steps,
                               ctpcol=ctpcol)
        st = lwalk.walk_linked(g, links, st, colour, max_steps=max_steps,
                               ctpcol=ctpcol)
        wverts = np.asarray(st.base.out_vert)
        wbases = np.asarray(st.base.out_bases)
        wlens = np.asarray(st.base.out_len)
        for gi, (b, l, r) in enumerate(gaps):
            target = int(idx[b, r]) * 2 + int(orient[b, r])
            L = int(wlens[gi])
            n = r - l - 1
            hit = np.nonzero(wverts[gi, :L] == target)[0]
            if is_ins[gi]:
                ok = [h for h in hit if h + 1 <= frag_len_max]
            else:
                tol = gap_tolerance(n)
                ok = [h for h in hit if abs((h + 1) - (n + 1)) <= tol]
            if ok:
                d = ok[0]  # shortest acceptable fill
                fills[(b, l)] = (wverts[gi, :d], wbases[gi, :d])

    # splice per read (vectorised base extraction, python only for the
    # short per-read run bookkeeping)
    okm_all = np.asarray(kops.oriented(
        jnp.asarray(np.asarray(g.keys)[idx.reshape(-1)]),
        jnp.asarray(orient.reshape(-1).astype(np.uint8)), k))
    basechars = np.array(list("ACGT"))
    lastb = basechars[(okm_all[:, -1] & 3).astype(int)].reshape(B, P)
    from ..utils.text import kmers_to_strings
    out = []
    for b in range(B):
        runs = runs_by_read[b]
        if not runs:
            raw = _codes_to_str(bases[b])
            out.append(CorrectedRead(np.zeros(0, np.int64), raw,
                                     raw.lower(), 0, 0))
            continue
        verts_out = []
        seq_parts = []
        disp_parts = []
        ngaps = nfixed = 0
        s0 = runs[0][0]
        lead = _codes_to_str(bases[b][:s0])
        first_kmer = kmers_to_strings(
            okm_all[b * P + s0][None], k)[0]
        seq_parts.append(first_kmer)
        disp_parts.append(lead.lower() + first_kmer)
        verts_out.append([idx[b, s0] * 2 + orient[b, s0]])
        for ri, (s, e) in enumerate(runs):
            if ri > 0:
                ngaps += 1
                fill = fills.get((b, runs[ri - 1][1]))
                if fill is not None:
                    nfixed += 1
                    fv, fb = fill
                    fseq = "".join("ACGT"[x] for x in fb)
                    seq_parts.append(fseq)
                    disp_parts.append(fseq)
                    verts_out.append(fv.tolist())
                else:
                    gap_seq = _codes_to_str(
                        bases[b][runs[ri - 1][1] + k: s + k - 1])
                    seq_parts.append(gap_seq)
                    disp_parts.append(gap_seq.lower())
                    verts_out.append([-1] * len(gap_seq))
            rng = range(s + 1, e + 1) if ri == 0 else range(s, e + 1)
            if ri > 0 and fills.get((b, runs[ri - 1][1])) is not None:
                # the fill ends just before the right anchor; include it
                rng = range(s, e + 1)
            rb = "".join(lastb[b, i] for i in rng)
            verts_out.append(
                [idx[b, i] * 2 + orient[b, i] for i in rng])
            seq_parts.append(rb)
            disp_parts.append(rb)
        e_last = runs[-1][1]
        tail = _codes_to_str(bases[b][e_last + k:])
        disp_parts.append(tail.lower())
        seq = "".join(seq_parts)
        disp = "".join(disp_parts)
        verts = np.array([v for sub in verts_out for v in sub], np.int64)
        out.append(CorrectedRead(verts, seq, disp, ngaps, nfixed))
    return out


def _codes_to_str(codes):
    return "".join("ACGTN"[min(int(c), 4)] for c in codes)


