"""Breakpoint caller: large-event calling against a trusted reference.

Role of ref src/tools/breakpoint_caller.c: at every graph node where a
non-reference branch exists, walk the non-ref path (per colour, with
links) until >= min_ref_nkmers consecutive reference kmers are
re-acquired (search capped at max_ref_nkmers); emit the 5' flank (a
colinear reference run leading into the break), the allele path, and the
3' reference re-contact run.

TPU mapping: candidate break sites are found with one vectorised pass
(ref-kmer with an out-edge to a non-ref kmer); all (site, branch,
colour) walks run as one batched linked walk; run assembly against the
reference index happens on host over the recorded vertex paths.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..ops import kmer as kops
from ..ops import sorted as sops
from ..graph import edges as E
from ..graph import store as gstore
from ..graph import kmer_occur as KO
from ..links import store as lstore
from ..links import walk as lwalk

DEFAULT_MIN_REF = 5     # ref breakpoint_caller.h:12
DEFAULT_MAX_REF = 1000  # ref breakpoint_caller.h:14


@dataclasses.dataclass
class Breakpoint:
    flank5p_seq: str
    flank5p_run: dict      # primary colinear ref run leading into the break
    flank3p_seq: str
    flank3p_run: dict      # primary ref re-contact run
    allele_seq: str        # bases strictly between the flanks
    cols: list
    # FULL colinear run lists per flank (ref breakpoint_caller.c:534-570
    # koruns_gzprint emits every run with its qoffset; the primary above
    # is the largest-match choice).  qoffset is in kmers, 0-based,
    # relative to the flank's own sequence.
    flank5p_runs: list = dataclasses.field(default_factory=list)
    flank3p_runs: list = dataclasses.field(default_factory=list)


def find_break_sites(g: gstore.DBGraph, ko: KO.KOGraph):
    """Vertices (2*row+orient) that are ref kmers with >=1 out-edge to a
    non-ref kmer; returns (verts, branch nibble of non-ref nexts)."""
    N = g.capacity
    uedges = np.asarray(gstore.union_edges(g))
    in_ref = KO.occurs_mask(ko, N)
    out_verts, out_nibs = [], []
    keysj = g.keys
    for o in (0, 1):
        oarr = jnp.full((N,), o, jnp.uint8)
        okm = kops.oriented(keysj, oarr, g.k)
        nib = (uedges >> (4 * o)) & 0xF
        nonref_nib = np.zeros(N, np.uint8)
        for n in range(4):
            has = (nib >> n) & 1 > 0
            nxt = kops.shift_append(okm, jnp.full((N,), n, jnp.uint8), g.k)
            key2, _ = kops.canonical(nxt, g.k)
            j, found = sops.lookup(g.keys, key2)
            nonref = has & np.asarray(found) & \
                ~in_ref[np.asarray(j)]
            nonref_nib |= (nonref.astype(np.uint8) << n)
        rows = np.nonzero(in_ref & (nonref_nib > 0))[0]
        out_verts.append(2 * rows + o)
        out_nibs.append(nonref_nib[rows])
    return (np.concatenate(out_verts), np.concatenate(out_nibs))


def call_breakpoints(g: gstore.DBGraph, ref: KO.RefGenome,
                     links: lstore.LinkStore | None = None,
                     min_ref: int = DEFAULT_MIN_REF,
                     max_ref: int = DEFAULT_MAX_REF,
                     max_flank: int = 1000):
    """Returns list[Breakpoint]."""
    from ..calls.bubbles import _force_first_step, _take_walkers
    ncols = g.ncols
    if links is None:
        links = lstore.empty(g.capacity, ncols)
    ko = KO.build_kograph(g, ref)
    verts, nibs = find_break_sites(g, ko)
    if len(verts) == 0:
        return []

    # one walker per (site, nonref branch, colour) where fork+branch in col
    covg_np = np.asarray(g.covg)
    meta = []
    rows = verts >> 1
    orients = verts & 1
    fork_okm = kops.oriented(jnp.asarray(g.keys)[jnp.asarray(rows)],
                             jnp.asarray(orients.astype(np.uint8)), g.k)
    branch_rows = np.zeros((len(verts), 4), np.int64)
    for n in range(4):
        nxt = kops.shift_append(fork_okm, jnp.full((len(verts),), n,
                                                   jnp.uint8), g.k)
        key2, _ = kops.canonical(nxt, g.k)
        jrow, _ = sops.lookup(g.keys, key2)
        branch_rows[:, n] = np.asarray(jrow)
    for si in range(len(verts)):
        for n in range(4):
            if not (nibs[si] >> n) & 1:
                continue
            for c in range(ncols):
                if covg_np[rows[si], c] > 0 and \
                   covg_np[branch_rows[si, n], c] > 0:
                    meta.append((si, n, c))
    if not meta:
        return []
    meta = np.array(meta)
    B = len(meta)
    max_steps = max_ref + min_ref + 2

    st = lwalk.linked_init(
        g, links, jnp.asarray(rows[meta[:, 0]].astype(np.int32)),
        jnp.asarray(orients[meta[:, 0]].astype(np.uint8)), max_steps)
    st = _force_first_step(g, links, st,
                           jnp.asarray(meta[:, 1].astype(np.uint8)),
                           jnp.asarray(meta[:, 2].astype(np.int32)))
    outs = {}
    from ..graph import adjacency as adjmod
    adj = adjmod.get_adjacency(g)  # one row gather per step, not log2(N)
    hopinfo = lwalk.get_hopinfo(g, links)
    for c in set(meta[:, 2].tolist()):
        sel = np.nonzero(meta[:, 2] == c)[0]
        sub = _take_walkers(st, sel)
        sub = lwalk.walk_linked(g, links, sub, int(c),
                                max_steps=max_steps,
                                ctpcol=min(int(c),
                                           links.nseen.shape[1] - 1),
                                adj=adj, hopinfo=hopinfo)
        lwalk.report_drops(sub, "breakpoints")
        outs[c] = (sel, sub)

    vert_paths = np.full((B, max_steps), -1, np.int32)
    base_paths = np.zeros((B, max_steps), np.uint8)
    lens = np.zeros(B, np.int32)
    for c, (sel, sub) in outs.items():
        # prefix-width returns (live pow2 bucket, not the full buffer)
        ob, ov = lwalk.fill_hop_outputs(g, sub)
        wv = min(ov.shape[1], vert_paths.shape[1])
        wb = min(ob.shape[1], base_paths.shape[1])
        vert_paths[np.asarray(sel)[:, None], np.arange(wv)] = ov[:, :wv]
        base_paths[np.asarray(sel)[:, None], np.arange(wb)] = ob[:, :wb]
        lens[sel] = np.asarray(sub.base.out_len)

    # 5p flanks: backward walks from each site (linkless, ref-tracking)
    from ..graph import traverse as T
    usites = np.unique(meta[:, 0])
    rseed = rows[usites]
    rorient = 1 - orients[usites]
    stb = T.walk_init(g, jnp.asarray(rseed.astype(np.int32)),
                      jnp.asarray(rorient.astype(np.uint8)), max_flank)
    stb = T.walk(g, stb, None, max_steps=max_flank)
    bverts = np.asarray(stb.out_vert)
    bbases = np.asarray(stb.out_bases)
    blens = np.asarray(stb.out_len)
    site_to_bi = {int(s): i for i, s in enumerate(usites)}

    from ..utils.text import kmers_to_strings
    keys_np = np.asarray(g.keys)
    calls = {}
    for w in range(B):
        si, n, c = meta[w]
        L = int(lens[w])
        if L < min_ref:
            continue
        path_v = vert_paths[w, :L]
        runs = KO.runs_of_path(ko, path_v, min_len=min_ref)
        if not runs:
            continue
        # earliest qualifying re-contact run (already qoffset-sorted)
        r3 = runs[0]
        if r3["qoffset"] > max_ref:
            continue
        # 5' flank: backward walk from the site; its vertices reversed
        # and complemented form the sequence INTO the site
        bi = site_to_bi[int(si)]
        bL = int(blens[bi])
        # the backward walk runs in the reversed orientation: include the
        # site vertex reversed so the run is colinear from qoffset 0
        back_path = np.concatenate(
            [[int(verts[si]) ^ 1], bverts[bi, :bL]])
        b_runs = KO.runs_of_path(ko, back_path, min_len=1)
        # runs contacting the break (qoffset 0 going backward) — a
        # repetitive flank yields several (ref picks up 5' runs only at
        # the first unitig, breakpoint_caller.c:254-263)
        r5bs = [r for r in b_runs if r["qoffset"] == 0]
        if not r5bs:
            continue
        # convert backward runs to forward orientation; primary = the
        # longest (the reference consumer's largest-match rule)
        r5bs.sort(key=lambda r: -r["len"])
        r5s = [{"chrom": r["chrom"], "first": r["last"],
                "last": r["first"], "strand": 1 - r["strand"],
                "len": r["len"]} for r in r5bs]
        r5b = r5bs[0]
        r5 = r5s[0]
        # sequences
        site_kmer = kmers_to_strings(
            np.asarray(kops.oriented(
                jnp.asarray(keys_np[rows[si]][None]),
                jnp.asarray([orients[si]], jnp.uint8), g.k)), g.k)[0]
        comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
        back_seq = "".join("ACGT"[x] for x in bbases[bi, :min(
            bL, r5b["len"] - 1 + g.k)])
        flank5p = "".join(comp[ch] for ch in reversed(back_seq)) + site_kmer
        allele = "".join("ACGT"[x] for x in base_paths[w, :r3["qoffset"]])
        f3len = min(r3["len"], 100)
        flank3p = "".join(
            "ACGT"[x] for x in
            base_paths[w, r3["qoffset"]:r3["qoffset"] + f3len])
        # full run lists with qoffsets relative to each flank's sequence
        flen5 = len(flank5p) - g.k + 1
        runs5 = [dict(r, qoffset=max(flen5 - r["len"], 0)) for r in r5s]
        runs3 = [dict(r, qoffset=r["qoffset"] - r3["qoffset"])
                 for r in runs]
        keyid = (int(si), int(n), allele, r3["chrom"], r3["first"])
        if keyid in calls:
            calls[keyid].cols.append(int(c))
        else:
            calls[keyid] = Breakpoint(
                flank5p_seq=flank5p, flank5p_run=r5,
                flank3p_seq=flank3p, flank3p_run=r3,
                allele_seq=allele, cols=[int(c)],
                flank5p_runs=runs5, flank3p_runs=runs3)
    return list(calls.values())
