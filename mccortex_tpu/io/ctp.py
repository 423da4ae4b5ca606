"""`.ctp` link file IO — compatible with the reference v4 text format.

Layout (ref src/graph_paths/gpath_save.c:10-28, gpath_reader.c):
gzip; pretty-printed JSON header object (braces balanced across lines);
comment lines starting '#'; blank line; then per kmer with links:

    <kmer> <numlinks>
    [F|R] <njuncs> <nseen0,nseen1,...> <junction-bases>
"""

from __future__ import annotations

import gzip
import json

import numpy as np
import jax.numpy as jnp

from ..constants import nwords
from ..links import store as lstore
from ..utils.text import kmers_to_strings, strings_to_kmers


def save_ctp(path: str, g, links: lstore.LinkStore, sample_names=None,
             command: str = "mctx thread") -> None:
    """Write the link store against graph g (keys give kmer strings)."""
    import mccortex_tpu
    N = g.capacity
    ncols = links.nseen.shape[1]
    offsets = np.asarray(links.offsets)
    nj = np.asarray(links.nj)
    seq = np.asarray(links.seq)
    nseen = np.asarray(links.nseen)
    keys = np.asarray(g.keys)
    nlinks = links.nlinks
    kmers_with = 0
    # vertices -> kmers: vertex v has links if offsets[v+1]>offsets[v]
    deg = np.diff(offsets)
    kmer_has = (deg[0::2] + deg[1::2]) > 0
    kmers_with = int(kmer_has.sum())

    hdr = {
        "file_format": "ctp",
        "format_version": 4,
        "ncols": ncols,
        "kmer_size": g.k,
        "generator": f"mccortex_tpu {mccortex_tpu.__version__}",
        "commands": [{"cmd": command}],
        "paths": {
            "num_kmers_with_paths": kmers_with,
            "num_paths": int(nlinks),
            "path_bytes": int(sum((nj + 3) // 4)),
        },
        "colours": [{"colour": c,
                     "sample": (sample_names[c] if sample_names else
                                f"colour{c}")}
                    for c in range(ncols)],
    }
    kstrs = kmers_to_strings(keys, g.k)
    with gzip.open(path, "wt") as fh:
        fh.write(json.dumps(hdr, indent=2))
        fh.write("\n\n")
        fh.write("# This file was generated with mccortex_tpu\n")
        fh.write("# Format: [kmer] [num_paths]\n")
        fh.write("#   [FR] [num_juncs] [counts0,counts1,...] [juncs]\n\n")
        rows = np.nonzero(kmer_has)[0]
        basechars = "ACGT"
        for r in rows:
            recs = []
            for o, oc in ((0, "F"), (1, "R")):
                v = 2 * r + o
                for li in range(offsets[v], offsets[v + 1]):
                    juncs = "".join(
                        basechars[int(lstore.unpack_junc(
                            jnp.asarray(seq[li][None]),
                            jnp.asarray([p]))[0])]
                        for p in range(nj[li]))
                    counts = ",".join(str(int(x)) for x in nseen[li])
                    recs.append(f"{oc} {nj[li]} {counts} {juncs}")
            fh.write(f"{kstrs[r]} {len(recs)}\n")
            for rec in recs:
                fh.write(rec + "\n")


def load_ctp(path: str, g) -> lstore.LinkStore:
    """Parse a .ctp file into a LinkStore against graph g."""
    from ..ops import kmer as kops
    from ..ops import sorted as sops
    from ..constants import CHAR_TO_BASE

    with gzip.open(path, "rt") as fh:
        text = fh.read()
    lines = text.splitlines()
    # JSON header: balanced braces
    depth = 0
    hdr_end = 0
    in_str = False
    esc = False
    done = False
    for i, line in enumerate(lines):
        for ch in line:
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    done = True
        if done:
            hdr_end = i
            break
    hdr = json.loads("\n".join(lines[:hdr_end + 1]))
    ncols = hdr.get("ncols", 1)
    if hdr.get("kmer_size") != g.k:
        raise ValueError(
            f"{path}: kmer_size {hdr.get('kmer_size')} != graph k={g.k}")

    verts, seqs, njs, nseens = [], [], [], []
    i = hdr_end + 1
    cur_row = -1
    npaths_left = 0
    W = g.W
    keys_np = np.asarray(g.keys)
    basemap = {c: i for i, c in enumerate("ACGT")}
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line or line.startswith("#"):
            continue
        if npaths_left == 0:
            kstr, num = line.split()[:2]
            key = strings_to_kmers([kstr], W)[0]
            cur_row = _find_row(keys_np, key)
            if cur_row < 0:
                raise ValueError(f"{path}: link kmer {kstr} not in graph")
            npaths_left = int(num)
        else:
            parts = line.split()
            orient = 0 if parts[0] == "F" else 1
            njx = int(parts[1])
            counts = [int(x) for x in parts[2].split(",")]
            juncs = parts[3]
            verts.append(2 * cur_row + orient)
            njs.append(njx)
            bases = np.array([basemap[c] for c in juncs[:njx]], np.uint8)
            seqs.append(bases)
            row = np.zeros(ncols, np.uint32)
            row[:len(counts)] = counts
            nseens.append(row)
            npaths_left -= 1
    N = g.capacity
    L = len(verts)
    if L == 0:
        return lstore.empty(N, ncols)
    jmax = max(njs)
    jwords = max(1, (jmax + 31) // 32)
    bases_arr = np.zeros((L, jmax), np.uint8)
    for ix, b in enumerate(seqs):
        bases_arr[ix, :len(b)] = b
    seq_packed = lstore.pack_juncs(bases_arr, np.array(njs), jwords)
    return lstore.assemble_csr(np.array(verts), seq_packed,
                               np.array(njs), np.stack(nseens), N)


def load_link_store(paths, g) -> lstore.LinkStore:
    store = None
    for p in paths:
        s = load_ctp(p, g)
        store = s if store is None else lstore.merge_stores(
            store, s, g.capacity)
    return store


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
