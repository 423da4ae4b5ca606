"""Pure-Python reference coloured dBG builder for tests (ground truth).

Independent re-derivation of the reference semantics
(ref: src/tools/build_graph.c, src/graph/db_node.h edge coding).
"""

from collections import defaultdict

from util import revcomp_str, BASE


def build_ref_graph(seq_by_colour, k, ncols=None):
    """seq_by_colour: list of (sequence, colour). Returns
    {key_str: (covg list, edges list)} with per-colour uint covg and edge
    bytes.  Sequences are split on non-ACGT chars."""
    ncols = ncols or (max(c for _, c in seq_by_colour) + 1)
    covg = defaultdict(lambda: [0] * ncols)
    edges = defaultdict(lambda: [0] * ncols)
    for seq, col in seq_by_colour:
        for frag in _split_acgt(seq):
            kms = []
            for i in range(len(frag) - k + 1):
                km = frag[i:i + k]
                rc = revcomp_str(km)
                key, o = (km, 0) if km <= rc else (rc, 1)
                kms.append((key, o, i))
                covg[key][col] += 1
            for key, o, i in kms:
                if i + k < len(frag):  # following base
                    b = BASE[frag[i + k]]
                    edges[key][col] |= 1 << (b + 4 * o)
                if i > 0:  # preceding base, recorded on reverse orientation
                    p = BASE[frag[i - 1]]
                    edges[key][col] |= 1 << ((3 - p) + 4 * (1 - o))
    return {key: (covg[key], edges[key]) for key in covg}


def _split_acgt(seq):
    frag = []
    for c in seq:
        if c in "ACGT":
            frag.append(c)
        else:
            if frag:
                yield "".join(frag)
            frag = []
    if frag:
        yield "".join(frag)


def ref_unitigs(graph, k):
    """Sequential unitig decomposition from a build_ref_graph dict.
    Returns a set of canonicalised unitig sequences (min of seq/revcmp).
    Mirrors db_unitig_extend rules: extend while outdeg==1 and next
    indeg==1, stop at hairpins/self (next key == current key) and at
    walk start key (cycles)."""
    COMP_ = {"A": "T", "C": "G", "G": "C", "T": "A"}

    def rc(s):
        return "".join(COMP_[c] for c in reversed(s))

    def union_edges(key):
        cov, edg = graph[key]
        u = 0
        for e in edg:
            u |= e
        return u

    def oriented_kmer(key, o):
        return key if o == 0 else rc(key)

    def nibble(key, o):
        return (union_edges(key) >> (4 * o)) & 0xF

    def popc(x):
        return bin(x).count("1")

    def step(key, o):
        nib = nibble(key, o)
        if popc(nib) != 1:
            return None
        nuc = "ACGT"[[1, 2, 4, 8].index(nib)]
        nxt = oriented_kmer(key, o)[1:] + nuc
        key2 = min(nxt, rc(nxt))
        o2 = 0 if key2 == nxt else 1
        if key2 not in graph:
            return None
        if popc(nibble(key2, 1 - o2)) != 1:
            return None
        if key2 == key:
            return None
        return key2, o2

    seen = set()
    unitigs = set()
    for start in graph:
        if start in seen:
            continue
        # walk both directions from start
        chain = [(start, 0)]
        startkey = start
        # extend forward
        cur, o = start, 0
        while True:
            nxt = step(cur, o)
            if nxt is None or nxt[0] == startkey or nxt[0] == chain[-1][0]:
                break
            if any(nxt[0] == c[0] for c in chain):
                break  # safety for cycles
            chain.append(nxt)
            cur, o = nxt
        # extend backward (walk reverse orientation from start)
        cur, o = start, 1
        back = []
        while True:
            nxt = step(cur, o)
            if nxt is None or nxt[0] == startkey or nxt[0] == chain[-1][0]:
                break
            if any(nxt[0] == c[0] for c in chain) or \
               any(nxt[0] == c[0] for c in back):
                break
            back.append(nxt)
            cur, o = nxt
        full = [(kk, 1 - oo) for kk, oo in reversed(back)] + chain
        seq = oriented_kmer(*full[0])
        for kk, oo in full[1:]:
            seq += oriented_kmer(kk, oo)[-1]
        unitigs.add(min(seq, rc(seq)))
        seen.update(kk for kk, _ in full)
    return unitigs


def ref_linkless_contig(graph, seed_key, k, colour=0):
    """Python reference for linkless contig assembly from a seed kmer key:
    mirrors graph_walker_choose states 0-5 (no links) + both directions.
    colour=None walks the union. Returns (contig, right_status,
    left_status) with status strings."""
    COMP_ = {"A": "T", "C": "G", "G": "C", "T": "A"}

    def rc(s):
        return "".join(COMP_[c] for c in reversed(s))

    def nib(key, o, cols):
        cov, edg = graph[key]
        u = 0
        for c in cols:
            u |= edg[c]
        return (u >> (4 * o)) & 0xF

    def in_colour(key, colour):
        if colour is None:
            return key in graph
        return key in graph and graph[key][0][colour] > 0

    ncols = len(graph[seed_key][0])
    all_cols = list(range(ncols))

    def walk(start_km):
        seen = set()
        cur = start_km
        out = []
        while True:
            key = min(cur, rc(cur))
            o = 0 if key == cur else 1
            if (key, o) in seen:
                return out, "HitCycle"
            seen.add((key, o))
            pop = nib(key, o, all_cols)
            cands = [n for n in range(4) if pop >> n & 1]
            if not cands:
                return out, "FailNoCovg"
            colc = []
            for n in cands:
                nxt = cur[1:] + "ACGT"[n]
                if in_colour(min(nxt, rc(nxt)), colour):
                    colc.append(n)
            if len(cands) == 1 and len(colc) == 1:
                pick = colc[0]
            elif len(cands) == 1 and not colc:
                pick = cands[0]  # POPFWD
            elif len(cands) > 1 and len(colc) == 1:
                pick = colc[0]  # POPFRK_COLFWD
            elif len(cands) > 1 and not colc:
                return out, "FailNoColCovg"
            else:
                return out, "FailNoLinks"
            cur = cur[1:] + "ACGT"[pick]
            out.append("ACGT"[pick])

    right, rstat = walk(seed_key)
    left_rc, lstat = walk(rc(seed_key))
    left = rc("".join(left_rc))
    return left + seed_key + "".join(right), rstat, lstat
