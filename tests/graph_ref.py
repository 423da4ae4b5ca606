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
