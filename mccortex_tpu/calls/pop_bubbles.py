"""Pop simple bubbles (role of ref src/tools/pop_bubbles.c): remove one
branch of two-branch bubbles to linearise a population graph before
contig assembly.  Caps: only pop when the removed branch's mean coverage
and length are within limits; the LOWER-coverage branch is removed
(ties: the lexicographically larger allele)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..graph import store as gstore
from ..graph import prune as P
from . import bubbles as bub


def pop_bubbles(g: gstore.DBGraph, max_covg: int = -1, max_len: int = -1,
                max_kdiff: int = -1):
    """max_kdiff: only pop when the branch lengths differ by at most
    this many kmers (<0 = ignore; ref pop_bubbles.c:112)."""
    bl = bub.call_bubbles(g, max_allele=max(max_len, 100)
                          if max_len > 0 else 100)
    covg_np = np.asarray(g.covg)
    remove_rows = set()
    npopped = 0
    for bb in bl:
        if len(bb.branches) != 2:
            continue
        # identify branch kmer rows via the recorded vertex paths: we
        # re-walk host-side using the allele strings through the flank
        rows_a, mc_a = _branch_rows(g, bb, 0, covg_np)
        rows_b, mc_b = _branch_rows(g, bb, 1, covg_np)
        if rows_a is None or rows_b is None:
            continue
        if max_kdiff >= 0 and abs(len(bb.branches[0])
                                  - len(bb.branches[1])) > max_kdiff:
            continue
        # pick branch to remove
        if (mc_a, bb.branches[0]) <= (mc_b, bb.branches[1]):
            rows_rm, mc, ln = rows_a, mc_a, len(bb.branches[0])
        else:
            rows_rm, mc, ln = rows_b, mc_b, len(bb.branches[1])
        if max_covg >= 0 and mc > max_covg:
            continue
        if max_len >= 0 and ln > max_len:
            continue
        rows_keep = rows_b if rows_rm is rows_a else rows_a
        only = set(rows_rm) - set(rows_keep)
        if only:
            remove_rows |= only
            npopped += 1
    keep = np.ones(g.capacity, bool)
    keep[list(remove_rows)] = False
    return P.prune_to_mask(g, jnp.asarray(keep)), npopped


def _branch_rows(g, bb, i, covg_np):
    """Kmer rows of branch i's allele path (flank5p tail + allele)."""
    from ..constants import CHAR_TO_BASE
    from ..ops import kmer as kops
    from ..ops import sorted as sops
    seq = bb.flank5p[-g.k:] + bb.branches[i]
    arr = CHAR_TO_BASE[np.frombuffer(seq.encode(), np.uint8)]
    if len(arr) < g.k:
        return None, 0
    kmers, valid = kops.rolling_kmers(jnp.asarray(arr[None]), g.k)
    keys, _ = kops.canonical(kmers, g.k)
    idx, found = sops.lookup(g.keys, keys[0])
    v = np.asarray(valid[0]) & np.asarray(found)
    rows = np.asarray(idx)[v]
    rows = rows[1:] if len(rows) else rows  # drop the fork kmer itself
    if len(rows) == 0:
        return None, 0
    mean_covg = int(covg_np[rows].sum(axis=1).mean())
    return rows.tolist(), mean_covg
