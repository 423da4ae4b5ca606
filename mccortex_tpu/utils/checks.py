"""Graph integrity checks (role of ref src/commands/ctx_health_check.c and
src/graph/gpath_checks.c edge parts): sorted canonical unique keys, covg
presence, and full per-colour edge symmetry."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import kmer as kops
from ..ops import sorted as sops


def check_graph_arrays(k: int, keys: np.ndarray, covg: np.ndarray,
                       edges: np.ndarray) -> list:
    errs = []
    N, W = keys.shape
    if N == 0:
        return errs
    jkeys = jnp.asarray(keys)
    # sorted + unique
    lt = np.asarray(kops.mw_lt(jkeys[:-1], jkeys[1:])) if N > 1 else np.array([])
    if N > 1 and not lt.all():
        errs.append(f"keys not sorted/unique at {int(np.argmin(lt))}")
    # canonical: key <= revcmp(key)
    rc = kops.revcmp(jkeys, k)
    bad = np.asarray(kops.mw_lt(rc, jkeys))
    if bad.any():
        errs.append(f"non-canonical key at {int(np.argmax(bad))}")
    # covg > 0 somewhere
    if (covg.sum(axis=1) == 0).any():
        errs.append("kmer with zero coverage in all colours")
    # edge symmetry: for every set edge (colour c, orient o, nuc n) on node
    # i, the neighbour key must exist and carry the symmetric bit
    jedges = jnp.asarray(edges)
    for o in (0, 1):
        okm = kops.oriented(jkeys, jnp.full((N,), o, jnp.uint8), k)
        first = kops.first_base(okm, k)
        for n in range(4):
            bit = np.uint8(1 << (n + 4 * o))
            has = (edges & bit) > 0  # (N, C)
            if not has.any():
                continue
            nxt = kops.shift_append(okm, jnp.full((N,), n, jnp.uint8), k)
            nkey, norient = kops.canonical(nxt, k)
            # o2: orientation of the neighbour node such that oriented
            # (nkey, o2) == nxt; norient==1 means nxt != nkey => o2=1
            o2 = norient
            idx, found = sops.lookup(jkeys, nkey)
            found = np.asarray(found)
            rows = has.any(axis=1)
            missing = rows & ~found
            if missing.any():
                errs.append(
                    f"edge to absent kmer (row {int(np.argmax(missing))}, "
                    f"orient {o}, nuc {n})")
                continue
            sym_nuc = (3 - np.asarray(first)) & 3
            sym_bit = np.uint8(1) << (sym_nuc + 4 * (1 - np.asarray(o2)))
            nedges = edges[np.asarray(idx)]  # (N, C)
            bad = has & ((nedges & sym_bit[:, None]) == 0)
            if bad.any():
                r = int(np.argmax(bad.any(axis=1)))
                errs.append(
                    f"asymmetric edge (row {r}, orient {o}, nuc {n})")
    return errs
