"""Edge inference (role of ref src/tools/infer_edges.c).

--pop: for each kmer, any edge present in some colour (union) but not all
(intersection) is added to every colour where both endpoint kmers have
coverage.  --all: every possible edge (all 8 bits not already in the
intersection) is probed; if the neighbour kmer exists, the edge is added
per colour where both endpoints have coverage.  Symmetry holds because
each kmer probes its own candidate bits independently
(ref infer_edges.c:26-90 infer_kmer_edges).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kmer as kops
from ..ops import sorted as sops
from . import store as gstore


@functools.partial(jax.jit, static_argnames=("k", "pop_only"))
def infer_edges(g: gstore.DBGraph, pop_only: bool = True,
                k: int | None = None) -> gstore.DBGraph:
    k = k or g.k
    N = g.capacity
    keys, covg, edges = g.keys, g.covg, g.edges
    uedges = gstore.union_edges(g)
    iedges = edges[:, 0]
    for c in range(1, edges.shape[1]):
        iedges = iedges & edges[:, c]
    cand = (uedges & ~iedges) if pop_only else (~iedges)
    present = covg > 0  # (N, C)
    new_edges = edges
    for o in (0, 1):
        oarr = jnp.full((N,), o, jnp.uint8)
        okm = kops.oriented(keys, oarr, k)
        for n in range(4):
            bit = np.uint8(1 << (n + 4 * o))
            rows = (cand & bit) > 0
            nxt = kops.shift_append(okm, jnp.full((N,), n, jnp.uint8), k)
            key2, _ = kops.canonical(nxt, k)
            j, found = sops.lookup(keys, key2)
            addc = rows[:, None] & found[:, None] & present & present[j]
            new_edges = jnp.where(addc, new_edges | bit, new_edges)
    return g.replace(edges=new_edges)
