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

from . import store as gstore


def infer_edges(g: gstore.DBGraph, pop_only: bool = True,
                k: int | None = None) -> gstore.DBGraph:
    from . import adjacency as adjmod
    adj = adjmod.get_adjacency(g)
    return _infer_adj(g, adj, pop_only)


@functools.partial(jax.jit, static_argnames=("pop_only",))
def _infer_adj(g: gstore.DBGraph, adj, pop_only: bool = True):
    N = g.capacity
    keys, covg, edges = g.keys, g.covg, g.edges
    uedges = gstore.union_edges(g)
    iedges = edges[:, 0]
    for c in range(1, edges.shape[1]):
        iedges = iedges & edges[:, c]
    cand = (uedges & ~iedges) if pop_only else (~iedges)
    present = covg > 0  # (N, C)
    idx = jnp.arange(N, dtype=jnp.int32)
    new_edges = edges
    for o in (0, 1):
        for n in range(4):
            bit = np.uint8(1 << (n + 4 * o))
            rows = (cand & bit) > 0
            from . import adjacency as adjmod
            nv = adjmod.adj_at(adj, idx * 2 + o, n)
            found = nv >= 0
            j = jnp.maximum(nv, 0) >> 1
            addc = rows[:, None] & found[:, None] & present & present[j]
            new_edges = jnp.where(addc, new_edges | bit, new_edges)
    return g.replace(edges=new_edges)
