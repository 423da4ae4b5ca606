"""Node removal with edge-consistent cleanup.

Role of ref src/graph/prune_nodes.c: delete kmers not in a keep mask and
clear any edge bits that point at deleted kmers (in every colour).
"""

from __future__ import annotations


import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import sorted as sops
from . import store as gstore


def clear_dangling_edges(keys: jnp.ndarray, edges: jnp.ndarray,
                         keep: jnp.ndarray, k: int,
                         adj: jnp.ndarray | None = None) -> jnp.ndarray:
    """Clear, per colour, any edge bit whose neighbour kmer is not kept.

    Large stores (> adjacency.ADJ_FREE_N kmers) with no cached adjacency
    run direct probe sweeps per (orientation, base) instead of
    materialising the flat (8N,) adjacency (HBM at 100M+ kmers)."""
    from . import adjacency as adjmod
    if adj is None:
        adj = adjmod.cached_adjacency_for(keys, k)
    if adj is None and keys.shape[0] > adjmod.ADJ_FREE_N:
        return _clear_dangling_direct(keys, edges, keep, k)
    if adj is None:
        adj = adjmod.get_adjacency_for(keys, k)
    return _clear_dangling_adj(edges, keep, adj)


def _clear_dangling_direct(keys, edges, keep, k):
    from . import adjacency as adjmod
    from ..ops import hashidx
    new_edges = edges
    for o in (0, 1):
        for n in range(4):
            key2, _o2 = adjmod._probe(keys, k, o, n)
            j, found = hashidx.lookup(keys, key2)
            new_edges = _clear_bit(new_edges, keep, j, found, o, n)
    return new_edges


@functools.partial(jax.jit, static_argnames=("o", "n"))
def _clear_bit(edges, keep, j, found, o: int, n: int):
    bit = np.uint8(1 << (n + 4 * o))
    kept = found & keep[jnp.maximum(j.astype(jnp.int32), 0)]
    clear = (~kept)[:, None]
    return jnp.where(clear, edges & np.uint8(0xFF ^ bit), edges)


@jax.jit
def _clear_dangling_adj(edges, keep, adj):
    N = edges.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    new_edges = edges
    for o in (0, 1):
        for n in range(4):
            bit = np.uint8(1 << (n + 4 * o))
            from . import adjacency as adjmod
            nv = adjmod.adj_at(adj, idx * 2 + o, n)
            neighbour_kept = (nv >= 0) & keep[jnp.maximum(nv, 0) >> 1]
            clear = (~neighbour_kept)[:, None]
            new_edges = jnp.where(clear, new_edges & np.uint8(0xFF ^ bit),
                                  new_edges)
    return new_edges


def prune_to_mask(g: gstore.DBGraph, keep: jnp.ndarray,
                  k: int | None = None) -> gstore.DBGraph:
    """Return a new store containing only kmers where keep is True, with
    dangling edges cleared.  Capacity preserved; keys stay sorted because
    compaction is order-preserving."""
    k = k or g.k
    keep = keep & ~sops.is_sentinel(g.keys)
    edges = clear_dangling_edges(g.keys, g.edges, keep, k)
    N = g.capacity
    # stable compaction: target slot = exclusive prefix sum of keep
    pos = jnp.cumsum(keep.astype(jnp.int32)) - keep.astype(jnp.int32)
    tgt = jnp.where(keep, pos, N)  # out-of-bounds => dropped by scatter
    keys_out = sops.sentinel((N,), g.W).at[tgt].set(g.keys, mode="drop")
    covg_out = jnp.zeros_like(g.covg).at[tgt].set(g.covg, mode="drop")
    edges_out = jnp.zeros_like(g.edges).at[tgt].set(edges, mode="drop")
    n = jnp.sum(keep).astype(jnp.int64)
    return gstore.DBGraph(keys=keys_out, covg=covg_out, edges=edges_out,
                          n=n, k=k)
