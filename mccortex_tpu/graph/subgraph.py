"""Subgraph extraction: BFS neighbourhood of seed kmers.

Role of ref src/tools/subgraph.c: mark kmers within `dist` steps of any
seed-sequence kmer, optionally whole unitigs (--unitigs) or the
complement (--invert), then prune.  TPU-native: the BFS frontier is the
boolean mark vector itself; one step = expand all 8 neighbours of every
marked kmer at once (dist iterations of vector ops).
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kmer as kops
from ..ops import sorted as sops
from ..ops import hashidx
from . import store as gstore
from . import edges as E


def bfs_mark(g: gstore.DBGraph, seed_mask: jnp.ndarray, dist: int, k: int):
    """Expand seed_mask by `dist` BFS steps over graph edges (one
    dispatch per step; adjacency gathers)."""
    from . import adjacency as adjmod
    adj = adjmod.get_adjacency(g)
    uedges = gstore.union_edges(g)
    mask = seed_mask
    for _ in range(dist):
        mask = _bfs_step(mask, uedges, adj)
    return mask & ~sops.is_sentinel(g.keys)


@jax.jit
def _bfs_step(mask, uedges, adj):
    N = mask.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    out = mask
    for o in (0, 1):
        nib = E.with_orientation(uedges, jnp.full((N,), o, jnp.uint8))
        for n in range(4):
            has = ((nib >> n) & 1).astype(bool) & mask
            from . import adjacency as adjmod
            nv = adjmod.adj_at(adj, idx * 2 + o, n)
            j = jnp.maximum(nv, 0) >> 1
            add = has & (nv >= 0)
            out = out | jnp.zeros_like(mask).at[j].max(add)
    return out


def seed_mask_from_seqs(g: gstore.DBGraph, seq_batches) -> jnp.ndarray:
    mask = jnp.zeros((g.capacity,), bool)
    for bases in seq_batches:
        kmers, valid = kops.rolling_kmers(jnp.asarray(bases), g.k)
        keys, _ = kops.canonical(kmers, g.k)
        idx, found = hashidx.lookup(g.keys, keys.reshape(-1, g.W))
        hit = (valid.reshape(-1) & found)
        mask = mask.at[idx].max(hit)
    return mask


def subgraph(g: gstore.DBGraph, seq_batches, dist: int = 0,
             invert: bool = False, whole_unitigs: bool = False):
    from . import prune as P
    from . import unitigs as U
    mask = seed_mask_from_seqs(g, seq_batches)
    if whole_unitigs:
        uv = U.unitig_view(g.keys, gstore.union_edges(g), g.k)
        # mark whole unitigs containing any marked kmer
        hit = jax.ops.segment_max(mask.astype(jnp.int32), uv.uid,
                                  num_segments=2 * g.capacity)
        mask = hit[uv.uid] > 0
    mask = bfs_mark(g, mask, dist, g.k)
    if invert:
        mask = ~mask & ~sops.is_sentinel(g.keys)
    return P.prune_to_mask(g, mask)
