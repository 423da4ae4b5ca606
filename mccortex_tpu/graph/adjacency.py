"""Precomputed vertex adjacency: the traversal fast path.

Walk steps need the graph row of each candidate next kmer.  Instead of a
batched binary search per step (log2 N gathers), precompute once per
graph: adj[v, n] = vertex (2*row+orient) reached from vertex v by
appending base n, or -1 if that kmer is absent.  One HBM gather per
candidate afterwards — the speed-of-light form of the reference's
hash-probe inner loop for traversal.

Built with 8 batched lookups over the whole store (O(N log N) once).
Cached per store (host-side id cache).
"""

from __future__ import annotations

import functools
import weakref

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kmer as kops
from ..ops import sorted as sops
from . import store as gstore


@functools.partial(jax.jit, static_argnames=("k",))
def build_adjacency(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """adj (2N, 4) int32: next vertex per (vertex, appended base)."""
    N = keys.shape[0]
    cols = []
    for o in (0, 1):
        okm = kops.oriented(keys, jnp.full((N,), o, jnp.uint8), k)
        percol = []
        for n in range(4):
            nxt = kops.shift_append(okm, jnp.full((N,), n, jnp.uint8), k)
            key2, o2 = kops.canonical(nxt, k)
            j, found = sops.lookup(keys, key2)
            v = jnp.where(found, j * 2 + o2.astype(jnp.int32),
                          jnp.int32(-1))
            percol.append(v)
        cols.append(jnp.stack(percol, axis=1))  # (N, 4)
    # interleave rows: vertex 2i+o
    return jnp.stack(cols, axis=1).reshape(2 * N, 4)


_cache: "weakref.WeakValueDictionary" = {}
_cache_store = {}


def get_adjacency(g: gstore.DBGraph) -> jnp.ndarray:
    """Per-store cached adjacency (keyed by the keys buffer identity)."""
    key = (id(g.keys), g.capacity, g.k)
    hit = _cache_store.get(key)
    if hit is not None:
        return hit
    adj = build_adjacency(g.keys, g.k)
    if len(_cache_store) > 8:
        _cache_store.clear()
    _cache_store[key] = adj
    return adj
