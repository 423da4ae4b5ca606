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

from ..ops import sorted as sops  # noqa: F811 (re-export)

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kmer as kops
from ..ops import sorted as sops
from . import store as gstore


@functools.partial(jax.jit, static_argnames=("k", "o", "n"))
def _probe(keys: jnp.ndarray, k: int, o: int, n: int):
    """Canonical key + orientation of the (o, n) neighbour of every kmer."""
    N = keys.shape[0]
    okm = kops.oriented(keys, jnp.full((N,), o, jnp.uint8), k)
    nxt = kops.shift_append(okm, jnp.full((N,), n, jnp.uint8), k)
    return kops.canonical(nxt, k)


@functools.partial(jax.jit, static_argnames=("k", "o"))
def probe_var(keys: jnp.ndarray, nuc: jnp.ndarray, k: int, o: int):
    """Canonical key + orientation of the per-kmer (o, nuc[i]) neighbour
    (variable appended base; used by the adjacency-free unitig path)."""
    N = keys.shape[0]
    okm = kops.oriented(keys, jnp.full((N,), o, jnp.uint8), k)
    nxt = kops.shift_append(okm, nuc, k)
    return kops.canonical(nxt, k)


@jax.jit
def _vertex_of(idx, found, o2):
    return jnp.where(found, idx * 2 + o2.astype(jnp.int32), jnp.int32(-1))


def lookup_chunked(sorted_keys: jnp.ndarray, queries: jnp.ndarray):
    """Batched host-level lookup through the planar hashed-bucket index
    (ops/hashidx.py): one row gather per query instead of a log2(N)
    binary search, dispatched in bounded chunks."""
    from ..ops import hashidx
    return hashidx.lookup(sorted_keys, queries)


def build_adjacency(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """adj FLAT (8N,) int32: adj[4*v + n] = next vertex from vertex v
    appending base n (v = 2*row + orient), -1 if absent.

    Flat 1-D on purpose: TPU tiled layouts pad a trailing dim of 4 up to
    the 128-lane width (32x memory); 1-D arrays have no such padding.
    Host-orchestrated: one small dispatch per probe/chunk."""
    N = keys.shape[0]
    # strided 1-D scatters only: any (N, small) intermediate would be
    # lane-padded on TPU (e.g. (N,2,4) tiles to 128 lanes = 32x memory)
    flat = jnp.full((8 * N,), -1, jnp.int32)
    for o in (0, 1):
        for n in range(4):
            key2, o2 = _probe(keys, k, o, n)
            j, found = lookup_chunked(keys, key2)
            v = _vertex_of(j, found, o2)
            flat = _strided_set(flat, v, o * 4 + n)
    return flat


@functools.partial(jax.jit, static_argnames=("off",))
def _strided_set(flat, vals, off: int):
    N = vals.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32) * 8 + off
    return flat.at[idx].set(vals)


def adj_at(adj: jnp.ndarray, v: jnp.ndarray, n) -> jnp.ndarray:
    """adj[4*v + n] with traced v (and traced or static n)."""
    if isinstance(n, int):
        return adj[v * 4 + n]
    return adj[v * 4 + n.astype(jnp.int32)]


# Above this many kmers the flat (8N,) adjacency (plus its build
# temporaries) no longer fits beside the planar table on one v5e's HBM;
# unitigs/prune switch to direct probe sweeps (no materialised adj).
ADJ_FREE_N = 1 << 25

_cache: "weakref.WeakValueDictionary" = {}
_cache_store = {}


def cached_adjacency_for(keys: jnp.ndarray, k: int):
    """The cached adjacency for this keys buffer, or None (never builds)."""
    ck = (id(keys), keys.shape[0], k)
    hit = _cache_store.get(ck)
    if hit is not None and hit[0] is keys:
        return hit[1]
    return None


def get_adjacency_for(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """Cached adjacency keyed by the keys buffer identity.  The cache
    stores the keys array itself and verifies `is` — a bare id() key
    can collide when a freed array's address is reused."""
    ck = (id(keys), keys.shape[0], k)
    hit = _cache_store.get(ck)
    if hit is not None and hit[0] is keys:
        return hit[1]
    adj = build_adjacency(keys, k)
    if len(_cache_store) > 8:
        _cache_store.clear()
    _cache_store[ck] = (keys, adj)
    return adj


def get_adjacency(g: gstore.DBGraph) -> jnp.ndarray:
    return get_adjacency_for(g.keys, g.k)
