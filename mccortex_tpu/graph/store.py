"""The coloured de Bruijn graph store.

Role of the reference dBGraph (ref: src/graph/db_graph.h:23-56): a kmer
set with per-colour coverage and per-colour edge bytes.  TPU-native
design: a sorted (cap, W) uint64 key array with parallel (cap, C) value
arrays, sentinel-padded; batched binary-search lookups; sort-merge
inserts (SURVEY.md §7 mapping 1).  The whole store is a pytree and moves
through jit/pjit as regular arrays; `k` and capacity are static.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..constants import nwords, check_k
from ..ops import sorted as sops


@struct.dataclass
class DBGraph:
    """Sorted coloured kmer store (pytree)."""
    keys: jnp.ndarray    # (cap, W) uint64, ascending, sentinel padded
    covg: jnp.ndarray    # (cap, C) uint32
    edges: jnp.ndarray   # (cap, C) uint8
    n: jnp.ndarray       # () int64 — number of live kmers
    k: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def ncols(self) -> int:
        return self.covg.shape[1]

    @property
    def W(self) -> int:
        return self.keys.shape[1]


def empty(k: int, capacity: int, ncols: int) -> DBGraph:
    check_k(k)
    W = nwords(k)
    return DBGraph(
        keys=sops.sentinel((capacity,), W),
        covg=jnp.zeros((capacity, ncols), jnp.uint32),
        edges=jnp.zeros((capacity, ncols), jnp.uint8),
        n=jnp.zeros((), jnp.int64),
        k=k)


def from_records(k: int, keys: jnp.ndarray, covg: jnp.ndarray,
                 edges: jnp.ndarray, capacity: int | None = None) -> DBGraph:
    """Build a store from unaggregated (key, covg, edges) records.

    keys (N, W); covg (N, C); edges (N, C).  Records with sentinel keys are
    ignored.  capacity defaults to N.
    """
    N = keys.shape[0]
    capacity = capacity or N
    okeys, ocovg, oedges, n = _reduce_records_best(keys, covg, edges,
                                                   capacity)
    return DBGraph(keys=okeys, covg=ocovg, edges=oedges,
                   n=n.astype(jnp.int64), k=k)


def _reduce_records_best(keys, covg, edges, capacity: int):
    """sort+aggregate records: the Pallas fused path on TPU (the XLA
    scatter reduce is element-latency-bound; see ops/pallas/segreduce),
    the XLA path on CPU or under an outer jit."""
    import jax.core as _core
    traced = any(isinstance(x, _core.Tracer) for x in (keys, covg, edges))
    if traced or jax.default_backend() == "cpu":
        skeys, scovg, sedges = sops.sort_by_key(keys, covg, edges)
        return sops.unique_reduce(skeys, scovg, sedges, capacity)
    from . import build as _gb
    try:
        ok, oc, oe, n = _gb.reduce_records_fused(
            keys, covg.astype(jnp.uint32), edges)
    except jax.errors.JaxRuntimeError as e:
        # wide-C plane counts can kill the remote compiler (r5 joint
        # build); the XLA path compiles everywhere, self-heal to it
        if not _gb._merge_should_fallback(e):
            raise
        import sys as _sys
        print("[mctx] fused reduce failed (%s); XLA fallback"
              % str(e)[:80], file=_sys.stderr)
        skeys, scovg, sedges = sops.sort_by_key(keys, covg, edges)
        return sops.unique_reduce(skeys, scovg, sedges, capacity)
    N = keys.shape[0]
    if capacity == N:
        return ok, oc.astype(covg.dtype), oe, n
    if capacity > N:
        pad = capacity - N
        W, C = keys.shape[1], covg.shape[1]
        ok = jnp.concatenate([ok, sops.sentinel((pad,), W)])
        oc = jnp.concatenate([oc, jnp.zeros((pad, C), oc.dtype)])
        oe = jnp.concatenate([oe, jnp.zeros((pad, C), oe.dtype)])
        return ok, oc.astype(covg.dtype), oe, n
    return (ok[:capacity], oc[:capacity].astype(covg.dtype),
            oe[:capacity], n)


def lookup(g: DBGraph, query_keys: jnp.ndarray):
    """Batched lookup: (idx, found) per query key (..., W).

    The replacement for hash_table_find (ref: hash_table.c:84); one of
    the two headline inner loops (BASELINE.json metric).  NOT jitted:
    host-level calls route through the planar hashed-bucket index
    (ops/hashidx.py, one row-gather per probe, ~25x the binary search),
    whose table build/cache is host-side.  When called under an outer
    jit (args are tracers) it falls back to the binary search — inside
    jit use sops.lookup or the adjacency cache directly.
    """
    import jax.core as _core
    if isinstance(query_keys, _core.Tracer) or isinstance(
            g.keys, _core.Tracer):
        return sops.lookup(g.keys, query_keys)
    from ..ops import hashidx
    return hashidx.lookup(g.keys, query_keys)


def merge_records(g: DBGraph, keys: jnp.ndarray, covg: jnp.ndarray,
                  edges: jnp.ndarray, capacity: int | None = None) -> DBGraph:
    """Merge unaggregated records into the store (find-or-insert epoch,
    replacing ref hash_table_find_or_insert_mt).  Returns a new store of
    `capacity` (default: same as g).  NOT jitted so host-level calls
    take the Pallas fused reduce on TPU (see _reduce_records_best)."""
    cap = capacity or g.capacity
    allk = jnp.concatenate([g.keys, keys], axis=0)
    allc = jnp.concatenate([g.covg, covg.astype(jnp.uint32)], axis=0)
    alle = jnp.concatenate([g.edges, edges], axis=0)
    okeys, ocovg, oedges, n = _reduce_records_best(allk, allc, alle, cap)
    return DBGraph(keys=okeys, covg=ocovg, edges=oedges,
                   n=n.astype(jnp.int64), k=g.k)


@jax.jit
def union_edges(g: DBGraph) -> jnp.ndarray:
    """Per-kmer edge byte OR-ed across colours (population edges)."""
    from . import edges as E
    return E._union_fallback(g.edges)


_uedges_cache: dict = {}


def cached_union_edges(g: DBGraph) -> jnp.ndarray:
    """union_edges memoised on the edges buffer identity, so downstream
    identity-keyed caches (unitigs.cached_unitig_view) can hit."""
    ck = id(g.edges)
    hit = _uedges_cache.get(ck)
    if hit is not None and hit[0] is g.edges:
        return hit[1]
    ue = union_edges(g)
    if len(_uedges_cache) > 4:
        _uedges_cache.clear()
    _uedges_cache[ck] = (g.edges, ue)
    return ue


def to_host(g: DBGraph):
    """Compact live records to host numpy (for file IO)."""
    n = int(g.n)
    return (np.asarray(g.keys[:n]), np.asarray(g.covg[:n]),
            np.asarray(g.edges[:n]))


def compacted(g: DBGraph, align: int = 1 << 16) -> DBGraph:
    """Slice the store down to its live prefix (records are always
    compacted at the front, sentinel-padded after).  Keeps capacity a
    multiple of `align` to bound recompilation across similar sizes."""
    n = int(g.n)
    cap = max(align, (n + align - 1) // align * align)
    if cap >= g.capacity:
        return g
    return DBGraph(keys=g.keys[:cap], covg=g.covg[:cap],
                   edges=g.edges[:cap], n=g.n, k=g.k)
