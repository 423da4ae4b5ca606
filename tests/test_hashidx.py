"""Planar hashed-bucket index vs the binary-search ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.ops import hashidx, kmer as kops, sorted as sops


def _mk_store(n, W, seed=0, kbits=62):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 1 << kbits, size=(n, W), dtype=np.uint64)
    # word 0 top bits zero (canonical invariant, k odd)
    keys[:, 0] &= np.uint64((1 << 62) - 1)
    keys = keys[np.lexsort(tuple(keys[:, w] for w in range(W - 1, -1, -1)))]
    # dedupe
    if W == 1:
        keys = np.unique(keys, axis=0)
    else:
        keys = np.unique(keys, axis=0)
    return keys


@pytest.mark.parametrize("W", [1, 2])
def test_lookup_matches_binary_search(W):
    store = _mk_store(5000, W, seed=1)
    n = len(store)
    rng = np.random.default_rng(2)
    hits = store[rng.integers(0, n, size=300)]
    misses = _mk_store(200, W, seed=3)
    queries = np.concatenate([hits, misses])
    rng.shuffle(queries)
    sk = jnp.asarray(store)
    q = jnp.asarray(queries)

    ref_idx, ref_found = sops.lookup(sk, q)
    idx, found = hashidx.lookup(sk, q)
    np.testing.assert_array_equal(np.asarray(found), np.asarray(ref_found))
    f = np.asarray(ref_found)
    np.testing.assert_array_equal(np.asarray(idx)[f], np.asarray(ref_idx)[f])


@pytest.mark.parametrize("W", [1, 2])
def test_lookup_join_matches_binary_search(W):
    store = _mk_store(5000, W, seed=11)
    n = len(store)
    rng = np.random.default_rng(12)
    hits = store[rng.integers(0, n, size=700)]       # duplicates likely
    misses = _mk_store(300, W, seed=13)
    sent = np.full((10, W), np.uint64(2**64 - 1))
    queries = np.concatenate([hits, misses, sent])
    rng.shuffle(queries)
    # store carries sentinel padding like a real store buffer
    padded = np.concatenate([store, np.full((64, W), np.uint64(2**64 - 1))])
    sk = jnp.asarray(padded)
    q = jnp.asarray(queries)

    ref_idx, ref_found = sops.lookup(sk, q)
    idx, found = sops.lookup_join(sk, q)
    np.testing.assert_array_equal(np.asarray(found), np.asarray(ref_found))
    f = np.asarray(ref_found)
    np.testing.assert_array_equal(np.asarray(idx)[f], np.asarray(ref_idx)[f])
    assert (np.asarray(idx)[~f] == 0).all()


def test_lookup_join_via_env_impl(monkeypatch):
    monkeypatch.setattr(hashidx, "LOOKUP_IMPL", "join")
    store = _mk_store(2000, 1, seed=21)
    rng = np.random.default_rng(22)
    queries = store[rng.integers(0, len(store), size=500)]
    idx, found = hashidx.lookup(jnp.asarray(store), jnp.asarray(queries))
    assert np.asarray(found).all()
    got = np.asarray(store)[np.asarray(idx)]
    np.testing.assert_array_equal(got, queries)


def test_sentinel_queries_not_found():
    store = _mk_store(100, 1)
    q = jnp.concatenate([jnp.asarray(store[:5]),
                         sops.sentinel((3,), 1)])
    idx, found = hashidx.lookup(jnp.asarray(store), q)
    assert np.asarray(found)[:5].all()
    assert not np.asarray(found)[5:].any()


def test_sentinel_padding_in_store_excluded():
    store = _mk_store(64, 1)
    padded = np.concatenate([store, np.full((32, 1), np.uint64(2**64 - 1))])
    idx, found = hashidx.lookup(jnp.asarray(padded), jnp.asarray(store))
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(idx), np.arange(64))


def test_overflow_retry_grows_buckets():
    # force tiny b_bits so the first attempt overflows
    store = _mk_store(3000, 1)
    table, b_bits = hashidx.build_table(store, b_bits=1)
    assert (1 << b_bits) * hashidx.EPR >= 3000
    idx, found = hashidx.lookup_planar(
        jnp.asarray(table), jnp.asarray(store), b_bits, 1)
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(idx), np.arange(len(store)))


def test_hash_np_matches_device():
    keys = _mk_store(512, 2, seed=7)
    h_np = hashidx._hash_np(keys)
    h_dev = np.asarray(kops.kmer_hash(jnp.asarray(keys)))
    np.testing.assert_array_equal(h_np, h_dev)


def test_cache_identity():
    store = jnp.asarray(_mk_store(1000, 1))
    t1, b1 = hashidx.get_index_for(store)
    t2, b2 = hashidx.get_index_for(store)
    assert t1 is t2 and b1 == b2


@pytest.mark.parametrize("W", [1, 2])
def test_lookup_join_mp_variant(W):
    store = _mk_store(4000, W, seed=31)
    n = len(store)
    rng = np.random.default_rng(32)
    hits = store[rng.integers(0, n, size=500)]
    misses = _mk_store(200, W, seed=33)
    sent = np.full((7, W), np.uint64(2**64 - 1))
    queries = np.concatenate([hits, misses, sent])
    rng.shuffle(queries)
    padded = np.concatenate([store, np.full((64, W), np.uint64(2**64 - 1))])
    sk, q = jnp.asarray(padded), jnp.asarray(queries)
    ref_idx, ref_found = sops.lookup(sk, q)
    idx, found = sops.lookup_join(sk, q, variant="mp", interpret=True)
    np.testing.assert_array_equal(np.asarray(found), np.asarray(ref_found))
    f = np.asarray(ref_found)
    np.testing.assert_array_equal(np.asarray(idx)[f], np.asarray(ref_idx)[f])
    assert (np.asarray(idx)[~f] == 0).all()
