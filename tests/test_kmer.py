"""Kmer codec tests vs a pure-Python string-level reference.

Parallels ref src/tests/bkmer_tests.c (pack, revcmp, canonical key,
shift-append) but validated against independent string ops.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.constants import nwords
from mccortex_tpu.ops import kmer as K

from util import (revcomp_str, key_str, kmer_to_words, words_to_kmer,
                  random_dna, seq_to_codes, kmers_of)

KS = [5, 11, 21, 31, 33, 63, 75, 127]


@pytest.mark.parametrize("k", KS)
def test_pack_unpack_roundtrip(k):
    W = nwords(k)
    seqs = [random_dna(k, seed=100 + k + i) for i in range(16)]
    codes = jnp.array(np.stack([seq_to_codes(s) for s in seqs]))
    packed = K.pack_kmers(codes, k)
    assert packed.shape == (16, W)
    # vs python packing
    expect = np.array([kmer_to_words(s, W) for s in seqs], dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(packed), expect)
    # roundtrip
    unp = K.unpack_kmers(packed, k)
    np.testing.assert_array_equal(np.asarray(unp), np.asarray(codes))


@pytest.mark.parametrize("k", KS)
def test_revcmp(k):
    seqs = [random_dna(k, seed=200 + k + i) for i in range(16)]
    codes = jnp.array(np.stack([seq_to_codes(s) for s in seqs]))
    packed = K.pack_kmers(codes, k)
    rc = K.revcmp(packed, k)
    W = nwords(k)
    expect = np.array([kmer_to_words(revcomp_str(s), W) for s in seqs],
                      dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(rc), expect)
    # involution
    rc2 = K.revcmp(rc, k)
    np.testing.assert_array_equal(np.asarray(rc2), np.asarray(packed))


@pytest.mark.parametrize("k", KS)
def test_canonical(k):
    seqs = [random_dna(k, seed=300 + k + i) for i in range(32)]
    codes = jnp.array(np.stack([seq_to_codes(s) for s in seqs]))
    packed = K.pack_kmers(codes, k)
    key, orient = K.canonical(packed, k)
    key_np, orient_np = np.asarray(key), np.asarray(orient)
    for i, s in enumerate(seqs):
        ks = key_str(s)
        assert words_to_kmer(key_np[i], k) == ks
        assert int(orient_np[i]) == (0 if ks == s else 1)
    # oriented() restores the original read strand
    restored = K.oriented(key, orient, k)
    np.testing.assert_array_equal(np.asarray(restored), np.asarray(packed))


@pytest.mark.parametrize("k", [5, 21, 31, 63, 127])
def test_shift_append_prepend(k):
    s = random_dna(k + 10, seed=400 + k)
    codes = jnp.array(seq_to_codes(s)[None, :])
    cur = K.pack_kmers(codes[:, :k], k)
    for i in range(k, k + 10):
        b = jnp.array([seq_to_codes(s)[i]])
        cur = K.shift_append(cur, b, k)
        expect = kmer_to_words(s[i - k + 1:i + 1], nwords(k))
        np.testing.assert_array_equal(np.asarray(cur)[0], expect)
    # prepend walks back
    for i in range(k + 9, k - 1, -1):
        b = jnp.array([seq_to_codes(s)[i - k]])
        cur = K.shift_prepend(cur, b, k)
        expect = kmer_to_words(s[i - k:i], nwords(k))
        np.testing.assert_array_equal(np.asarray(cur)[0], expect)


@pytest.mark.parametrize("k", KS)
def test_rolling_kmers(k):
    L = k + 37
    seqs = [random_dna(L, seed=500 + k + i) for i in range(4)]
    # inject an N and some padding into one read
    seqs[1] = seqs[1][:k + 3] + "N" + seqs[1][k + 4:]
    codes = np.stack([seq_to_codes(s, pad_to=L + 5) for s in seqs])
    kmers, valid = K.rolling_kmers(jnp.array(codes), k)
    kmers_np, valid_np = np.asarray(kmers), np.asarray(valid)
    W = nwords(k)
    assert kmers.shape == (4, L + 5, W)
    for r, s in enumerate(seqs):
        for i in range(L + 5):
            window = s[i:i + k] if i + k <= len(s) else None
            ok = window is not None and "N" not in window
            assert bool(valid_np[r, i]) == ok, (r, i)
            if ok:
                assert words_to_kmer(kmers_np[r, i], k) == window


def test_first_last_base():
    k = 21
    s = random_dna(k, seed=7)
    packed = K.pack_kmers(jnp.array(seq_to_codes(s)[None]), k)
    assert int(K.first_base(packed, k)[0]) == seq_to_codes(s)[0]
    assert int(K.last_base(packed)[0]) == seq_to_codes(s)[-1]


def test_hash_distributes():
    k = 31
    seqs = [random_dna(k, seed=600 + i) for i in range(4096)]
    codes = jnp.array(np.stack([seq_to_codes(s) for s in seqs]))
    keys, _ = K.canonical(K.pack_kmers(codes, k), k)
    h = K.kmer_hash(keys)
    shards = np.asarray(h % jnp.uint64(8)).astype(np.int64)
    counts = np.bincount(shards, minlength=8)
    assert counts.min() > 4096 / 8 * 0.7
    # different seeds give different hashes
    h2 = K.kmer_hash(keys, seed=1)
    assert (np.asarray(h) != np.asarray(h2)).mean() > 0.99
