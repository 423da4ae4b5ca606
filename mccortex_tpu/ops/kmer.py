"""Vectorised binary-kmer codec.

A k-mer is 2-bit packed into W = ceil(2k/64) uint64 words, laid out exactly
like the reference BinaryKmer (ref: src/graph/binary_kmer.h:7 "[0]=xx001122
[1]=33445566"): word 0 is the most significant, the kmer occupies the LOW
2k bits of the W*64-bit big-endian number, first base at the top.  With
A=0<C=1<G=2<T=3 the multiword lexicographic compare equals DNA string
compare, and the canonical key is min(fwd, revcmp)
(ref: src/graph/db_node.h "bkmer_get_key" semantics).

All functions are shape-polymorphic over leading batch dims; the word dim W
is always the trailing axis and is static.  Everything is pure jnp and
jit-safe; the fused build front-end lives in ops/pallas/frontend.py
(u32-pair kernels) and the aggregation in ops/pallas/segreduce.py.
"""

from __future__ import annotations

import numpy as np
import functools

import jax
import jax.numpy as jnp

from ..constants import nwords

U64 = jnp.uint64

_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)
_ONES = np.uint64(0xFFFFFFFFFFFFFFFF)


def _u64(x) -> jnp.ndarray:
    return jnp.asarray(np.uint64(x), dtype=U64)


# ---------------------------------------------------------------------------
# multiword helpers: arrays of shape (..., W), word 0 most significant
# ---------------------------------------------------------------------------

def mw_shift_left(x: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Shift the multiword integer left by a static number of bits."""
    W = x.shape[-1]
    word_sh, bit_sh = nbits // 64, nbits % 64
    if word_sh >= W:
        return jnp.zeros_like(x)
    if word_sh:
        x = jnp.concatenate(
            [x[..., word_sh:], jnp.zeros(x.shape[:-1] + (word_sh,), dtype=U64)],
            axis=-1)
    if bit_sh:
        hi = x << _u64(bit_sh)
        lo_in = jnp.concatenate(
            [x[..., 1:], jnp.zeros(x.shape[:-1] + (1,), dtype=U64)], axis=-1)
        x = hi | (lo_in >> _u64(64 - bit_sh))
    return x


def mw_shift_right(x: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Shift the multiword integer right by a static number of bits."""
    W = x.shape[-1]
    word_sh, bit_sh = nbits // 64, nbits % 64
    if word_sh >= W:
        return jnp.zeros_like(x)
    if word_sh:
        x = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (word_sh,), dtype=U64), x[..., :-word_sh]],
            axis=-1)
    if bit_sh:
        lo = x >> _u64(bit_sh)
        hi_in = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), dtype=U64), x[..., :-1]], axis=-1)
        x = lo | (hi_in << _u64(64 - bit_sh))
    return x


def mw_lt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a < b over the trailing word axis (word 0 first)."""
    W = a.shape[-1]
    lt = a[..., W - 1] < b[..., W - 1]
    for w in range(W - 2, -1, -1):
        lt = (a[..., w] < b[..., w]) | ((a[..., w] == b[..., w]) & lt)
    return lt


def mw_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def mw_min(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mw_lt(a, b)[..., None], a, b)


# ---------------------------------------------------------------------------
# pack / unpack
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames='k')
def pack_kmers(bases: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pack base codes (..., k) uint8 -> (..., W) uint64 kmers.

    bases[..., 0] is the first (most significant) base.  O(log k) vector
    ops: zero-pad to W*32 bases, reshape to (..., W, 32), then tree-combine
    pairs (32 bases per word, big-endian 2-bit groups).
    """
    W = nwords(k)
    batch = bases.shape[:-1]
    pad = W * 32 - k
    b64 = (bases & np.uint8(3)).astype(U64)
    if pad:
        b64 = jnp.concatenate(
            [jnp.zeros(batch + (pad,), dtype=U64), b64], axis=-1)
    v = b64.reshape(batch + (W, 32))
    width = 1  # bases currently held per element
    while width < 32:
        v = (v[..., 0::2] << _u64(2 * width)) | v[..., 1::2]
        width *= 2
    return v[..., 0]


@functools.partial(jax.jit, static_argnames='k')
def unpack_kmers(kmers: jnp.ndarray, k: int) -> jnp.ndarray:
    """Unpack (..., W) uint64 kmers -> (..., k) uint8 base codes."""
    W = kmers.shape[-1]
    offs = 2 * (k - 1 - np.arange(k))
    widx = W - 1 - offs // 64
    shifts = jnp.asarray((offs % 64).astype(np.uint64), dtype=U64)
    words = kmers[..., widx]  # (..., k) gather
    return ((words >> shifts) & _u64(3)).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# reverse complement / canonical key
# ---------------------------------------------------------------------------

def _rev2bits_word(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the order of 2-bit groups within each uint64."""
    x = ((x & _M2) << _u64(2)) | ((x >> _u64(2)) & _M2)
    x = ((x & _M4) << _u64(4)) | ((x >> _u64(4)) & _M4)
    x = ((x & _M8) << _u64(8)) | ((x >> _u64(8)) & _M8)
    x = ((x & _M16) << _u64(16)) | ((x >> _u64(16)) & _M16)
    x = (x << _u64(32)) | (x >> _u64(32))
    return x


@functools.partial(jax.jit, static_argnames='k')
def revcmp(kmers: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse complement of packed kmers (ref: binary_kmer.c revcmp).

    Complement is bitwise NOT per 2-bit base (3-n == ~n & 3); then base
    order is reversed across the whole W*64-bit number and the result is
    shifted back down into the low 2k bits.
    """
    W = kmers.shape[-1]
    y = ~kmers
    y = _rev2bits_word(y)
    y = jnp.flip(y, axis=-1)
    return mw_shift_right(y, 64 * W - 2 * k)


@functools.partial(jax.jit, static_argnames='k')
def canonical(kmers: jnp.ndarray, k: int):
    """Return (key, orient): key = min(kmer, revcmp(kmer)); orient==1 iff
    the reverse complement is the key (i.e. the input was the non-key
    strand).  Matches ref bkmer key semantics; k odd => never equal."""
    rc = revcmp(kmers, k)
    rc_is_key = mw_lt(rc, kmers)
    key = jnp.where(rc_is_key[..., None], rc, kmers)
    return key, rc_is_key.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames='k')
def oriented(keys: jnp.ndarray, orient: jnp.ndarray, k: int) -> jnp.ndarray:
    """Kmer as read in the given orientation: key if FORWARD else revcmp."""
    rc = revcmp(keys, k)
    return jnp.where(orient[..., None].astype(bool), rc, keys)


@functools.partial(jax.jit, static_argnames='k')
def first_base(kmers: jnp.ndarray, k: int) -> jnp.ndarray:
    """Most significant base (ref: binary_kmer.h:46 first_nuc)."""
    off = 2 * (k - 1)
    W = kmers.shape[-1]
    w = W - 1 - off // 64
    return (kmers[..., w] >> _u64(off % 64)).astype(jnp.uint8) & np.uint8(3)


@jax.jit
def last_base(kmers: jnp.ndarray) -> jnp.ndarray:
    return kmers[..., -1].astype(jnp.uint8) & np.uint8(3)


@functools.partial(jax.jit, static_argnames='k')
def shift_append(kmers: jnp.ndarray, base: jnp.ndarray, k: int) -> jnp.ndarray:
    """kmer<<2 | base, masked to 2k bits (ref: binary_kmer left_shift_add)."""
    W = kmers.shape[-1]
    y = mw_shift_left(kmers, 2)
    y = y.at[..., W - 1].set(y[..., W - 1] | base.astype(U64))
    return _mask_topbits(y, k)


@functools.partial(jax.jit, static_argnames='k')
def shift_prepend(kmers: jnp.ndarray, base: jnp.ndarray, k: int) -> jnp.ndarray:
    """base<<(2k-2) | kmer>>2 (ref: binary_kmer right_shift_add)."""
    y = mw_shift_right(kmers, 2)
    off = 2 * (k - 1)
    W = kmers.shape[-1]
    w = W - 1 - off // 64
    y = y.at[..., w].set(y[..., w] | (base.astype(U64) << _u64(off % 64)))
    return y


def _mask_topbits(kmers: jnp.ndarray, k: int) -> jnp.ndarray:
    """Zero any bits above 2k."""
    W = kmers.shape[-1]
    top_bits = 2 * k - 64 * (W - 1)
    mask = np.uint64((1 << top_bits) - 1) if top_bits < 64 else _ONES
    return kmers.at[..., 0].set(kmers[..., 0] & mask)


# ---------------------------------------------------------------------------
# hashing (shard routing + bloom filters); splitmix64 finaliser
# ---------------------------------------------------------------------------

_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: jnp.ndarray) -> jnp.ndarray:
    x = x + _GOLD
    x = (x ^ (x >> _u64(30))) * _SM_C1
    x = (x ^ (x >> _u64(27))) * _SM_C2
    return x ^ (x >> _u64(31))


@functools.partial(jax.jit, static_argnames='seed')
def kmer_hash(keys: jnp.ndarray, seed: int = 0) -> jnp.ndarray:
    """64-bit hash of packed kmers (..., W) -> (...,) uint64.

    Role of ref binary_kmer_hash (binary_kmer.h:28-36); we use a splitmix64
    fold, which is fully vectorisable on TPU (the exact function need not
    match the reference — it never reaches disk)."""
    W = keys.shape[-1]
    h = splitmix64(keys[..., 0] ^ _u64(np.uint64(seed) * _GOLD))
    for w in range(1, W):
        h = splitmix64(h ^ keys[..., w])
    return h


# ---------------------------------------------------------------------------
# rolling extraction: all kmers of a read batch in O(log k) vector ops
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames='k')
def rolling_kmers(bases: jnp.ndarray, k: int):
    """Extract every kmer of every read.

    bases: (..., L) uint8 base codes, 4 = invalid/pad.
    Returns (kmers, valid): kmers (..., L, W) where kmers[..., i, :] is the
    packed kmer starting at position i (garbage if invalid); valid marks
    windows that lie fully inside the read with no invalid base.

    Uses width-doubling composition (kmer of width 2m at i = width-m at i
    joined with width-m at i+m), so the whole batch is O(log k) shifted
    elementwise passes instead of a length-k gather per position.  This is
    the TPU replacement for the reference's sequential shift-append loop
    (ref: build_graph.c:122 build_graph_from_str_mt).
    """
    L = bases.shape[-1]
    W = nwords(k)
    batch = bases.shape[:-1]
    if L < k:   # every window falls off the end: no valid kmers
        return (jnp.zeros(batch + (L, W), dtype=U64),
                jnp.zeros(batch + (L,), dtype=bool))

    def shift_pos(arr, m):
        # arr[..., i] -> arr[..., i+m] with zero pad at the end
        pad = jnp.zeros(batch + (m,) + arr.shape[len(batch) + 1:], dtype=arr.dtype)
        return jnp.concatenate([arr[..., m:] if arr.ndim == len(batch) + 1
                                else arr[..., m:, :], pad], axis=len(batch))

    # powers-of-two widths
    pow_vals = {1: jnp.concatenate(
        [jnp.zeros(batch + (L, W - 1), dtype=U64),
         (bases & np.uint8(3)).astype(U64)[..., None]], axis=-1)}
    m = 1
    while m * 2 <= k:
        v = pow_vals[m]
        v2 = mw_shift_left(v, 2 * m)
        v2 = v2 | shift_pos(v, m)
        pow_vals[m * 2] = v2
        m *= 2

    # compose k from its binary expansion, MSB width first
    acc = None
    acc_w = 0
    for bit in range(int(np.log2(k)), -1, -1):
        m = 1 << bit
        if k & m:
            piece = pow_vals[m]
            if acc is None:
                acc, acc_w = piece, m
            else:
                acc = mw_shift_left(acc, 2 * m) | shift_pos(piece, acc_w)
                acc_w += m
    kmers = _mask_topbits(acc, k)

    # validity: no invalid base inside window, window fits in L
    invalid = (bases >= 4).astype(jnp.int32)
    csum = jnp.cumsum(invalid, axis=-1)
    csum = jnp.concatenate([jnp.zeros(batch + (1,), jnp.int32), csum], axis=-1)
    idx = jnp.arange(L)
    win_end = jnp.minimum(idx + k, L)
    none_invalid = (jnp.take(csum, win_end, axis=-1) -
                    jnp.take(csum, idx, axis=-1)) == 0
    fits = idx + k <= L
    valid = none_invalid & fits
    return kmers, valid


def _msb(x: int) -> int:
    return 1 << (x.bit_length() - 1)
