"""Pallas TPU kernel: fused build front-end for k <= 63 (W <= 2).

One VMEM pass turns a read batch (B, L) of base codes into canonical
kmer key planes + edge bytes + validity — the fusion of
ops/kmer.rolling_kmers + canonical + graph/build.reads_to_records'
edge derivation (ref build_graph.c:122 shift-append loop; SURVEY.md §7
mapping 2).  The XLA version materialises ~log2(k) (B, L) uint64
intermediates in HBM per doubling pass; here everything lives in VMEM
as explicit u32 limbs (Mosaic has no 64-bit integers): 2 limbs for
k <= 31, 4 limbs for k <= 63 (VERDICT r2 item 8 — large k was
second-class on the TPU front-end).

Layout notes: kmers occupy the LOW 2k bits of the W*64-bit value with
the first base most significant, word 0 most significant — identical to
ops/kmer.py, so the planes feed count_batch's 32-bit-plane sort
unchanged.  Limbs inside the kernel are least-significant-first;
returned key planes are most-significant-first.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# reads per grid step: fewer, larger tiles amortise per-step grid/DMA
# overhead; lab7 on v5e (chained, RPC-free): 256 -> 4.62 ms, 512 ->
# 4.33 ms, 1024 -> 4.36 ms, 2048 -> scoped-VMEM OOM at L=256.
# MCTX_FE_TILE overrides for A/B (perf_lab7)
TILE_B = int(__import__("os").environ.get("MCTX_FE_TILE", 512))


def _i32(v):
    return jnp.int32(v)


def _u32(v):
    return jnp.uint32(v)


def _shl(limbs, s: int):
    """limbs (LSB-first u32 list) << s for static s >= 0."""
    NL = len(limbs)
    if s == 0:
        return list(limbs)
    words, bits = s // 32, s % 32
    zero = jnp.zeros_like(limbs[0])
    out = []
    for i in range(NL):
        src = i - words
        v = limbs[src] if 0 <= src < NL else zero
        if bits:
            lo = limbs[src - 1] if 0 <= src - 1 < NL else zero
            v = (v << _u32(bits)) | (lo >> _u32(32 - bits))
        out.append(v)
    return out


def _shr(limbs, s: int):
    """limbs (LSB-first u32 list) >> s for static s >= 0."""
    NL = len(limbs)
    if s == 0:
        return list(limbs)
    words, bits = s // 32, s % 32
    zero = jnp.zeros_like(limbs[0])
    out = []
    for i in range(NL):
        src = i + words
        v = limbs[src] if src < NL else zero
        if bits:
            hi = limbs[src + 1] if src + 1 < NL else zero
            v = (v >> _u32(bits)) | (hi << _u32(32 - bits))
        out.append(v)
    return out


def _or(a, b):
    return [x | y for x, y in zip(a, b)]


def _from_right_L(x, d: int, fill):
    """y[:, i] = x[:, i + d] along the L axis, `fill` past the end."""
    L = x.shape[1]
    y = pltpu.roll(x, _i32(L - d), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= L - d, jnp.asarray(fill, x.dtype), y)


_M2 = 0x33333333
_M4 = 0x0F0F0F0F
_M8 = 0x00FF00FF


def _rev2bits_u32(x):
    """Reverse 2-bit groups within each u32."""
    x = ((x & _u32(_M2)) << _u32(2)) | ((x >> _u32(2)) & _u32(_M2))
    x = ((x & _u32(_M4)) << _u32(4)) | ((x >> _u32(4)) & _u32(_M4))
    x = ((x & _u32(_M8)) << _u32(8)) | ((x >> _u32(8)) & _u32(_M8))
    x = (x << _u32(16)) | (x >> _u32(16))
    return x


def _lt(a, b):
    """Lexicographic unsigned a < b over LSB-first limb lists."""
    lt = jnp.zeros_like(a[0], jnp.bool_)
    eq = jnp.ones_like(a[0], jnp.bool_)
    for x, y in zip(reversed(a), reversed(b)):   # MSB first
        lt = lt | (eq & (x < y))
        eq = eq & (x == y)
    return lt


def _make_kernel(k: int, L: int, nl: int, with_valid: bool = True):
    """nl = number of u32 limbs (2 for W=1, 4 for W=2)."""
    def kernel(*refs):
        bases_ref = refs[0]
        key_refs = refs[1:1 + nl]            # MSB-first outputs
        eb_ref = refs[1 + nl]
        valid_ref = refs[2 + nl] if with_valid else None
        b = bases_ref[:]                     # (TILE_B, L) int32
        col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
        zero = jnp.zeros_like(b, jnp.uint32)

        # rolling pack via width doubling to the OVERSHOT window
        # P = next-pow2(k), then one shift down by 2*(P-k) drops the
        # trailing P-k bases.  Raw rolls (no boundary fill): window i's
        # bit-pair for base offset t is code[(i+t) mod L], so wraparound
        # garbage sits exactly at offsets t >= k for every VALID window
        # (valid needs i+k <= L), i.e. only in the bits the final shift
        # discards; invalid windows are sentinel-filled below anyway.
        # This replaces the popcount(k)-piece combine of the base-2
        # decomposition (4 combine steps at k=31, each as costly as a
        # doubling level) with ONE extra doubling level — and drops the
        # per-level iota+select of the boundary fill.  2*P always fits
        # the limbs: k <= 31 -> P = 32 = 2 limbs; k <= 63 -> P = 64 = 4.
        P = 1 << (k - 1).bit_length()
        code = (b & 3).astype(jnp.uint32)
        limbs = [code] + [zero] * (nl - 1)
        m = 1
        while m < P:
            shifted = _shl(limbs, 2 * m)
            rolled = [pltpu.roll(x, _i32(L - m), 1) for x in limbs]
            limbs = _or(shifted, rolled)
            m *= 2
        # bits above 2*P are zero by induction (each doubling fills
        # exactly 4*m low bits), so no masking is needed after the shift
        fwd = _shr(limbs, 2 * (P - k))

        # validity: window fits and contains no invalid base
        inval = (b >= 4).astype(jnp.int32)
        win_bad = inval
        d = 1
        while d < k:
            step = min(d, k - d)
            win_bad = win_bad | _from_right_L(win_bad, step, 1)
            d += step
        valid = (win_bad == 0) & (col + k <= L)

        # reverse complement: complement, reverse 2-bit groups across
        # the whole 32*nl-bit value, shift down to the low 2k bits
        comp = [~x for x in fwd]
        rev = [_rev2bits_u32(x) for x in reversed(comp)]
        rev = _shr(rev, 32 * nl - 2 * k)

        rc_lt = _lt(rev, fwd)
        key = [jnp.where(rc_lt, r, f) for r, f in zip(rev, fwd)]
        orient = rc_lt.astype(jnp.int32)

        # edge byte (ref db_node.h nuc_orient_to_edge; build.py
        # reads_to_records): following base fw bit + preceding base rv
        # bit, gated on the neighbour window being valid
        nxt = _from_right_L(b, k, 4)
        prv = pltpu.roll(b, _i32(1), 1)
        prv = jnp.where(col == 0, _i32(4), prv)
        valid_i = valid.astype(jnp.int32)
        vnext = _from_right_L(valid_i, 1, 0) & valid_i
        vprev = pltpu.roll(valid_i, _i32(1), 1)
        vprev = jnp.where(col == 0, _i32(0), vprev) & valid_i
        fw_bit = jnp.int32(1) << ((nxt & 3) + (orient << 2))
        rv_bit = jnp.int32(1) << (((3 - (prv & 3)) & 3)
                                  + ((1 - orient) << 2))
        ebyte = jnp.where(vnext == 1, fw_bit, _i32(0)) | \
            jnp.where(vprev == 1, rv_bit, _i32(0))

        # sentinel-fill invalid windows so outputs feed the sort as-is;
        # key planes MSB-first (limb list is LSB-first)
        for p in range(nl):
            key_refs[p][:] = jnp.where(
                valid, key[nl - 1 - p].astype(jnp.int32), _i32(-1))
        eb_ref[:] = jnp.where(valid, ebyte, _i32(0))
        if with_valid:
            valid_ref[:] = valid.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret",
                                             "with_valid"))
def records_fused(bases: jnp.ndarray, k: int, *, interpret: bool = False,
                  with_valid: bool = True):
    """bases (B, L) uint8 -> (*key_planes, ebyte[, valid]): (B, L) i32
    planes, invalid windows sentinel-filled (-1 keys, 0 edges).

    key_planes are most-significant-first u32 halves of the canonical
    key words: 2 planes for k <= 31, 4 planes for 31 < k <= 63.
    with_valid=False skips the validity plane write — the count path
    derives everything from the sentinel fill, so the extra (B, L)
    HBM write is pure waste there."""
    assert k <= 63
    nl = 2 if k <= 31 else 4
    B, L = bases.shape
    pad = (-B) % TILE_B
    b32 = bases.astype(jnp.int32)
    if pad:
        b32 = jnp.concatenate(
            [b32, jnp.full((pad, L), 4, jnp.int32)])
    # pad L to a lane multiple: rolls on a non-128-multiple axis fall
    # off Mosaic's vector path (catastrophically slow); padded columns
    # are invalid bases, so their windows are invalid and sliced away
    Lp = -(-L // 128) * 128
    if Lp != L:
        b32 = jnp.concatenate(
            [b32, jnp.full((b32.shape[0], Lp - L), 4, jnp.int32)],
            axis=1)
    NB = b32.shape[0] // TILE_B
    zero = np.int32(0)
    n_out = nl + (2 if with_valid else 1)
    outs = pl.pallas_call(
        _make_kernel(k, Lp, nl, with_valid),
        grid=(NB,),
        in_specs=[pl.BlockSpec((TILE_B, Lp), lambda i: (i, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((TILE_B, Lp), lambda i: (i, zero),
                                     memory_space=pltpu.VMEM)
                        for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((NB * TILE_B, Lp),
                                             jnp.int32)
                        for _ in range(n_out)),
        interpret=interpret,
    )(b32)
    return tuple(o[:B, :L] for o in outs)
