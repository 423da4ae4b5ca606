"""Pallas TPU kernel: fused build front-end for k <= 31.

One VMEM pass turns a read batch (B, L) of base codes into canonical
kmer key planes + edge bytes + validity — the fusion of
ops/kmer.rolling_kmers + canonical + graph/build.reads_to_records'
edge derivation (ref build_graph.c:122 shift-append loop; SURVEY.md §7
mapping 2).  The XLA version materialises ~log2(k) (B, L) uint64
intermediates in HBM per doubling pass; here everything lives in VMEM
as explicit (hi, lo) u32 pairs (Mosaic has no 64-bit integers).

Layout notes: kmers occupy the LOW 2k bits of the 64-bit pair with the
first base most significant — identical to ops/kmer.py, so the planes
feed count_batch's 32-bit-plane sort unchanged.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 256          # reads per grid step


def _i32(v):
    return jnp.int32(v)


def _u32(v):
    return jnp.uint32(v)


def _shl64(hi, lo, s: int):
    """(hi, lo) << s for static s."""
    if s == 0:
        return hi, lo
    if s >= 32:
        return lo << _u32(s - 32) if s > 32 else lo, jnp.zeros_like(lo)
    return (hi << _u32(s)) | (lo >> _u32(32 - s)), lo << _u32(s)


def _shr64(hi, lo, s: int):
    if s == 0:
        return hi, lo
    if s >= 32:
        return jnp.zeros_like(hi), hi >> _u32(s - 32) if s > 32 else hi
    return hi >> _u32(s), (lo >> _u32(s)) | (hi << _u32(32 - s))


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


def _make_kernel(k: int, L: int):
    def kernel(bases_ref, khi_ref, klo_ref, eb_ref, valid_ref):
        b = bases_ref[:]                       # (TILE_B, L) int32
        col = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)

        # rolling pack via width doubling on (hi, lo) u32 pairs
        code = (b & 3).astype(jnp.uint32)
        pows = {1: (jnp.zeros_like(code), code)}
        m = 1
        while m * 2 <= k:
            hi, lo = pows[m]
            hi2, lo2 = _shl64(hi, lo, 2 * m)
            hi_r = _from_right_L(hi, m, 0)
            lo_r = _from_right_L(lo, m, 0)
            pows[m * 2] = (hi2 | hi_r, lo2 | lo_r)
            m *= 2
        acc = None
        acc_w = 0
        for bit in range(int(np.log2(k)), -1, -1):
            m = 1 << bit
            if k & m:
                piece = pows[m]
                if acc is None:
                    acc, acc_w = piece, m
                else:
                    hi, lo = _shl64(*acc, 2 * m)
                    acc = (hi | _from_right_L(piece[0], acc_w, 0),
                           lo | _from_right_L(piece[1], acc_w, 0))
                    acc_w += m
        fhi, flo = acc
        if 2 * k > 32:
            fhi = fhi & _u32((1 << (2 * k - 32)) - 1)
        else:
            fhi = jnp.zeros_like(fhi)

        # validity: window fits and contains no invalid base
        inval = (b >= 4).astype(jnp.int32)
        win_bad = inval
        d = 1
        while d < k:
            step = min(d, k - d)
            win_bad = win_bad | _from_right_L(win_bad, step, 1)
            d += step
        valid = (win_bad == 0) & (col + k <= L)

        # reverse complement of the 2k-bit pair
        chi = ~fhi
        clo = ~flo
        rhi = _rev2bits_u32(clo)
        rlo = _rev2bits_u32(chi)
        rhi, rlo = _shr64(rhi, rlo, 64 - 2 * k)

        rc_lt = (rhi < fhi) | ((rhi == fhi) & (rlo < flo))
        khi = jnp.where(rc_lt, rhi, fhi)
        klo = jnp.where(rc_lt, rlo, flo)
        orient = rc_lt.astype(jnp.int32)

        # edge byte (ref db_node.h nuc_orient_to_edge; build.py
        # reads_to_records): following base fw bit + preceding base rv
        # bit, gated on the neighbour window being valid
        nxt = _from_right_L(b, k, 4)
        # prev base: shift left by 1 (b[:, i-1]); col 0 invalid
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

        # sentinel-fill invalid windows so outputs feed the sort as-is
        khi_ref[:] = jnp.where(valid, khi.astype(jnp.int32), _i32(-1))
        klo_ref[:] = jnp.where(valid, klo.astype(jnp.int32), _i32(-1))
        eb_ref[:] = jnp.where(valid, ebyte, _i32(0))
        valid_ref[:] = valid.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def records_fused(bases: jnp.ndarray, k: int, *, interpret: bool = False):
    """bases (B, L) uint8 -> (key_hi, key_lo, ebyte, valid): (B, L) i32
    planes, invalid windows sentinel-filled (-1 keys, 0 edges).
    k <= 31 (W = 1) only."""
    assert k <= 31
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
    outs = pl.pallas_call(
        _make_kernel(k, Lp),
        grid=(NB,),
        in_specs=[pl.BlockSpec((TILE_B, Lp), lambda i: (i, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((TILE_B, Lp), lambda i: (i, zero),
                                     memory_space=pltpu.VMEM)
                        for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((NB * TILE_B, Lp),
                                             jnp.int32)
                        for _ in range(4)),
        interpret=interpret,
    )(b32)
    return tuple(o[:B, :L] for o in outs)
