"""Pallas TPU merge-path: merge two sorted plane tuples in ONE data pass.

The bitonic `merge_planes` clean stage costs log2(M) full-array passes;
merge-path makes every output block independent: block t's content is
A[a0(t):a0(t+1)) ∪ B[b0(t):b0(t+1)) where a0 are the merge-path splits
(vectorised binary search over block diagonals, XLA level).  The kernel
then DMAs exactly those windows into VMEM (dynamic row offset + in-VMEM
dynamic lane rotation for the element-exact base), masks the elements
beyond each block's own consumption counts to +inf (exactness under
cross-array ties — without the mask a tied record could be emitted by
two adjacent blocks), runs one in-VMEM bitonic clean network over
(A_win asc | B_win desc), and writes the lower half.

HBM traffic ≈ read A+B once + write once — independent of M's log.
Unlike bitonic merge_planes, lengths need not match or be powers of two
(each padded to a block multiple only), so the LSM's asymmetric
final-drain merges ride it too.

Reference role: the merge half of hash-table growth / graph joins
(ref src/graph/hash_table.c rehash loop; graphs_load_files_multi).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitonic import (LANES, _cmpx, _to_sortable, _from_sortable, _i32)

_IMAX = 0x7FFFFFFF


def _r_blk_for(np_: int) -> int:
    """Rows per output block, sized to keep windows+work+double-buffered
    outputs inside ~12MB of the ~16MB VMEM."""
    if np_ <= 3:
        return 1024
    if np_ <= 6:
        return 512
    return 256


def _splits(ka, kb, nk: int, NB: int, blk: int, Ma: int, Mb: int):
    """a_starts (NB+1,) i32: merge-path split of each block diagonal.

    ka/kb: SORTABLE i32 key plane lists (sign-flipped, so plain i32 <
    is the record order).  P(mid) = A[mid] <= B[d-mid-1] is monotone
    decreasing in mid; the split is the smallest mid where it fails."""
    d = jnp.arange(NB + 1, dtype=jnp.int32) * jnp.int32(blk)
    lo = jnp.maximum(jnp.int32(0), d - jnp.int32(Mb))
    hi = jnp.minimum(d, jnp.int32(Ma))
    steps = int(np.ceil(np.log2(max(Ma, Mb, 2)))) + 2
    for _ in range(steps):
        go = lo < hi
        mid = (lo + hi) >> 1
        j = d - mid - 1
        mc = jnp.clip(mid, 0, max(Ma - 1, 0))
        jc = jnp.clip(j, 0, max(Mb - 1, 0))
        lt = jnp.zeros_like(go)
        eq = jnp.ones_like(go)
        for p in range(nk):
            av, bv = ka[p][mc], kb[p][jc]
            lt = lt | (eq & (av < bv))
            eq = eq & (av == bv)
        cond = lt | eq          # A[mid] <= B[d-mid-1]
        lo = jnp.where(go & cond, mid + 1, lo)
        hi = jnp.where(go & ~cond, mid, hi)
    return lo


def _make_kernel(np_: int, nk: int, r_blk: int):
    blk = r_blk * LANES

    def kernel(*refs):
        # per-block scalars: A window element offset, flipped-B window
        # element offset, and the A-consumption count (na)
        a0g, fbg, nag = refs[0], refs[1], refs[2]   # SMEM (NB,)
        a_refs = refs[3:3 + np_]             # ANY (rows_a, LANES)
        b_refs = refs[3 + np_:3 + 2 * np_]   # ANY flipped B (rows_b, LANES)
        out_refs = refs[3 + 2 * np_:3 + 3 * np_]
        awin = refs[3 + 3 * np_]             # VMEM (np_, r_blk+8, LANES)
        bwin = refs[4 + 3 * np_]
        sem = refs[5 + 3 * np_]

        g = pl.program_id(0)
        a0 = a0g[g]
        na = nag[g]
        fb0 = fbg[g]

        W_ROWS = r_blk + 8        # window rows (8-multiple: sublane tiling)
        for p in range(np_):
            pltpu.make_async_copy(
                a_refs[p].at[pl.ds(a0 >> _i32(7), W_ROWS), :],
                awin.at[_i32(p)], sem.at[_i32(0)]).start()
            pltpu.make_async_copy(
                b_refs[p].at[pl.ds(fb0 >> _i32(7), W_ROWS), :],
                bwin.at[_i32(p)], sem.at[_i32(1)]).start()
        for p in range(np_):
            pltpu.make_async_copy(
                awin.at[_i32(p)], awin.at[_i32(p)],
                sem.at[_i32(0)]).wait()
            pltpu.make_async_copy(
                bwin.at[_i32(p)], bwin.at[_i32(p)],
                sem.at[_i32(1)]).wait()

        col = jax.lax.broadcasted_iota(jnp.int32, (W_ROWS, LANES), 1)

        def align(x, sh):
            # y flat[i] = x flat[i + sh], sh in [0, 128)
            amt = (_i32(LANES) - sh) & _i32(LANES - 1)
            rl = pltpu.roll(x, amt, 1)
            rn = pltpu.roll(rl, _i32(W_ROWS - 1), 0)   # next row
            y = jnp.where(col < _i32(LANES) - sh, rl, rn)
            return y[:r_blk, :]

        ash = a0 & _i32(LANES - 1)
        bsh = fb0 & _i32(LANES - 1)
        flat = jax.lax.broadcasted_iota(jnp.int32, (r_blk, LANES), 0) \
            * _i32(LANES) + \
            jax.lax.broadcasted_iota(jnp.int32, (r_blk, LANES), 1)
        # flipped-B window: reverse(B[b0:b0+blk]); its LAST nb elements
        # are the block's B records (the smallest of the window), i.e.
        # flat >= blk - nb live, flat < blk - nb masked
        nb = _i32(blk) - na
        planes = []
        for p in range(np_):
            aw = align(awin[_i32(p)], ash)
            bw = align(bwin[_i32(p)], bsh)
            # masked-out elements: keys +inf so they sort after the
            # block's blk live records; payloads zeroed so a masked
            # element selected among +inf ties (live sentinel padding)
            # is indistinguishable from real padding
            fill = _i32(_IMAX) if p < nk else _i32(0)
            aw = jnp.where(flat < na, aw, fill)
            bw = jnp.where(flat >= _i32(blk) - nb, bw, fill)
            planes.append(jnp.concatenate([aw, bw], axis=0))

        dir_asc = jnp.ones((2 * r_blk, LANES), jnp.int32)
        j = blk
        while j >= 1:
            planes = _cmpx(planes, j, dir_asc, nk, 2 * r_blk)
            j //= 2
        for p in range(np_):
            out_refs[p][:] = planes[p][:r_blk, :]

    return kernel


def _splits_batched(kp, nk: int, NB: int, NBpp: int, blk: int, R: int):
    """Per-block merge-path splits for npairs independent (A, B) run
    pairs laid out as [A0|B0|A1|B1|...], run length R.  Returns
    (a0_local, na) per output block (both (NB,) i32)."""
    t = jnp.arange(NB, dtype=jnp.int32)
    q = t // jnp.int32(NBpp)
    dd = (t % jnp.int32(NBpp)) * jnp.int32(blk)
    base_a = q * jnp.int32(2 * R)
    base_b = base_a + jnp.int32(R)

    def search(dd):
        lo = jnp.maximum(jnp.int32(0), dd - jnp.int32(R))
        hi = jnp.minimum(dd, jnp.int32(R))
        steps = int(np.ceil(np.log2(max(R, 2)))) + 2
        for _ in range(steps):
            go = lo < hi
            mid = (lo + hi) >> 1
            j = dd - mid - 1
            mc = base_a + jnp.clip(mid, 0, R - 1)
            jc = base_b + jnp.clip(j, 0, R - 1)
            lt = jnp.zeros_like(go)
            eq = jnp.ones_like(go)
            for p in range(nk):
                av, bv = kp[p][mc], kp[p][jc]
                lt = lt | (eq & (av < bv))
                eq = eq & (av == bv)
            cond = lt | eq
            lo = jnp.where(go & cond, mid + 1, lo)
            hi = jnp.where(go & ~cond, mid, hi)
        return lo

    a0 = search(dd)
    a1 = search(jnp.minimum(dd + jnp.int32(blk), jnp.int32(2 * R)))
    return q, dd, a0, a1 - a0


def _merge_level(sp, nk: int, R: int, r_blk: int, interpret: bool):
    """One merge-path tree level over SORTABLE planes: runs of length R
    (all ascending) -> runs of length 2R.  One data pass."""
    np_ = len(sp)
    blk = r_blk * LANES
    M = sp[0].shape[0]
    NBpp = (2 * R) // blk
    NB = M // blk
    npairs = M // (2 * R)
    q, dd, a0l, nag = _splits_batched(sp, nk, NB, NBpp, blk, R)
    base_a = q * jnp.int32(2 * R)
    a0g = base_a + a0l
    b0 = dd - a0l
    # flipped odd runs, packed [flip(B0)|flip(B1)|...], front pad
    # blk + 8*LANES of +inf, 8 tail rows: window offset for run q at
    # within-run b0 is q*R + R - b0 + 8*LANES (see merge_path_planes)
    fbg = q * jnp.int32(R) + jnp.int32(R + 8 * LANES) - b0
    pad = jnp.full((blk + 8 * LANES,), _IMAX, jnp.int32)
    tail8 = jnp.full((8 * LANES,), _IMAX, jnp.int32)
    a_pad = [jnp.concatenate([x, pad]).reshape(-1, LANES) for x in sp]
    b_flip = [jnp.concatenate(
        [pad, jnp.flip(x.reshape(npairs, 2, R)[:, 1, :],
                       axis=-1).reshape(-1), tail8]).reshape(-1, LANES)
        for x in sp]

    zero = np.int32(0)
    ospec = pl.BlockSpec((r_blk, LANES), lambda i: (i, zero),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(np_, nk, r_blk),
        grid=(NB,),
        in_specs=[pl.BlockSpec((NB,), lambda i: (zero,),
                               memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * np_),
        out_specs=tuple([ospec] * np_),
        out_shape=tuple(jax.ShapeDtypeStruct((NB * r_blk, LANES),
                                             jnp.int32)
                        for _ in range(np_)),
        scratch_shapes=[pltpu.VMEM((np_, r_blk + 8, LANES), jnp.int32),
                        pltpu.VMEM((np_, r_blk + 8, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(a0g, fbg, nag, *a_pad, *b_flip)
    return [x.reshape(-1) for x in outs]


@functools.partial(jax.jit, static_argnames=("num_keys", "interpret"))
def sort_planes_mp(planes, num_keys: int, interpret: bool = False):
    """Sort u32 planes by the first num_keys planes: per-block bitonic
    local sort (all ascending) + a merge-path tree (ONE data pass per
    level, vs the bitonic global network's log^2 passes).  Length must
    be blk * 2^j — pad with 0xFFFFFFFF key sentinels."""
    from . import bitonic as bt
    np_ = len(planes)
    r_blk = _r_blk_for(np_)
    blk = r_blk * LANES
    M = planes[0].shape[0]
    nruns = M // blk
    assert M % blk == 0 and (nruns & (nruns - 1)) == 0, (M, blk)
    sp = _to_sortable(planes, num_keys)
    sp = bt._pcall(bt._make_blocksort_kernel(np_, num_keys, r_blk,
                                             all_asc=True),
                   sp, r_blk, interpret)
    R = blk
    while R < M:
        sp = _merge_level(sp, num_keys, R, r_blk, interpret)
        R *= 2
    return tuple(_from_sortable(sp, num_keys))


@functools.partial(jax.jit, static_argnames=("num_keys", "interpret"))
def merge_path_planes(planes_a, planes_b, num_keys: int,
                      interpret: bool = False):
    """Merge two sorted u32 plane tuples (ascending on the first
    num_keys planes, unsigned; 0xFFFFFFFF sentinel padding sorts last)
    into one sorted tuple of length Ma+Mb.  Ma and Mb must each be a
    multiple of r_blk*LANES (see _r_blk_for) — pad with sentinels."""
    np_ = len(planes_a)
    r_blk = _r_blk_for(np_)
    blk = r_blk * LANES
    Ma, Mb = planes_a[0].shape[0], planes_b[0].shape[0]
    assert Ma % blk == 0 and Mb % blk == 0, (Ma, Mb, blk)
    M = Ma + Mb
    NB = M // blk
    sa = _to_sortable(planes_a, num_keys)
    sb = _to_sortable(planes_b, num_keys)
    starts = _splits(sa[:num_keys], sb[:num_keys], num_keys, NB, blk,
                     Ma, Mb)
    d = jnp.arange(NB, dtype=jnp.int32) * jnp.int32(blk)
    a0g = starts[:NB]
    nag = starts[1:] - starts[:NB]
    fbg = jnp.int32(Mb + 8 * LANES) - (d - a0g)
    # pads sized so every window DMA (r_blk+8 rows from the start row
    # of any element offset the splits can produce) stays in bounds:
    # A gets blk + 8 rows of +inf at the END; flipped B gets the same at
    # the FRONT (element offsets there are Mb + 8*LANES - b0) plus 8
    # tail rows
    pad = jnp.full((blk + 8 * LANES,), _IMAX, jnp.int32)
    tail8 = jnp.full((8 * LANES,), _IMAX, jnp.int32)
    a_pad = [jnp.concatenate([x, pad]).reshape(-1, LANES) for x in sa]
    b_flip = [jnp.concatenate([pad, jnp.flip(x), tail8]).reshape(
        -1, LANES) for x in sb]
    zero = np.int32(0)
    ospec = pl.BlockSpec((r_blk, LANES), lambda i: (i, zero),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(np_, num_keys, r_blk),
        grid=(NB,),
        in_specs=[pl.BlockSpec((NB,), lambda i: (zero,),
                               memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * np_),
        out_specs=tuple([ospec] * np_),
        out_shape=tuple(jax.ShapeDtypeStruct((NB * r_blk, LANES),
                                             jnp.int32)
                        for _ in range(np_)),
        scratch_shapes=[pltpu.VMEM((np_, r_blk + 8, LANES), jnp.int32),
                        pltpu.VMEM((np_, r_blk + 8, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(a0g, fbg, nag, *a_pad, *b_flip)
    return tuple(x.reshape(-1)
                 for x in _from_sortable(list(outs), num_keys))
