"""Pallas TPU kernel: segmented reduce + stream compaction over sorted
kmer records — the build epoch's aggregation step.

Input: record planes sorted by key (key planes most-significant first),
sentinel (-1/0xFFFFFFFF in every key plane) padding at the end.
Output: one record per unique live key, compacted to the front, with
  covg = run length (number of duplicates) and edge = OR of edge bytes,
plus the unique count.

This replaces the XLA segment_sum / segmented-OR / scatter-compaction
pipeline (ops/sorted.py unique_reduce), whose random-access scatters and
gathers are element-latency-bound on TPU (~90-120 ms per pass at 8M
records vs ~1 ms of actual memory traffic).  The kernel is one pass:
each grid step owns one block, all reductions are O(log BLK) vectorised
VPU passes in VMEM, runs crossing block boundaries flow through SMEM
carry scratch (the TPU grid executes sequentially), and each block
appends its compacted records with one row-aligned DMA per plane
(partial output rows are buffered in a VMEM residual scratch).

Reference semantics: the hash-table insert/accumulate loop of
/root/reference/src/graph/hash_table.c:169-205 (find_or_insert) plus
db_graph.c covg/edge accumulation, re-expressed as sort + segmented
reduction (SURVEY.md §7 mapping 2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R_BLK = 256                    # rows per block
BLK = R_BLK * LANES            # 32768 records per grid step
_SENT = -1                     # sentinel key-plane value (0xFFFFFFFF)


def _i32(v):
    # Static scalar as concrete int32: under x64, bare Python ints become
    # weak int64 scalars, which Mosaic cannot lower.
    return jnp.int32(v)


def _iotas(R):
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return row, col, row * LANES + col



def _roll(x, shift, axis):
    """pltpu.roll that tolerates bool data (Mosaic dynamic rotate only
    supports 32-bit element types)."""
    if x.dtype == jnp.bool_:
        return pltpu.roll(x.astype(jnp.int32), shift, axis) != 0
    return pltpu.roll(x, shift, axis)

def _flat_prev(x, carry_scalar):
    """x shifted one flat position right ((r,c)<-(r,c-1), row wrap),
    position (0,0) filled with carry_scalar."""
    rl = _roll(x, _i32(1), 1)
    rb = _roll(rl, _i32(1), 0)
    _, col, flat = _iotas(x.shape[0])
    prev = jnp.where(col == 0, rb, rl)
    return jnp.where(flat == 0, carry_scalar, prev)


def _from_right(x, d, fill):
    """y[i] = x[i+d] on the flat row-major order, `fill` past the end.
    d is a static power of two (any multiple of LANES also works)."""
    R = x.shape[0]
    row, col, flat = _iotas(R)
    fill = jnp.asarray(fill, x.dtype)
    if d % LANES == 0:
        m = d // LANES
        y = _roll(x, _i32(R - m), 0)
        return jnp.where(row >= R - m, fill, y)
    rl = _roll(x, _i32(LANES - d), 1)    # (r, c+d) for c < 128-d
    rb = _roll(rl, _i32(R - 1), 0)       # (r+1, c+d-128) otherwise
    y = jnp.where(col < LANES - d, rl, rb)
    return jnp.where(flat >= R * LANES - d, fill, y)


def _from_left(x, d):
    """y[i] = x[i-d] on the flat order (garbage wrap for i < d; callers
    mask).  d static power of two below LANES, or multiple of LANES."""
    if d % LANES == 0:
        return _roll(x, _i32(d // LANES), 0)
    rl = _roll(x, _i32(d), 1)
    rb = _roll(rl, _i32(1), 0)
    _, col, _ = _iotas(x.shape[0])
    return jnp.where(col >= d, rl, rb)


def _seg_scan_fwd(is_start, sums, ors):
    """Inclusive forward segmented scan over lists of planes: `sums`
    summed, `ors` OR-ed, segments reset at is_start.  O(log BLK)
    doubling passes."""
    R = is_start.shape[0]
    _, _, flat = _iotas(R)
    # flags as i32 throughout: Mosaic cannot roll/select i1 vectors
    f = is_start.astype(jnp.int32)
    sums = list(sums)
    ors = list(ors)
    d = 1
    while d < R * LANES:
        fp = _from_left(f, d)
        before = flat < d                      # no element d earlier
        take = (f == 0) & (~before)
        sums = [jnp.where(take, c + _from_left(c, d), c) for c in sums]
        ors = [jnp.where(take, e | _from_left(e, d), e) for e in ors]
        f = jnp.where(before, f, f | fp)
        d *= 2
    return sums, ors


def _compact(planes, emit):
    """Stably move elements where emit=True to the front (flat order).

    Binary-decomposed left shifts, LSB first: element i moves left by
    s[i] = (# of non-emit positions before i).  At bit b every element
    whose remaining shift has bit b set moves 2**b left simultaneously
    (a flat gather-from-right).  Destinations of live movers stay
    distinct and LSB-to-MSB order never lands a mover on a still-needed
    element (property-tested against numpy in
    tests/test_pallas_segreduce.py).  Returns (planes, emit count).
    """
    R = planes[0].shape[0]
    _, _, flat = _iotas(R)
    em = emit.astype(jnp.int32)
    ne = 1 - em
    pre = ne
    d = 1
    while d < R * LANES:
        p = _from_left(pre, d)
        pre = jnp.where(flat < d, pre, pre + p)
        d *= 2
    s = pre - ne                                # exclusive prefix of dead
    s = jnp.where(emit, s, _i32(0))
    alive = em                                  # i32: Mosaic has no i1 ops
    # f32 sum: exact to 2**24 >> BLK; jnp.sum on i32 promotes to
    # i64 under x64, which Mosaic cannot lower
    nkeep = jnp.sum(em.astype(jnp.float32)).astype(jnp.int32)
    b = 1
    while b < R * LANES:
        s_src = _from_right(s, b, 0)
        src_alive = _from_right(alive, b, 0)
        incoming = (src_alive != 0) & ((s_src & _i32(b)) != 0)
        new_planes = []
        for x in planes:
            xs = _from_right(x, b, jnp.zeros((), x.dtype))
            new_planes.append(jnp.where(incoming, xs, x))
        planes = new_planes
        moved_away = (alive != 0) & ((s & _i32(b)) != 0)
        s = jnp.where(incoming, s_src - _i32(b),
                      jnp.where(moved_away, _i32(0), s))
        alive = jnp.where(incoming, _i32(1),
                          jnp.where(moved_away, _i32(0), alive))
        b *= 2
    return planes, nkeep


def _make_kernel(n_keys: int, n_sum: int, n_or: int, r_blk: int):
    """Kernel over planes: NK key planes + NS sum planes + NO or planes
    in; NK key planes + count + NS sums + NO ors out (row-padded), plus
    the unique count.

    SMEM scratch `st` (i32):
      st[0] = base row of the next output write
      st[1] = residual element count (0..127)
      st[2] = total emitted records
      st[3..3+NK) = carry key planes (last record of previous block)
      st[3+NK] = carry live-count aggregate
      st[4+NK..4+NK+NS) = carry sum aggregates
      st[4+NK+NS..4+NK+NS+NO) = carry or aggregates
    """
    NK, NS, NO = n_keys, n_sum, n_or
    NP = NK + 1 + NS + NO   # output planes: keys…, count, sums…, ors…
    NIN = NK + NS + NO

    def kernel(*refs):
        in_refs = refs[:NIN]
        out_refs = refs[NIN:NIN + NP]
        cnt_ref = refs[NIN + NP]
        st = refs[NIN + NP + 1]
        res = refs[NIN + NP + 2]        # (NP, 1, LANES) residual
        buf = refs[NIN + NP + 3]        # (NP, r_blk, LANES) DMA stage
        sem = refs[NIN + NP + 4]

        g = pl.program_id(0)
        ng = pl.num_programs(0)
        R = r_blk
        row, col, flat = _iotas(R)

        @pl.when(g == 0)
        def _():
            st[0] = _i32(0)
            st[1] = _i32(0)
            st[2] = _i32(0)
            for p in range(NK):
                st[3 + p] = _i32(-1)    # sentinel carry: no pending run
            for p in range(1 + NS + NO):
                st[3 + NK + p] = _i32(0)

        keys = [in_refs[p][:] for p in range(NK)]
        sums_in = [in_refs[NK + p][:] for p in range(NS)]
        ors_in = [in_refs[NK + NS + p][:] for p in range(NO)]

        live = keys[0] != _SENT
        for p in range(1, NK):
            live = live | (keys[p] != _SENT)
        live_i = live.astype(jnp.int32)

        # run starts (vs previous record, incl. cross-block carry)
        prevs = [_flat_prev(keys[p], st[3 + p]) for p in range(NK)]
        is_start = prevs[0] != keys[0]
        for p in range(1, NK):
            is_start = is_start | (prevs[p] != keys[p])

        aggs = [live_i] + [c * live_i for c in sums_in]
        orss = [e * live_i for e in ors_in]
        sums, ors = _seg_scan_fwd(is_start, aggs, orss)

        # positions before the first start continue the carried run
        first_start = jnp.min(jnp.where(is_start, flat, _i32(R * LANES)))
        in_carry = flat < first_start
        sums = [jnp.where(in_carry, c + st[3 + NK + i], c)
                for i, c in enumerate(sums)]
        ors = [jnp.where(in_carry, e | st[4 + NK + NS + i], e)
               for i, e in enumerate(ors)]

        # a start at p emits the PREVIOUS run: key = key[p-1] (or carry),
        # aggregate = scan[p-1] (or carry); only if that run was live
        pvals = [_flat_prev(c, st[3 + NK + i])
                 for i, c in enumerate(sums)]
        povals = [_flat_prev(e, st[4 + NK + NS + i])
                  for i, e in enumerate(ors)]
        prev_live = prevs[0] != _SENT
        for p in range(1, NK):
            prev_live = prev_live | (prevs[p] != _SENT)
        emit = is_start & prev_live

        planes, nemit = _compact(prevs + pvals + povals, emit)

        # prepend the residual partial row (rem elements, dynamic 0..127)
        rem = st[1]
        b = 1
        while b < LANES:
            bit = (rem & _i32(b)) != 0
            new = []
            for x in planes:
                rl = _roll(x, _i32(b), 1)
                rb = _roll(rl, _i32(1), 0)
                sh = jnp.where(col >= b, rl, rb)
                new.append(jnp.where(bit, sh, x))
            planes = new
            b *= 2
        for p in range(NP):
            resrow = jnp.broadcast_to(res[p, 0:1, :], (R, LANES))
            planes[p] = jnp.where((row == 0) & (col < rem), resrow,
                                  planes[p])

        total = rem + nemit
        # LANES is 2**7; scalar // lowers through an i64 helper in Mosaic
        full_rows = jax.lax.shift_right_logical(total, _i32(7))
        new_rem = total & _i32(LANES - 1)

        base = st[0]
        for p in range(NP):
            buf[p, :, :] = planes[p]
        for p in range(NP):
            cp = pltpu.make_async_copy(
                buf.at[_i32(p)], out_refs[p].at[pl.ds(base, R), :], sem)
            cp.start()
            cp.wait()
        # stash the partial row (elements past the full rows)
        for p in range(NP):
            res[p, 0:1, :] = buf[p, pl.ds(full_rows, 1), :]
        st[0] = base + full_rows
        st[1] = new_rem
        st[2] = st[2] + nemit

        # carry out: the last record of this block may continue
        for p in range(NK):
            st[3 + p] = keys[p][R - 1, LANES - 1]
        for i, c in enumerate(sums):
            st[3 + NK + i] = c[R - 1, LANES - 1]
        for i, e in enumerate(ors):
            st[4 + NK + NS + i] = e[R - 1, LANES - 1]

        @pl.when(g == ng - 1)
        def _():
            # flush residual partial row + the still-pending run (if any)
            pend = st[3] != -1
            for p in range(1, NK):
                pend = jnp.logical_or(pend, st[3 + p] != -1)
            nres = st[1]
            col1 = col[0:1, :]
            pend_vals = [st[3 + p] for p in range(NK)] +                 [st[3 + NK + i] for i in range(1 + NS + NO)]
            for p in range(NP):
                fill = _i32(_SENT if p < NK else 0)
                fr = jnp.where(col1 < nres, res[p, 0:1, :],
                               jnp.where((col1 == nres) & pend,
                                         pend_vals[p], fill))
                buf[p, 0:1, :] = fr
                cp = pltpu.make_async_copy(
                    buf.at[_i32(p), pl.ds(0, 1), :],
                    out_refs[p].at[pl.ds(st[0], 1), :], sem)
                cp.start()
                cp.wait()
            cnt_ref[0] = st[2] + jnp.where(pend, _i32(1), _i32(0))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def segreduce_compact_multi(key_planes, sum_planes, or_planes, *,
                            interpret=False):
    """Generalised segmented reduce + compaction.

    key_planes: tuple of (M,) i32 planes (most significant first),
    sorted by the combined key, sentinel (-1 in all planes) padding at
    the end.  sum_planes / or_planes: tuples of (M,) i32 value planes
    aggregated per run by + / |.

    Returns (out_key_planes, count, out_sums, out_ors, n_unique):
    compacted unique records at the front; count = run length (live
    records per run); sentinel/zero tails.
    """
    NK, NS, NO = len(key_planes), len(sum_planes), len(or_planes)
    M = key_planes[0].shape[0]
    assert M % BLK == 0, M
    NB = M // BLK
    shaped = [x.reshape(NB * R_BLK, LANES)
              for x in (*key_planes, *sum_planes, *or_planes)]

    NP = NK + 1 + NS + NO
    out_shape = tuple(
        jax.ShapeDtypeStruct((NB * R_BLK + 1, LANES), jnp.int32)
        for _ in range(NP)) + (
        jax.ShapeDtypeStruct((1,), jnp.int32),)
    # index maps must return concrete int32: under x64 a literal 0 traces
    # as an i64 constant, which Mosaic rejects in its transform functions
    zero = np.int32(0)
    in_specs = [pl.BlockSpec((R_BLK, LANES), lambda i: (i, zero),
                             memory_space=pltpu.VMEM)
                for _ in range(NK + NS + NO)]
    out_specs = tuple(pl.BlockSpec(memory_space=pl.ANY)
                      for _ in range(NP)) + (
        pl.BlockSpec((1,), lambda i: (zero,),
                     memory_space=pltpu.SMEM),)
    outs = pl.pallas_call(
        _make_kernel(NK, NS, NO, R_BLK),
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((4 + NK + NS + NO,), jnp.int32),
                        pltpu.VMEM((NP, 1, LANES), jnp.int32),
                        pltpu.VMEM((NP, R_BLK, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
        debug=bool(__import__('os').environ.get('MCTX_PALLAS_DEBUG')),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*shaped)
    n = outs[NP][0]
    planes = [o.reshape(-1)[:M] for o in outs[:NP]]
    idx = jnp.arange(M, dtype=jnp.int32)
    live = idx < n
    okeys = [jnp.where(live, x, _SENT) for x in planes[:NK]]
    zl = lambda x: jnp.where(live, x, 0)
    count = zl(planes[NK])
    osums = [zl(x) for x in planes[NK + 1:NK + 1 + NS]]
    oors = [zl(x) for x in planes[NK + 1 + NS:]]
    return okeys, count, osums, oors, n


def segreduce_compact(key_planes, edge_plane, *, interpret=False):
    """Back-compat wrapper: covg = run length, edge = OR of the run."""
    okeys, count, _sums, ors, n = segreduce_compact_multi(
        tuple(key_planes), (), (edge_plane,), interpret=interpret)
    return okeys, count, ors[0], n
