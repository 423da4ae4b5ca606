"""Pallas TPU bitonic sort / merge over 32-bit record planes.

Replaces `jax.lax.sort` in the build epoch (VERDICT r2 item 2: the sort
is ~24ms of the 37ms epoch at 8.4M records, ~30x off the HBM roofline).
XLA's TPU sort lowers each compare-exchange substep to its own HBM pass;
here all substeps with butterfly distance < BLK run fused in VMEM:

  * blocksort kernel — the full bitonic network for one VMEM block
    (stages k=2..BLK unrolled; one HBM round trip per block).  Blocks
    come out with alternating sort directions, exactly the state the
    global bitonic network needs.
  * cross-block butterflies (distance >= BLK) — pure elementwise
    min/max on reshaped views; XLA emits them at memory bandwidth.
  * tail kernel — per merge stage, all remaining distances BLK/2..1
    fused into one VMEM pass (direction = a scalar from the block id).

Butterfly pairing is i ^ j, so partners are a cyclic lane roll (j < 128)
or sublane roll (j >= 128) away — never a gather.  Compare is multiword:
key planes most-significant first, unsigned order via the sign-flip map
u32 <-> i32 (sentinel 0xFFFFFFFF maps to INT32_MAX and sorts last).

Order produced: ascending on the tuple of key planes (unsigned), exactly
matching jax.lax.sort(ops, num_keys=NK) on bitcast planes — property
tested against it in tests/test_pallas_bitonic.py.  NOT stable (bitonic
networks aren't); every consumer (segreduce aggregation) is
order-insensitive within equal keys.

Reference role: the sorted-insert half of the hash-table build loop
(/root/reference/src/graph/hash_table.c:169-205) in the sort-reduce
formulation (SURVEY.md §7 mapping 1-2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R_BLK = 1024                  # rows per block
BLK = R_BLK * LANES           # 131072 records per grid step
_SIGN = -0x80000000           # i32 sign bit (u32<->i32 order map)


def _i32(v):
    # Static scalar as concrete int32: under x64 bare Python ints become
    # weak int64 scalars, which Mosaic cannot lower.
    return jnp.int32(v)


def _key_lt_eq(a, b, nk):
    """Lexicographic (a < b, a == b) over the first nk planes
    (i32 masks); one pass yields both <= and >= for free."""
    lt = jnp.zeros_like(a[0], jnp.int32)
    eq = jnp.ones_like(a[0], jnp.int32)
    for p in range(nk):
        lt = lt | (eq * (a[p] < b[p]).astype(jnp.int32))
        eq = eq * (a[p] == b[p]).astype(jnp.int32)
    return lt, eq


def _key_lt(a, b, nk):
    return _key_lt_eq(a, b, nk)[0]


def _partner(x, j, r_blk):
    """x[i ^ j] for every flat element i of an (r_blk, LANES) block.
    j a static power of two < BLK.  Cyclic rolls pair correctly because
    2j always divides the rolled axis length."""
    if j < LANES:
        fwd = pltpu.roll(x, _i32(LANES - j), 1)   # x[i+j]
        bwd = pltpu.roll(x, _i32(j), 1)           # x[i-j]
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((col & _i32(j)) == 0, fwd, bwd)
    m = j // LANES
    fwd = pltpu.roll(x, _i32(r_blk - m), 0)
    bwd = pltpu.roll(x, _i32(m), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & _i32(m)) == 0, fwd, bwd)


def _cmpx(planes, j, dir_asc_i32, nk, r_blk):
    """One compare-exchange substep at distance j over all planes.
    dir_asc_i32: i32 mask (broadcastable) — 1 where the 2k-group at this
    element sorts ascending."""
    partners = [_partner(x, j, r_blk) for x in planes]
    if j < LANES:
        pos = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 1)
        low = ((pos & _i32(j)) == 0).astype(jnp.int32)
    else:
        pos = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 0)
        low = ((pos & _i32(j // LANES)) == 0).astype(jnp.int32)
    lt, eq = _key_lt_eq(planes, partners, nk)    # self < / == partner
    le = lt | eq                                 # self <= partner
    ge = 1 - lt                                  # self >= partner
    want_min = 1 - (low ^ dir_asc_i32)           # low==dir -> keep min
    take_self = jnp.where(want_min != 0, le, ge)
    return [jnp.where(take_self != 0, x, p)
            for x, p in zip(planes, partners)]


def _make_blocksort_kernel(np_, nk, r_blk, all_asc: bool = False):
    """Full bitonic network for one block: stages k=2..BLK.  Direction
    for k < BLK comes from local index bits; for k == BLK from the block
    parity, so block g leaves ascending iff g is even — the alternating
    layout the global network expects.  all_asc=True makes every block
    ascending instead (the layout the merge-path sort tree expects)."""
    blk = r_blk * LANES

    def kernel(*refs):
        g = pl.program_id(0)
        planes = [refs[p][:] for p in range(np_)]
        row = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 1)
        flat = row * _i32(LANES) + col
        k = 2
        while k <= blk:
            if k < blk:
                dir_asc = ((flat & _i32(k)) == 0).astype(jnp.int32)
            elif all_asc:
                dir_asc = jnp.ones(planes[0].shape, jnp.int32)
            else:
                dir_asc = jnp.broadcast_to(
                    ((g & _i32(1)) == 0).astype(jnp.int32),
                    planes[0].shape)
            j = k // 2
            while j >= 1:
                planes = _cmpx(planes, j, dir_asc, nk, r_blk)
                j //= 2
            k *= 2
        for p in range(np_):
            refs[np_ + p][:] = planes[p]

    return kernel


def _make_tail_kernel(np_, nk, r_blk, k_log, final_asc):
    """All substeps with distance < BLK of the merge stage k = 2**k_log.
    Direction is constant per block: ((g*BLK) & k) == 0; when
    final_asc, the whole stage sorts ascending (k == M)."""
    def kernel(*refs):
        g = pl.program_id(0)
        planes = [refs[p][:] for p in range(np_)]
        if final_asc:
            dir_scalar = _i32(1)
        else:
            blk_log = int(np.log2(r_blk * LANES))
            bit = (g >> _i32(k_log - blk_log)) & _i32(1)
            dir_scalar = (_i32(1) - bit)
        dir_asc = jnp.broadcast_to(dir_scalar, planes[0].shape)
        j = (r_blk * LANES) // 2
        while j >= 1:
            planes = _cmpx(planes, j, dir_asc, nk, r_blk)
            j //= 2
        for p in range(np_):
            refs[np_ + p][:] = planes[p]

    return kernel


def _pcall(kernel, planes, r_blk, interpret):
    np_ = len(planes)
    M = planes[0].shape[0]
    NB = M // (r_blk * LANES)
    shaped = [x.reshape(NB * r_blk, LANES) for x in planes]
    zero = np.int32(0)
    spec = pl.BlockSpec((r_blk, LANES), lambda i: (i, zero),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[spec] * np_,
        out_specs=tuple([spec] * np_),
        out_shape=tuple(jax.ShapeDtypeStruct((NB * r_blk, LANES),
                                             jnp.int32)
                        for _ in range(np_)),
        interpret=interpret,
    )(*shaped)
    return [o.reshape(-1) for o in outs]


def _xla_butterfly(planes, j, k, nk, M):
    """Cross-block compare-exchange at distance j (>= BLK) of merge
    stage k: pure elementwise min/max on (M/2j, 2, j) views — XLA runs
    this at memory bandwidth."""
    G = M // (2 * j)
    v = [x.reshape(G, 2, j) for x in planes]
    a = [x[:, 0, :] for x in v]
    b = [x[:, 1, :] for x in v]
    lt = _key_lt(a, b, nk)
    if k >= M:
        dir_asc = jnp.ones((G, 1), jnp.int32)
    else:
        base = jnp.arange(G, dtype=jnp.int32) * jnp.int32(2 * j)
        dir_asc = ((base & jnp.int32(k)) == 0).astype(jnp.int32)[:, None]
    ordered = jnp.where(dir_asc != 0, lt, 1 - lt)
    na = [jnp.where(ordered != 0, x, y) for x, y in zip(a, b)]
    nb = [jnp.where(ordered != 0, y, x) for x, y in zip(a, b)]
    return [jnp.stack([x, y], axis=1).reshape(M)
            for x, y in zip(na, nb)]


def _to_sortable(planes, nk):
    """u32 planes -> i32 with unsigned order (sign-flip key planes)."""
    out = []
    for p, x in enumerate(planes):
        y = jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32)
        if p < nk:
            y = y ^ _SIGN
        out.append(y)
    return out


def _from_sortable(planes, nk):
    out = []
    for p, y in enumerate(planes):
        if p < nk:
            y = y ^ _SIGN
        out.append(jax.lax.bitcast_convert_type(y, jnp.uint32))
    return out


@functools.partial(jax.jit,
                   static_argnames=("num_keys", "r_blk", "interpret"))
def sort_planes(planes, num_keys: int, r_blk: int | None = None,
                interpret: bool = False):
    """Sort u32 planes by the first num_keys planes (unsigned, most
    significant first); remaining planes ride along.  len(planes[0])
    must be a power of two and a multiple of r_blk*LANES (pad with
    0xFFFFFFFF sentinels).  Drop-in for
    jax.lax.sort(planes, num_keys=num_keys) up to ties."""
    r_blk = r_blk or R_BLK
    np_ = len(planes)
    M = planes[0].shape[0]
    blk = r_blk * LANES
    assert M % blk == 0 and (M & (M - 1)) == 0, M
    sp = _to_sortable(planes, num_keys)
    sp = _pcall(_make_blocksort_kernel(np_, num_keys, r_blk), sp,
                r_blk, interpret)
    k = 2 * blk
    while k <= M:
        j = k // 2
        while j >= blk:
            sp = _xla_butterfly(sp, j, k, num_keys, M)
            j //= 2
        sp = _pcall(_make_tail_kernel(np_, num_keys, r_blk,
                                      int(np.log2(k)), k >= M),
                    sp, r_blk, interpret)
        k *= 2
    return tuple(_from_sortable(sp, num_keys))


@functools.partial(jax.jit,
                   static_argnames=("num_keys", "r_blk", "interpret"))
def merge_planes(planes_a, planes_b, num_keys: int,
                 r_blk: int | None = None, interpret: bool = False):
    """Merge two individually sorted plane tuples into one sorted tuple
    of length Ma+Mb: ONE bitonic merge stage (flip B, clean network) —
    log(M) passes instead of a full re-sort.  Ma and Mb must be equal
    powers of two, multiples of r_blk*LANES."""
    r_blk = r_blk or R_BLK
    np_ = len(planes_a)
    Ma, Mb = planes_a[0].shape[0], planes_b[0].shape[0]
    assert Ma == Mb, (Ma, Mb)
    M = Ma + Mb
    blk = r_blk * LANES
    assert M % blk == 0 and (M & (M - 1)) == 0, M
    sa = _to_sortable(planes_a, num_keys)
    sb = _to_sortable(planes_b, num_keys)
    sp = [jnp.concatenate([x, jnp.flip(y)]) for x, y in zip(sa, sb)]
    j = M // 2
    while j >= blk:
        sp = _xla_butterfly(sp, j, M, num_keys, M)
        j //= 2
    sp = _pcall(_make_tail_kernel(np_, num_keys, r_blk,
                                  int(np.log2(M)), True),
                sp, r_blk, interpret)
    return tuple(_from_sortable(sp, num_keys))
