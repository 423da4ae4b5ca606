"""Benchmark: graph-build + batched-lookup throughput on the current
device (TPU under the driver; CPU with JAX_PLATFORMS=cpu).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline metric is build kmers/s/chip on the inner epoch
(rolling extraction + canonicalise + sort + segmented reduce), the
replacement for the reference's hash-table insert loop
(ref src/tools/build_graph.c:122; BASELINE.json metric).  Iterations are
chained through a data dependency (the previous epoch's count perturbs
the next input) so asynchronous dispatch cannot overlap them, and the
final value is fetched to host — wall-clock is end-to-end honest.

vs_baseline anchors against the reference's CPU hash-table insert
throughput: mccortex's own hashtest micro-benchmark inserts ~4M
kmers/s/core on a modern x86 core (results/hash_table_benchmark; the
binary itself is unbuildable here — submodules are not vendored), so we
use 4.0e6 kmers/s as the single-core CPU baseline.
"""

import json
import sys
import time

import numpy as np

CPU_BASELINE_KMERS_PER_S = 4.0e6  # mccortex hash insert, 1 core (see above)


def main():
    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401
    from mccortex_tpu.graph.build import count_batch
    from mccortex_tpu.ops import sorted as sops

    k, ncols, colour = 31, 1, 0
    B, L = 2048, 256  # ~0.5M records per epoch
    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def epoch(bases, salt):
        # data-dependent input shift serialises iterations
        shifted = jnp.roll(bases, (salt % 7).astype(jnp.int32), axis=0)
        keys, covg, edges, n = count_batch(shifted, k, ncols, colour)
        return n

    n = epoch(bases, jnp.int64(0))
    int(n)  # compile + sync
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        n = epoch(bases, n)
    total = int(n)  # host fetch forces completion of the whole chain
    dt = (time.perf_counter() - t0) / iters
    kmers = B * (L - k + 1)
    kmers_per_s = kmers / dt

    # secondary: batched lookup on a ~4M-kmer store
    keys, covg, edges, nu = count_batch(bases, k, ncols, colour)
    store_keys = keys  # sorted, sentinel padded
    Q = 1 << 18
    qk = store_keys[jnp.asarray(rng.integers(0, max(int(nu), 1), Q))]

    @jax.jit
    def lk(qk, salt):
        q2 = jnp.roll(qk, (salt % 5).astype(jnp.int32), axis=0)
        idx, found = sops.lookup(store_keys, q2)
        return idx.astype(jnp.int64).sum()

    s = lk(qk, jnp.int64(0))
    int(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = lk(qk, s)
    int(s)
    dt_lk = (time.perf_counter() - t0) / iters
    lookups_per_s = Q / dt_lk

    out = {
        "metric": "build_kmers_per_s_per_chip",
        "value": round(kmers_per_s),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / CPU_BASELINE_KMERS_PER_S, 3),
        "lookup_kmers_per_s": round(lookups_per_s),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
