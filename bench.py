"""Benchmark: graph-build + batched-lookup throughput on the current
device (TPU under the driver; CPU with JAX_PLATFORMS=cpu).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline metric is build kmers/s/chip on the inner epoch
(rolling extraction + canonicalise + sort + segmented reduce), the
replacement for the reference's hash-table insert loop
(ref src/tools/build_graph.c:122; BASELINE.json metric).  vs_baseline
compares against the reference's CPU hash-table insert throughput
anchor: mccortex's own hashtest micro-benchmark inserts ~4M kmers/s/core
on a modern x86 core (results/hash_table_benchmark README; the binary
itself is unbuildable here — submodules are not vendored), so we use
4.0e6 kmers/s as the single-core CPU baseline.
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

    k, ncols, colour = 31, 1, 0
    B, L = 2048, 256  # ~0.5M records per epoch
    rng = np.random.default_rng(0)
    bases = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))

    def run():
        keys, covg, edges, n = count_batch(bases, k, ncols, colour)
        return n

    n = run()
    n.block_until_ready()  # compile
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        n = run()
    n.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    kmers = B * (L - k + 1)
    kmers_per_s = kmers / dt

    out = {
        "metric": "build_kmers_per_s_per_chip",
        "value": round(kmers_per_s),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / CPU_BASELINE_KMERS_PER_S, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
