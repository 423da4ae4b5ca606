"""Weak-scaling measurement harness for the sharded build
(SURVEY.md §5 distributed backend; BASELINE ≥70%-efficiency-at-2-hosts
target).

Per-device load is held constant while the mesh grows 1 -> 2 -> 4 -> 8
devices; reports kmer observations/s/device and parallel efficiency
vs the 1-device run.  Runs on whatever devices JAX exposes:

  CPU validation (virtual 8-device mesh):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/weak_scaling.py
  Pod-ready: on a real multi-chip TPU slice the same script measures
  ICI-routed all_to_all scaling unchanged.

Prints one JSON line: {"devices": [...], "kmers_per_s_per_device":
[...], "efficiency": [...]}.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401
    from mccortex_tpu.parallel import shard as psh

    k = 31
    reads_per_dev, L = 512, 256
    out_cap = 1 << 18
    bucket_cap = 1 << 14
    ndev_all = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= ndev_all]
    rng = np.random.default_rng(0)

    results = {"devices": [], "kmers_per_s_per_device": [],
               "efficiency": []}
    base_rate = None
    for n in sizes:
        mesh = psh.make_mesh(n)
        bld = psh.ShardedBuilder(mesh, k, 1, 0, bucket_cap, out_cap)
        state = psh.empty_sharded_graph(mesh, k, 1, out_cap)
        B = reads_per_dev * n
        bases = jnp.asarray(
            rng.integers(0, 4, size=(B, L), dtype=np.uint8))
        out = bld.step(bases, *state)          # compile + warm
        np.asarray(out[3]).sum()
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = bld.step(bases, *state)
        np.asarray(out[3]).sum()               # sync
        dt = (time.perf_counter() - t0) / iters
        kmers = B * (L - k + 1)
        rate_dev = kmers / dt / n
        if base_rate is None:
            base_rate = rate_dev
        results["devices"].append(n)
        results["kmers_per_s_per_device"].append(round(rate_dev))
        results["efficiency"].append(round(rate_dev / base_rate, 3))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
