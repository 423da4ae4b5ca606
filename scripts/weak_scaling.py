"""Weak-scaling measurement harness for the sharded build
(SURVEY.md §5 distributed backend; BASELINE >=70%-efficiency-at-2-hosts
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

CAVEAT for the CPU run: virtual devices SHARE the host cores (this box
has 4), so measured per-device rates conflate partitioning overhead
with core contention once n_devices exceeds the core count.  The
communication accounting below (records routed, all_to_all bytes,
bucket padding utilisation) is shape-exact and hardware-independent —
it is what projects to a real slice; see ROUND5.md for the projection.

Prints one JSON object with measured rates for the 1-D mesh sizes, the
hierarchical 2-D (2 hosts x 4 chips) mesh, and per-step communication
accounting.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def _comm_accounting(bases_np, k, n_shards, bucket_cap, W, C):
    """Shape-exact per-step all_to_all accounting (host mirror of the
    device routing): how many records each device sends, the wire bytes
    (capacity x record size — all_to_all ships FULL buckets, padding
    included), and bucket utilisation."""
    import jax.numpy as jnp
    from mccortex_tpu.ops import kmer as kops
    from mccortex_tpu.graph.build import reads_to_records
    # per-device local slice -> local unique records -> owner counts
    B = bases_np.shape[0]
    per = B // n_shards
    rec_bytes = 8 * W + 4 * C + 1 * C
    sent_records = []
    max_bucket = 0
    for d in range(n_shards):
        rows = jnp.asarray(bases_np[d * per:(d + 1) * per])
        kk, _eb, _valid = reads_to_records(rows, k)
        keys = np.asarray(kk.reshape(-1, W))
        live = ~(keys == np.uint64(0xFFFFFFFFFFFFFFFF)).all(axis=1)
        uniq = np.unique(keys[live], axis=0)
        h = np.asarray(kops.kmer_hash(jnp.asarray(uniq)))
        owner = (h % np.uint64(n_shards)).astype(np.int64)
        cnt = np.bincount(owner, minlength=n_shards)
        sent_records.append(int(cnt.sum() - cnt[d]))  # off-device
        max_bucket = max(max_bucket, int(cnt.max()))
    wire_bytes_per_dev = n_shards * bucket_cap * rec_bytes
    util = max(1e-9, np.mean(sent_records) / max(1, (n_shards - 1)
                                                 * bucket_cap))
    return {
        "record_bytes": rec_bytes,
        "bucket_cap": bucket_cap,
        "max_bucket_needed": max_bucket,
        "offdev_records_per_dev": round(float(np.mean(sent_records))),
        "a2a_wire_bytes_per_dev": wire_bytes_per_dev,
        "bucket_utilisation": round(float(util), 4),
    }


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

    results = {"host_cores": _os.cpu_count(),
               "devices": [], "kmers_per_s_per_device": [],
               "efficiency": []}

    def timed(bld, state, bases, n):
        out = bld.step(bases, *state)          # compile + warm
        np.asarray(out[3]).sum()
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = bld.step(bases, *state)
        np.asarray(out[3]).sum()               # sync
        dt = (time.perf_counter() - t0) / iters
        kmers = bases.shape[0] * (L - k + 1)
        return kmers / dt / n

    base_rate = None
    for n in sizes:
        mesh = psh.make_mesh(n)
        bld = psh.ShardedBuilder(mesh, k, 1, 0, bucket_cap, out_cap)
        state = psh.empty_sharded_graph(mesh, k, 1, out_cap)
        B = reads_per_dev * n
        bases = jnp.asarray(
            rng.integers(0, 4, size=(B, L), dtype=np.uint8))
        rate_dev = timed(bld, state, bases, n)
        if base_rate is None:
            base_rate = rate_dev
        results["devices"].append(n)
        results["kmers_per_s_per_device"].append(round(rate_dev))
        results["efficiency"].append(round(rate_dev / base_rate, 3))
        print("weak_scaling: n=%d %.0f kmers/s/dev (eff %.2f)"
              % (n, rate_dev, rate_dev / base_rate), file=_sys.stderr)

    # hierarchical 2-D (2 hosts x chips) mesh: records cross the host
    # axis exactly once; on a real slice the outer axis is DCN
    if ndev_all >= 8:
        mesh2 = psh.make_mesh_2d(2, 4)
        bld2 = psh.ShardedBuilder(mesh2, k, 1, 0, bucket_cap, out_cap)
        state2 = bld2.empty_state()
        B = reads_per_dev * 8
        bases = jnp.asarray(
            rng.integers(0, 4, size=(B, L), dtype=np.uint8))
        rate2 = timed(bld2, state2, bases, 8)
        results["mesh_2x4_kmers_per_s_per_device"] = round(rate2)
        results["mesh_2x4_efficiency"] = round(rate2 / base_rate, 3)
        print("weak_scaling: 2x4 hier %.0f kmers/s/dev (eff %.2f)"
              % (rate2, rate2 / base_rate), file=_sys.stderr)

    # communication accounting at n=8 (shape-exact, hw-independent)
    bases_np = rng.integers(0, 4, size=(reads_per_dev * 8, L),
                            dtype=np.uint8)
    try:
        results["comm_n8"] = _comm_accounting(
            bases_np, k, 8, bucket_cap, W=1, C=1)
    except Exception as e:  # accounting must never block the capture
        results["comm_error"] = str(e)[:200]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
