"""perf lab 8: device merge engine ground truth at 100Mb-build shapes.

The r5c 100Mb profile charged 356s to merge_resolve (device merge time
at warm) and 680s to host spills of the two >160M-record top merges.
The host gate is now off (build.py MERGE_HOST_MIN); this lab measures
what the on-device engines actually cost at those shapes so the e2e
number has a roofline: merge_sorted_fused (mp) and _merge2
(rank-scatter) at 2x{16M, 32M, 64M, 90M} records, W=1, C=1, warm,
chained through a data dependency (no per-iteration RPC).

Usage: python scripts/perf_lab8.py [sizes_m, comma-sep]
Prints one JSON line.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def main():
    sizes_m = [int(x) for x in sys.argv[1].split(",")] \
        if len(sys.argv) > 1 else [16, 32, 64, 90]

    import _tpu_wait
    _tpu_wait.arm_watchdog({"phase": "perf_lab8"})
    import jax
    _tpu_wait.wait_backend()
    import jax.numpy as jnp
    import mccortex_tpu  # noqa: F401  (x64 on)
    from mccortex_tpu.graph import build as gbuild
    from mccortex_tpu.ops import sorted as sops

    out = {"metric": "merge_lab8"}
    for m in sizes_m:
        n = m << 20
        # two sorted disjoint-ish key sets (odd/even lanes overlap ~50%)
        rng = np.random.default_rng(m)
        ka = np.sort(rng.integers(0, 1 << 62, n, np.uint64))[:, None]
        kb = np.sort(rng.integers(0, 1 << 62, n, np.uint64))[:, None]
        ca = np.ones((n, 1), np.uint32)
        ea = np.ones((n, 1), np.uint8)
        try:
            da = (jnp.asarray(ka), jnp.asarray(ca), jnp.asarray(ea))
            db = (jnp.asarray(kb), jnp.asarray(ca), jnp.asarray(ea))
            res = {}
            for name, fn in (
                ("rank", lambda: gbuild._merge2(
                    da[0], da[1], da[2], db[0], db[1], db[2])),
                ("fused", lambda: gbuild.merge_sorted_fused(
                    da[0], da[1], da[2], db[0], db[1], db[2],
                    sort_impl="mp")),
            ):
                try:
                    r = fn()
                    jax.block_until_ready(r)
                    t0 = time.perf_counter()
                    r = fn()
                    jax.block_until_ready(r)
                    dt = time.perf_counter() - t0
                    res[name] = {
                        "s": round(dt, 3),
                        "mrec_per_s": round(2 * m / dt, 1)}
                    del r
                except Exception as e:  # noqa: BLE001
                    res[name] = {"error": str(e)[:120]}
            out[f"2x{m}M"] = res
            del da, db
        except Exception as e:  # noqa: BLE001
            out[f"2x{m}M"] = {"error": str(e)[:120]}
        print(json.dumps(out), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
