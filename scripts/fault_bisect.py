"""Bisect the TPU kernel fault in the clean path at ~2M kmers."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np


def main():
    import jax, jax.numpy as jnp
    import mccortex_tpu
    from mccortex_tpu.graph import build as gbuild, store as gstore
    from mccortex_tpu.graph import unitigs as U, clean as gclean
    from mccortex_tpu.graph import prune as P
    from mccortex_tpu.ops import sorted as sops

    k = 31
    gsize, cov, rlen = 1_000_000, 20.0, 150
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, gsize, dtype=np.uint8)
    nreads = int(gsize * cov / rlen)
    starts = rng.integers(0, gsize - rlen, nreads)
    reads = np.lib.stride_tricks.sliding_window_view(
        genome, rlen)[starts].copy()
    nerr = int(0.003 * reads.size)
    reads[rng.integers(0, nreads, nerr),
          rng.integers(0, rlen, nerr)] = rng.integers(0, 4, nerr,
                                                      dtype=np.uint8)
    B = 2048
    batches = [(reads[i:i + B], 0) for i in range(0, nreads - B + 1, B)]
    t0 = time.time()
    g = gbuild.build(batches, k, ncols=1)
    g.keys.block_until_ready()
    print(f"build ok {int(g.n)} kmers {time.time()-t0:.0f}s", flush=True)

    def stage(name, fn):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        print(f"{name} ok {time.time()-t0:.1f}s", flush=True)
        return r

    uedges = stage("union_edges", lambda: gstore.union_edges(g))
    succ = stage("successors", lambda: U.successors(g.keys, uedges, k))
    pd = stage("pointer_doubling", lambda: U.pointer_doubling(succ))
    uv = stage("unitig_view", lambda: U.unitig_view(g.keys, uedges, k))
    stats = stage("unitig_stats", lambda: U.unitig_stats(g))
    uvx, median, is_tip, ext = stats
    live = ~sops.is_sentinel(g.keys)
    keep = live & ~((median < 5) | (is_tip & (uvx.length < 2 * k)))
    edges2 = stage("clear_dangling",
                   lambda: P.clear_dangling_edges(g.keys, g.edges, keep, k))
    g2 = stage("prune", lambda: P.prune_to_mask(g, keep))
    print(f"clean ok: {int(g2.n)} kmers", flush=True)


if __name__ == "__main__":
    main()
