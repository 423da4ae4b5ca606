"""Differential fuzz sweep: N random genomes (default 100+) checked
against the independent python references + the lossless property
(VERDICT r2 weak item 6: grow ref-based validation beyond goldens).

Per genome: (a) graph store (keys/covg/edges) == string-level python
reference, (b) unitig multiset == python walker, (c) lossless
reconstruction from graph + links at a k drawn from {9, 15, 31, 63}.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/fuzz_lossless.py [N]
Writes a summary line; non-zero exit on any mismatch.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main(n_genomes: int = 100) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from graph_ref import build_ref_graph, ref_unitigs
    from test_graph_build import batchify, graph_to_dict
    from test_links import build_g, thread_all, row_of, flanked
    from util import random_dna, revcomp_str
    from mccortex_tpu.graph import build as gbuild
    from mccortex_tpu.graph import unitigs as U
    from mccortex_tpu.links import walk as lwalk

    def canon(s):
        return min(s, revcomp_str(s))

    rng = np.random.default_rng(424242)
    ks = [9, 15, 31, 63]
    fails = []
    for it in range(n_genomes):
        k = ks[it % len(ks)]
        glen = int(rng.integers(150, 400))
        ncols = int(rng.integers(1, 3))
        inputs = []
        for c in range(ncols):
            seq = random_dna(glen, seed=int(rng.integers(1 << 30)))
            if rng.random() < 0.25:
                p = int(rng.integers(0, len(seq)))
                seq = seq[:p] + "N" + seq[p + 1:]
            inputs.append((seq, c))

        # (a) graph vs python reference
        ref = build_ref_graph(inputs, k, ncols=ncols)
        g = gbuild.build(batchify(inputs, pad_to=401), k, ncols=ncols)
        got = graph_to_dict(g, k)
        if got != ref:
            fails.append((it, k, "graph"))
            continue

        # (b) unitigs vs python walker (single-colour view)
        want_u = sorted(canon(u) for u in ref_unitigs(ref, k))
        got_u = sorted(canon(s) for s in U.extract_unitigs(g))
        if got_u != want_u:
            fails.append((it, k, "unitigs"))
            continue

        # (c) lossless reconstruction (clean single sequence).
        # FIXED length per k: varying shapes would compile a fresh XLA
        # program per genome, and XLA:CPU dies after ~1000 in-process
        # executables (CLAUDE.md landmine)
        seq = random_dna(320, seed=int(rng.integers(1 << 30)))
        try:
            full = flanked(seq, k, seed=int(rng.integers(1 << 30)))
        except RuntimeError:
            continue
        g2 = build_g([(full, 0)], k)
        links = thread_all(g2, [(full, 0)])
        contigs, _stats = lwalk.assemble_contigs_linked(
            g2, links, np.array([row_of(g2, full[:k])]), colour=0,
            max_len=len(full) + 100)
        if canon(contigs[0]) != canon(full):
            fails.append((it, k, "lossless"))
        if (it + 1) % 10 == 0:
            print(f"[fuzz] {it + 1}/{n_genomes} ok so far "
                  f"({len(fails)} failures)", flush=True)
            jax.clear_caches()   # XLA:CPU in-process compile cap

    print(f"[fuzz] {n_genomes} genomes, k in {ks}: "
          f"{n_genomes - len(fails)} passed, {len(fails)} failed"
          + (f" -> {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sys.exit(main(n))
