"""E.coli-scale bubble calling measurement (VERDICT r2 item 4).

Builds a 2-colour diploid joint graph from an E.coli-sized synthetic
genome (hap2 = hap1 + planted SNPs), then times `call_bubbles` on the
full graph and reports recall of the planted sites.

Usage: python scripts/scale_bubbles.py [genome_mb] [n_snps] [coverage]
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
    gmb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.6
    nsnp = int(sys.argv[2]) if len(sys.argv) > 2 else 4600
    cov = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    gsize = int(gmb * 1e6)
    k, rlen = 31, 150

    import _tpu_wait
    _tpu_wait.arm_watchdog({"phase": "scale_bubbles"})
    import jax  # noqa: F401
    _tpu_wait.wait_backend()
    from mccortex_tpu.graph import build as gbuild
    from mccortex_tpu.calls import bubbles as cbub
    from mccortex_tpu.calls import calls2vcf as c2v
    from mccortex_tpu.graph import kmer_occur as KO

    rng = np.random.default_rng(7)
    hap1 = rng.integers(0, 4, gsize, dtype=np.uint8)
    pos = np.sort(rng.choice(
        np.arange(k, gsize - k, 2 * k), size=nsnp, replace=False))
    hap2 = hap1.copy()
    hap2[pos] = (hap2[pos] + rng.integers(1, 4, nsnp)) % 4
    print(f"genome {gmb}Mb, {nsnp} SNPs, {cov:.0f}x/hap", file=sys.stderr)

    nreads = int(gsize * cov / rlen)
    B = min(8192, nreads)
    batches = []
    for col, hap in ((0, hap1), (1, hap2)):
        starts = rng.integers(0, gsize - rlen, nreads)
        reads = np.lib.stride_tricks.sliding_window_view(
            hap, rlen)[starts].copy()
        for i in range(0, nreads, B):
            chunk = reads[i:i + B]
            if chunk.shape[0] < B:   # pad the tail batch: every read counts
                pad = np.full((B - chunk.shape[0], rlen), 4, np.uint8)
                chunk = np.concatenate([chunk, pad])
            batches.append((chunk, col))

    t0 = time.perf_counter()
    g = gbuild.build(batches, k, ncols=2)
    g.keys.block_until_ready()
    t_build = time.perf_counter() - t0
    print(f"build: {t_build:.1f}s  {int(g.n)} kmers (2 colours)",
          file=sys.stderr)

    t0 = time.perf_counter()
    bubs = cbub.call_bubbles(g, max_allele=80, max_flank=200)
    t_bub = time.perf_counter() - t0
    print(f"bubbles: {t_bub:.1f}s  {len(bubs)} calls", file=sys.stderr)

    # recall via the real decomposition path (fuzz_callers semantics):
    # bubbles -> VCF against hap1, then intersect with planted sites.
    gstr1 = "".join("ACGT"[c] for c in hap1)
    calls = [{"name": f"b{i}", "flank5p": bb.flank5p,
              "flank3p": bb.flank3p,
              "branches": [(j, br) for j, br in enumerate(bb.branches)]}
             for i, bb in enumerate(bubs)]
    t0 = time.perf_counter()
    recs, _ = c2v.bubbles_to_vcf(calls, KO.RefGenome(["c"], [gstr1]), k)
    t_vcf = time.perf_counter() - t0
    got_pos = {r.pos for r in recs}
    hit = sum(1 for p in pos if int(p) in got_pos)
    print(f"calls2vcf: {t_vcf:.1f}s  {len(recs)} records, "
          f"{hit}/{nsnp} planted SNPs recovered", file=sys.stderr)

    print(json.dumps({
        "genome_mb": gmb, "n_snps": nsnp, "coverage": cov,
        "kmers": int(g.n), "build_s": round(t_build, 1),
        "bubbles_s": round(t_bub, 1), "n_bubbles": len(bubs),
        "calls2vcf_s": round(t_vcf, 1),
        "snp_recall": round(hit / nsnp, 4),
        "calls_per_s": (round(len(bubs) / t_bub) if t_bub > 0 else 0),
    }))


if __name__ == "__main__":
    main()
