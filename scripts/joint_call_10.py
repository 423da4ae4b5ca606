"""10-sample joint variant calling at E.coli scale (BASELINE config 2;
ref results/var_calling_10ecoli/Makefile:1-30: 10 E.coli samples,
joint graph, bubbles -> calls2vcf -> vcfcov -> vcfgeno).

Synthetic analogue: one E.coli-sized genome, 10 haploid samples each
carrying a private set of planted SNPs plus a shared set, sequenced at
`cov`x with 0.3% error.  Every phase is wall-clock timed; the VCF is
sanity-checked (recall of planted sites, per-sample genotype
correctness on a sample of records).

Usage: python scripts/joint_call_10.py [genome_mb] [n_samples] [cov]
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
    nsamp = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cov = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    gsize = int(gmb * 1e6)
    k, rlen, err = 21, 150, 0.003
    nsnp_priv, nsnp_shared = max(20, gsize // 4600), max(10, gsize // 9200)

    import _tpu_wait
    _tpu_wait.arm_watchdog({"phase": "joint_call_10"})
    import jax  # noqa: F401
    _tpu_wait.wait_backend()
    from mccortex_tpu.graph import build as gbuild
    from mccortex_tpu.graph import clean as gclean
    from mccortex_tpu.calls import bubbles as cbub
    from mccortex_tpu.calls import calls2vcf as c2v
    from mccortex_tpu.calls import genotyping as geno
    from mccortex_tpu.calls import vcfgeno as vg
    from mccortex_tpu.graph import kmer_occur as KO
    from mccortex_tpu.io import vcf as vcfio

    rng = np.random.default_rng(17)
    ref = rng.integers(0, 4, gsize, dtype=np.uint8)
    # planted sites, all >= 2k apart so bubbles never interact
    all_pos = np.sort(rng.choice(np.arange(k, gsize - k, 2 * k),
                                 size=nsnp_priv * nsamp + nsnp_shared,
                                 replace=False))
    rng.shuffle(all_pos)
    shared_pos = np.sort(all_pos[:nsnp_shared])
    priv_pos = [np.sort(all_pos[nsnp_shared + i * nsnp_priv:
                                nsnp_shared + (i + 1) * nsnp_priv])
                for i in range(nsamp)]
    truth = {}   # pos -> set(samples carrying the alt)
    haps = []
    for s in range(nsamp):
        hap = ref.copy()
        for p in np.concatenate([shared_pos, priv_pos[s]]):
            hap[p] = (ref[p] + 1 + (p % 3)) % 4
            truth.setdefault(int(p), set()).add(s)
        haps.append(hap)
    print(f"genome {gmb}Mb, {nsamp} samples, {len(truth)} planted SNP "
          f"sites ({nsnp_shared} shared), {cov:.0f}x", file=sys.stderr)

    nreads = int(gsize * cov / rlen)
    B = min(8192, nreads)
    batches = []
    for s, hap in enumerate(haps):
        starts = rng.integers(0, gsize - rlen, nreads)
        reads = np.lib.stride_tricks.sliding_window_view(
            hap, rlen)[starts].copy()
        nerr = int(err * reads.size)
        ei = rng.integers(0, nreads, nerr)
        ej = rng.integers(0, rlen, nerr)
        reads[ei, ej] = rng.integers(0, 4, nerr, dtype=np.uint8)
        for i in range(0, nreads, B):
            chunk = reads[i:i + B]
            if chunk.shape[0] < B:
                chunk = np.concatenate(
                    [chunk,
                     np.full((B - chunk.shape[0], rlen), 4, np.uint8)])
            batches.append((chunk, s))

    t0 = time.perf_counter()
    g = gbuild.build(batches, k, ncols=nsamp)
    g.keys.block_until_ready()
    t_build = time.perf_counter() - t0
    obs = nreads * (rlen - k + 1) * nsamp
    print(f"build: {t_build:.1f}s  {int(g.n)} kmers x {nsamp} colours "
          f"({obs / t_build / 1e6:.1f}M obs/s e2e)", file=sys.stderr)

    t0 = time.perf_counter()
    hist = gclean.covg_histogram(g)
    cutoff, *_ = gclean.pick_kmer_threshold(hist)
    thr = cutoff if cutoff > 0 else 2
    g2 = gclean.clean_graph(g, covg_threshold=thr, min_keep_tip=2 * k)
    g2.keys.block_until_ready()
    t_clean = time.perf_counter() - t0
    print(f"clean: {t_clean:.1f}s thr<{thr} {int(g.n)} -> {int(g2.n)}",
          file=sys.stderr)

    t0 = time.perf_counter()
    bubs = cbub.call_bubbles(g2, max_allele=80, max_flank=200)
    t_bub = time.perf_counter() - t0
    print(f"bubbles: {t_bub:.1f}s  {len(bubs)} calls", file=sys.stderr)

    gstr = "".join("ACGT"[c] for c in ref)
    refg = KO.RefGenome(["chr1"], [gstr])
    calls = [{"name": f"b{i}", "flank5p": bb.flank5p,
              "flank3p": bb.flank3p,
              "branches": [(j, br) for j, br in enumerate(bb.branches)]}
             for i, bb in enumerate(bubs)]
    t0 = time.perf_counter()
    recs, _ = c2v.bubbles_to_vcf(calls, refg, k)
    t_vcf = time.perf_counter() - t0
    print(f"calls2vcf: {t_vcf:.1f}s  {len(recs)} records",
          file=sys.stderr)

    # dedupe + sort records, attach samples
    seen = {}
    for r in sorted(recs, key=lambda r: r.pos):
        seen.setdefault((r.pos, r.ref, tuple(r.alts)), r)
    recs = list(seen.values())
    names = [f"s{i}" for i in range(nsamp)]
    vf = vcfio.VcfFile(
        headers=["##fileformat=VCFv4.2", "##contig=<ID=chr1>"],
        sample_names=names, records=recs)
    for r in vf.records:
        r.fmt = []
        r.samples = [dict() for _ in names]

    t0 = time.perf_counter()
    geno.vcfcov(vf, refg, g2)
    t_cov = time.perf_counter() - t0
    print(f"vcfcov: {t_cov:.1f}s", file=sys.stderr)

    kcov = cov * (rlen - k + 1) / rlen
    t0 = time.perf_counter()
    ndone, nskip = vg.genotype_vcf(
        vf, k, [kcov] * nsamp, [err] * nsamp, [1] * nsamp,
        [(rlen - k + 1)] * nsamp)
    t_geno = time.perf_counter() - t0
    print(f"vcfgeno: {t_geno:.1f}s ({ndone} done, {nskip} skipped)",
          file=sys.stderr)

    # sanity: recall of planted sites + genotype correctness
    by_pos = {r.pos: r for r in vf.records}
    hit = sum(1 for p in truth if p in by_pos)
    gt_ok = gt_tot = 0
    for p, carriers in truth.items():
        r = by_pos.get(p)
        if r is None or len(r.alts) != 1:
            continue
        # alt must match the planted base for carrier samples
        for s in range(nsamp):
            gt = r.samples[s].get("GT", ".")
            if gt in (".", ""):
                continue
            gt_tot += 1
            want = "1" if s in carriers else "0"
            if gt.split("/")[0].split("|")[0] == want:
                gt_ok += 1
    recall = hit / len(truth)
    gt_acc = gt_ok / max(gt_tot, 1)
    print(f"recall {hit}/{len(truth)} = {recall:.4f}, genotype acc "
          f"{gt_acc:.4f} over {gt_tot}", file=sys.stderr)

    print(json.dumps({
        "genome_mb": gmb, "n_samples": nsamp, "coverage": cov,
        "kmers": int(g2.n), "sites": len(truth),
        "build_s": round(t_build, 1), "clean_s": round(t_clean, 1),
        "bubbles_s": round(t_bub, 1), "n_bubbles": len(bubs),
        "calls2vcf_s": round(t_vcf, 1), "vcfcov_s": round(t_cov, 1),
        "vcfgeno_s": round(t_geno, 1),
        "snp_recall": round(recall, 4),
        "genotype_acc": round(gt_acc, 4),
    }))


if __name__ == "__main__":
    main()
