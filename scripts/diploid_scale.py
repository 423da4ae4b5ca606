"""Diploid breakpoints+genotyping recipe at chr22-1Mbp-like scale
(BASELINE configs 3-4 analog; ref results/var_calling_diploid_chr22_1Mbp/).

One diploid sample (het SNPs/indels) + one hom sample carrying a 400bp
deletion over a G-sized genome with a tandem repeat; full `mctx
pipeline` (build -> clean -> thread -> bubbles + breakpoints ->
calls2vcf -> vcfcov -> vcfgeno), wall-clock timed, truth recall and
the 400bp breakpoint-deletion asserted.

Usage: python scripts/diploid_scale.py [genome_mb] [outdir]
Prints one JSON line.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import random
import shutil
import sys
import time


def _random_dna(n, rng):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _apply_variants(seq, variants):
    out, last = [], 0
    for pos, r, a in sorted(variants):
        out.append(seq[last:pos])
        out.append(a)
        last = pos + len(r)
    out.append(seq[last:])
    return "".join(out)


_COMP = str.maketrans("ACGT", "TGCA")


def main():
    gmb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mctx_diploid"
    G = int(gmb * 1e6)
    k, rlen, err = 31, 100, 0.003
    rng = random.Random(616161)

    import _tpu_wait
    _tpu_wait.arm_watchdog({"phase": "diploid_scale"})
    import jax  # noqa: F401
    _tpu_wait.wait_backend()
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import vcf as vcfio

    base = _random_dna(G, rng)
    unit = base[G // 3:G // 3 + 60]
    ref = base[:G // 3 + 60] + unit + base[G // 3 + 60:]

    # truth: 1 SNP / ~7kb, indels 3-25bp / ~50kb, away from the repeat
    truth = []
    p = 2000
    while p < G - 2000:
        if abs(p - G // 3) > 1000:
            alt = "ACGT"[("ACGT".index(ref[p]) + 1) % 4]
            truth.append((p, ref[p], alt))
        p += 7000 + rng.randrange(0, 500)
    p = 5000
    i = 0
    while p < G - 2000:
        if abs(p - G // 3) > 1000:
            ln = (3, 5, 12, 25, 6, 10, 18, 4)[i % 8]
            if i % 2 == 0:
                truth.append((p, ref[p:p + ln + 1], ref[p]))
            else:
                truth.append((p, ref[p], ref[p] + _random_dna(ln, rng)))
            i += 1
        p += 50_000 + rng.randrange(0, 1000)
    BRK_POS, BRK_LEN = int(0.7 * G), 400

    t_sorted = sorted(truth)
    half = len(t_sorted) // 2
    s1_vars = t_sorted[:half]
    s2_vars = t_sorted[half:] + [
        (BRK_POS, ref[BRK_POS:BRK_POS + BRK_LEN + 1], ref[BRK_POS])]
    s1a, s1b = ref, _apply_variants(ref, s1_vars)      # het
    s2hap = _apply_variants(ref, s2_vars)              # hom

    print(f"diploid {gmb}Mb: {len(truth)} truth variants "
          f"({half} het s1 / {len(truth) - half} hom s2) "
          f"+ {BRK_LEN}bp deletion", file=sys.stderr)

    if os.path.isdir(outdir):
        shutil.rmtree(outdir)
    os.makedirs(outdir, exist_ok=True)
    ref_fa = f"{outdir}/ref.fa"
    with open(ref_fa, "w") as fh:
        fh.write(f">ref\n{ref}\n")

    def sim_reads(path, haps, cov):
        n = cov * len(haps[0]) // rlen
        with open(path, "w") as fh:
            for i in range(n):
                hap = haps[i % len(haps)]
                pos = rng.randrange(0, len(hap) - rlen)
                r = list(hap[pos:pos + rlen])
                for j in range(len(r)):
                    if rng.random() < err:
                        r[j] = rng.choice("ACGT")
                r = "".join(r)
                if rng.random() < 0.5:
                    r = r.translate(_COMP)[::-1]
                fh.write(f">r{i}\n{r}\n")

    t0 = time.perf_counter()
    f1 = f"{outdir}/s1.fa"
    f2 = f"{outdir}/s2.fa"
    sim_reads(f1, [s1a, s1b], 40)
    sim_reads(f2, [s2hap], 40)
    t_sim = time.perf_counter() - t0
    samples_txt = f"{outdir}/samples.txt"
    with open(samples_txt, "w") as fh:
        fh.write(f"s1 {f1} . .\n")
        fh.write(f"s2 {f2} . .\n")

    kcov = 40 * (rlen - k + 1) // rlen
    t0 = time.perf_counter()
    rc = mctx(["pipeline", "-k", str(k), "--samples", samples_txt,
               "--ref", ref_fa, "--kcov", f"{kcov},{kcov}",
               "-o", f"{outdir}/pipe"])
    t_pipe = time.perf_counter() - t0
    if rc != 0:
        print(json.dumps({"error": f"pipeline rc={rc}"}))
        return

    vcf = vcfio.read_vcf(f"{outdir}/pipe/calls.cov.vcf")
    found = {(r.pos, r.ref, r.alts[0]) for r in vcf.records}
    missed = []
    for (pp, rr, aa) in truth:
        if (pp, rr, aa) in found:
            continue
        dlen = len(aa) - len(rr)
        near = [r for r in vcf.records
                if abs(r.pos - pp) <= k
                and (len(r.alts[0]) - len(r.ref)) == dlen]
        if dlen == 0 or not near:
            missed.append(pp)
    big_dels = [r for r in vcf.records
                if len(r.ref) - len(r.alts[0]) >= BRK_LEN - 2 * k
                and abs(r.pos - BRK_POS) <= 2 * k]
    geno = vcfio.read_vcf(f"{outdir}/pipe/calls.geno.vcf")
    n_gt = sum(1 for r in geno.records
               if r.samples and "GT" in r.fmt)

    print(json.dumps({
        "metric": "diploid_pipeline",
        "genome_mb": gmb, "k": k,
        "n_truth": len(truth),
        "n_missed": len(missed),
        "recall": round(1 - len(missed) / len(truth), 4),
        "brk_deletion_found": bool(big_dels),
        "n_vcf_records": len(vcf.records),
        "n_genotyped": n_gt,
        "sim_s": round(t_sim, 1),
        "pipeline_s": round(t_pipe, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
