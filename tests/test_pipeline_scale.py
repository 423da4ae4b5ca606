"""Reference-scale end-to-end gate (VERDICT r2 item 5): two diploid
samples over a 50kb genome with SNPs + deletions + insertions and a
tandem-repeat region, full pipeline to genotyped VCF, truth-VCF
intersection — no truth variant may be missed (ref
tests/pipeline/Makefile:34-44 semantics at readsim-like scale)."""

import os
import random

import pytest

from mccortex_tpu.cli.main import main as mctx
from mccortex_tpu.io import vcf as vcfio

from util import random_dna
from test_pipeline import simulate_reads


def _apply_variants(seq, variants):
    """variants: list of (pos0, ref, alt) sorted by pos; non-overlapping."""
    out = []
    last = 0
    for pos, r, a in sorted(variants):
        out.append(seq[last:pos])
        out.append(a)
        last = pos + len(r)
    out.append(seq[last:])
    return "".join(out)


@pytest.mark.slow
def test_pipeline_diploid_50kb(tmp_path):
    rng = random.Random(515151)
    k = 31
    G = 50_000
    base = random_dna(G, seed=4100)
    # tandem repeat region: an 60bp unit duplicated at position 30k
    unit = base[30_000:30_060]
    ref = base[:30_060] + unit + base[30_060:]

    # truth variants (pos0 on REF coords, ref-str, alt-str), spread out
    # and clear of the repeat; SNPs + dels + insertions
    truth = []
    snp_pos = [2_000, 6_500, 11_000, 17_500, 22_000, 27_000,
               36_000, 41_000, 46_000, 48_500]
    for pp in snp_pos:
        alt = "ACGT"[("ACGT".index(ref[pp]) + 1) % 4]
        truth.append((pp, ref[pp], alt))
    dels = [(8_000, 5), (38_500, 12)]
    for pp, ln in dels:
        truth.append((pp, ref[pp:pp + ln + 1], ref[pp]))
    inss = [(14_000, random_dna(6, seed=4201)),
            (44_000, random_dna(10, seed=4202))]
    for pp, insseq in inss:
        truth.append((pp, ref[pp], ref[pp] + insseq))

    # genotype matrix: sample1 carries the first half het, second half
    # absent; sample2 carries the second half (hom) + one shared SNP
    t_sorted = sorted(truth)
    half = len(t_sorted) // 2
    s1_vars = t_sorted[:half] + [t_sorted[half]]
    s2_vars = t_sorted[half:]
    s1a, s1b = ref, _apply_variants(ref, s1_vars)          # het
    s2a = s2b = _apply_variants(ref, s2_vars)              # hom

    # ~20x per haplotype, 0.3% error
    r1 = simulate_reads(s1a, s1b, 40 * G // 100, 100, 0.003, rng)
    r2 = simulate_reads(s2a, s2b, 40 * G // 100, 100, 0.003, rng)

    ref_fa = str(tmp_path / "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(f">ref\n{ref}\n")
    files = []
    for nm, reads in (("s1", r1), ("s2", r2)):
        f = str(tmp_path / f"{nm}.fa")
        with open(f, "w") as fh:
            for i, r in enumerate(reads):
                fh.write(f">{nm}_{i}\n{r}\n")
        files.append(f)

    outdir = str(tmp_path / "pipe")
    rc = mctx(["pipeline", "-k", str(k),
               "--sample", f"s1:{files[0]}", "--sample", f"s2:{files[1]}",
               "--ref", ref_fa, "--kcov", "28,28",
               "-o", outdir])
    assert rc == 0
    vcf = vcfio.read_vcf(os.path.join(outdir, "calls.cov.vcf"))

    # truth intersection (ref: bcftools isec, fail on any missed truth
    # variant).  Indels may be left-shifted within k: accept any record
    # with the same length change within k of the truth position.
    found_exact = {(r.pos, r.ref, r.alts[0]) for r in vcf.records}
    missed = []
    for (pp, rr, aa) in truth:
        if (pp, rr, aa) in found_exact:
            continue
        dlen = len(aa) - len(rr)
        near = [r for r in vcf.records
                if abs(r.pos - pp) <= k
                and (len(r.alts[0]) - len(r.ref)) == dlen]
        if dlen == 0 or not near:
            missed.append((pp, rr[:8], aa[:8]))
    assert not missed, (len(missed), missed,
                        sorted(found_exact)[:20])

    # genotyped VCF: GT present for both samples
    geno = vcfio.read_vcf(os.path.join(outdir, "calls.geno.vcf"))
    assert geno.records and "GT" in geno.records[0].fmt
    # samples + the appended ref colour (make-pipeline.pl joins the
    # reference in as the last graph colour)
    assert geno.sample_names == ["s1", "s2", "ref"]
