"""mctx pipeline — the full multi-sample workflow in one command.

Role of ref scripts/make-pipeline.pl: chain
build -> clean -> (join) -> thread -> links-clean -> bubbles/breakpoints
-> calls2vcf -> vcfcov -> vcfgeno (make-pipeline.pl:186-198).  The
reference emits a Makefile; here the steps run directly (each stage's
output file is the checkpoint — a stage is skipped if its output already
exists, mirroring make's resume semantics; --force reruns everything).
"""

from __future__ import annotations

import argparse
import os

from .main import register
from .commands import _status


def cmd_pipeline(argv):
    p = argparse.ArgumentParser(prog="mctx pipeline")
    p.add_argument("-k", "--kmer", type=int, required=True)
    p.add_argument("--sample", action="append", required=True,
                   metavar="NAME:READS[,READS2]",
                   help="sample name and read file(s)")
    p.add_argument("--ref", default=None,
                   help="reference FASTA (enables breakpoints + vcf)")
    p.add_argument("-o", "--outdir", required=True)
    p.add_argument("--no-clean", action="store_true")
    p.add_argument("--clean-threshold", type=int, default=0,
                   help="fixed cleaning threshold (default: auto+fallback 2)")
    p.add_argument("--gap-fill", action="store_true", default=True)
    p.add_argument("--kcov", default=None,
                   help="per-sample kmer coverage for genotyping")
    p.add_argument("--ploidy", default="2")
    p.add_argument("--force", action="store_true")
    args = p.parse_args(argv)

    from .main import main as mctx
    k = args.kmer
    out = args.outdir
    os.makedirs(out, exist_ok=True)
    samples = []
    for spec in args.sample:
        name, files = spec.split(":", 1)
        samples.append((name, files.split(",")))

    def step(outfile, cmd):
        if not args.force and os.path.exists(outfile):
            _status(f"pipeline: {outfile} exists, skipping")
            return
        # inner commands refuse to overwrite without -f; a partial
        # output from an interrupted run must not wedge the resume
        cmd = [cmd[0], "-f"] + cmd[1:]
        _status(f"pipeline: mctx {' '.join(cmd)}")
        rc = mctx(cmd)
        if rc != 0:
            raise RuntimeError(f"pipeline step failed: {cmd}")

    # 1. per-sample build (+ optional clean)
    sample_graphs = []
    for name, files in samples:
        raw = f"{out}/{name}.raw.ctx"
        cmd = ["build", "-k", str(k), "--sample", name]
        for f in files:
            cmd += ["--seq", f]
        cmd.append(raw)
        step(raw, cmd)
        if args.no_clean:
            sample_graphs.append(raw)
        else:
            cln = f"{out}/{name}.clean.ctx"
            if args.clean_threshold:
                step(cln, ["clean", "--unitigs",
                           str(args.clean_threshold), "-o", cln, raw])
            else:
                step(cln, ["clean", "--unitigs", "--fallback", "2",
                           "-o", cln, raw])
            sample_graphs.append(cln)

    # 2. join into one multi-colour graph (+ ref as last colour if given)
    joined = f"{out}/joint.ctx"
    jcmd = ["join", "-o", joined] + sample_graphs
    step(joined, jcmd)

    # 3. per-sample links against the joint graph
    ctps = []
    for ci, (name, files) in enumerate(samples):
        ctp = f"{out}/{name}.ctp.gz"
        cmd = ["thread", "--colour", str(ci)]
        if args.gap_fill:
            cmd.append("--gap-fill")
        for f in files:
            cmd += ["--seq", f]
        cmd += ["-o", ctp, joined]
        step(ctp, cmd)
        ctps.append(ctp)
    merged_ctp = f"{out}/joint.ctp.gz"
    step(merged_ctp, ["pjoin", "-o", merged_ctp, joined] + ctps)

    # 4. bubbles (+ breakpoints when a reference is given)
    bub = f"{out}/bubbles.txt.gz"
    step(bub, ["bubbles", "-o", bub, "-p", merged_ctp, joined])
    call_files = [bub]
    if args.ref:
        brk = f"{out}/breakpoints.txt.gz"
        step(brk, ["breakpoints", "--seq", args.ref, "-p", merged_ctp,
                   "-o", brk, joined])
        call_files.append(brk)

    # 5. VCF
    if args.ref:
        vcfs = []
        for cf in call_files:
            base = os.path.basename(cf).split(".")[0]
            v = f"{out}/{base}.vcf"
            step(v, ["calls2vcf", "-o", v, cf, args.ref])
            vcfs.append(v)
        # merge record lists
        from ..io import vcf as vcfio
        merged = f"{out}/calls.vcf"
        if args.force or not os.path.exists(merged):
            allrecs = []
            hdrs = None
            for v in vcfs:
                vf = vcfio.read_vcf(v)
                hdrs = hdrs or vf.headers
                allrecs.extend(vf.records)
            seen = {}
            for r in sorted(allrecs, key=lambda r: (r.chrom, r.pos)):
                seen.setdefault((r.chrom, r.pos, r.ref, tuple(r.alts)), r)
            vcfio.write_vcf(merged, vcfio.VcfFile(
                headers=hdrs or [], sample_names=[],
                records=list(seen.values())))
        cov = f"{out}/calls.cov.vcf"
        step(cov, ["vcfcov", "-o", cov, "-r", args.ref, merged, joined])
        if args.kcov:
            geno = f"{out}/calls.geno.vcf"
            step(geno, ["vcfgeno", "-o", geno, "-k", str(k),
                        "--kcov", args.kcov, "--ploidy", args.ploidy,
                        cov])
    _status(f"pipeline complete -> {out}/")
    return 0


register("pipeline", cmd_pipeline, "run the full multi-sample workflow")
