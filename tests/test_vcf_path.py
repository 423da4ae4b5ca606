"""Breakpoints + calls2vcf + vcfcov + vcfgeno tests (the M6 VCF path;
parallels ref tests/breakpoint, tests/vcfcov, tests/pipeline checks)."""

import gzip

import numpy as np
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.graph import kmer_occur as KO
from mccortex_tpu.calls import breakpoints as BK
from mccortex_tpu.calls import calls2vcf as C2V
from mccortex_tpu.calls import genotyping as GT
from mccortex_tpu.calls import vcfgeno as VG
from mccortex_tpu.align import nw
from mccortex_tpu.io import vcf as vcfio
from mccortex_tpu.io import callfile

from util import random_dna, revcomp_str
from test_graph_build import batchify
from test_ctx_io import write_fasta


def build_g(inputs, k, ncols=1):
    return gbuild.build(batchify(inputs), k, ncols=ncols)


def test_nw_align_and_decompose():
    ref = "ACGTACGTAAGGTTCCACGT"
    # SNP at 8 (A->C) and deletion of ref[12:15]
    alt = ref[:8] + "C" + ref[9:12] + ref[15:]
    recs = nw.decompose(ref, alt, 0, ref)
    assert (8, "A", "C") in recs
    dels = [r for r in recs if len(r[1]) > len(r[2])]
    assert len(dels) == 1
    p, r, a = dels[0]
    assert len(r) - len(a) == 3


def test_kograph_runs():
    k = 11
    ref_seq = random_dna(300, seed=600)
    g = build_g([(ref_seq, 0)], k)
    ref = KO.RefGenome(["chr1"], [ref_seq])
    ko = KO.build_kograph(g, ref)
    assert ko.noccurs == len(ref_seq) - k + 1
    # runs along the genome path itself: one colinear run
    from mccortex_tpu.links import thread as lthread
    import jax.numpy as jnp
    from util import seq_to_codes
    idx, orient, valid = lthread.reads_to_node_paths(
        g, jnp.asarray(seq_to_codes(ref_seq)[None]), k)
    verts = (np.asarray(idx)[0] * 2 + np.asarray(orient)[0])[
        np.asarray(valid)[0]]
    runs = KO.runs_of_path(ko, verts)
    assert len(runs) == 1
    assert runs[0]["first"] == 0 and runs[0]["strand"] == 0
    assert runs[0]["len"] == len(verts)


def test_breakpoint_deletion():
    k = 11
    ref_seq = random_dna(400, seed=610)
    # sample has a 60bp deletion
    sample = ref_seq[:170] + ref_seq[230:]
    g = build_g([(ref_seq, 0), (sample, 1)], k, ncols=2)
    ref = KO.RefGenome(["chr1"], [ref_seq])
    calls = BK.call_breakpoints(g, ref)
    assert len(calls) >= 1
    hits = [bp for bp in calls
            if bp.flank5p_run["chrom"] == 0
            and abs(bp.flank5p_run["last"] - (170 - k)) <= 1]
    assert hits, [(bp.flank5p_run, bp.flank3p_run) for bp in calls]
    bp = hits[0]
    assert 1 in bp.cols  # supported by the sample colour
    # decompose to VCF: one deletion of length 60
    records, dropped = C2V.breakpoints_to_vcf([bp], ref, k)
    assert len(records) >= 1
    dels = [r for r in records if len(r.ref) - len(r.alts[0]) == 60]
    assert dels, [(r.pos, r.ref[:5], r.alts) for r in records]


def test_cli_breakpoints_calls2vcf(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    k = 11
    ref_seq = random_dna(500, seed=620)
    sample = ref_seq[:200] + random_dna(40, seed=621) + ref_seq[200:]
    ref_fa = str(tmp_path / "ref.fa")
    s_fa = str(tmp_path / "s.fa")
    write_fasta(ref_fa, [ref_seq])
    write_fasta(s_fa, [sample])
    ctx = str(tmp_path / "g.ctx")
    calls = str(tmp_path / "bk.txt.gz")
    out_vcf = str(tmp_path / "out.vcf")
    assert mctx(["build", "-k", str(k), "--sample", "ref", "--seq", ref_fa,
                 "--sample", "s", "--seq", s_fa, ctx]) == 0
    assert mctx(["breakpoints", "--seq", ref_fa, "-o", calls, ctx]) == 0
    hdr, parsed = callfile.read_call_file(calls)
    assert hdr["file_format"] == "CtxBreakpoints"
    assert len(parsed) >= 1
    assert mctx(["calls2vcf", "-o", out_vcf, calls, ref_fa]) == 0
    vcf = vcfio.read_vcf(out_vcf)
    # 40bp insertion found at position ~200
    ins = [r for r in vcf.records if len(r.alts[0]) - len(r.ref) == 40]
    assert ins and abs(ins[0].pos - 200) <= k


def test_bubbles_to_vcf_snp(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    k = 11
    ref_seq = random_dna(300, seed=630)
    alt_base = "ACGT"[("ACGT".index(ref_seq[150]) + 1) % 4]
    sample = ref_seq[:150] + alt_base + ref_seq[151:]
    ref_fa = str(tmp_path / "ref.fa")
    s_fa = str(tmp_path / "s.fa")
    write_fasta(ref_fa, [ref_seq])
    write_fasta(s_fa, [sample])
    ctx = str(tmp_path / "g.ctx")
    bub = str(tmp_path / "bub.txt.gz")
    out_vcf = str(tmp_path / "out.vcf")
    assert mctx(["build", "-k", str(k), "--sample", "ref", "--seq", ref_fa,
                 "--sample", "s", "--seq", s_fa, ctx]) == 0
    assert mctx(["bubbles", "-o", bub, ctx]) == 0
    assert mctx(["calls2vcf", "-o", out_vcf, bub, ref_fa]) == 0
    vcf = vcfio.read_vcf(out_vcf)
    snps = [r for r in vcf.records
            if r.pos == 150 and r.ref == ref_seq[150]
            and r.alts == [alt_base]]
    assert snps, [(r.pos, r.ref, r.alts) for r in vcf.records]


def test_vcfcov_and_vcfgeno(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    k = 11
    ref_seq = random_dna(300, seed=640)
    alt_base = "ACGT"[("ACGT".index(ref_seq[150]) + 1) % 4]
    hap_alt = ref_seq[:150] + alt_base + ref_seq[151:]
    # sample A: hom ref (cov 4); sample B: hom alt (cov 4)
    ref_fa = str(tmp_path / "ref.fa")
    a_fa = str(tmp_path / "a.fa")
    b_fa = str(tmp_path / "b.fa")
    with open(ref_fa, "w") as fh:
        fh.write(f">chr1\n{ref_seq}\n")
    write_fasta(a_fa, [ref_seq] * 4)
    write_fasta(b_fa, [hap_alt] * 4)
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "A", "--seq", a_fa,
                 "--sample", "B", "--seq", b_fa, ctx]) == 0
    # hand-written VCF with the SNP
    in_vcf = str(tmp_path / "in.vcf")
    with open(in_vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write(f"chr1\t151\t.\t{ref_seq[150]}\t{alt_base}\t.\t.\t.\n")
    cov_vcf = str(tmp_path / "cov.vcf")
    assert mctx(["vcfcov", "-o", cov_vcf, "-r", ref_fa, in_vcf, ctx]) == 0
    vcf = vcfio.read_vcf(cov_vcf)
    r = vcf.records[0]
    tagR, tagA = f"K{k}R", f"K{k}A"
    # sample A: ref covg ~4, alt 0; sample B: opposite
    assert int(r.samples[0][tagR]) >= 3 and int(r.samples[0][tagA]) == 0
    assert int(r.samples[1][tagA]) >= 3 and int(r.samples[1][tagR]) == 0
    # genotype
    out_vcf = str(tmp_path / "geno.vcf")
    assert mctx(["vcfgeno", "-o", out_vcf, "-k", str(k), "--kcov", "4",
                 "--read-len", "300", cov_vcf]) == 0
    vg = vcfio.read_vcf(out_vcf)
    r = vg.records[0]
    assert r.samples[0]["GT"] == "0/0"
    assert r.samples[1]["GT"] == "1/1"
    assert int(r.samples[0]["GQ"]) >= 0


def test_vcfgeno_het():
    # synthetic: coverage split between ref and alt -> het call
    vcf = vcfio.VcfFile(
        headers=["##fileformat=VCFv4.2"], sample_names=["s"],
        records=[vcfio.VcfRecord(
            chrom="c", pos=100, vid=".", ref="A", alts=["T"],
            fmt=["K11R", "K11A"],
            samples=[{"K11R": "10", "K11A": "11"}])])
    ndone, nskip = VG.genotype_vcf(vcf, 11, kcovs=[20.0], errs=[0.01],
                                   ploidy_spec=[2], readlensk=[90])
    assert ndone == 1
    assert vcf.records[0].samples[0]["GT"] == "0/1"
    # hom-ref when alt covg 0
    vcf.records[0].samples[0].update({"K11R": "20", "K11A": "0"})
    VG.genotype_record(vcf.records[0], 11, [20.0], [0.01], [2], [90],
                       "K11R", "K11A")
    assert vcf.records[0].samples[0]["GT"] == "0/0"


def test_breakpoint_repetitive_flank_run_lists(tmp_path):
    """A 5' flank occurring at two ref positions must list BOTH colinear
    runs in the call file (ref breakpoint_caller.c:534-570 emits every
    KOccurRun per flank), each with a 1-based qoffset field."""
    from mccortex_tpu.cli.main import main as mctx
    k = 11
    dup = random_dna(40, seed=710)
    a = random_dna(80, seed=711)
    b = random_dna(80, seed=712)
    tail = random_dna(80, seed=713)
    ins = random_dna(30, seed=714)
    # dup appears twice; the sample inserts right after the SECOND copy
    ref_seq = a + dup + b + dup + tail
    sample = a + dup + b + dup + ins + tail
    ref_fa = str(tmp_path / "ref.fa")
    s_fa = str(tmp_path / "s.fa")
    write_fasta(ref_fa, [ref_seq])
    write_fasta(s_fa, [sample])
    ctx = str(tmp_path / "g.ctx")
    calls = str(tmp_path / "bk.txt.gz")
    assert mctx(["build", "-k", str(k), "--sample", "ref", "--seq",
                 ref_fa, "--sample", "s", "--seq", s_fa, ctx]) == 0
    assert mctx(["breakpoints", "--seq", ref_fa, "-o", calls, ctx]) == 0
    hdr, parsed = callfile.read_call_file(calls)
    assert hdr["format_version"] == 4
    multi = [c for c in parsed
             if c["flank5p_hdr"].split("chr=")[1].count(",") >= 1]
    assert multi, [c["flank5p_hdr"] for c in parsed]
    # every run annotation has the 4-field form name:start-end:strand:qoff
    for c in multi:
        for body in c["flank5p_hdr"].split("chr=")[1].split()[0].split(","):
            parts = body.rsplit(":", 3)
            assert len(parts) == 4 and parts[2] in "+-" \
                and parts[3].isdigit(), body


def test_calls2vcf_largest_run_choice():
    """Run choice changes the VCF position: the consumer must pick the
    LONGEST run per flank (ties: 5' highest qoffset, 3' lowest), not the
    first listed (ref decomp_brkpt_call + chrom_pos_list_get_largest)."""
    from mccortex_tpu.cli.commands3 import (_breakpoint_calls_to_vcf,
                                            _largest_run,
                                            _parse_chr_runs)
    from mccortex_tpu.calls import calls2vcf as c2v
    k = 11
    dup = random_dna(40, seed=720)
    a = random_dna(60, seed=721)
    b = random_dna(49, seed=722)
    tail = random_dna(80, seed=723)
    # copy 1 of dup at 60..99; copy 2 (with 11 bases of shared left
    # context) at 120..159; deletion of 20 ref bases after copy 2
    ext = b[-k:]
    ref_seq = a + dup + b + ext + dup + random_dna(20, seed=724) + tail
    ref = KO.RefGenome(["chr1"], [ref_seq])
    flank5 = ext + dup    # matches copy 2 for 51bp, copy 1 for 40bp
    p1 = len(a)                      # copy-1 kmer-start of dup
    p2 = len(a) + len(dup) + len(b)  # ext start before copy 2
    # 5' header lists the SHORT (wrong, copy-1) run first
    run_short = f"chr1:{p1 + 1}-{p1 + len(dup)}:+:{len(ext) + 1}"
    run_long = f"chr1:{p2 + 1}-{p2 + len(ext) + len(dup)}:+:1"
    t3 = p2 + len(ext) + len(dup) + 20   # 3' contact after deletion
    run3 = f"chr1:{t3 + 1}-{t3 + 40}:+:1"
    call = {"name": "brkpnt.call0",
            "flank5p_hdr": f"brkpnt.call0.5pflank chr={run_short},{run_long}",
            "flank3p_hdr": f"brkpnt.call0.3pflank chr={run3}",
            "flank5p": flank5, "flank3p": ref_seq[t3:t3 + 40],
            "branches": [("path", "")]}
    name_idx = {"chr1": 0}
    runs5 = _parse_chr_runs(call, "flank5p", name_idx, k)
    assert len(runs5) == 2
    chosen = _largest_run(runs5, use_first=False)
    assert chosen["len"] == len(ext) + len(dup) - k + 1  # the long run
    records, dropped = _breakpoint_calls_to_vcf([call], ref, k, c2v)
    assert dropped == 0 and records
    # deletion called AFTER copy 2 (ref pos ~ p2+ext+dup), not copy 1
    assert records[0].pos >= p2, (records[0].pos, p2)
    # tie-break: equal lengths -> 5' prefers the higher qoffset,
    # 3' the lower
    ra = {"chrom": 0, "first": 10, "last": 20, "strand": 0,
          "qoffset": 0, "len": 11}
    rb = dict(ra, first=50, last=60, qoffset=5)
    assert _largest_run([ra, rb], use_first=False) is rb
    assert _largest_run([ra, rb], use_first=True) is ra


def test_breakpoint_minus_strand_call_decomposes(tmp_path):
    """A call whose flanks map to the minus strand must decompose to
    the same variant as its plus-strand twin (ref decomp_brkpt_call
    revcomps the branch and swaps the flank roles)."""
    from mccortex_tpu.cli.main import main as mctx
    import gzip
    k = 11
    ref_seq = random_dna(400, seed=610)
    sample = ref_seq[:170] + ref_seq[230:]       # 60bp deletion
    ref_fa = str(tmp_path / "ref.fa")
    s_fa = str(tmp_path / "s.fa")
    write_fasta(ref_fa, [ref_seq])
    write_fasta(s_fa, [sample])
    ctx = str(tmp_path / "g.ctx")
    calls = str(tmp_path / "bk.txt.gz")
    assert mctx(["build", "-k", str(k), "--sample", "ref", "--seq",
                 ref_fa, "--sample", "s", "--seq", s_fa, ctx]) == 0
    assert mctx(["breakpoints", "--seq", ref_fa, "-o", calls, ctx]) == 0
    text = gzip.open(calls, "rt").read()
    assert ":-:" in text, "expected a minus-strand call"
    # keep ONLY minus-strand calls in the file
    lines = text.split("\n")
    out_lines, keep, block = [], False, []
    hdr_done = False
    for ln in lines:
        if ln.startswith(">") and ln.split()[0].endswith("5pflank"):
            block = [ln]
            keep = ":-:" in ln
        elif block:
            block.append(ln)
            if ln == "" and len(block) > 5:
                if keep:
                    out_lines.extend(block)
                block = []
        elif not ln.startswith(">"):
            out_lines.append(ln)      # JSON header + comments
    minus_calls = str(tmp_path / "minus.txt.gz")
    with gzip.open(minus_calls, "wt") as fh:
        fh.write("\n".join(out_lines) + "\n")
    out_vcf = str(tmp_path / "minus.vcf")
    assert mctx(["calls2vcf", "-o", out_vcf, minus_calls, ref_fa]) == 0
    vcf = vcfio.read_vcf(out_vcf)
    dels = [r for r in vcf.records
            if len(r.ref) - len(r.alts[0]) == 60]
    assert dels, [(r.pos, len(r.ref), len(r.alts[0]))
                  for r in vcf.records]
    # and the full file (both strands) dedups to one deletion record
    all_vcf = str(tmp_path / "all.vcf")
    assert mctx(["calls2vcf", "-o", all_vcf, calls, ref_fa]) == 0
    vcf2 = vcfio.read_vcf(all_vcf)
    dels2 = [r for r in vcf2.records
             if len(r.ref) - len(r.alts[0]) == 60]
    assert len(dels2) == 1 and dels2[0].pos == dels[0].pos
