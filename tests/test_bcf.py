"""BCF 2.2 round-trip + BGZF container validity."""

import gzip
import struct

import numpy as np

from mccortex_tpu.io import bcf, vcf as vcfio


def _mk_vcf():
    headers = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chr1,length=5000>",
        "##contig=<ID=chr2,length=3000>",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="depth">',
        '##FORMAT=<ID=K21R,Number=A,Type=Integer,Description="x">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">',
    ]
    recs = [
        vcfio.VcfRecord(chrom="chr1", pos=99, vid="v1", ref="A",
                        alts=["C"], qual=".", filt="PASS",
                        info={"DP": 33},
                        fmt=["K21R"], samples=[{"K21R": 7},
                                               {"K21R": "."}]),
        vcfio.VcfRecord(chrom="chr2", pos=4, vid=".", ref="AT",
                        alts=["A", "ATT"], qual="50", filt="PASS",
                        info={},
                        fmt=["GT"], samples=[{"GT": "0/1"},
                                             {"GT": "1/1"}]),
    ]
    return vcfio.VcfFile(headers=headers, sample_names=["s1", "s2"],
                         records=recs)


def test_bcf_roundtrip(tmp_path):
    v = _mk_vcf()
    p = str(tmp_path / "t.bcf")
    bcf.write_bcf(p, v)
    v2 = bcf.read_bcf(p)
    assert v2.sample_names == ["s1", "s2"]
    assert len(v2.records) == 2
    r0, r1 = v2.records
    assert (r0.chrom, r0.pos, r0.vid, r0.ref, r0.alts) == \
        ("chr1", 99, "v1", "A", ["C"])
    assert r0.info == {"DP": 33}
    assert r0.samples[0]["K21R"] == 7 and r0.samples[1]["K21R"] == "."
    assert (r1.chrom, r1.pos, r1.ref, r1.alts) == \
        ("chr2", 4, "AT", ["A", "ATT"])
    assert r1.samples[0]["GT"] == "0/1" and r1.samples[1]["GT"] == "1/1"
    assert r1.qual == "50"


def test_bgzf_container_structure(tmp_path):
    # each gzip member must carry the BC extra subfield with BSIZE and
    # the file must end with the 28-byte BGZF EOF marker (htslib checks)
    v = _mk_vcf()
    p = str(tmp_path / "t.bcf")
    bcf.write_bcf(p, v)
    raw = open(p, "rb").read()
    assert raw[:4] == b"\x1f\x8b\x08\x04"
    xlen = struct.unpack("<H", raw[10:12])[0]
    assert raw[12:14] == b"BC" and xlen == 6
    bsize = struct.unpack("<H", raw[16:18])[0] + 1
    assert raw[bsize:bsize + 4] in (b"\x1f\x8b\x08\x04", b"")
    assert raw.endswith(bcf._BGZF_EOF)
    # python gzip must also read it transparently
    assert gzip.decompress(raw)[:5] == b"BCF\x02\x02"


def test_vcfcov_bcf_output(tmp_path):
    # the vcfcov CLI round-trips through BCF when the extension says so
    from mccortex_tpu.cli.main import main as mctx
    from util import random_dna
    from test_ctx_io import write_fasta
    k = 11
    genome = random_dna(200, seed=1200)
    alt = genome[:100] + ("A" if genome[100] != "A" else "C") \
        + genome[101:]
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [genome, alt])
    ref_fa = str(tmp_path / "ref.fa")
    with open(ref_fa, "w") as f:
        f.write(f">chr1\n{genome}\n")
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq", fa, ctx]) == 0
    invcf = str(tmp_path / "in.vcf")
    with open(invcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID=chr1,length={len(genome)}>\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(f"chr1\t101\tv1\t{genome[100]}\t{alt[100]}\t.\tPASS\t.\n")
    outbcf = str(tmp_path / "out.bcf")
    assert mctx(["vcfcov", "-o", outbcf, "-r", ref_fa, invcf,
                 ctx]) == 0
    v = vcfio.read_variants(outbcf)
    assert len(v.records) == 1
    r = v.records[0]
    assert r.pos == 100 and r.ref == genome[100]
    ktags = [kk for kk in r.fmt if kk.startswith("K")]
    assert len(ktags) == 2
    assert all(isinstance(r.samples[0][t], (int,)) or
               r.samples[0][t] == "." for t in ktags)
