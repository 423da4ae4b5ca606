"""SAM/BAM ingest (native + python) and calls2vcf -F mapped flanks."""

import gzip
import struct

import numpy as np
import pytest

from util import random_dna, seq_to_codes


def write_sam(path, reads, chrom="chr1", header=True):
    """reads: list of (name, flag, pos1, mapq, cigar, seq, qual)."""
    with open(path, "w") as f:
        if header:
            f.write("@HD\tVN:1.6\tSO:coordinate\n")
            f.write(f"@SQ\tSN:{chrom}\tLN:100000\n")
        for name, flag, pos, mapq, cigar, seq, qual in reads:
            f.write(f"{name}\t{flag}\t{chrom}\t{pos}\t{mapq}\t{cigar}"
                    f"\t*\t0\t0\t{seq}\t{qual}\n")


def write_bam(path, reads, chrom="chr1"):
    code = "=ACMGRSVTWYHKDBN"
    out = b"BAM\x01"
    text = b"@HD\tVN:1.6\n"
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", 1)
    name = chrom.encode() + b"\x00"
    out += struct.pack("<i", len(name)) + name + struct.pack("<i", 100000)
    for qname, flag, seq in reads:
        s4 = bytearray()
        for i in range(0, len(seq), 2):
            hi = code.index(seq[i])
            lo = code.index(seq[i + 1]) if i + 1 < len(seq) else 0
            s4.append((hi << 4) | lo)
        qn = qname.encode() + b"\x00"
        body = struct.pack("<iiBBHHHiiii", 0, 0, len(qn), 60, 0, 0,
                           flag, len(seq), -1, -1, 0)
        body += qn + bytes(s4) + bytes([30] * len(seq))
        out += struct.pack("<i", len(body)) + body
    with gzip.open(path, "wb") as f:
        f.write(out)


def test_parse_reads_sam(tmp_path):
    from mccortex_tpu.io import seqio
    p = str(tmp_path / "r.sam")
    write_sam(p, [
        ("r1", 0, 1, 60, "10M", "ACGTACGTAA", "IIIIIIIIII"),
        ("r2", 16, 5, 60, "8M", "GGCCTTAA", "JJJJJJJJ"),
        ("sec", 256, 9, 60, "4M", "ACGT", "IIII"),      # secondary
        ("star", 0, 1, 60, "*", "*", "*"),               # no sequence
    ])
    reads = list(seqio.parse_reads(p))
    assert [r.name for r in reads] == ["r1", "r2"]
    assert reads[0].seq == "ACGTACGTAA"
    assert reads[0].quals[0] == ord("I") - 33


def test_parse_reads_bam(tmp_path):
    from mccortex_tpu.io import seqio
    p = str(tmp_path / "r.bam")
    write_bam(p, [("r1", 0, "ACGTACGTAA"),
                  ("r2", 16, "GGCCTTAA"),
                  ("sup", 0x800, "ACGT")])
    reads = list(seqio.parse_reads(p))
    assert [r.name for r in reads] == ["r1", "r2"]
    assert reads[0].seq == "ACGTACGTAA"
    assert reads[1].quals[0] == 30


def test_build_from_sam_and_bam_match_fasta(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctx as ictx
    from test_ctx_io import write_fasta
    k = 11
    g1 = random_dna(120, seed=950)
    g2 = random_dna(120, seed=951)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [g1, g2])
    sam = str(tmp_path / "r.sam")
    write_sam(sam, [("a", 0, 1, 60, "120M", g1, "I" * 120),
                    ("b", 0, 1, 60, "120M", g2, "I" * 120)])
    bam = str(tmp_path / "r.bam")
    write_bam(bam, [("a", 0, g1), ("b", 0, g2)])
    outs = []
    for src, name in ((fa, "fa.ctx"), (sam, "sam.ctx"), (bam, "bam.ctx")):
        out = str(tmp_path / name)
        assert mctx(["build", "-k", str(k), "--sample", "s",
                     "--seq", src, out]) == 0
        outs.append(ictx.read_ctx(out))
    for other in outs[1:]:
        np.testing.assert_array_equal(outs[0][1], other[1])  # keys
        np.testing.assert_array_equal(outs[0][2], other[2])  # covg
        np.testing.assert_array_equal(outs[0][3], other[3])  # edges


def test_calls2vcf_sam_flank_recovers_repetitive_flank(tmp_path):
    from mccortex_tpu.calls import calls2vcf as c2v
    from mccortex_tpu.graph import kmer_occur as KO
    k = 11
    dup = random_dna(40, seed=960)       # appears twice in the ref
    uniq1 = random_dna(60, seed=961)
    mid = random_dna(30, seed=962)
    tail = random_dna(60, seed=963)
    # variant site right after the SECOND dup copy
    ref_seq = uniq1 + dup + mid + dup + "A" + tail
    ref = KO.RefGenome(names=["chr1"], seqs=[ref_seq])
    var_pos = len(uniq1) + len(dup) + len(mid) + len(dup)
    f5 = dup                              # ends in a repeated kmer
    f3 = tail[:30]
    call = {"name": "call0", "flank5p": f5, "flank3p": f3,
            "branches": [("b0", "A"), ("b1", "C")]}
    # without SAM: 5' flank kmers are all duplicated -> dropped
    recs, dropped = c2v.bubbles_to_vcf([call], ref, k)
    assert dropped == 1 and not recs
    # SAM places the flank at the second copy
    sam = str(tmp_path / "flanks.sam")
    write_sam(sam, [("call0", 0,
                     len(uniq1) + len(dup) + len(mid) + 1, 60,
                     f"{len(dup)}M", f5, "I" * len(dup))])
    places = c2v.load_flank_sam(sam, ref, min_mapq=30)
    assert "call0" in places
    recs, dropped = c2v.bubbles_to_vcf([call], ref, k,
                                       sam_places=places)
    assert dropped == 0 and len(recs) == 1
    assert recs[0].pos == var_pos and recs[0].ref == "A" \
        and recs[0].alts == ["C"]
    # low-MAPQ entries are filtered out
    sam2 = str(tmp_path / "lowq.sam")
    write_sam(sam2, [("call0", 0,
                      len(uniq1) + len(dup) + len(mid) + 1, 5,
                      f"{len(dup)}M", f5, "I" * len(dup))])
    assert c2v.load_flank_sam(sam2, ref, min_mapq=30) == {}


def write_bam_aln(path, reads, chrom="chr1"):
    """Full-alignment BAM writer: reads = (name, flag, pos1, mapq,
    cigar_ops, seq) with cigar_ops a list of (length, opchar)."""
    code = "=ACMGRSVTWYHKDBN"
    ops = "MIDNSHP=X"
    out = b"BAM\x01"
    text = b"@HD\tVN:1.6\n"
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", 1)
    name = chrom.encode() + b"\x00"
    out += struct.pack("<i", len(name)) + name + struct.pack("<i", 100000)
    for qname, flag, pos1, mapq, cigar_ops, seq in reads:
        s4 = bytearray()
        for i in range(0, len(seq), 2):
            hi = code.index(seq[i])
            lo = code.index(seq[i + 1]) if i + 1 < len(seq) else 0
            s4.append((hi << 4) | lo)
        qn = qname.encode() + b"\x00"
        body = struct.pack("<iiBBHHHiiii", 0, pos1 - 1, len(qn), mapq,
                           0, len(cigar_ops), flag, len(seq), -1, -1, 0)
        body += qn
        for ln, opc in cigar_ops:
            body += struct.pack("<I", (ln << 4) | ops.index(opc))
        body += bytes(s4) + bytes([30] * len(seq))
        out += struct.pack("<i", len(body)) + body
    with gzip.open(path, "wb") as f:
        f.write(out)


def test_calls2vcf_bam_flank_round_trip(tmp_path):
    """-F accepts BAM directly (ref ctx_calls2vcf.c:24-46 reads SAM or
    BAM via htslib): same repetitive-flank scenario as the SAM test,
    flank placements from a BAM must produce the identical VCF record."""
    from mccortex_tpu.calls import calls2vcf as c2v
    from mccortex_tpu.graph import kmer_occur as KO
    k = 11
    dup = random_dna(40, seed=960)
    uniq1 = random_dna(60, seed=961)
    mid = random_dna(30, seed=962)
    tail = random_dna(60, seed=963)
    ref_seq = uniq1 + dup + mid + dup + "A" + tail
    ref = KO.RefGenome(names=["chr1"], seqs=[ref_seq])
    var_pos = len(uniq1) + len(dup) + len(mid) + len(dup)
    f5 = dup
    call = {"name": "call0", "flank5p": f5, "flank3p": tail[:30],
            "branches": [("b0", "A"), ("b1", "C")]}
    pos1 = len(uniq1) + len(dup) + len(mid) + 1
    bam = str(tmp_path / "flanks.bam")
    write_bam_aln(bam, [("call0", 0, pos1, 60, [(len(dup), "M")], f5)])
    places = c2v.load_flank_sam(bam, ref, min_mapq=30)
    assert places["call0"] == (0, pos1 - 1, pos1 - 1 + len(dup), 0, 60)
    recs, dropped = c2v.bubbles_to_vcf([call], ref, k,
                                       sam_places=places)
    assert dropped == 0 and len(recs) == 1
    assert recs[0].pos == var_pos and recs[0].ref == "A" \
        and recs[0].alts == ["C"]
    # MAPQ filter applies to BAM records too (-Q)
    bam2 = str(tmp_path / "lowq.bam")
    write_bam_aln(bam2, [("call0", 0, pos1, 5, [(len(dup), "M")], f5)])
    assert c2v.load_flank_sam(bam2, ref, min_mapq=30) == {}
    # soft-clip + deletion CIGAR: ref span counts M/D/N/=/X only
    bam3 = str(tmp_path / "clip.bam")
    write_bam_aln(bam3, [("call0", 0, pos1, 60,
                          [(5, "S"), (len(dup) - 5, "M"), (3, "D")], f5)])
    pl = c2v.load_flank_sam(bam3, ref, min_mapq=30)
    assert pl["call0"][2] - pl["call0"][1] == len(dup) - 5 + 3
