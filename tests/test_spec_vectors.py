"""Independent spec vectors (VERDICT r4 item 8): fixtures constructed
BY HAND from the published format specs — never by this repo's writers
— to break the golden-file circularity (our goldens prove
byte-stability; these prove spec conformance).

Sources:
- .ctx: /root/reference/docs/file_formats/graph_file_format.txt:1-52
  (v6 header layout) + src/basic/db_node.h edge-bit semantics (the
  doc's nibble picture is mirrored relative to the code; binaries come
  from the code, so the code wins).
- .ctp: the v4 text format of src/graph_paths/gpath_save.c (JSON
  header + '<kmer> <n>' / '[FR] <nj> <counts> <juncs>' lines).
- BCF: samtools hts-specs VCFv4.3 section 6 (BCF2.2 encoding),
  including the spec GT int coding (allele+1)<<1|phased and BGZF
  framing with the BC extra subfield.
"""

import json
import struct
import zlib

import numpy as np

from mccortex_tpu.io import ctx as ctxio


# ---------------------------------------------------------------------------
# .ctx v6
# ---------------------------------------------------------------------------

def _pack_kmer5(s):
    """2 bits/base, base j at bit 2*(k-1-j) (binary_kmer.h layout)."""
    v = 0
    for ch in s:
        v = (v << 2) | "ACGT".index(ch)
    return v


def _x87(x: float) -> bytes:
    """80-bit x87 extended in 16 bytes (little-endian, 6 pad bytes) —
    only exact powers of two needed here."""
    if x == 0.0:
        return b"\x00" * 16
    import math
    e = int(math.log2(x))
    assert 2.0 ** e == x, "fixture uses exact powers of two"
    biased = 16383 + e
    return (b"\x00" * 7 + b"\x80" + struct.pack("<H", biased)
            + b"\x00" * 6)


def test_ctx_v6_spec_vector(tmp_path):
    k, W, ncols = 5, 1, 2
    # canonical k=5 kmers (lexicographic min of fwd/revcmp), ascending
    kmers = ["AACGT", "ACGCA", "CCCCC"]
    covg = [(7, 0), (1, 2), (3, 3)]
    # AACGT followed by C (bit 1), preceded by T (rev: comp(T)=A ->
    # bit 4) in colour 0 -> 0x12; colour 1 empty
    edges = [(0x12, 0x00), (0x00, 0x21), (0x88, 0x01)]

    b = bytearray()
    b += b"CORTEX"
    b += struct.pack("<4I", 6, k, W, ncols)        # version, k, W, cols
    b += struct.pack("<2I", 100, 90)               # mean read lengths
    b += struct.pack("<2Q", 123456, 98765)         # total sequence
    for name in (b"alpha", b"b2"):                 # sample names
        b += struct.pack("<I", len(name)) + name
    b += _x87(0.5) + _x87(0.25)                    # long double seq_err
    for _ in range(ncols):                         # cleaning block
        b += bytes([1, 0, 1, 0])                   # tip clip, sup, kmer,
        b += struct.pack("<2I", 0, 2)              # against-graph thresh
        b += struct.pack("<I", 0)                  # cleaned-against name
    b += b"CORTEX"
    for s, cv, ed in zip(kmers, covg, edges):
        b += struct.pack("<Q", _pack_kmer5(s))
        b += struct.pack("<2I", *cv)
        b += bytes(ed)

    path = tmp_path / "spec.ctx"
    path.write_bytes(bytes(b))

    hdr, keys, cov, edg = ctxio.read_ctx(str(path))
    assert hdr.kmer_size == k and hdr.ncols == ncols
    assert [g.sample_name for g in hdr.ginfo] == ["alpha", "b2"]
    assert [g.seq_err for g in hdr.ginfo] == [0.5, 0.25]
    assert [g.mean_read_length for g in hdr.ginfo] == [100, 90]
    assert [g.total_sequence for g in hdr.ginfo] == [123456, 98765]
    from mccortex_tpu.utils.text import kmers_to_strings
    assert kmers_to_strings(np.asarray(keys), k) == kmers
    np.testing.assert_array_equal(np.asarray(cov),
                                  np.array(covg, np.uint32))
    np.testing.assert_array_equal(np.asarray(edg),
                                  np.array(edges, np.uint8))


def test_ctx_v6_spec_vector_roundtrip_writer(tmp_path):
    """Our writer must reproduce the hand-packed bytes for the same
    content (headers carry no free-form provenance in .ctx v6)."""
    k, ncols = 5, 2
    kmers = ["AACGT", "ACGCA", "CCCCC"]
    keys = np.array([[_pack_kmer5(s)] for s in kmers], np.uint64)
    cov = np.array([(7, 0), (1, 2), (3, 3)], np.uint32)
    edg = np.array([(0x12, 0x00), (0x00, 0x21), (0x88, 0x01)], np.uint8)
    ginfo = []
    for nm, ml, ts, se, thr in (("alpha", 100, 123456, 0.5, 2),
                                ("b2", 90, 98765, 0.25, 2)):
        gi = ctxio.GraphInfo(sample_name=nm, mean_read_length=ml,
                             total_sequence=ts, seq_err=se)
        gi.cleaning.cleaned_tips = True
        gi.cleaning.cleaned_unitigs = True
        gi.cleaning.clean_unitigs_thresh = thr
        ginfo.append(gi)
    hdr = ctxio.CtxHeader(kmer_size=k, ginfo=ginfo)
    p = tmp_path / "ours.ctx"
    ctxio.write_ctx(str(p), hdr, keys, cov, edg)
    h2, k2, c2, e2 = ctxio.read_ctx(str(p))
    assert [g.sample_name for g in h2.ginfo] == ["alpha", "b2"]
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_array_equal(c2, cov)
    np.testing.assert_array_equal(e2, edg)


# ---------------------------------------------------------------------------
# .ctp v4 text
# ---------------------------------------------------------------------------

def test_ctp_v4_spec_vector(tmp_path):
    import gzip
    import jax.numpy as jnp
    from mccortex_tpu.graph import build as gbuild
    from mccortex_tpu.io import ctp as ctpio
    from mccortex_tpu.utils.text import kmers_to_strings
    from util import seq_to_codes

    k = 5
    seq = "AACGTACGGTAACGC"
    g = gbuild.build([(np.asarray(seq_to_codes(seq))[None], 0)], k,
                     ncols=1)
    keys = np.asarray(g.keys)[: int(g.n)]
    kstrs = kmers_to_strings(keys, k)
    kmer = kstrs[0]

    hdr = {
        "file_format": "ctp", "format_version": 4,
        "ncols": 1, "kmer_size": k,
        "generator": "hand-built spec vector",
        "paths": {"num_kmers_with_paths": 1, "num_paths": 2,
                  "path_bytes": 2,
                  "contig_hists": [{"lengths": [], "counts": []}]},
        "colours": [{"colour": 0, "sample": "s"}],
    }
    text = (json.dumps(hdr, indent=1) + "\n\n"
            "# hand-written fixture, not from save_ctp\n"
            f"{kmer} 2\n"
            "F 3 5 ACT\n"
            "R 1 2 G\n")
    p = tmp_path / "spec.ctp"
    with gzip.open(p, "wt") as fh:
        fh.write(text)

    links = ctpio.load_ctp(str(p), g)
    assert links.nlinks == 2
    nj = np.asarray(links.nj)
    nseen = np.asarray(links.nseen)
    offs = np.asarray(links.offsets)
    row = 0   # kmer = kstrs[0] -> store row 0
    fw = list(range(offs[2 * row], offs[2 * row + 1]))
    rv = list(range(offs[2 * row + 1], offs[2 * row + 2]))
    assert len(fw) == 1 and len(rv) == 1
    assert nj[fw[0]] == 3 and nseen[fw[0], 0] == 5
    assert nj[rv[0]] == 1 and nseen[rv[0], 0] == 2
    jstrs = ctpio._decode_juncs(np.asarray(links.seq),
                                np.asarray(links.nj))
    assert jstrs[fw[0]] == "ACT"
    assert jstrs[rv[0]] == "G"


# ---------------------------------------------------------------------------
# BCF 2.2
# ---------------------------------------------------------------------------

def _bgzf(data: bytes) -> bytes:
    """Hand-rolled BGZF framing per the SAM spec section 4.1."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    bsize = 12 + 6 + len(comp) + 8
    out = (b"\x1f\x8b\x08\x04" + b"\x00" * 6          # gzip + FEXTRA
           + struct.pack("<H", 6) + b"BC"
           + struct.pack("<HH", 2, bsize - 1)
           + comp
           + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                         len(data)))
    eof = bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000")
    return out + eof


def test_bcf_spec_vector(tmp_path):
    from mccortex_tpu.io import bcf as bcfio

    header = "\n".join([
        "##fileformat=VCFv4.2",
        '##FILTER=<ID=PASS,Description="All filters passed">',
        "##contig=<ID=chr1>",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2",
    ]) + "\n\x00"
    # dictionary (order of FILTER/INFO/FORMAT IDs): PASS=0, DP=1, GT=2
    ht = header.encode()
    body = bytearray()
    body += b"BCF\x02\x02"
    body += struct.pack("<I", len(ht)) + ht

    shared = bytearray()
    shared += struct.pack("<ii", 0, 99)          # chr1, POS 100 (0-based)
    shared += struct.pack("<i", 1)               # rlen
    shared += struct.pack("<f", 30.0)            # QUAL
    shared += struct.pack("<HH", 1, 2)           # n_info, n_allele
    shared += struct.pack("<I", (2 << 24) | 2)   # n_fmt=2, n_sample=2
    shared += bytes([0x17]) + b"."               # ID "."
    shared += bytes([0x17]) + b"A"               # REF
    shared += bytes([0x17]) + b"G"               # ALT
    shared += bytes([0x11, 0x00])                # FILTER = [PASS]
    shared += bytes([0x11, 0x01])                # INFO key DP
    shared += bytes([0x11, 30])                  # INFO value 30 (int8)

    indiv = bytearray()
    indiv += bytes([0x11, 0x02])                 # FORMAT key GT
    indiv += bytes([0x21])                       # 2 x int8 per sample
    indiv += struct.pack("<4b", 2, 4, 4, 5)      # 0/1 , 1|1
    indiv += bytes([0x11, 0x01])                 # FORMAT key DP
    indiv += bytes([0x11])                       # 1 x int8 per sample
    indiv += struct.pack("<2b", 13, 9)

    body += struct.pack("<II", len(shared), len(indiv))
    body += shared + indiv

    p = tmp_path / "spec.bcf"
    p.write_bytes(_bgzf(bytes(body)))

    vf = bcfio.read_bcf(str(p))
    assert vf.sample_names == ["s1", "s2"]
    assert len(vf.records) == 1
    r = vf.records[0]
    assert (r.chrom, r.pos, r.ref, r.alts) == ("chr1", 99, "A", ["G"])
    assert r.qual in ("30", "30.0") or float(r.qual) == 30.0
    assert r.filt == "PASS"
    assert r.info["DP"] == 30
    assert r.fmt == ["GT", "DP"]
    assert r.samples[0]["GT"] == "0/1"
    assert r.samples[1]["GT"] == "1|1"
    assert r.samples[0]["DP"] == 13 and r.samples[1]["DP"] == 9


def test_bcf_gt_coding_roundtrip(tmp_path):
    """Our writer must emit the spec GT int coding (not char strings):
    write with our writer, decode the raw bytes BY HAND per the spec."""
    import gzip
    from mccortex_tpu.io import bcf as bcfio
    from mccortex_tpu.io.vcf import VcfFile, VcfRecord

    rec = VcfRecord(chrom="c", pos=5, vid=".", ref="A", alts=["T"],
                    qual="10", filt="PASS", info={},
                    fmt=["GT"], samples=[{"GT": "1|0"}, {"GT": "."}])
    vf = VcfFile(headers=["##fileformat=VCFv4.2",
                          "##contig=<ID=c>",
                          '##FORMAT=<ID=GT,Number=1,Type=String,'
                          'Description="g">'],
                 sample_names=["a", "b"], records=[rec])
    p = tmp_path / "ours.bcf"
    bcfio.write_bcf(str(p), vf)
    with gzip.open(p, "rb") as fh:
        data = fh.read()
    # find the GT vector: descriptor (2<<4)|1 followed by the coded
    # alleles 1|0 -> [(1+1)<<1|0, (0+1)<<1|1] = [4, 3]; "." -> [0, EOV]
    needle = bytes([0x21]) + struct.pack("<4b", 4, 3, 0, -127)
    assert needle in data
    # and read back symmetrically
    vf2 = bcfio.read_bcf(str(p))
    assert vf2.records[0].samples[0]["GT"] == "1|0"
    assert vf2.records[0].samples[1]["GT"] == "."


# ---------------------------------------------------------------------------
# BAM (SAM spec section 4.2)
# ---------------------------------------------------------------------------

def test_bam_spec_vector(tmp_path):
    """Hand-packed BAM per the SAM spec section 4.2 (BGZF + BAM\\1 +
    binary alignment records with 4-bit seq nibbles), decoded by our
    sequence reader AND the alignment-field parser."""
    from mccortex_tpu.io import seqio

    header_text = "@HD\tVN:1.6\n@SQ\tSN:chrZ\tLN:500\n"
    ht = header_text.encode()
    body = bytearray()
    body += b"BAM\x01"
    body += struct.pack("<i", len(ht)) + ht
    body += struct.pack("<i", 1)                      # n_ref
    body += struct.pack("<i", 5) + b"chrZ\x00"        # name
    body += struct.pack("<i", 500)                    # l_ref

    # one mapped record: name "r1", chrZ:10 (0-based 9), MAPQ 42,
    # CIGAR 4M2D3M, SEQ ACGTACG (7 bases), QUAL 30s
    name = b"r1\x00"
    cigar = [(4 << 4) | 0, (2 << 4) | 2, (3 << 4) | 0]   # 4M 2D 3M
    # 4-bit codes: =ACMGRSVTWYHKDBN -> A=1 C=2 G=4 T=8
    nib = {"A": 1, "C": 2, "G": 4, "T": 8}
    seq = "ACGTACG"
    packed = bytearray()
    for i in range(0, len(seq), 2):
        hi = nib[seq[i]] << 4
        lo = nib[seq[i + 1]] if i + 1 < len(seq) else 0
        packed.append(hi | lo)
    rec = bytearray()
    rec += struct.pack("<ii", 0, 9)                   # ref_id, pos0
    rec += bytes([len(name)])                         # l_read_name
    rec += bytes([42])                                # mapq
    rec += struct.pack("<H", 4680)                    # bin (unused here)
    rec += struct.pack("<HH", len(cigar), 0)          # n_cigar, flag
    rec += struct.pack("<i", len(seq))                # l_seq
    rec += struct.pack("<ii", -1, -1)                 # next ref/pos
    rec += struct.pack("<i", 0)                       # tlen
    rec += name
    for cv in cigar:
        rec += struct.pack("<I", cv)
    rec += bytes(packed)
    rec += bytes([30] * len(seq))                     # qual
    body += struct.pack("<i", len(rec)) + rec

    p = tmp_path / "spec.bam"
    p.write_bytes(_bgzf(bytes(body)))

    reads = list(seqio._parse_bam(str(p)))
    assert len(reads) == 1
    assert reads[0].name == "r1" and reads[0].seq == "ACGTACG"
    assert list(reads[0].quals) == [30] * 7

    alns = list(seqio.parse_bam_alignments(str(p)))
    assert alns == [("r1", 0, "chrZ", 9, 42, 4 + 2 + 3)]


# ---------------------------------------------------------------------------
# CRAM 3.0 (hts-specs CRAMv3 section 8-10)
# ---------------------------------------------------------------------------

def _itf8(v):
    """ITF-8 per CRAMv3 section 2.3 (independent of io/cram.py)."""
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF,
                      (v >> 8) & 0xFF, v & 0xFF])
    return bytes([0xF0 | (v >> 28), (v >> 20) & 0xFF, (v >> 12) & 0xFF,
                  (v >> 4) & 0xFF, v & 0x0F])


def _cram_block(method, ctype, cid, data, comp=None):
    comp = data if comp is None else comp
    out = (bytes([method, ctype]) + _itf8(cid) + _itf8(len(comp))
           + _itf8(len(data)) + comp)
    return out + struct.pack("<I", zlib.crc32(out))


def test_cram_spec_vector(tmp_path):
    """Hand-built CRAM 3.0 container with codec choices the repo's own
    writer never emits (HUFFMAN read lengths + BETA flags in the CORE
    bit stream, BYTE_ARRAY_LEN names, a gzip external block, shuffled
    block order): the reader must decode it from the spec alone."""
    import gzip as _gzip
    from mccortex_tpu.io import cram

    # --- compression header ----------------------------------------
    # preservation: RN=1, AP=1 (delta), SM default, TD one empty line
    pres_entries = (b"RN\x01" + b"AP\x01"
                    + b"SM" + bytes([0x1B] * 5)
                    + b"TD" + _itf8(1) + b"\x00")
    pres_body = _itf8(4) + pres_entries

    def enc(key, codec_id, params):
        return key + _itf8(codec_id) + _itf8(len(params)) + params

    encs = [
        enc(b"BF", 3, _itf8(1) + _itf8(4) + _itf8(1) + _itf8(0)),
        # ^ HUFFMAN constant 4 (unmapped), zero-bit code
        enc(b"CF", 6, _itf8(0) + _itf8(1)),       # BETA offset0 1 bit
        enc(b"RL", 3, _itf8(2) + _itf8(10) + _itf8(6)
            + _itf8(2) + _itf8(1) + _itf8(1)),    # HUFFMAN {10, 6}
        enc(b"AP", 1, _itf8(4)),                  # EXTERNAL cid 4
        enc(b"RG", 1, _itf8(5)),
        enc(b"RN", 4, (_itf8(1) + _itf8(len(_itf8(10))) + _itf8(10)
                       + _itf8(1) + _itf8(len(_itf8(6))) + _itf8(6))),
        # ^ BYTE_ARRAY_LEN: len EXTERNAL cid10, vals EXTERNAL cid6
        enc(b"TL", 1, _itf8(7)),
        enc(b"BA", 1, _itf8(8)),
        enc(b"QS", 1, _itf8(9)),
    ]
    enc_body = _itf8(len(encs)) + b"".join(encs)
    chdr = (_itf8(len(pres_body)) + pres_body
            + _itf8(len(enc_body)) + enc_body
            + _itf8(1) + _itf8(0))                # no tag encodings
    chdr_block = _cram_block(0, 1, 0, chdr)

    # --- data streams ------------------------------------------------
    seq1, seq2 = "ACGTACGTAC", "GGGTTT"
    q1 = bytes(range(35, 45))
    # core bits per record: CF (1 bit), RL (1 huffman bit; canonical
    # code over sorted (len,value): 0 -> 6, 1 -> 10)
    core = bytes([0b11000000])                    # rec1: 1,1  rec2: 0,0
    ext = {
        4: _itf8(0) + _itf8(0),                   # AP deltas
        5: _itf8(0) + _itf8(0),                   # RG
        6: b"q1q2",                               # RN values
        7: _itf8(0) + _itf8(0),                   # TL
        8: (seq1 + seq2).encode(),                # BA
        9: q1,                                    # QS (rec1 only)
        10: _itf8(2) + _itf8(2),                  # RN lengths
    }

    # --- slice -------------------------------------------------------
    shdr = (_itf8(-1) + _itf8(0) + _itf8(0) + _itf8(2)  # ref,start,span,nrec
            + b"\x00"                              # counter (ltf8 0)
            + _itf8(1 + len(ext))                  # nblocks
            + _itf8(len(ext)) + b"".join(_itf8(c) for c in sorted(ext))
            + _itf8(-1) + bytes(16))               # embedded ref, md5
    blocks = [_cram_block(0, 2, 0, shdr),
              _cram_block(0, 4, 0, core)]
    # shuffled external order; BA block gzip-compressed
    for cid in (9, 8, 4, 10, 5, 7, 6):
        data = ext[cid]
        if cid == 8:
            blocks.append(_cram_block(1, 3, cid, data,
                                      comp=_gzip.compress(data)))
        else:
            blocks.append(_cram_block(0, 3, cid, data))

    body = chdr_block + b"".join(blocks)

    def container(body_bytes, ref_id, nrec, nblocks):
        hdr = (_itf8(ref_id) + _itf8(0) + _itf8(0) + _itf8(nrec)
               + b"\x00" + b"\x00"                 # counter, bases ltf8
               + _itf8(nblocks) + _itf8(0))        # nblocks, landmarks
        return (struct.pack("<i", len(body_bytes)) + hdr
                + struct.pack("<I", 0) + body_bytes)

    sam_text = "@HD\tVN:1.6\n"
    sam_block = _cram_block(
        0, 0, 0, struct.pack("<i", len(sam_text)) + sam_text.encode())

    p = tmp_path / "spec.cram"
    p.write_bytes(b"CRAM" + bytes([3, 0]) + bytes(20)
                  + container(sam_block, 0, 0, 1)
                  + container(body, -1, 2, 1 + len(blocks))
                  + cram._EOF_CONTAINER)

    got = list(cram.parse_cram(str(p)))
    assert [(n, s) for n, s, _ in got] == [("q1", seq1), ("q2", seq2)]
    assert list(got[0][2]) == list(q1)
    assert got[1][2] is None
