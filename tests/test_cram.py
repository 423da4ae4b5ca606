"""CRAM 3.0 ingest: varints, rANS codecs, unmapped round trip through
the real build CLI, mapped-record feature reconstruction, v3.1
rejection."""

import io
import struct

import numpy as np
import pytest

from mccortex_tpu.io import cram
from util import random_dna


def test_varint_round_trips():
    for v in [0, 1, 127, 128, 300, (1 << 14) - 1, 1 << 14, 1 << 20,
              (1 << 28) - 1, 1 << 28, (1 << 32) - 1]:
        assert cram.read_itf8(io.BytesIO(cram.write_itf8(v))) == v
    for v in [0, 127, 128, 1 << 13, 1 << 14, 1 << 30, 1 << 50, 1 << 62]:
        assert cram.read_ltf8(io.BytesIO(cram.write_ltf8(v))) == v
    # signed ref ids
    assert cram._s32(cram.read_itf8(
        io.BytesIO(cram.write_itf8(-1 & 0xFFFFFFFF)))) == -1


@pytest.mark.parametrize("order", [0, 1])
def test_rans_round_trip(order):
    rng = np.random.default_rng(order)
    datas = [bytes(rng.integers(65, 70, 5000, np.uint8)),
             b"ACGT" * 1000,
             bytes(rng.integers(0, 256, 4097, np.uint8)),
             bytes([7] * 999)]
    for data in datas:
        enc = (cram.rans_encode0(data) if order == 0
               else cram.rans_encode1(data))
        assert cram.rans_decode(enc) == data


def test_unmapped_round_trip_via_build_cli(tmp_path):
    """mctx build from a CRAM must equal the build from the same reads
    as FASTA (ref ctx_build.c accepts CRAM input)."""
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctx as ictx
    from test_ctx_io import write_fasta
    rng = np.random.default_rng(9)
    k = 11
    seqs = [random_dna(130, seed=2000 + i) for i in range(20)]
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, seqs)
    cr = str(tmp_path / "r.cram")
    cram.write_cram(cr, [(f"r{i}", s, None)
                         for i, s in enumerate(seqs)])
    outs = []
    for src, name in ((fa, "fa.ctx"), (cr, "cram.ctx")):
        out = str(tmp_path / name)
        assert mctx(["build", "-k", str(k), "--sample", "s",
                     "--seq", src, out]) == 0
        outs.append(ictx.read_ctx(out))
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
    np.testing.assert_array_equal(outs[0][3], outs[1][3])


def _craft_mapped_cram(path, ref_name, records):
    """Minimal mapped-slice writer for decoder tests.

    records: (name, pos1, read_len, features) with features a list of
    (read_pos1, code, payload): X->subst code int, I->bytes, D->int.
    """
    w8 = cram.write_itf8
    streams = {1: bytearray(), 2: bytearray(), 3: bytearray(),
               4: bytearray(), 5: bytearray(), 6: bytearray(),
               7: bytearray(), 10: bytearray(), 11: bytearray(),
               12: bytearray(), 13: bytearray(), 14: bytearray(),
               15: bytearray(), 16: bytearray()}
    cid = {"BF": 1, "CF": 2, "RL": 3, "AP": 4, "RG": 5, "RN": 6,
           "TL": 7, "FN": 10, "FC": 11, "FP": 12, "BS": 13, "IN": 14,
           "DL": 15, "MQ": 16}
    last = 0
    for name, pos1, rl, feats in records:
        streams[1] += w8(0)              # BF mapped
        streams[2] += w8(0)              # CF: no quals
        streams[3] += w8(rl)
        streams[4] += w8(pos1 - last)    # AP delta
        last = pos1
        streams[5] += w8(0)
        streams[6] += name.encode() + b"\x00"
        streams[7] += w8(0)
        streams[10] += w8(len(feats))
        fprev = 0
        for fp, fc, payload in feats:
            streams[11].append(ord(fc))
            streams[12] += w8(fp - fprev)
            fprev = fp
            if fc == "X":
                streams[13].append(payload)
            elif fc == "I":
                streams[14] += payload + b"\x00"
            elif fc == "D":
                streams[15] += w8(payload)
        streams[16] += w8(60)            # MQ

    def ext_enc(key):
        params = w8(cid[key])
        return key.encode() + w8(1) + w8(len(params)) + params

    def bas_enc(key):
        params = bytes([0]) + w8(cid[key])
        return key.encode() + w8(5) + w8(len(params)) + params

    encs = [ext_enc(x) for x in ("BF", "CF", "RL", "AP", "RG", "TL",
                                 "FN", "FC", "FP", "BS", "DL", "MQ")]
    encs += [bas_enc("RN"), bas_enc("IN")]
    enc_body = w8(len(encs)) + b"".join(encs)
    pres = [b"RN\x01", b"AP\x01", b"RR\x01",
            b"SM" + bytes([0x1B] * 5),
            b"TD" + w8(1) + b"\x00"]
    pres_body = w8(len(pres)) + b"".join(pres)
    chdr = (w8(len(pres_body)) + pres_body + w8(len(enc_body)) + enc_body
            + w8(1) + w8(0))
    chdr_block = cram.write_block(cram.METHOD_RAW, 1, 0, chdr)
    sh = (w8(0) + w8(0) + w8(200) + w8(len(records)) + cram.write_ltf8(0)
          + w8(1 + len(streams)) + w8(len(streams))
          + b"".join(w8(c) for c in sorted(streams))
          + w8(-1 & 0xFFFFFFFF) + bytes(16))
    blocks = [cram.write_block(cram.METHOD_RAW, 2, 0, sh),
              cram.write_block(cram.METHOD_RAW, 4, 0, b"")]
    for c in sorted(streams):
        blocks.append(cram.write_block(cram.METHOD_RAW, 3, c,
                                       bytes(streams[c])))
    body = chdr_block + b"".join(blocks)
    sam = f"@SQ\tSN:{ref_name}\tLN:100000\n"
    samb = struct.pack("<i", len(sam)) + sam.encode()
    hdr_block = cram.write_block(cram.METHOD_RAW, 0, 0, samb)

    def container(bb, ref_id, nrec, nblocks):
        hdr = (w8(ref_id & 0xFFFFFFFF) + w8(0) + w8(0) + w8(nrec)
               + cram.write_ltf8(0) + cram.write_ltf8(0) + w8(nblocks)
               + w8(0))
        return struct.pack("<i", len(bb)) + hdr + \
            struct.pack("<I", 0) + bb

    with open(path, "wb") as fh:
        fh.write(cram.CRAM_MAGIC + bytes([3, 0]) + bytes(20))
        fh.write(container(hdr_block, 0, 0, 1))
        fh.write(container(body, 0, len(records), 2 + len(streams)))
        fh.write(cram._EOF_CONTAINER)


def test_mapped_records_reconstruct_against_reference(tmp_path):
    ref_seq = random_dna(300, seed=2100)
    path = str(tmp_path / "m.cram")
    # read 1: exact 30bp match at 1-based pos 5
    # read 2: substitution at read pos 4 (code 1), 20bp at pos 50
    # read 3: 3bp insertion "GGT" after read pos 6 + 4bp deletion,
    #         read len 25 at pos 100
    _craft_mapped_cram(path, "chr1", [
        ("m1", 5, 30, []),
        ("m2", 50, 20, [(4, "X", 1)]),
        ("m3", 100, 25, [(7, "I", b"GGT"), (15, "D", 4)]),
    ])
    got = list(cram.parse_cram(path, ref={"chr1": ref_seq}))
    assert [g[0] for g in got] == ["m1", "m2", "m3"]
    assert got[0][1] == ref_seq[4:34]
    # substitution: ref base r -> row[code]; SM 0x1B rows are the
    # non-ref bases in ACGTN order
    rb = ref_seq[49 + 3]
    others = [c for c in "ACGTN" if c != rb]
    want2 = ref_seq[49:52] + others[1] + ref_seq[53:69]
    assert got[1][1] == want2
    # insertion + deletion
    w = ref_seq[99:105] + "GGT"            # read pos 1-6 ref, 7-9 ins
    w += ref_seq[105:110]                  # read pos 10-14
    # D at read pos 15 skips 4 ref bases; remaining 11 read bases
    w += ref_seq[114:125]
    assert got[2][1] == w


def test_v31_codec_rejected(tmp_path):
    # method 5 (rANS Nx16) must raise with the conversion hint
    blk = bytes([5, 3]) + cram.write_itf8(1) + cram.write_itf8(4) + \
        cram.write_itf8(4) + b"xxxx" + bytes(4)
    with pytest.raises(cram.CramError, match="3.1"):
        cram.read_block(io.BytesIO(blk))
    # major version 4 rejected at the file level
    p = str(tmp_path / "v4.cram")
    with open(p, "wb") as fh:
        fh.write(b"CRAM" + bytes([4, 0]) + bytes(20))
    with pytest.raises(cram.CramError, match="unsupported"):
        list(cram.parse_cram(p))
