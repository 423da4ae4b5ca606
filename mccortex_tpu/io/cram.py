"""CRAM 3.0 read support (the reference's last read format:
ctx_build.c:29 accepts CRAM via htslib).

Self-contained pure-python implementation of the CRAM 3.0 container
format (hts-specs CRAMv3): ITF8/LTF8 varints, block compression methods
raw/gzip/bzip2/lzma/rANS-4x8 (order 0 and 1), compression-header
preservation + data-series encoding maps, core-stream codecs (canonical
Huffman, Beta) and external codecs (EXTERNAL, BYTE_ARRAY_STOP,
BYTE_ARRAY_LEN), slice record decoding with reference-based sequence
reconstruction (substitution matrix + insertion/deletion/softclip/...
features) and embedded-reference slices.

Validation caveat (same as io/bcf.py): htslib/samtools/pysam do not
exist in this environment and the reference's htslib submodule is not
vendored, so cross-validation against an independent producer was not
possible; the format logic follows the public spec and is exercised by
a paired minimal writer (write_cram) in round-trip tests.  CRAM v3.1+
codecs (rANS-Nx16, fqzcomp, name tokeniser) are rejected with a clear
error naming the conversion path.

Only what `mctx build` needs is decoded: name, sequence, quality —
mapped records are reconstructed against the reference (--ref / -r or
an embedded reference block); tag data is skipped structurally.
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import struct
import zlib

import numpy as np

CRAM_MAGIC = b"CRAM"
TOTFREQ = 4096          # rANS 4x8 12-bit normalisation
RANS_LOW = 1 << 23      # renormalisation threshold
_EOF_CONTAINER = bytes([
    0x0f, 0x00, 0x00, 0x00, 0xff, 0xff, 0xff, 0xff, 0x0f, 0xe0,
    0x45, 0x4f, 0x46, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x05,
    0xbd, 0xd9, 0x4f, 0x00, 0x01, 0x00, 0x06, 0x06, 0x01, 0x00,
    0x01, 0x00, 0x01, 0x00, 0xee, 0x63, 0x01, 0x4b,
])


class CramError(ValueError):
    pass


def _s32(v: int) -> int:
    """ITF8 values are signed 32-bit (two's complement)."""
    return v - (1 << 32) if v >= (1 << 31) else v


# ---------------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------------

def read_itf8(b: io.BytesIO) -> int:
    c = b.read(1)
    if not c:
        raise EOFError
    v = c[0]
    n = 0
    while n < 4 and (v >> (7 - n)) & 1:
        n += 1
    if n == 0:
        return v
    rest = b.read(n)
    out = v & (0x0F if n == 4 else (0x7F >> n))
    for i, by in enumerate(rest):
        if n == 4 and i == 3:
            out = (out << 4) | (by & 0x0F)   # last byte: low nibble
        else:
            out = (out << 8) | by
    return out


def write_itf8(v: int) -> bytes:
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


def read_ltf8(b: io.BytesIO) -> int:
    c = b.read(1)
    if not c:
        raise EOFError
    v = c[0]
    n = 0
    while n < 8 and (v >> (7 - n)) & 1:
        n += 1
    out = v & (0xFF >> (n + 1)) if n < 8 else 0
    for by in b.read(n):
        out = (out << 8) | by
    return out


def write_ltf8(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for n in range(1, 8):
        if v < (1 << (7 - n + 8 * n)):
            first = ((0xFF << (8 - n)) & 0xFF) | (v >> (8 * n))
            return bytes([first] + [(v >> (8 * (n - 1 - i))) & 0xFF
                                    for i in range(n)])
    return bytes([0xFF] + [(v >> (8 * (7 - i))) & 0xFF
                           for i in range(8)])


# ---------------------------------------------------------------------------
# rANS 4x8 (order 0 / 1)
# ---------------------------------------------------------------------------

def _read_freq12(b: io.BytesIO) -> int:
    """1-2 byte frequency (htslib rans_static.c): values >= 128 use a
    high-bit-flagged 15-bit form."""
    f0 = b.read(1)[0]
    if f0 >= 128:
        return ((f0 & 0x7F) << 8) | b.read(1)[0]
    return f0


def _read_freqs0(b: io.BytesIO):
    """Order-0 frequency table (htslib rans_static.c decode layout)."""
    freqs = np.zeros(256, np.uint32)
    j = b.read(1)[0]
    rle = 0
    while True:
        freqs[j] = _read_freq12(b)
        if rle:
            rle -= 1
            j += 1
        else:
            nxt = b.read(1)[0]
            if nxt == j + 1 and nxt != 0:
                j = nxt
                rle = b.read(1)[0]
            else:
                j = nxt
        if j == 0 and rle == 0:
            break
    return freqs


def _rans_tables(freqs: np.ndarray):
    cum = np.zeros(257, np.uint32)
    cum[1:] = np.cumsum(freqs)
    if cum[-1] != TOTFREQ:
        # tolerate slightly under-normalised tables
        pass
    lookup = np.zeros(TOTFREQ, np.uint16)
    for s in np.nonzero(freqs)[0]:
        lookup[cum[s]:cum[s] + freqs[s]] = s
    return cum, lookup


def rans_decode(data: bytes) -> bytes:
    """Decode one rANS 4x8 compressed block (order 0 or 1)."""
    b = io.BytesIO(data)
    order = b.read(1)[0]
    _csz = struct.unpack("<I", b.read(4))[0]
    usz = struct.unpack("<I", b.read(4))[0]
    if order == 0:
        freqs = _read_freqs0(b)
        cum, lookup = _rans_tables(freqs)
        R = list(struct.unpack("<4I", b.read(16)))
        payload = b.read()
        out = bytearray(usz)
        p = 0
        for i in range(usz):
            j = i & 3
            f = R[j] & (TOTFREQ - 1)
            s = int(lookup[f])
            out[i] = s
            R[j] = int(freqs[s]) * (R[j] >> 12) + f - int(cum[s])
            while R[j] < RANS_LOW and p < len(payload):
                R[j] = (R[j] << 8) | payload[p]
                p += 1
        return bytes(out)
    if order == 1:
        # per-context tables: outer symbol-RLE over contexts (same walk
        # as the inner tables, htslib rans_static.c)
        F = {}
        i = b.read(1)[0]
        rle = 0
        while True:
            F[i] = _read_freqs0(b)
            if rle:
                rle -= 1
                i += 1
            else:
                nxt = b.read(1)[0]
                if nxt == i + 1 and nxt != 0:
                    i = nxt
                    rle = b.read(1)[0]
                else:
                    i = nxt
            if i == 0 and rle == 0:
                break
        tables = {c: _rans_tables(f) for c, f in F.items()}
        R = list(struct.unpack("<4I", b.read(16)))
        payload = b.read()
        out = bytearray(usz)
        p = 0
        # quarters are floor(usz/4); state 3 also decodes the remainder
        seg = usz >> 2
        ctx = [0, 0, 0, 0]

        def step(j, ii):
            nonlocal p
            c = ctx[j]
            freqs = F.get(c)
            if freqs is None:
                raise CramError("rANS O1: missing context table")
            cum, lookup = tables[c]
            f = R[j] & (TOTFREQ - 1)
            sy = int(lookup[f])
            out[ii] = sy
            R[j] = int(freqs[sy]) * (R[j] >> 12) + f - int(cum[sy])
            while R[j] < RANS_LOW and p < len(payload):
                R[j] = (R[j] << 8) | payload[p]
                p += 1
            ctx[j] = sy

        for i in range(seg):
            for j in range(4):
                step(j, j * seg + i)
        for ii in range(4 * seg, usz):
            step(3, ii)
        return bytes(out)
    raise CramError(f"rANS order {order} unsupported")


def _write_freq12(f: int) -> bytes:
    if f < 128:
        return bytes([f])
    return bytes([0x80 | (f >> 8), f & 0xFF])


def _write_freqs0(freqs: np.ndarray) -> bytes:
    """htslib-layout order-0 frequency table (symbol RLE runs)."""
    out = bytearray()
    present = np.nonzero(freqs)[0]
    rle = 0
    for j in present:
        j = int(j)
        if rle:
            rle -= 1
        else:
            out.append(j)
            if j > 0 and freqs[j - 1]:
                # start of a consecutive run: count further symbols
                r = j + 1
                while r < 256 and freqs[r]:
                    r += 1
                rle = r - (j + 1)
                out.append(rle)
        out += _write_freq12(int(freqs[j]))
    out.append(0)
    return bytes(out)


def rans_encode0(data: bytes) -> bytes:
    """Order-0 rANS 4x8 encoder (for the paired writer)."""
    usz = len(data)
    if usz == 0:
        raise CramError("rans_encode0: empty input (use RAW)")
    arr = np.frombuffer(data, np.uint8)
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    freqs = np.zeros(256, np.uint32)
    present = np.nonzero(counts)[0]
    scaled = np.maximum(
        1, np.round(counts[present] / counts.sum() * TOTFREQ)).astype(
        np.int64)
    # fix to sum exactly TOTFREQ
    diff = TOTFREQ - scaled.sum()
    scaled[np.argmax(scaled)] += diff
    if scaled.min() < 1:
        raise CramError("freq normalisation failed")
    freqs[present] = scaled
    cum = np.zeros(257, np.uint32)
    cum[1:] = np.cumsum(freqs)

    ft = _write_freqs0(freqs)

    # encode in reverse, 4 interleaved states
    R = [RANS_LOW] * 4
    outrev = bytearray()
    for i in range(usz - 1, -1, -1):
        j = i & 3
        s = data[i]
        f = int(freqs[s])
        # renormalise: keep R < f * (RANS_LOW >> 12) * 256
        xmax = ((RANS_LOW >> 12) << 8) * f
        while R[j] >= xmax:
            outrev.append(R[j] & 0xFF)
            R[j] >>= 8
        R[j] = (R[j] // f) * TOTFREQ + (R[j] % f) + int(cum[s])
    states = struct.pack("<4I", *R)
    payload = bytes(reversed(outrev))
    body = ft + states + payload
    return bytes([0]) + struct.pack("<II", len(body), usz) + body


def rans_encode1(data: bytes) -> bytes:
    """Order-1 rANS 4x8 encoder (paired with the order-1 decoder; used
    for sequence/quality streams where context modelling pays off)."""
    usz = len(data)
    if usz < 16:
        raise CramError("rans_encode1: input too small (use order 0)")
    seg = usz >> 2
    # context = previous byte within each state's segment (state 3's
    # segment extends over the remainder); first position context 0
    ctx_of = bytearray(usz)
    for j in range(4):
        start = j * seg
        end = (j + 1) * seg if j < 3 else usz
        ctx_of[start] = 0
        for i in range(start + 1, end):
            ctx_of[i] = data[i - 1]
    counts = {}
    for i in range(usz):
        c = ctx_of[i]
        if c not in counts:
            counts[c] = np.zeros(256, np.int64)
        counts[c][data[i]] += 1
    freqs, cums = {}, {}
    for c, cnt in counts.items():
        present = np.nonzero(cnt)[0]
        scaled = np.maximum(
            1, np.round(cnt[present] / cnt.sum() * TOTFREQ)).astype(
            np.int64)
        scaled[np.argmax(scaled)] += TOTFREQ - scaled.sum()
        if scaled.min() < 1:
            raise CramError("O1 freq normalisation failed")
        f = np.zeros(256, np.uint32)
        f[present] = scaled
        freqs[c] = f
        cum = np.zeros(257, np.uint32)
        cum[1:] = np.cumsum(f)
        cums[c] = cum
    # outer context table with the same symbol-RLE walk
    ft = bytearray()
    rle = 0
    for c in sorted(freqs):
        if rle:
            rle -= 1
        else:
            ft.append(c)
            if c > 0 and (c - 1) in freqs:
                r = c + 1
                while r in freqs:
                    r += 1
                rle = r - (c + 1)
                ft.append(rle)
        ft += _write_freqs0(freqs[c])
    ft.append(0)

    R = [RANS_LOW] * 4
    outrev = bytearray()

    def enc(j, pos):
        sy = data[pos]
        c = ctx_of[pos]
        f = int(freqs[c][sy])
        xmax = ((RANS_LOW >> 12) << 8) * f
        while R[j] >= xmax:
            outrev.append(R[j] & 0xFF)
            R[j] >>= 8
        R[j] = (R[j] // f) * TOTFREQ + (R[j] % f) + int(cums[c][sy])

    # exact mirror of the decode order: tail (state 3) reversed first,
    # then the main loop with i descending, j = 3..0
    for pos in range(usz - 1, 4 * seg - 1, -1):
        enc(3, pos)
    for i in range(seg - 1, -1, -1):
        for j in (3, 2, 1, 0):
            enc(j, j * seg + i)
    states = struct.pack("<4I", *R)
    payload = bytes(reversed(outrev))
    body = bytes(ft) + states + payload
    return bytes([1]) + struct.pack("<II", len(body), usz) + body


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

METHOD_RAW, METHOD_GZIP, METHOD_BZIP2, METHOD_LZMA, METHOD_RANS = range(5)


def read_block(b: io.BytesIO):
    """Returns (content_type, content_id, data)."""
    method = b.read(1)[0]
    ctype = b.read(1)[0]
    cid = read_itf8(b)
    csize = read_itf8(b)
    rsize = read_itf8(b)
    raw = b.read(csize)
    b.read(4)  # CRC32
    if method == METHOD_RAW:
        data = raw
    elif method == METHOD_GZIP:
        data = gzip.decompress(raw)
    elif method == METHOD_BZIP2:
        data = bz2.decompress(raw)
    elif method == METHOD_LZMA:
        data = lzma.decompress(raw)
    elif method == METHOD_RANS:
        data = rans_decode(raw)
    else:
        raise CramError(
            f"block compression method {method} is CRAM v3.1+ "
            "(rANS-Nx16/fqzcomp/tok3); convert with `samtools view -O "
            "cram,version=3.0` or to BAM")
    if len(data) != rsize:
        raise CramError(f"block size mismatch {len(data)} != {rsize}")
    return ctype, cid, data


def write_block(method: int, ctype: int, cid: int, data: bytes) -> bytes:
    if method == METHOD_GZIP:
        comp = gzip.compress(data)
    elif method == METHOD_RANS:
        comp = rans_encode0(data)
    else:
        method = METHOD_RAW
        comp = data
    out = bytes([method, ctype]) + write_itf8(cid) + \
        write_itf8(len(comp)) + write_itf8(len(data)) + comp
    return out + struct.pack("<I", zlib.crc32(out))


# ---------------------------------------------------------------------------
# codecs (decode side)
# ---------------------------------------------------------------------------

class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


def _parse_encoding(b: io.BytesIO):
    codec = read_itf8(b)
    n = read_itf8(b)
    params = b.read(n)
    return codec, params


class Codec:
    """Decoder for one data series."""

    def __init__(self, spec, external, core):
        self.codec, params = spec
        self.external = external
        self.core = core
        p = io.BytesIO(params)
        if self.codec == 1:          # EXTERNAL
            self.cid = read_itf8(p)
            self.off = {}
        elif self.codec == 3:        # HUFFMAN (canonical)
            nv = read_itf8(p)
            self.values = [read_itf8(p) for _ in range(nv)]
            nl = read_itf8(p)
            self.lengths = [read_itf8(p) for _ in range(nl)]
            self._build_huffman()
        elif self.codec == 4:        # BYTE_ARRAY_LEN
            self.len_codec = Codec(_parse_encoding(p), external, core)
            self.val_codec = Codec(_parse_encoding(p), external, core)
        elif self.codec == 5:        # BYTE_ARRAY_STOP
            self.stop = p.read(1)[0]
            self.cid = read_itf8(p)
            self.off = {}
        elif self.codec == 6:        # BETA
            self.offset = read_itf8(p)
            self.nbits = read_itf8(p)
        else:
            raise CramError(f"codec {self.codec} unsupported")

    def _build_huffman(self):
        pairs = sorted(zip(self.lengths, self.values))
        self.codes = {}
        code = 0
        prev_len = pairs[0][0] if pairs else 0
        for ln, v in pairs:
            code <<= (ln - prev_len)
            prev_len = ln
            self.codes[(ln, code)] = v
            code += 1

    def read_int(self, state) -> int:
        if self.codec == 1:
            buf = self.external[self.cid]
            o = state.eoff.setdefault(self.cid, 0)
            bb = io.BytesIO(buf)
            bb.seek(o)
            v = read_itf8(bb)
            state.eoff[self.cid] = bb.tell()
            return v
        if self.codec == 3:
            if len(self.codes) == 1 and next(iter(self.codes))[0] == 0:
                return self.values[0]        # constant, zero bits
            ln, code = 0, 0
            for _ in range(32):
                code = (code << 1) | state.core.read_bits(1)
                ln += 1
                if (ln, code) in self.codes:
                    return self.codes[(ln, code)]
            raise CramError("bad huffman stream")
        if self.codec == 6:
            return state.core.read_bits(self.nbits) - self.offset
        raise CramError(f"read_int on codec {self.codec}")

    def read_byte(self, state) -> int:
        if self.codec == 1:
            buf = self.external[self.cid]
            o = state.eoff.setdefault(self.cid, 0)
            state.eoff[self.cid] = o + 1
            return buf[o]
        return self.read_int(state) & 0xFF

    def read_bytes(self, state, length=None) -> bytes:
        if self.codec == 5:
            buf = self.external[self.cid]
            o = state.eoff.setdefault(self.cid, 0)
            e = buf.index(self.stop, o)
            state.eoff[self.cid] = e + 1
            return buf[o:e]
        if self.codec == 4:
            n = self.len_codec.read_int(state)
            return bytes(self.val_codec.read_byte(state)
                         for _ in range(n))
        if self.codec == 1:
            buf = self.external[self.cid]
            o = state.eoff.setdefault(self.cid, 0)
            state.eoff[self.cid] = o + length
            return buf[o:o + length]
        raise CramError(f"read_bytes on codec {self.codec}")


class _SliceState:
    def __init__(self, core: BitReader):
        self.core = core
        self.eoff = {}


# ---------------------------------------------------------------------------
# container / compression header / slice parsing
# ---------------------------------------------------------------------------

def _read_container_header(fh):
    length_b = fh.read(4)
    if len(length_b) < 4:
        return None
    length = struct.unpack("<i", length_b)[0]
    hb = io.BytesIO()
    # ref_seq_id, start, span, nrecords, counter(ltf8), bases(ltf8),
    # nblocks, landmarks[]
    raw = bytearray()

    def take(n):
        d = fh.read(n)
        raw.extend(d)
        return d

    # parse varints incrementally from the file
    def itf8_f():
        buf = io.BytesIO()
        c = take(1)
        buf.write(c)
        v = c[0]
        n = 0
        while n < 4 and (v >> (7 - n)) & 1:
            n += 1
        buf.write(take(n))
        buf.seek(0)
        return read_itf8(buf)

    def ltf8_f():
        buf = io.BytesIO()
        c = take(1)
        buf.write(c)
        v = c[0]
        n = 0
        while n < 8 and (v >> (7 - n)) & 1:
            n += 1
        buf.write(take(n))
        buf.seek(0)
        return read_ltf8(buf)

    ref_id = itf8_f()
    start = itf8_f()
    span = itf8_f()
    nrec = itf8_f()
    counter = ltf8_f()
    nbases = ltf8_f()
    nblocks = itf8_f()
    nland = itf8_f()
    for _ in range(nland):
        itf8_f()
    fh.read(4)  # CRC
    body = fh.read(length)
    ref_id = _s32(ref_id)
    return {"ref_id": ref_id, "start": start, "span": span,
            "nrec": nrec, "nblocks": nblocks, "body": body,
            "counter": counter, "nbases": nbases}


def _parse_compression_header(data: bytes):
    b = io.BytesIO(data)
    hdr = {"preservation": {}, "encodings": {}, "tag_encodings": {}}
    # preservation map
    _sz = read_itf8(b)
    nkeys = read_itf8(b)
    for _ in range(nkeys):
        key = b.read(2).decode()
        if key in ("RN", "AP", "RR"):
            hdr["preservation"][key] = b.read(1)[0] != 0
        elif key == "SM":
            hdr["preservation"]["SM"] = b.read(5)
        elif key == "TD":
            ln = read_itf8(b)
            hdr["preservation"]["TD"] = b.read(ln).split(b"\x00")
        else:
            raise CramError(f"preservation key {key}")
    # data series encodings
    _sz = read_itf8(b)
    nkeys = read_itf8(b)
    for _ in range(nkeys):
        key = b.read(2).decode()
        hdr["encodings"][key] = _parse_encoding(b)
    # tag encodings
    _sz = read_itf8(b)
    nkeys = read_itf8(b)
    for _ in range(nkeys):
        tagid = read_itf8(b)
        hdr["tag_encodings"][tagid] = _parse_encoding(b)
    return hdr


def _parse_slice_header(data: bytes):
    b = io.BytesIO(data)
    s = {}
    s["ref_id"] = _s32(read_itf8(b))
    s["start"] = read_itf8(b)
    s["span"] = read_itf8(b)
    s["nrec"] = read_itf8(b)
    s["counter"] = read_ltf8(b)
    s["nblocks"] = read_itf8(b)
    nids = read_itf8(b)
    s["content_ids"] = [read_itf8(b) for _ in range(nids)]
    s["embedded_ref"] = _s32(read_itf8(b))
    s["md5"] = b.read(16)
    return s


_SUB_BASES = "ACGTN"


def _sub_matrix(sm: bytes):
    """SM byte i: ref base _SUB_BASES[i]; 2-bit code -> substituted base
    (the 4 non-ref bases in code order packed high-to-low)."""
    mat = {}
    for i, ref_base in enumerate(_SUB_BASES):
        others = [c for c in _SUB_BASES if c != ref_base]
        byte = sm[i]
        row = [""] * 4
        for j, ob in enumerate(others):
            code = (byte >> (6 - 2 * j)) & 3
            row[code] = ob
        mat[ref_base] = row
    return mat


def parse_cram(path: str, ref=None):
    """Yield (name, seq, quals) from a CRAM 3.0 file.

    ref: optional {name: sequence} dict (or RefGenome-like with .names /
    .seqs) for mapped records; slices with embedded references need no
    ref.  Raises CramError naming the conversion path for v3.1+ codecs.
    """
    refmap = {}
    if ref is not None:
        if hasattr(ref, "names"):
            refmap = {n: s for n, s in zip(ref.names, ref.seqs)}
        else:
            refmap = dict(ref)
    with open(path, "rb") as fh:
        magic = fh.read(4)
        if magic != CRAM_MAGIC:
            raise CramError(f"{path}: not a CRAM file")
        major, minor = fh.read(1)[0], fh.read(1)[0]
        if major != 3:
            raise CramError(f"CRAM v{major}.{minor} unsupported "
                            "(convert to CRAM 3.0 or BAM)")
        fh.read(20)  # file id
        # SAM header container
        c = _read_container_header(fh)
        hb = io.BytesIO(c["body"])
        _t, _i, samhdr = read_block(hb)
        ref_names = _sam_ref_names(samhdr)
        while True:
            c = _read_container_header(fh)
            if c is None:
                break
            if c["ref_id"] == -1 and c["start"] == 4542278 and \
               c["nrec"] == 0 and c["nblocks"] == 1 and \
               c["counter"] == 0 and len(c["body"]) <= 16:
                break                    # EOF container
            if c["nrec"] == 0 and c["nblocks"] <= 1:
                continue
            yield from _decode_container(c, ref_names, refmap)


def _sam_ref_names(samhdr: bytes):
    # SAM header block: int32 text length + text
    if len(samhdr) >= 4:
        (ln,) = struct.unpack("<i", samhdr[:4])
        text = samhdr[4:4 + ln].decode(errors="replace")
    else:
        text = ""
    names = []
    for line in text.splitlines():
        if line.startswith("@SQ"):
            for f in line.split("\t"):
                if f.startswith("SN:"):
                    names.append(f[3:])
    return names


def _decode_container(c, ref_names, refmap):
    b = io.BytesIO(c["body"])
    ctype, _cid, chdr_data = read_block(b)
    if ctype != 1:
        raise CramError("expected compression header block")
    hdr = _parse_compression_header(chdr_data)
    while b.tell() < len(c["body"]):
        try:
            ctype, _cid, sdata = read_block(b)
        except (EOFError, IndexError):
            break
        if ctype != 2:
            continue
        yield from _decode_slice(sdata, b, hdr, ref_names, refmap)


def _decode_slice(shdr_data, b, hdr, ref_names, refmap):
    s = _parse_slice_header(shdr_data)
    core = b""
    external = {}
    embedded_ref = None
    for _ in range(s["nblocks"]):
        ctype, cid, data = read_block(b)
        if ctype == 4:
            core = data
        elif ctype == 3:
            external[cid] = data
            if cid == s["embedded_ref"]:
                embedded_ref = data
    enc = hdr["encodings"]
    pres = hdr["preservation"]
    codecs = {k: Codec(v, external, None) for k, v in enc.items()}
    state = _SliceState(BitReader(core))
    sub = _sub_matrix(pres.get("SM", bytes([0x1B] * 5)))

    # reference sequence for this slice
    def ref_seq(rid):
        if embedded_ref is not None:
            return embedded_ref.decode(), s["start"]
        if 0 <= rid < len(ref_names) and ref_names[rid] in refmap:
            return refmap[ref_names[rid]], 1
        return None, 1

    last_pos = s["start"]
    rec_i = 0
    for _ in range(s["nrec"]):
        bf = codecs["BF"].read_int(state)
        cf = codecs["CF"].read_int(state)
        rid = s["ref_id"]
        if rid == -2:                     # multi-ref slice
            rid = codecs["RI"].read_int(state)
        rl = codecs["RL"].read_int(state)
        if pres.get("AP", True):
            last_pos = last_pos + codecs["AP"].read_int(state)
            ap = last_pos
        else:
            ap = codecs["AP"].read_int(state)
        _rg = codecs["RG"].read_int(state) if "RG" in codecs else -1
        if pres.get("RN", True) and "RN" in codecs:
            name = codecs["RN"].read_bytes(state).decode()
        else:
            name = f"cram_rec_{s['counter'] + rec_i}"
        # mate data
        if cf & 2:
            _mf = codecs["MF"].read_int(state)
            if not pres.get("RN", True) and "RN" in codecs:
                name = codecs["RN"].read_bytes(state).decode()
            _ns = codecs["NS"].read_int(state)
            _np = codecs["NP"].read_int(state)
            _ts = codecs["TS"].read_int(state)
        elif cf & 4:
            _nf = codecs["NF"].read_int(state)
        tl = codecs["TL"].read_int(state) if "TL" in codecs else 0
        # tags: decode structurally and discard
        td = pres.get("TD", [b""])
        line = td[tl] if tl < len(td) else b""
        for t in range(0, len(line) - 2, 3):
            tagid = (line[t] << 16) | (line[t + 1] << 8) | line[t + 2]
            tc = hdr["tag_encodings"].get(tagid)
            if tc is None:
                continue
            Codec(tc, external, None).read_bytes(state)

        unmapped = bf & 4
        if not unmapped:
            fn = codecs["FN"].read_int(state)
            feats = []
            fpos = 0
            for _f in range(fn):
                fc = chr(codecs["FC"].read_byte(state))
                fpos += codecs["FP"].read_int(state)
                if fc == "X":
                    feats.append((fpos, "X",
                                  codecs["BS"].read_byte(state)))
                elif fc == "S":
                    feats.append((fpos, "S",
                                  codecs["SC"].read_bytes(state)))
                elif fc == "I":
                    feats.append((fpos, "I",
                                  codecs["IN"].read_bytes(state)))
                elif fc == "i":
                    feats.append((fpos, "i",
                                  codecs["BA"].read_byte(state)))
                elif fc == "D":
                    feats.append((fpos, "D",
                                  codecs["DL"].read_int(state)))
                elif fc == "N":
                    feats.append((fpos, "N",
                                  codecs["RS"].read_int(state)))
                elif fc == "P":
                    feats.append((fpos, "P",
                                  codecs["PD"].read_int(state)))
                elif fc == "H":
                    feats.append((fpos, "H",
                                  codecs["HC"].read_int(state)))
                elif fc == "B":
                    ba = codecs["BA"].read_byte(state)
                    codecs["QS"].read_byte(state)
                    feats.append((fpos, "i", ba))
                elif fc == "b":
                    feats.append((fpos, "S",
                                  codecs["BB"].read_bytes(state)))
                elif fc == "Q":
                    codecs["QS"].read_byte(state)
                elif fc == "q":
                    codecs["QQ"].read_bytes(state)
                else:
                    raise CramError(f"feature code {fc}")
            _mq = codecs["MQ"].read_int(state)
            rseq, roff = ref_seq(rid)
            seq = _reconstruct(rl, ap, feats, rseq, roff, sub)
        else:
            seq = bytes(codecs["BA"].read_byte(state)
                        for _ in range(rl)).decode(errors="replace")
        if cf & 1:
            quals = bytes(codecs["QS"].read_byte(state)
                          for _ in range(rl))
        else:
            quals = None
        rec_i += 1
        yield name, seq, (np.frombuffer(quals, np.uint8)
                          if quals is not None else None)


def _reconstruct(rl, ap, feats, rseq, roff, sub):
    """Rebuild a mapped read's sequence from reference + features."""
    out = []
    rpos = ap - roff            # 0-based index into rseq
    qpos = 1                    # 1-based read position
    if rseq is None:
        rseq = ""

    def refbase(i):
        return rseq[i].upper() if 0 <= i < len(rseq) else "N"

    for fpos, fc, payload in feats:
        while qpos < fpos:
            out.append(refbase(rpos))
            rpos += 1
            qpos += 1
        if fc == "X":
            rb = refbase(rpos)
            row = sub.get(rb, sub["N"])
            out.append(row[payload & 3])
            rpos += 1
            qpos += 1
        elif fc == "S":
            sseq = payload.decode(errors="replace")
            out.append(sseq)
            qpos += len(sseq)
        elif fc == "I":
            iseq = payload.decode(errors="replace")
            out.append(iseq)
            qpos += len(iseq)
        elif fc == "i":
            out.append(chr(payload))
            qpos += 1
        elif fc == "D":
            rpos += payload
        elif fc == "N":
            rpos += payload
        elif fc == "P":
            pass
        elif fc == "H":
            pass
    seq = "".join(out)
    while len(seq) < rl:
        seq += refbase(rpos)
        rpos += 1
    return seq[:rl]


# ---------------------------------------------------------------------------
# minimal writer (round-trip validation + test fixture generator)
# ---------------------------------------------------------------------------

def write_cram(path: str, reads, ref_names=(), method=METHOD_RANS):
    """Write unmapped CRAM 3.0 records: reads = iterable of
    (name, seq, quals|None).  One container, one slice.  Bases ride the
    BA series, names BYTE_ARRAY_STOP, ints EXTERNAL — exercising the
    decoder's codec paths with real rANS/gzip blocks."""
    reads = list(reads)
    nrec = len(reads)
    sam_text = "".join(f"@SQ\tSN:{n}\tLN:1000000\n" for n in ref_names)
    sam_block_data = struct.pack("<i", len(sam_text)) + \
        sam_text.encode()

    # data series layout: every series EXTERNAL in its own block
    cids = {"BF": 1, "CF": 2, "RL": 3, "AP": 4, "RG": 5, "RN": 6,
            "TL": 7, "BA": 8, "QS": 9}
    streams = {c: bytearray() for c in cids.values()}
    for name, seq, quals in reads:
        streams[1] += write_itf8(4)            # BF: unmapped
        streams[2] += write_itf8(1 if quals is not None else 0)
        streams[3] += write_itf8(len(seq))
        streams[4] += write_itf8(0)
        streams[5] += write_itf8(0)
        streams[6] += name.encode() + b"\x00"
        streams[7] += write_itf8(0)
        streams[8] += seq.encode()
        if quals is not None:
            streams[9] += bytes(int(q) for q in quals)

    def ext_enc(key):
        params = write_itf8(cids[key])
        return key.encode() + write_itf8(1) + \
            write_itf8(len(params)) + params

    def bas_enc(key, stop):
        params = bytes([stop]) + write_itf8(cids[key])
        return key.encode() + write_itf8(5) + \
            write_itf8(len(params)) + params

    enc_entries = [ext_enc(k) for k in
                   ("BF", "CF", "RL", "AP", "RG", "TL", "BA", "QS")]
    enc_entries.append(bas_enc("RN", 0))
    enc_body = write_itf8(len(enc_entries)) + b"".join(enc_entries)

    pres_entries = []
    for key, val in (("RN", 1), ("AP", 0), ("RR", 0)):
        pres_entries.append(key.encode() + bytes([val]))
    pres_entries.append(b"SM" + bytes([0x1B] * 5))
    pres_entries.append(b"TD" + write_itf8(1) + b"\x00")
    pres_body = write_itf8(len(pres_entries)) + b"".join(pres_entries)

    chdr = (write_itf8(len(pres_body)) + pres_body
            + write_itf8(len(enc_body)) + enc_body
            + write_itf8(1) + write_itf8(0))    # no tag encodings

    chdr_block = write_block(METHOD_RAW, 1, 0, chdr)

    sh = (write_itf8(0xFFFFFFFF & -1) + write_itf8(0) + write_itf8(0)
          + write_itf8(nrec) + write_ltf8(0)
          + write_itf8(1 + len(streams)) + write_itf8(len(streams))
          + b"".join(write_itf8(c) for c in sorted(streams))
          + write_itf8(0xFFFFFFFF & -1) + bytes(16))
    slice_blocks = [write_block(METHOD_RAW, 2, 0, sh),
                    write_block(METHOD_RAW, 4, 0, b"")]  # empty core
    for cid in sorted(streams):
        m = method if len(streams[cid]) > 16 else METHOD_RAW
        slice_blocks.append(write_block(m, 3, cid, bytes(streams[cid])))

    body = chdr_block + b"".join(slice_blocks)

    def container(body_bytes, ref_id, start, nrec_, nblocks):
        hdr = (write_itf8(ref_id & 0xFFFFFFFF) + write_itf8(start)
               + write_itf8(0) + write_itf8(nrec_) + write_ltf8(0)
               + write_ltf8(0) + write_itf8(nblocks) + write_itf8(0))
        return (struct.pack("<i", len(body_bytes)) + hdr
                + struct.pack("<I", 0) + body_bytes)

    with open(path, "wb") as fh:
        fh.write(CRAM_MAGIC + bytes([3, 0]) + bytes(20))
        hdr_block = write_block(METHOD_RAW, 0, 0, sam_block_data)
        fh.write(container(hdr_block, 0, 0, 0, 1))
        fh.write(container(body, -1, 0, nrec, 2 + len(streams)))
        fh.write(_EOF_CONTAINER)
