"""Sequence file reading: FASTA / FASTQ, plain or gzipped.

Role of ref libs/seq_file + src/basic/seq_reader.c — host-side ingest that
feeds padded base-code batches to the device build kernels.  A C++ ingest
path (native/) can replace the parser; this module defines the interface.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..constants import CHAR_TO_BASE


@dataclass
class Read:
    name: str
    seq: str
    quals: np.ndarray | None = None  # phred scores (int) or None


def _openseq(path):
    f = open(path, "rb")
    if f.read(2) == b"\x1f\x8b":
        f.seek(0)
        return gzip.open(f, "rt")
    f.seek(0)
    return open(path, "rt")


# Optional reference for mapped-CRAM decoding ({name: seq} dict or a
# RefGenome), set by `mctx build --ref` (htslib finds it via REF_PATH;
# here it is explicit).
CRAM_REF = None

# FASTQ quality ASCII offset: 33 or 64; 0 = auto-detect per file from
# the first record (ref seq_file fq offset guessing, -O/--fq-offset).
FQ_OFFSET = 0


def _is_cram(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(4) == b"CRAM"


def parse_reads(path: str) -> Iterator[Read]:
    """Yield reads from FASTA/FASTQ/SAM/BAM/CRAM (gz/BGZF ok); format
    auto-detected (ref ctx_build.c:29 input formats, via libs/seq_file).
    Secondary/supplementary alignments are skipped."""
    if _is_cram(path):
        from .cram import parse_cram
        for name, seq, quals in parse_cram(path, ref=CRAM_REF):
            yield Read(name, seq.upper(), quals)
        return
    if _is_bam(path):
        yield from _parse_bam(path)
        return
    with _openseq(path) as fh:
        first = fh.readline()
        if not first:
            return
        if "\t" in first:          # SAM (with or without @-header)
            yield from _parse_sam_lines(first, fh)
            return
        if first.startswith(">"):
            name, chunks = first[1:].strip(), []
            for line in fh:
                if line.startswith(">"):
                    yield Read(name.split()[0] if name else "",
                               "".join(chunks).upper())
                    name, chunks = line[1:].strip(), []
                else:
                    chunks.append(line.strip())
            yield Read(name.split()[0] if name else "", "".join(chunks).upper())
        elif first.startswith("@"):
            name = first
            offset = FQ_OFFSET   # 0 = auto-detect from the first record
            while name:
                seq = fh.readline().strip().upper()
                fh.readline()  # '+' separator
                qual = fh.readline().strip()
                qb = np.frombuffer(qual.encode(), np.uint8)
                if offset == 0:
                    # ref seq_file guess: any char below '@' implies
                    # phred+33; otherwise phred+64 (Illumina 1.3-1.7)
                    offset = 33 if (len(qb) == 0 or qb.min() < 64) else 64
                quals = qb.astype(np.int16) - offset
                yield Read(name[1:].strip().split()[0], seq,
                           np.clip(quals, 0, 255).astype(np.uint8))
                name = fh.readline()
        else:
            raise ValueError(f"{path}: unrecognised sequence format")


def _is_bam(path: str) -> bool:
    with open(path, "rb") as f:
        if f.read(2) != b"\x1f\x8b":
            return False
    with gzip.open(path, "rb") as g:
        return g.read(4) == b"BAM\x01"


def _parse_sam_lines(first: str, fh) -> Iterator[Read]:
    """SAM text records (header lines skipped; 0x100/0x800 flags and
    SEQ='*' records dropped)."""
    import itertools
    for line in itertools.chain([first], fh):
        if not line.strip() or line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        if len(f) < 11:
            continue
        flag = int(f[1])
        if flag & 0x900 or f[9] == "*":
            continue
        quals = None
        if f[10] != "*":
            q = np.frombuffer(f[10].encode(), np.uint8).astype(
                np.int16) - 33
            quals = np.clip(q, 0, 255).astype(np.uint8)
        yield Read(f[0], f[9].upper(), quals)


_BAM_SEQ = "=ACMGRSVTWYHKDBN"


def _parse_bam(path: str) -> Iterator[Read]:
    """Minimal BAM reader: BGZF is concatenated gzip members, which
    python's gzip module reads transparently; no htslib needed for
    read-only sequence access."""
    import struct
    with gzip.open(path, "rb") as g:
        if g.read(4) != b"BAM\x01":
            raise ValueError(f"{path}: bad BAM magic")
        (l_text,) = struct.unpack("<i", g.read(4))
        g.read(l_text)
        (n_ref,) = struct.unpack("<i", g.read(4))
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", g.read(4))
            g.read(l_name + 4)
        while True:
            bs = g.read(4)
            if len(bs) < 4:
                return
            (block_size,) = struct.unpack("<i", bs)
            rec = g.read(block_size)
            if len(rec) < block_size:
                raise ValueError(f"{path}: truncated BAM record")
            l_read_name = rec[8]
            n_cigar, flag = struct.unpack("<HH", rec[12:16])
            (l_seq,) = struct.unpack("<i", rec[16:20])
            if flag & 0x900 or l_seq <= 0:
                continue
            name = rec[32:32 + l_read_name - 1].decode()
            off = 32 + l_read_name + 4 * n_cigar
            nseq = (l_seq + 1) // 2
            s4 = np.frombuffer(rec[off:off + nseq], np.uint8)
            nib = np.empty(nseq * 2, np.uint8)
            nib[0::2] = s4 >> 4
            nib[1::2] = s4 & 0xF
            seq = "".join(_BAM_SEQ[x] for x in nib[:l_seq])
            qual = np.frombuffer(
                rec[off + nseq:off + nseq + l_seq], np.uint8)
            quals = None if (qual == 0xFF).all() else qual.copy()
            yield Read(name, seq, quals)


def parse_bam_alignments(path: str):
    """Yield (name, flag, rname, pos0, mapq, ref_len) per mapped BAM
    record — the alignment fields (RNAME via the header ref table, POS,
    MAPQ, reference span from the CIGAR) that sequence-only _parse_bam
    skips.  Used by calls2vcf -F to accept BAM flank files directly
    (ref ctx_calls2vcf.c:24-46 reads SAM or BAM via htslib)."""
    import struct
    # ref-consuming CIGAR ops: M=0, D=2, N=3, '='=7, X=8
    _ref_consumes = (1, 0, 1, 1, 0, 0, 0, 1, 1)
    with gzip.open(path, "rb") as g:
        if g.read(4) != b"BAM\x01":
            raise ValueError(f"{path}: bad BAM magic")
        (l_text,) = struct.unpack("<i", g.read(4))
        g.read(l_text)
        (n_ref,) = struct.unpack("<i", g.read(4))
        ref_names = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", g.read(4))
            nm = g.read(l_name)[:-1].decode()
            g.read(4)  # l_ref
            ref_names.append(nm)
        while True:
            bs = g.read(4)
            if len(bs) < 4:
                return
            (block_size,) = struct.unpack("<i", bs)
            rec = g.read(block_size)
            if len(rec) < block_size:
                raise ValueError(f"{path}: truncated BAM record")
            ref_id, pos0 = struct.unpack("<ii", rec[0:8])
            l_read_name = rec[8]
            mapq = rec[9]
            n_cigar, flag = struct.unpack("<HH", rec[12:16])
            name = rec[32:32 + l_read_name - 1].decode()
            coff = 32 + l_read_name
            ref_len = 0
            for ci in range(n_cigar):
                (cv,) = struct.unpack("<I", rec[coff + 4 * ci:
                                                coff + 4 * ci + 4])
                op = cv & 0xF
                if op < 9 and _ref_consumes[op]:
                    ref_len += cv >> 4
            rname = ref_names[ref_id] if 0 <= ref_id < n_ref else "*"
            yield (name, flag, rname, pos0, mapq, ref_len)


def read_batches(paths, batch_size: int = 2048, max_len: int | None = None,
                 colour: int = 0) -> Iterator[tuple]:
    """Group reads into (codes (B, L) uint8, quals (B, L) uint8 | None,
    colour) batches, padded with the invalid code 4.  With the default
    max_len=None rows size to the longest read (no truncation); when
    max_len is given, reads are CLIPPED to it — use
    read_batches_native / _read_batches_chunked for overlapping-chunk
    splitting of long records."""
    buf = []
    for path in paths:
        for rd in parse_reads(path):
            buf.append(rd)
            if len(buf) >= batch_size:
                yield _to_batch(buf, max_len, colour)
                buf = []
    if buf:
        yield _to_batch(buf, max_len, colour)


def _to_batch(reads, max_len, colour):
    L = max(len(r.seq) for r in reads)
    if max_len:
        L = min(L, max_len)
    L = max(L, 1)
    B = len(reads)
    codes = np.full((B, L), 4, dtype=np.uint8)
    any_quals = any(r.quals is not None for r in reads)
    quals = np.zeros((B, L), dtype=np.uint8) if any_quals else None
    for i, r in enumerate(reads):
        s = np.frombuffer(r.seq[:L].encode(), np.uint8)
        codes[i, :len(s)] = CHAR_TO_BASE[s]
        if quals is not None and r.quals is not None:
            q = r.quals[:L]
            quals[i, :len(q)] = q
    return codes, quals, colour


def total_bases(paths) -> int:
    return sum(len(r.seq) for p in paths for r in parse_reads(p))


def read_batches_native(paths, batch_size: int = 2048, max_len: int = 1024,
                        colour: int = 0, prefetch: int = 4,
                        overlap: int | None = None):
    """Native (C++) batch reader; yields the same (codes, quals, colour)
    tuples as read_batches.  Falls back to the python parser when the
    native library is unavailable.

    Sequences longer than max_len are emitted as OVERLAPPING row chunks
    (never truncated): consecutive chunks share `overlap` bases
    [default 64, enough for any k <= 63]; callers that know k pass
    overlap=k for exactly one duplicate kmer observation per seam.

    prefetch > 0 runs decode on a producer thread with a bounded queue
    so file IO + parsing overlap device compute (role of ref
    libs/seq_file async reader feeding worker threads,
    ref ctx_build.c / asyncio pool) — the C parser releases the GIL
    during gz decompression, so the overlap is real."""
    if prefetch > 0:
        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        SENTINEL = object()
        stop = threading.Event()
        err = []

        def produce():
            try:
                for item in read_batches_native(
                        paths, batch_size, max_len, colour, prefetch=0,
                        overlap=overlap):
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:      # surfaced on the consumer
                err.append(e)
            finally:
                try:
                    q.put_nowait(SENTINEL)
                except queue.Full:
                    pass

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                yield item
        finally:
            # generator abandoned or exhausted: terminate the producer
            # (a blocked put would otherwise leak the thread + buffers)
            stop.set()
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)
        if err:
            raise err[0]
        return

    import ctypes
    from ..native import get_lib
    lib = get_lib()
    if lib is None:
        yield from _read_batches_chunked(paths, batch_size, max_len,
                                         colour, overlap or 64)
        return
    lib.mctx_seq_set_fq_offset(int(FQ_OFFSET))
    lib.mctx_seq_set_chunk_overlap(int(overlap or 64))
    for path in paths:
        if _is_cram(path):       # CRAM decodes in python (io/cram.py)
            yield from _read_batches_chunked([path], batch_size, max_len,
                                             colour, overlap or 64)
            continue
        h = lib.mctx_seq_open(path.encode())
        if not h:
            raise FileNotFoundError(path)
        try:
            while True:
                codes = np.full((batch_size, max_len), 4, np.uint8)
                quals = np.zeros((batch_size, max_len), np.uint8)
                lens = np.zeros(batch_size, np.int32)
                n = lib.mctx_seq_read_batch(
                    h, batch_size, max_len,
                    codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    quals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
                if n < 0:
                    raise ValueError(f"{path}: native parse error")
                if n == 0:
                    break
                L = int(min(max(lens[:n].max(), 1), max_len))
                has_quals = bool(quals[:n].any())
                yield (codes[:n, :L],
                       quals[:n, :L] if has_quals else None, colour)
        finally:
            lib.mctx_seq_close(h)


def _rc_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse-complement a padded code batch (4 = invalid stays 4)."""
    return np.where(codes < 4, 3 - codes, 4).astype(np.uint8)[:, ::-1]


def mate_normalize(c1: np.ndarray, c2: np.ndarray, matedir: str = "FR",
                   q1: np.ndarray | None = None,
                   q2: np.ndarray | None = None):
    """Normalise a mate pair to the FR convention every PE consumer
    assumes (r1 fragment-forward, r2 on the reverse strand) — role of
    ref seq_reader.c:497-500 seq_reads_mate_normalise, which maps to
    FF: only the mate-RELATIVE orientation matters (RR == FF, RF is the
    mirrored FR).  Quality rows are reversed alongside their codes."""
    m = matedir.upper()
    if m == "FR":
        pass
    elif m in ("FF", "RR"):
        c2 = _rc_codes(c2)
        q2 = q2[:, ::-1] if q2 is not None else None
    elif m == "RF":
        c1, c2 = _rc_codes(c1), _rc_codes(c2)
        q1 = q1[:, ::-1] if q1 is not None else None
        q2 = q2[:, ::-1] if q2 is not None else None
    else:
        raise ValueError(f"matepair must be FF/FR/RF/RR, got {matedir!r}")
    if q1 is None and q2 is None:
        return c1, c2
    return c1, c2, q1, q2


def read_batches_pe(path1, path2, batch_size: int = 2048,
                    max_len: int = 8192, colour: int = 0,
                    matedir: str = "FR"):
    """Yield mate-pair batches (codes1, codes2, colour); files must have
    reads in the same order (standard _1/_2 convention).

    max_len is generous (paired-end reads are short): a mate LONGER
    than it would be emitted as multiple chunk rows and silently
    misalign the pairing, so rows are checked and over-long mates
    rejected with a clear error."""
    it1 = read_batches_native([path1], batch_size, max_len, colour)
    it2 = read_batches_native([path2], batch_size, max_len, colour)
    for (c1, q1, _), (c2, q2, _) in zip(it1, it2):
        if c1.shape[1] >= max_len or c2.shape[1] >= max_len:
            raise ValueError(
                f"paired-end mate >= {max_len}bp: chunked rows would "
                f"misalign mate pairing ({path1} / {path2})")
        n = min(c1.shape[0], c2.shape[0])
        c1, c2 = mate_normalize(c1[:n], c2[:n], matedir)
        yield c1, c2, colour


def read_batches_interleaved(path, batch_size: int = 2048,
                             max_len: int = 8192, colour: int = 0,
                             matedir: str = "FR"):
    """Yield (codes1, codes2, quals1, quals2, colour) from an
    interleaved mate-pair file (even rows = r1).  Same over-length
    guard as read_batches_pe: chunked rows would break the even/odd
    pairing."""
    for codes, quals, _ in read_batches_native([path], batch_size,
                                               max_len, colour):
        if codes.shape[1] >= max_len:
            raise ValueError(
                f"interleaved mate >= {max_len}bp: chunked rows would "
                f"misalign mate pairing ({path})")
        if codes.shape[0] % 2:
            codes = codes[:-1]
            quals = quals[:-1] if quals is not None else None
        c1, c2 = codes[0::2], codes[1::2]
        q1 = quals[0::2] if quals is not None else None
        q2 = quals[1::2] if quals is not None else None
        c1, c2, q1, q2 = mate_normalize(
            c1, c2, matedir,
            q1 if q1 is not None else np.zeros_like(c1),
            q2 if q2 is not None else np.zeros_like(c2))
        if quals is None:
            q1 = q2 = None
        yield c1, c2, q1, q2, colour


def _chunk_read(rd: "Read", max_len: int, overlap: int):
    """Split one long read into overlapping chunks (python mirror of
    the native reader's sc_emit)."""
    L = len(rd.seq)
    if L <= max_len:
        yield rd
        return
    step = max(max_len - overlap, 1)
    off = 0
    while True:
        end = min(off + max_len, L)
        yield Read(rd.name, rd.seq[off:end],
                   rd.quals[off:end] if rd.quals is not None else None)
        if end >= L:
            return
        off += step


def _read_batches_chunked(paths, batch_size, max_len, colour, overlap):
    """Python fallback for read_batches_native: same chunked-emission
    semantics (no truncation of long records)."""
    buf = []
    for path in paths:
        for rd in parse_reads(path):
            for ch in _chunk_read(rd, max_len, overlap):
                buf.append(ch)
                if len(buf) >= batch_size:
                    yield _to_batch(buf, max_len, colour)
                    buf = []
    if buf:
        yield _to_batch(buf, max_len, colour)
