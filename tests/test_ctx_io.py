"""`.ctx` IO + CLI build/view/check tests (golden-file style, like the
reference tests/build + tests/sort Makefiles)."""

import os

import numpy as np
import pytest

from mccortex_tpu.cli.main import main as mctx
from mccortex_tpu.io import ctx as ctxio
from mccortex_tpu.utils.text import kmers_to_strings, edges_to_strings

from util import random_dna
from graph_ref import build_ref_graph


def write_fasta(path, seqs):
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">r{i}\n{s}\n")


def test_header_roundtrip(tmp_path):
    h = ctxio.CtxHeader(kmer_size=31, ginfo=[
        ctxio.GraphInfo(sample_name="s0", total_sequence=1234,
                        mean_read_length=100, seq_err=0.013),
        ctxio.GraphInfo(sample_name="another", total_sequence=99,
                        mean_read_length=7)])
    h.ginfo[1].cleaning.cleaned_tips = True
    h.ginfo[1].cleaning.clean_unitigs_thresh = 3
    p = str(tmp_path / "t.ctx")
    keys = np.array([[5], [9]], dtype=np.uint64)
    covg = np.array([[1, 2], [3, 0]], dtype=np.uint32)
    edges = np.array([[0x21, 0], [0, 0x10]], dtype=np.uint8)
    ctxio.write_ctx(p, h, keys, covg, edges)
    h2, k2, c2, e2 = ctxio.read_ctx(p)
    assert h2.kmer_size == 31 and h2.ncols == 2
    assert h2.ginfo[0].sample_name == "s0"
    assert abs(h2.ginfo[0].seq_err - 0.013) < 1e-9
    assert h2.ginfo[1].cleaning.cleaned_tips is True
    assert h2.ginfo[1].cleaning.clean_unitigs_thresh == 3
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_array_equal(c2, covg)
    np.testing.assert_array_equal(e2, edges)


def test_zero_covg_dropped(tmp_path):
    h = ctxio.CtxHeader(kmer_size=5, ginfo=[ctxio.GraphInfo()])
    p = str(tmp_path / "z.ctx")
    keys = np.array([[5], [9]], dtype=np.uint64)
    covg = np.array([[0], [3]], dtype=np.uint32)
    edges = np.zeros((2, 1), dtype=np.uint8)
    ctxio.write_ctx(p, h, keys, covg, edges)
    _, k2, _, _ = ctxio.read_ctx(p)
    assert len(k2) == 1 and k2[0, 0] == 9


def test_cli_build_view_check(tmp_path, capsys):
    k = 11
    seqs = [random_dna(120, seed=i) for i in range(3)]
    fa = str(tmp_path / "in.fa")
    out = str(tmp_path / "g.ctx")
    write_fasta(fa, seqs)
    rc = mctx(["build", "-k", str(k), "--sample", "sampleA",
               "--seq", fa, out])
    assert rc == 0
    h, keys, covg, edges = ctxio.read_ctx(out)
    assert h.ginfo[0].sample_name == "sampleA"
    assert h.ginfo[0].total_sequence == sum(len(s) for s in seqs)
    ref = build_ref_graph([(s, 0) for s in seqs], k)
    kstrs = kmers_to_strings(keys, k)
    got = {kstrs[i]: (covg[i].tolist(), edges[i].tolist())
           for i in range(len(keys))}
    assert got == ref
    # keys sorted ascending (our store invariant; subsumes ctx sort)
    assert all(tuple(keys[i]) < tuple(keys[i + 1])
               for i in range(len(keys) - 1))
    # view --kmers prints every kmer
    capsys.readouterr()
    rc = mctx(["view", "--kmers", out])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert len(lines) == len(keys)
    first = lines[0].split()
    assert first[0] == kstrs[0]
    # check passes
    assert mctx(["check", out]) == 0


def test_check_catches_asymmetric_edge(tmp_path):
    k = 11
    fa = str(tmp_path / "in.fa")
    out = str(tmp_path / "g.ctx")
    write_fasta(fa, [random_dna(80, seed=5)])
    mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, out])
    h, keys, covg, edges = ctxio.read_ctx(out)
    # corrupt: clear one edge byte (breaks symmetry)
    nz = np.argwhere(edges[:, 0] != 0)
    edges[nz[0][0], 0] = 0
    ctxio.write_ctx(out, h, keys, covg, edges)
    assert mctx(["check", out]) == 1


def test_fastq_quality_cutoff(tmp_path):
    k = 7
    seq = random_dna(50, seed=77)
    fq = str(tmp_path / "r.fq")
    qual = "I" * 20 + "#" * 10 + "I" * 20  # '#'=phred 2
    with open(fq, "w") as fh:
        fh.write(f"@r0\n{seq}\n+\n{qual}\n")
    out = str(tmp_path / "q.ctx")
    mctx(["build", "-k", str(k), "--fq-cutoff", "10",
          "--sample", "s", "--seq", fq, out])
    h, keys, covg, edges = ctxio.read_ctx(out)
    masked = seq[:20] + "N" * 10 + seq[30:]
    ref = build_ref_graph([(masked, 0)], k)
    kstrs = kmers_to_strings(keys, k)
    assert set(kstrs) == set(ref)
