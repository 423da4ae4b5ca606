"""Gap-filling correction tests (parallels ref corrected_aln tests)."""

import numpy as np
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.align import correct as AC
from mccortex_tpu.links import thread as lthread

from util import random_dna, revcomp_str, seq_to_codes
from test_graph_build import batchify
from test_ctx_io import write_fasta


def build_g(inputs, k, ncols=1):
    return gbuild.build(batchify(inputs), k, ncols=ncols)


def mutate(seq, pos, rng=None):
    alt = "ACGT"[("ACGT".index(seq[pos]) + 1) % 4]
    return seq[:pos] + alt + seq[pos + 1:]


def test_correct_single_substitution():
    k = 11
    genome = random_dna(200, seed=700)
    g = build_g([(genome, 0)] * 3, k)
    bad = mutate(genome, 100)
    arr = np.asarray(seq_to_codes(bad)[None])
    res = AC.correct_batch(g, None, arr)
    assert res[0].ngaps == 1 and res[0].nfixed == 1
    assert res[0].seq == genome
    assert res[0].display == genome  # fully corrected, all uppercase


def test_correct_uncorrectable_lowercased():
    k = 11
    genome = random_dna(150, seed=710)
    g = build_g([(genome, 0)], k)
    # error creates a gap the graph cannot bridge with matching length:
    # delete 30 bases from the read (fill length mismatch > tolerance)
    bad = genome[:60] + genome[95:]
    arr = np.asarray(seq_to_codes(bad)[None])
    res = AC.correct_batch(g, None, arr)
    assert res[0].ngaps == 1
    if res[0].nfixed == 0:
        assert any(c.islower() for c in res[0].display)


def test_correct_two_errors():
    k = 11
    genome = random_dna(300, seed=720)
    g = build_g([(genome, 0)] * 2, k)
    bad = mutate(mutate(genome, 80), 200)
    arr = np.asarray(seq_to_codes(bad)[None])
    res = AC.correct_batch(g, None, arr)
    assert res[0].nfixed == 2
    assert res[0].seq == genome


def test_thread_gapfill_restores_links():
    # errory reads: plain threading loses junction info at errors;
    # gap-filled threading recovers it
    k = 9
    m = random_dna(40, seed=730)
    a1, b1 = random_dna(30, seed=731), random_dna(30, seed=732)
    a2, b2 = random_dna(30, seed=733), random_dna(30, seed=734)
    r1, r2 = a1 + m + b1, a2 + m + b2
    g = build_g([(r1, 0), (r2, 0)], k)
    # reads with an error in the middle of the shared segment
    r1e = mutate(r1, len(a1) + 20)
    r2e = mutate(r2, len(a2) + 20)
    plain = lthread.thread_reads(g, batchify([(r1e, 0), (r2e, 0)]), 1)
    filled = lthread.thread_reads_gapfill(
        g, batchify([(r1e, 0), (r2e, 0)]), 1)
    # gap-filled threading must produce links spanning the whole insert
    assert filled.nlinks >= plain.nlinks
    from mccortex_tpu.links import walk as lwalk
    from test_links import row_of, canon
    seed = row_of(g, a1[:k])
    c1, _ = lwalk.assemble_contigs_linked(g, filled, np.array([seed]))
    assert canon(c1[0]) == canon(r1)


def test_cli_correct(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    k = 11
    genome = random_dna(250, seed=740)
    fa = str(tmp_path / "good.fa")
    write_fasta(fa, [genome] * 3)
    ctx = str(tmp_path / "g.ctx")
    bad_fa = str(tmp_path / "bad.fa")
    write_fasta(bad_fa, [mutate(genome, 120)])
    out = str(tmp_path / "fixed.fa")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, ctx]) == 0
    assert mctx(["correct", "--seq", bad_fa, "-o", out, ctx]) == 0
    fixed = [l.strip() for l in open(out) if not l.startswith(">")]
    assert fixed[0] == genome


def test_cli_links_clean(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctp as ctpio
    from mccortex_tpu.cli.commands import _load_graph
    k = 9
    m = random_dna(30, seed=750)
    r1 = random_dna(20, seed=751) + m + random_dna(20, seed=752)
    r2 = random_dna(20, seed=753) + m + random_dna(20, seed=754)
    fa = str(tmp_path / "r.fa")
    # r1 seen 3x, r2 once
    write_fasta(fa, [r1, r1, r1, r2])
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "l.ctp.gz")
    cleaned = str(tmp_path / "lc.ctp.gz")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, ctx]) == 0
    assert mctx(["thread", "--seq", fa, "-o", ctp, ctx]) == 0
    assert mctx(["links", "--clean", "2", "-o", cleaned, ctx, ctp]) == 0
    h, g = _load_graph(ctx)
    before = ctpio.load_ctp(ctp, g)
    after = ctpio.load_ctp(cleaned, g)
    assert after.nlinks < before.nlinks
    assert (np.asarray(after.nseen).sum(axis=1) >= 2).all()
