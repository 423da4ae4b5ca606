"""CLI surface of `mctx links` (ref ctx_links.c usage)."""

import gzip

import numpy as np
import pytest

from mccortex_tpu.cli.main import main as mctx

from util import random_dna
from test_ctx_io import write_fasta


@pytest.fixture
def threaded(tmp_path):
    k = 9
    p1, p2 = random_dna(14, 11), random_dna(14, 12)
    common = random_dna(30, 1)
    a, b = random_dna(12, 2), random_dna(12, 3)
    mid = random_dna(14, 4)
    c, d = random_dna(12, 5), random_dna(12, 6)
    reads = ([p1 + common + a + mid + c] * 5
             + [p1 + common + a + mid + d] * 1
             + [p1 + common + b] * 3 + [p2 + common + b])
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, reads)
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "g.ctp.gz")
    assert mctx(["build", "-k", str(k), "--sample", "S",
                 "--seq", fa, ctx]) == 0
    assert mctx(["thread", "--seq", fa, "-o", ctp, ctx]) == 0
    return k, ctx, ctp, tmp_path


def test_links_clean_junction_level(threaded):
    k, ctx, ctp, tmp = threaded
    out = str(tmp / "clean.ctp.gz")
    assert mctx(["links", "--clean", "3", "-o", out, ctx, ctp]) == 0
    with gzip.open(out, "rt") as fh:
        body = [l for l in fh if l and l[0] in "FR"]
    # cleaned file still has links; every count >= 3
    assert body
    for line in body:
        parts = line.split()
        assert all(int(x) >= 3 for x in parts[2].split(","))


def test_links_list_threshold_hist_plot(threaded):
    k, ctx, ctp, tmp = threaded
    csv = str(tmp / "list.csv")
    thr = str(tmp / "thr.txt")
    hist = str(tmp / "hist.csv")
    dot = str(tmp / "tree.dot")
    assert mctx(["links", "--list", csv, "--threshold", thr,
                 "--covg-hist", hist, "--plot", dot,
                 "--max-dist", "8", ctx, ctp]) == 0
    assert open(csv).readline().strip() == "SeqLen,Covg"
    assert len(open(csv).readlines()) > 1
    t = open(thr).read()
    assert "suggested_cutoff=" in t
    h = open(hist).read().splitlines()
    assert len(h) == 9  # header + 8 dist rows
    assert open(dot).read().startswith("digraph G {")


def test_links_limit(threaded):
    k, ctx, ctp, tmp = threaded
    out = str(tmp / "lim.ctp.gz")
    assert mctx(["links", "--limit", "1", "-o", out, ctx, ctp]) == 0
    with gzip.open(out, "rt") as fh:
        kmers = [l for l in fh if l and l[0] in "ACGT"]
    assert len(kmers) == 1
