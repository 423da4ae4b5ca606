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


def test_thread_fq_cutoff_masks(tmp_path):
    # a read with a low-quality error base threads cleanly when -Q masks
    # the bad base (the gap is then bridged like a sequencing error)
    from mccortex_tpu.cli.main import main as mctx
    from util import random_dna
    import gzip
    k = 9
    m = random_dna(30, seed=1900)
    r1 = random_dna(20, seed=1901) + m + random_dna(20, seed=1902)
    fa = str(tmp_path / "good.fa")
    with open(fa, "w") as f:
        f.write(f">a\n{r1}\n")
    # fastq with one wrong, low-quality base mid-m
    bad = list(r1)
    pos = 20 + 15
    bad[pos] = "A" if r1[pos] != "A" else "C"
    fq = str(tmp_path / "bad.fq")
    quals = ["I"] * len(r1)
    quals[pos] = "#"
    with open(fq, "w") as f:
        f.write(f"@b\n{''.join(bad)}\n+\n{''.join(quals)}\n")
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq", fa, ctx]) == 0
    out1 = str(tmp_path / "l1.ctp.gz")
    out2 = str(tmp_path / "l2.ctp.gz")
    assert mctx(["thread", "--seq", fq, "-o", out1, ctx]) == 0
    assert mctx(["thread", "--seq", fq, "-Q", "20", "-o", out2,
                 ctx]) == 0
    # both parse; masking must not crash and produces a valid ctp
    assert gzip.open(out2, "rt").read().startswith("{")
