"""Bubble caller tests (parallels ref src/tests/bubble_caller_tests.c +
tests/bubbles integration dirs)."""

import numpy as np
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.calls import bubbles as bub
from mccortex_tpu.io import callfile

from util import random_dna, revcomp_str
from test_graph_build import batchify


def build_g(inputs, k, ncols=1):
    return gbuild.build(batchify(inputs), k, ncols=ncols)


def make_snp_pair(glen=200, snp_at=100, seed=400):
    a = random_dna(glen, seed=seed)
    alt = "ACGT"[("ACGT".index(a[snp_at]) + 1) % 4]
    b = a[:snp_at] + alt + a[snp_at + 1:]
    return a, b


def test_snp_bubble_two_colours():
    k = 11
    a, b = make_snp_pair()
    g = build_g([(a, 0), (b, 1)], k, ncols=2)
    bl = bub.call_bubbles(g)
    assert len(bl) >= 1
    # find the bubble with two single-colour branches
    found = False
    for bb in bl:
        if len(bb.branches) != 2:
            continue
        # haplotype reconstruction must equal a segment of each input
        for br, cols in zip(bb.branches, bb.branch_colsets):
            hap = bb.flank5p + br + bb.flank3p
            src = a if cols == [0] else b
            ok = hap in src or revcomp_str(hap) in src
            if not ok:
                break
        else:
            found = True
    assert found, bl


def test_snp_bubble_single_colour_diploid():
    # both haplotypes in ONE colour: bubble still called, branches both
    # in colour 0
    k = 11
    a, b = make_snp_pair(seed=410)
    g = build_g([(a, 0), (b, 0)], k, ncols=1)
    bl = bub.call_bubbles(g)
    assert len(bl) >= 1
    assert any(len(bb.branches) == 2 for bb in bl)


def test_haploid_filter_removes_repeat_bubble():
    k = 11
    a, b = make_snp_pair(seed=420)
    g = build_g([(a, 0), (b, 0)], k, ncols=1)
    # colour 0 traverses both branches; declaring it haploid kills the call
    bl = bub.call_bubbles(g, haploid_cols=[0])
    two_branch = [bb for bb in bl if len(bb.branches) >= 2]
    assert two_branch == []


def test_no_bubble_in_linear_genome():
    k = 11
    g = build_g([(random_dna(300, seed=430), 0)], k)
    assert bub.call_bubbles(g) == []


def test_insertion_bubble():
    k = 11
    a = random_dna(160, seed=440)
    ins = random_dna(7, seed=441)
    b = a[:80] + ins + a[80:]
    g = build_g([(a, 0), (b, 1)], k, ncols=2)
    bl = bub.call_bubbles(g)
    assert len(bl) >= 1
    lens = sorted(len(br) for bb in bl for br in bb.branches)
    # one branch is ~7 longer than the other
    ok = any(abs(len(bb.branches[0]) - len(bb.branches[1])) == len(ins)
             for bb in bl if len(bb.branches) == 2)
    assert ok


def test_cli_bubbles_roundtrip(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from test_ctx_io import write_fasta
    k = 11
    a, b = make_snp_pair(seed=450)
    fa_a = str(tmp_path / "a.fa")
    fa_b = str(tmp_path / "b.fa")
    write_fasta(fa_a, [a]); write_fasta(fa_b, [b])
    ctx = str(tmp_path / "g.ctx")
    out = str(tmp_path / "bubbles.txt.gz")
    assert mctx(["build", "-k", str(k), "--sample", "sA", "--seq", fa_a,
                 "--sample", "sB", "--seq", fa_b, ctx]) == 0
    assert mctx(["bubbles", "-o", out, ctx]) == 0
    hdr, calls = callfile.read_call_file(out)
    assert hdr["file_format"] == "CtxBubbles"
    assert len(calls) >= 1
    c = calls[0]
    assert c["flank5p"] and c["flank3p"] and len(c["branches"]) == 2
