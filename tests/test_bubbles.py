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


def test_nested_bubbles_per_shared_unitig():
    # three alleles from one fork: x/y converge at M (inner bubble),
    # z joins at R (outer bubble) — ref find_bubbles_ending_with emits
    # BOTH (one per shared 3' unitig)
    k = 11
    L = random_dna(40, seed=460)
    M = random_dna(30, seed=461)
    Q = random_dna(30, seed=462)
    R = random_dna(40, seed=463)
    snp = L[-1]
    opts = [c for c in "ACGT" if c != snp]
    s1 = L + opts[0] + M + R
    s2 = L + opts[1] + M + R
    s3 = L + opts[2] + Q + R
    g = build_g([(s1, 0), (s2, 0), (s3, 0)], k)
    bl = bub.call_bubbles(g)
    # the inner 2-allele bubble AND the outer 3-allele bubble must both
    # be called (nested); reverse-strand duplicates may also appear
    want_inner = sorted([opts[0] + M[:k - 1], opts[1] + M[:k - 1]])
    inner = [b for b in bl if sorted(b.branches) == want_inner]
    assert len(inner) == 1
    three = [b for b in bl if len(b.branches) == 3]
    assert len(three) == 1
    outer_first = sorted(s[:1] for s in three[0].branches)
    assert outer_first == sorted(opts)


def test_serial_bubble_suppression_with_links():
    # two SNP bubbles in series; link-carrying walks from the first fork
    # continue through the second — the chained call at the second
    # convergence must be suppressed (ref paths_all_share_unitig) unless
    # remove_serial=False
    from mccortex_tpu.links import thread as lthread
    k = 11
    L = random_dna(40, seed=470)
    M = random_dna(30, seed=471)
    R = random_dna(40, seed=472)
    a1 = "A" if L[-1] != "A" else "C"
    a2 = "G" if a1 != "G" else "T"
    b1 = "A" if M[-1] != "A" else "C"
    b2 = "G" if b1 != "G" else "T"
    hap1 = L + a1 + M + b1 + R
    hap2 = L + a2 + M + b2 + R
    g = build_g([(hap1, 0), (hap2, 0)], k)
    links = lthread.thread_reads(g, batchify([(hap1, 0), (hap2, 0)]), 1)
    bl_keep = bub.call_bubbles(g, links, remove_serial=False)
    bl_drop = bub.call_bubbles(g, links, remove_serial=True)
    # with serial removal the linked walk-through calls disappear;
    # both primary bubbles survive
    assert len(bl_drop) >= 2
    assert len(bl_keep) > len(bl_drop)
