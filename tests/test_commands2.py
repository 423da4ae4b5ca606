"""Tests for the second batch of commands: subgraph, join, pjoin, reads,
coverage, dist, sort, uniqkmers, rmsubstr, popbubbles, server."""

import io
import json

import numpy as np
import pytest

from mccortex_tpu.cli.main import main as mctx
from mccortex_tpu.io import ctx as ctxio
from mccortex_tpu.utils.text import kmers_to_strings
from mccortex_tpu.utils.dna import revcomp

from util import random_dna, revcomp_str
from test_ctx_io import write_fasta
from graph_ref import build_ref_graph


@pytest.fixture
def two_colour_graph(tmp_path):
    k = 11
    a = random_dna(200, seed=500)
    b = a[:100] + random_dna(50, seed=501) + a[100:]
    fa_a, fa_b = str(tmp_path / "a.fa"), str(tmp_path / "b.fa")
    write_fasta(fa_a, [a])
    write_fasta(fa_b, [b])
    ctx = str(tmp_path / "ab.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "A", "--seq", fa_a,
                 "--sample", "B", "--seq", fa_b, ctx]) == 0
    return k, a, b, fa_a, fa_b, ctx, tmp_path


def test_subgraph_dist(two_colour_graph):
    k, a, b, fa_a, fa_b, ctx, tmp = two_colour_graph
    seed_fa = str(tmp / "seed.fa")
    write_fasta(seed_fa, [a[50:50 + k]])  # one seed kmer
    out = str(tmp / "sub.ctx")
    assert mctx(["subgraph", "--seq", seed_fa, "--dist", "5",
                 "-o", out, ctx]) == 0
    h, keys, covg, edges = ctxio.read_ctx(out)
    assert 1 <= len(keys) <= 11  # seed + 5 each side
    assert mctx(["check", out]) == 0
    # invert: everything except the neighbourhood
    out2 = str(tmp / "sub2.ctx")
    assert mctx(["subgraph", "--seq", seed_fa, "--dist", "5", "--invert",
                 "-o", out2, ctx]) == 0
    h0, keys0, _, _ = ctxio.read_ctx(ctx)
    h2, keys2, _, _ = ctxio.read_ctx(out2)
    assert len(keys2) == len(keys0) - len(keys)


def test_join_offsets_and_flatten(tmp_path):
    k = 11
    a, b = random_dna(150, seed=510), random_dna(150, seed=511)
    fa_a, fa_b = str(tmp_path / "a.fa"), str(tmp_path / "b.fa")
    write_fasta(fa_a, [a])
    write_fasta(fa_b, [b])
    ca, cb = str(tmp_path / "a.ctx"), str(tmp_path / "b.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "A", "--seq", fa_a, ca]) == 0
    assert mctx(["build", "-k", str(k), "--sample", "B", "--seq", fa_b, cb]) == 0
    out = str(tmp_path / "join.ctx")
    assert mctx(["join", "-o", out, ca, cb]) == 0
    h, keys, covg, edges = ctxio.read_ctx(out)
    assert h.ncols == 2
    ref = build_ref_graph([(a, 0), (b, 1)], k)
    kstrs = kmers_to_strings(keys, k)
    got = {kstrs[i]: (covg[i].tolist(), edges[i].tolist())
           for i in range(len(keys))}
    assert got == ref
    assert mctx(["check", out]) == 0
    # flatten
    out2 = str(tmp_path / "flat.ctx")
    assert mctx(["join", "--flatten", "-o", out2, ca, cb]) == 0
    h2, k2, c2, e2 = ctxio.read_ctx(out2)
    assert h2.ncols == 1
    assert c2.sum() == covg.sum()


def test_reads_filter(two_colour_graph, tmp_path):
    k, a, b, fa_a, fa_b, ctx, tmp = two_colour_graph
    mixed = str(tmp / "mixed.fa")
    other = random_dna(80, seed=520)
    write_fasta(mixed, [a[20:90], other])
    out = str(tmp / "kept.fa")
    assert mctx(["reads", "--seq", mixed, "-o", out, ctx]) == 0
    kept = [l.strip() for l in open(out) if not l.startswith(">")]
    assert kept == [a[20:90]]
    # overwriting without -f must refuse (ref futil_check_outfile)
    assert mctx(["reads", "--seq", mixed, "--invert", "-o", out, ctx]) != 0
    assert mctx(["reads", "-f", "--seq", mixed, "--invert", "-o", out,
                 ctx]) == 0
    kept = [l.strip() for l in open(out) if not l.startswith(">")]
    assert kept == [other]
    # ref <in>:<out> form writes FASTQ (.fq.gz)
    obase = str(tmp / "filt")
    assert mctx(["reads", "-1", f"{mixed}:{obase}", ctx]) == 0
    import gzip
    lines = gzip.open(obase + ".fq.gz", "rt").read().splitlines()
    assert lines[0].startswith("@") and lines[1] == a[20:90]


def test_coverage(two_colour_graph, tmp_path, capsys):
    k, a, b, fa_a, fa_b, ctx, tmp = two_colour_graph
    q = str(tmp / "q.fa")
    write_fasta(q, [a[:50]])
    capsys.readouterr()
    assert mctx(["coverage", "--seq", q, ctx]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith(">")
    row0 = [int(x) for x in out[1].split()]
    assert len(row0) == 50 - k + 1
    assert all(v >= 1 for v in row0)  # colour A covers its own prefix


def test_dist_matrix(two_colour_graph, capsys):
    k, a, b, fa_a, fa_b, ctx, tmp = two_colour_graph
    capsys.readouterr()
    assert mctx(["dist", ctx]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert lines[0].split() == ["A", "B"]
    m = [[int(x) for x in l.split()[1:]] for l in lines[1:]]
    assert m[0][1] == m[1][0]  # symmetric
    assert m[0][0] >= m[0][1]  # diagonal dominates


def test_sort_roundtrip(two_colour_graph, tmp_path):
    k, a, b, fa_a, fa_b, ctx, tmp = two_colour_graph
    # scramble the file, then sort restores canonical order
    h, keys, covg, edges = ctxio.read_ctx(ctx)
    perm = np.random.default_rng(0).permutation(len(keys))
    scrambled = str(tmp / "scrambled.ctx")
    ctxio.write_ctx(scrambled, h, keys[perm], covg[perm], edges[perm])
    assert mctx(["sort", "-o", scrambled, scrambled]) == 0
    h2, k2, c2, e2 = ctxio.read_ctx(scrambled)
    np.testing.assert_array_equal(k2, keys)
    assert mctx(["index", scrambled]) == 0
    idx_lines = open(scrambled + ".idx").read().splitlines()
    assert len(idx_lines) >= 2


def test_uniqkmers_flank(tmp_path, capsys):
    fa = str(tmp_path / "s.fa")
    seq = random_dna(100, seed=530)
    write_fasta(fa, [seq])
    capsys.readouterr()
    assert mctx(["uniqkmers", "-k", "9", "-F", fa, "0"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith(">")
    full = out[1]
    assert len(full) == 100 + 18 and seq in full
    # plain mode emits N distinct kmers
    capsys.readouterr()
    assert mctx(["uniqkmers", "-k", "9", "5"]) == 0
    kms = [l for l in capsys.readouterr().out.splitlines()
           if not l.startswith(">")]
    assert len(kms) == 5 and len(set(kms)) == 5


def test_rmsubstr(tmp_path, capsys):
    fa = str(tmp_path / "r.fa")
    s = random_dna(100, seed=540)
    write_fasta(fa, [s, s[10:60], revcomp(s[20:80]), random_dna(50, seed=541)])
    out = str(tmp_path / "uniq.fa")
    assert mctx(["rmsubstr", "-o", out, fa]) == 0
    kept = [l.strip() for l in open(out) if not l.startswith(">")]
    assert len(kept) == 2
    assert s in kept


def test_popbubbles(tmp_path):
    k = 11
    a = random_dna(200, seed=550)
    alt = "ACGT"[("ACGT".index(a[100]) + 1) % 4]
    b = a[:100] + alt + a[101:]
    fa = str(tmp_path / "d.fa")
    write_fasta(fa, [a, a, a, b])  # a has covg 3, b branch covg 1
    ctx = str(tmp_path / "d.ctx")
    out = str(tmp_path / "popped.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, ctx]) == 0
    assert mctx(["popbubbles", "-o", out, ctx]) == 0
    h, keys, covg, edges = ctxio.read_ctx(out)
    ref = build_ref_graph([(a, 0)] * 3, k)
    kstrs = set(kmers_to_strings(keys, k))
    assert kstrs == set(ref)  # low-covg branch removed
    assert mctx(["check", out]) == 0


def test_server(two_colour_graph, monkeypatch, capsys):
    k, a, b, fa_a, fa_b, ctx, tmp = two_colour_graph
    import sys as _sys
    q = a[30:30 + k]
    monkeypatch.setattr("sys.stdin", io.StringIO(f"info\n{q}\nNNNNN\n"))
    assert mctx(["server", ctx]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert out[0]["kmer_size"] == k
    assert out[1]["find"] is True and out[1]["colours"][0] >= 1
    assert "error" in out[2]


def test_pjoin(two_colour_graph, tmp_path):
    k, a, b, fa_a, fa_b, ctx, tmp = two_colour_graph
    ctp1 = str(tmp / "l1.ctp.gz")
    ctp2 = str(tmp / "l2.ctp.gz")
    out = str(tmp / "merged.ctp.gz")
    assert mctx(["thread", "--seq", fa_a, "-o", ctp1, ctx]) == 0
    assert mctx(["thread", "--seq", fa_b, "-o", ctp2, ctx]) == 0
    assert mctx(["pjoin", "-o", out, ctx, ctp1, ctp2]) == 0
    from mccortex_tpu.io import ctp as ctpio
    from mccortex_tpu.cli.commands import _load_graph
    h, g = _load_graph(ctx)
    merged = ctpio.load_ctp(out, g)
    l1 = ctpio.load_ctp(ctp1, g)
    l2 = ctpio.load_ctp(ctp2, g)
    assert merged.nlinks <= l1.nlinks + l2.nlinks
    assert int(np.asarray(merged.nseen).sum()) == \
        int(np.asarray(l1.nseen).sum()) + int(np.asarray(l2.nseen).sum())


def test_join_intersect(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctx as ictx
    from util import random_dna
    from test_ctx_io import write_fasta
    k = 11
    a = random_dna(120, seed=1400)
    b = random_dna(120, seed=1401)
    shared = random_dna(80, seed=1402)
    fa_a = str(tmp_path / "a.fa"); write_fasta(fa_a, [a + shared])
    fa_b = str(tmp_path / "b.fa"); write_fasta(fa_b, [b + shared])
    ca = str(tmp_path / "a.ctx"); cb = str(tmp_path / "b.ctx")
    out = str(tmp_path / "j.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "a",
                 "--seq", fa_a, ca]) == 0
    assert mctx(["build", "-k", str(k), "--sample", "b",
                 "--seq", fa_b, cb]) == 0
    assert mctx(["join", "-o", out, "-i", cb, ca]) == 0
    h, keys, covg, edges = ictx.read_ctx(out)
    hb, kb, _, _ = ictx.read_ctx(cb)
    # every surviving kmer is in b's graph; the shared segment survives
    kb_set = set(map(tuple, kb.tolist()))
    assert all(tuple(x) in kb_set for x in keys.tolist())
    assert len(keys) >= 80 - k + 1
    ha, ka, _, _ = ictx.read_ctx(ca)
    assert len(keys) < len(ka)


def test_memory_budget_flag(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from util import random_dna
    from test_ctx_io import write_fasta
    import pytest as _pytest
    k = 11
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [random_dna(300, seed=1600)])
    ctx = str(tmp_path / "g.ctx")
    # generous budget: fine
    assert mctx(["build", "-k", str(k), "--sample", "s", "-m", "1G",
                 "--seq", fa, ctx]) == 0
    # tiny budget: the built graph cannot fit -> hard failure
    with _pytest.raises(MemoryError):
        mctx(["build", "-k", str(k), "--sample", "s", "-m", "1K",
              "--seq", fa, str(tmp_path / "g2.ctx")])
    # clean honours -m too
    out = str(tmp_path / "c.ctx")
    assert mctx(["clean", "--unitigs", "0", "-m", "1G", "-o", out,
                 ctx]) == 0


def test_parse_mem_strings():
    from mccortex_tpu.utils import membudget as mb
    assert mb.parse_mem("8G") == 8 << 30
    assert mb.parse_mem("500M") == 500 << 20
    assert mb.parse_mem("4GB") == 4 << 30
    assert mb.parse_mem("1024") == 1024
    assert mb.kmers_in_budget(13 * 100, 1, 1) == 100


def test_exp_abc(tmp_path, capsys):
    from mccortex_tpu.cli.main import main as mctx
    from util import random_dna
    from test_ctx_io import write_fasta
    k = 11
    genome = random_dna(400, seed=1700)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [genome] * 2)
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "l.ctp.gz")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq", fa, ctx]) == 0
    assert mctx(["thread", "--seq", fa, "-o", ctp, ctx]) == 0
    assert mctx(["exp_abc", "-N", "50", "-p", ctp, ctx]) == 0
    err = capsys.readouterr().err
    assert "RES_ABC_SUCCESS" in err
    # a linear genome with links must be highly consistent
    import re
    m = re.search(r"RES_ABC_SUCCESS: (\d+) / 50", err)
    assert m and int(m.group(1)) >= 40
