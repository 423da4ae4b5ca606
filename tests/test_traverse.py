"""Batched walker + linkless contig tests (parallels ref
src/tests/graph_walker_tests.c linkless cases)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.graph import store as gstore
from mccortex_tpu.graph import traverse as T
from mccortex_tpu.utils.stats import contig_stats

from util import random_dna, revcomp_str, seq_to_codes
from test_graph_build import batchify


def build_g(inputs, k, ncols=1):
    return gbuild.build(batchify(inputs), k, ncols=ncols)


def test_linear_walk_recovers_genome():
    k = 11
    seq = random_dna(300, seed=201)
    g = build_g([(seq, 0)], k)
    contigs, stats = T.assemble_linkless_contigs(g, np.array([0, 5, 17]),
                                                 colour=0)
    cseq = min(seq, revcomp_str(seq))
    for c in contigs:
        assert min(c, revcomp_str(c)) == cseq
    # both directions stopped with NOCOVG (ends of the graph)
    assert (stats == T.NOCOVG).all()


def test_walk_stops_at_fork():
    k = 7
    stem = random_dna(40, seed=211)
    a = stem + "A" + random_dna(30, seed=212)
    b = stem + "C" + random_dna(30, seed=213)
    g = build_g([(a, 0), (b, 0)], k)
    # seed in the middle of the stem: the fork-side walk must halt with
    # NOLINKS (fork in colour, no link info)
    from mccortex_tpu.ops import kmer as K
    from mccortex_tpu.ops import sorted as sops
    mid = stem[10:10 + k]
    key, _ = K.canonical(K.pack_kmers(
        jnp.asarray(seq_to_codes(mid)[None]), k), k)
    row, found = sops.lookup(g.keys, key)
    assert bool(found[0])
    contigs, stats = T.assemble_linkless_contigs(
        g, np.array([int(row[0])]), colour=0)
    assert T.NOLINKS in stats[0]
    # exact agreement with the python reference walker
    from graph_ref import build_ref_graph, ref_linkless_contig
    refg = build_ref_graph([(a, 0), (b, 0)], k)
    from util import key_str
    expect, rstat, lstat = ref_linkless_contig(refg, key_str(mid), k, 0)
    c = contigs[0]
    assert min(c, revcomp_str(c)) == min(expect, revcomp_str(expect))


def test_walk_halts_on_cycle():
    k = 5
    core = "ACGGTCAGTACCTTGGCAAT"
    seq = core + core[:k]
    g = build_g([(seq, 0)], k)
    contigs, stats = T.assemble_linkless_contigs(g, np.array([0]), colour=0)
    assert T.HALT_CYCLE in stats[0]
    # contig covers at least the whole cycle once
    assert len(contigs[0]) >= len(core)


@pytest.mark.parametrize("seed", range(8))
def test_random_walks_match_reference(seed):
    k = 9
    reads = [random_dna(70, seed=seed * 31 + i) for i in range(3)]
    reads.append(reads[0][30:] + reads[1][:30])
    inputs = [(r, 0) for r in reads]
    g = build_g(inputs, k)
    from graph_ref import build_ref_graph, ref_linkless_contig
    from mccortex_tpu.utils.text import kmers_to_strings
    refg = build_ref_graph(inputs, k)
    n = int(g.n)
    rows = np.arange(0, n, 7)
    contigs, stats = T.assemble_linkless_contigs(g, rows, colour=0)
    keys = np.asarray(g.keys)[rows]
    kstrs = kmers_to_strings(keys, k)
    for i, row in enumerate(rows):
        expect, rstat, lstat = ref_linkless_contig(refg, kstrs[i], k, 0)
        got = contigs[i]
        assert min(got, revcomp_str(got)) == \
            min(expect, revcomp_str(expect)), (i, kstrs[i])


def test_colour_restricted_walk():
    k = 9
    shared = random_dna(60, seed=221)
    ext0 = shared + "A" + random_dna(30, seed=222)
    ext1 = shared + "C" + random_dna(30, seed=223)
    # colour 0 has ext0 path only; colour 1 has ext1 only
    g = build_g([(ext0, 0), (ext1, 1)], k, ncols=2)
    from mccortex_tpu.ops import kmer as K
    from mccortex_tpu.ops import sorted as sops
    mid = shared[5:5 + k]
    key, _ = K.canonical(K.pack_kmers(
        jnp.asarray(seq_to_codes(mid)[None]), k), k)
    row, _ = sops.lookup(g.keys, key)
    c0, s0 = T.assemble_linkless_contigs(g, np.array([int(row[0])]), colour=0)
    c1, s1 = T.assemble_linkless_contigs(g, np.array([int(row[0])]), colour=1)
    assert min(c0[0], revcomp_str(c0[0])) == min(ext0, revcomp_str(ext0))
    assert min(c1[0], revcomp_str(c1[0])) == min(ext1, revcomp_str(ext1))
    # walking the population (colour=None) stops at the fork
    cp, sp = T.assemble_linkless_contigs(g, np.array([int(row[0])]),
                                         colour=None)
    assert min(cp[0], revcomp_str(cp[0])) == min(shared, revcomp_str(shared))


def test_max_len_halt():
    k = 11
    seq = random_dna(500, seed=231)
    g = build_g([(seq, 0)], k)
    contigs, stats = T.assemble_linkless_contigs(
        g, np.array([0]), colour=0, max_len=50)
    assert T.HALT_MAXLEN in stats[0]
    assert len(contigs[0]) <= 50 + 50 + k


def test_adjacency_free_hop_walk():
    # very large stores walk without the flat adjacency (binary-search
    # probes at junctions); force that path on a small graph
    from mccortex_tpu.graph import adjacency as adjmod
    k = 11
    seq = random_dna(300, seed=301)
    g = build_g([(seq, 0)], k)
    old = adjmod.ADJ_FREE_N
    adjmod.ADJ_FREE_N = 0
    try:
        contigs, stats = T.assemble_linkless_contigs(
            g, np.array([0, 7]), colour=0)
    finally:
        adjmod.ADJ_FREE_N = old
    for c in contigs:
        assert min(c, revcomp_str(c)) == min(seq, revcomp_str(seq))
    assert (stats == T.NOCOVG).all()


def test_contig_stats():
    st = contig_stats([100, 200, 300, 400], genome_size=1000)
    assert st["n"] == 4 and st["total"] == 1000
    assert st["max"] == 400 and st["n50"] == 300 and st["ng50"] == 300


def test_cli_contigs(tmp_path, capsys):
    from mccortex_tpu.cli.main import main as mctx
    from test_ctx_io import write_fasta
    k = 11
    seq = random_dna(250, seed=241)
    fa = str(tmp_path / "in.fa")
    write_fasta(fa, [seq[:150], seq[100:]])
    ctx = str(tmp_path / "g.ctx")
    outfa = str(tmp_path / "contigs.fa")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, ctx]) == 0
    assert mctx(["contigs", "--no-reseed", "-o", outfa, ctx]) == 0
    seqs = [l.strip() for l in open(outfa) if not l.startswith(">")]
    assert min(seqs[0], revcomp_str(seqs[0])) == min(seq, revcomp_str(seq))
    # --no-reseed: one contig covers everything
    assert len(seqs) == 1


def test_confidence_table():
    from mccortex_tpu.graph.contig_confidence import conf_table
    t = conf_table(10000, {100: 1000})  # 10x coverage of 100bp reads
    # short gaps are confidently spanned; gaps near read length are not
    assert t[1] > 0.99
    assert t[99] < t[10]
    assert (np.diff(t[1:]) <= 1e-12).all()  # monotone nonincreasing


def test_hop_cap_growth_never_truncates(monkeypatch):
    """A junction-dense walk needing more hops than the initial
    hop/visited buffer must grow the cap and retry, not halt short with
    HALT_MAXLEN (ADVICE r4: the 2048-entry cap could truncate contigs
    below max_len).  Junction density is forced by merging an extra
    incoming read every ~10 bases, so each merge point starts a new
    unitig (one hop each)."""
    k = 11
    seq = random_dna(400, seed=4040)
    inputs = [(seq, 0)]
    for pos in range(20, 380, 10):
        inputs.append((random_dna(15, seed=5000 + pos)
                       + seq[pos:pos + k], 0))
    g = build_g(inputs, k)
    from mccortex_tpu.ops import kmer as K
    from mccortex_tpu.ops import sorted as sops
    from mccortex_tpu.constants import CHAR_TO_BASE
    codes = jnp.asarray(CHAR_TO_BASE[np.frombuffer(
        seq[:k].encode(), np.uint8)])[None]
    key, _ = K.canonical(K.pack_kmers(codes, k), k)
    row, found = sops.lookup(g.keys, key)
    assert bool(np.asarray(found)[0])
    seed = np.asarray(row)

    ref_contigs, ref_stats = T.assemble_linkless_contigs(
        g, seed, colour=0, max_len=1024)
    monkeypatch.setattr(T, "HOP_CAP0", 4)
    caps_used = []
    real_once = T._hop_walk_once

    def spy(g_, uv, sv, col, ml, adj, ue, hop_cap):
        caps_used.append(hop_cap)
        return real_once(g_, uv, sv, col, ml, adj, ue, hop_cap)

    monkeypatch.setattr(T, "_hop_walk_once", spy)
    got_contigs, got_stats = T.assemble_linkless_contigs(
        g, seed, colour=0, max_len=1024)
    assert got_contigs == ref_contigs
    assert (got_stats == ref_stats).all()
    assert max(caps_used) > 4   # the retry actually grew the buffers
    # the contig passes many merge points (each is a hop), far more
    # than the starting cap of 4
    assert len(ref_contigs[0]) >= 200
