"""LinkTree-equivalent link cleaning (ref src/paths/link_tree.c,
src/commands/ctx_links.c).

The signature property: cleaning truncates a link at its first
low-coverage junction — the TAIL is removed, not the whole link
(ref _ltree_clean_link), and surviving prefixes merge.
"""

import io

import numpy as np
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.links import link_tree as ltree
from mccortex_tpu.links import store as lstore
from mccortex_tpu.links import thread as lthread

from util import random_dna, revcomp_str
from test_graph_build import batchify


K = 9


def build_g(inputs, k=K, ncols=1):
    return gbuild.build(batchify([(s, 0) for s in inputs]), k,
                        ncols=ncols)


def thread_all(g, inputs, ncols=1):
    return lthread.thread_reads(
        g, batchify([(s, 0) for s in inputs]), ncols)


def two_junction_layout(seed=7):
    """p1|p2 -> common -> a|b, a -> mid -> c|d: the merge into `common`
    makes links attach at the end of p1/p2 (links attach before
    in-junctions); such links carry the two forward junction choices
    (a-vs-b, then c-vs-d)."""
    p1 = random_dna(14, 11)
    p2 = random_dna(14, 12)
    common = random_dna(30, 1)
    a = random_dna(12, 2)
    b = random_dna(12, 3)
    mid = random_dna(14, 4)
    c = random_dna(12, 5)
    d = random_dna(12, 6)
    return p1, p2, common, a, b, mid, c, d


def _link_strs(g, links):
    """(vert, juncs, nseen) triples as python-friendly tuples."""
    offs = np.asarray(links.offsets)
    verts = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    nj = np.asarray(links.nj)
    bases = ltree.unpack_bases(np.asarray(links.seq), nj)
    ns = np.asarray(links.nseen).sum(axis=1)
    out = []
    for i in range(links.nlinks):
        juncs = "".join("ACGT"[x] for x in bases[i, :nj[i]])
        out.append((int(verts[i]), juncs, int(ns[i])))
    return out


def test_clean_truncates_tail_not_whole_link():
    p1, p2, common, a, b, mid, c, d = two_junction_layout()
    deep = p1 + common + a + mid + c     # seen 5x
    shallow = p1 + common + a + mid + d  # seen 1x (weak 2nd junction)
    other = p1 + common + b              # make the 1st junction real
    merge = p2 + common + b              # make `common` a merge point
    reads = [deep] * 5 + [shallow] * 1 + [other] * 3 + [merge]
    g = build_g(reads)
    links = thread_all(g, reads)

    jpos, ok, _, _ = ltree.trace_juncpos(g, links)
    assert ok.all()
    view = ltree.LinkTreeView(g, links, jpos)
    cleaned, stats = view.clean(cutoff=3)

    before = _link_strs(g, links)
    after = _link_strs(g, cleaned)
    # every 2-junction link whose tail was weak must survive truncated
    # to its first junction, not disappear
    max_nj_before = max(len(j) for _, j, _ in before)
    max_nj_after = max(len(j) for _, j, _ in after)
    assert max_nj_before >= 2
    assert len(after) > 0
    # no link with a weak (<3) final-edge count survives
    for _, juncs, ns in after:
        assert ns >= 3
    # the deep path (5x through both junctions) is still present with
    # 2 junctions somewhere
    assert max_nj_after >= 2


def test_clean_merges_prefixes():
    """Two links sharing junction 1 where both tails are weak: they
    truncate to the same prefix and merge into ONE link whose count is
    the shared-edge count (sum of both)."""
    p1, p2, common, a, b, mid, c, d = two_junction_layout()
    r1 = p1 + common + a + mid + c
    r2 = p1 + common + a + mid + d
    other = p1 + common + b
    merge = p2 + common + b
    reads = [r1] * 2 + [r2] * 2 + [other] * 2 + [merge]
    g = build_g(reads)
    links = thread_all(g, reads)
    jpos, ok, _, _ = ltree.trace_juncpos(g, links)
    view = ltree.LinkTreeView(g, links, jpos)
    cleaned, stats = view.clean(cutoff=3)
    after = _link_strs(g, cleaned)
    # the two 2-junction links collapse to one 1-junction link with
    # count 4 (2+2 through the shared first junction edge)
    assert any(len(j) == 1 and ns == 4 for _, j, ns in after)
    for _, j, ns in after:
        assert len(j) <= 1 or ns >= 3


def test_covg_hist_and_threshold():
    p1, p2, common, a, b, mid, c, d = two_junction_layout()
    reads = ([p1 + common + a + mid + c] * 20
             + [p1 + common + a + mid + d] * 1
             + [p1 + common + b] * 10 + [p2 + common + b])
    g = build_g(reads)
    links = thread_all(g, reads)
    jpos, ok, _, _ = ltree.trace_juncpos(g, links)
    view = ltree.LinkTreeView(g, links, jpos)
    hists = view.covg_hist(distsize=40, covgsize=100)
    assert hists.sum() > 0
    # every unique junction edge appears exactly once per root
    sug = ltree.suggest_cutoff(hists)
    assert "suggested_cutoff" in sug
    buf = io.StringIO()
    ltree.write_threshold_file(buf, sug)
    assert buf.getvalue().startswith("sumcovgs=")


def test_list_rows_seqlen():
    p1, p2, common, a, b, mid, c, d = two_junction_layout()
    reads = ([p1 + common + a + mid + c] * 3 + [p1 + common + b] * 2
             + [p2 + common + b])
    g = build_g(reads)
    links = thread_all(g, reads)
    jpos, ok, _, _ = ltree.trace_juncpos(g, links)
    view = ltree.LinkTreeView(g, links, jpos)
    rows = view.list_rows()
    assert rows.shape[0] > 0
    # SeqLen = k + dist + 1 > k for every edge
    assert (rows[:, 0] > K).all()
    assert (rows[:, 1] > 0).all()


def test_write_dot_smoke():
    p1, p2, common, a, b, mid, c, d = two_junction_layout()
    reads = ([p1 + common + a + mid + c] * 3 + [p1 + common + b] * 2
             + [p2 + common + b])
    g = build_g(reads)
    links = thread_all(g, reads)
    offs = np.asarray(links.offsets)
    deg = np.diff(offs)
    rows = np.nonzero((deg[0::2] + deg[1::2]) > 0)[0]
    buf = io.StringIO()
    ltree.write_dot(g, links, int(rows[0]), buf)
    s = buf.getvalue()
    assert s.startswith("digraph G {") and s.rstrip().endswith("}")
    assert "->" in s


def test_trace_ok_is_walkability():
    """A link whose junction base has no edge must trace not-ok."""
    p1, p2, common, a, b, mid, c, d = two_junction_layout()
    reads = [p1 + common + a] * 3 + [p1 + common + b] * 2 + \
        [p2 + common + a]
    g = build_g(reads)
    links = thread_all(g, reads)
    jpos, ok, _, _ = ltree.trace_juncpos(g, links)
    assert ok.all()
    # corrupt a link's junction bases -> walk must fail
    import jax.numpy as jnp
    bad = links.replace(seq=jnp.where(
        jnp.arange(links.nlinks)[:, None] == 0,
        links.seq ^ jnp.uint64(3 << 62), links.seq))
    _, ok2, _, _ = ltree.trace_juncpos(g, bad)
    assert not ok2[0]
