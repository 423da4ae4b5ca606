"""Link threading + linked traversal tests.

The headline gate is the LOSSLESS property (ref tests/lossless): a random
sequence must be regenerated exactly from graph + links at k=9.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.graph import store as gstore
from mccortex_tpu.graph import traverse as T
from mccortex_tpu.links import store as lstore
from mccortex_tpu.links import thread as lthread
from mccortex_tpu.links import walk as lwalk
from mccortex_tpu.io import ctp as ctpio

from util import random_dna, revcomp_str, seq_to_codes, key_str
from test_graph_build import batchify


def build_g(inputs, k, ncols=1):
    return gbuild.build(batchify(inputs), k, ncols=ncols)


def thread_all(g, inputs, ncols=1):
    batches = batchify(inputs)
    return lthread.thread_reads(g, batches, ncols)


def row_of(g, kmer_str):
    from mccortex_tpu.ops import kmer as K
    from mccortex_tpu.ops import sorted as sops
    key, _ = K.canonical(K.pack_kmers(
        jnp.asarray(seq_to_codes(kmer_str)[None]), g.k), g.k)
    row, found = sops.lookup(g.keys, key)
    assert bool(found[0]), kmer_str
    return int(row[0])


def canon(s):
    return min(s, revcomp_str(s))


def test_thread_x_shape_resolves_fork():
    """Two reads crossing a shared middle: links must route each walk
    through its own read's branches (the defining linked-dBG property)."""
    k = 7
    m = random_dna(30, seed=301)
    a1, a2 = random_dna(25, seed=302), random_dna(25, seed=303)
    b1, b2 = random_dna(25, seed=304), random_dna(25, seed=305)
    r1, r2 = a1 + m + b1, a2 + m + b2
    g = build_g([(r1, 0), (r2, 0)], k)
    links = thread_all(g, [(r1, 0), (r2, 0)])
    assert links.nlinks > 0
    # linkless walk from inside a1 stops at the merge/fork
    seed = row_of(g, a1[:k])
    c0, s0 = T.assemble_linkless_contigs(g, np.array([seed]), colour=0)
    assert len(c0[0]) < len(r1)
    # linked walk recovers the full read
    c1, s1 = lwalk.assemble_contigs_linked(g, links, np.array([seed]),
                                           colour=0)
    assert canon(c1[0]) == canon(r1), (c1[0], s1)
    seed2 = row_of(g, a2[:k])
    c2, _ = lwalk.assemble_contigs_linked(g, links, np.array([seed2]),
                                          colour=0)
    assert canon(c2[0]) == canon(r2)


def test_link_store_counts():
    k = 7
    m = random_dna(30, seed=311)
    a1, b1 = random_dna(20, seed=312), random_dna(20, seed=313)
    a2, b2 = random_dna(20, seed=314), random_dna(20, seed=315)
    r1, r2 = a1 + m + b1, a2 + m + b2
    g = build_g([(r1, 0), (r2, 0)], k)
    # seeing the same read twice doubles nseen but not nlinks
    l1 = thread_all(g, [(r1, 0), (r2, 0)])
    l2 = thread_all(g, [(r1, 0), (r1, 0), (r2, 0)])
    assert l1.nlinks == l2.nlinks
    assert int(np.asarray(l2.nseen).sum()) > int(np.asarray(l1.nseen).sum())


def flanked(seq, k, seed=0):
    """Add unique flanks so the sequence ends are unambiguous walk seeds
    (role of ref uniqkmers -F, tests/lossless recipe)."""
    rng = np.random.default_rng(seed)
    for _ in range(100):
        fl = "".join("ACGT"[i] for i in rng.integers(0, 4, 2 * k))
        fr = "".join("ACGT"[i] for i in rng.integers(0, 4, 2 * k))
        full = fl + seq + fr
        kms = {}
        ok = True
        for i in range(len(full) - k + 1):
            ks = key_str(full[i:i + k])
            kms[ks] = kms.get(ks, 0) + 1
        # flank-crossing kmers must be unique in the whole sequence
        for i in list(range(0, 3 * k)) + list(range(len(full) - 3 * k,
                                                    len(full) - k + 1)):
            if kms[key_str(full[i:i + k])] > 1:
                ok = False
                break
        if ok:
            return full
    raise RuntimeError("could not build unique flanks")


@pytest.mark.parametrize("glen,seed", [(500, 1), (2000, 2)])
def test_lossless_reconstruction(glen, seed):
    """The reference's signature property test (tests/lossless): a random
    sequence is regenerated exactly from graph + links at k=9."""
    k = 9
    seq = random_dna(glen, seed=1000 + seed)
    full = flanked(seq, k, seed=seed)
    g = build_g([(full, 0)], k)
    links = thread_all(g, [(full, 0)])
    # seed from the first kmer of the left flank
    seed_row = row_of(g, full[:k])
    contigs, stats = lwalk.assemble_contigs_linked(
        g, links, np.array([seed_row]), colour=0,
        max_len=len(full) + 100)
    assert canon(contigs[0]) == canon(full), (
        len(contigs[0]), len(full), stats)


def test_lossless_all_seeds_are_substrings():
    """Contigs pulled from every kmer are substrings of the full walk
    (what rmsubstr relies on)."""
    k = 9
    seq = random_dna(300, seed=321)
    full = flanked(seq, k, seed=3)
    g = build_g([(full, 0)], k)
    links = thread_all(g, [(full, 0)])
    n = int(g.n)
    contigs, _ = lwalk.assemble_contigs_linked(
        g, links, np.arange(0, n, 3), colour=0, max_len=len(full) + 100)
    fullc = canon(full)
    best = max(contigs, key=len)
    assert canon(best) == fullc
    rc = revcomp_str(full)
    for c in contigs:
        assert c in full or c in rc or revcomp_str(c) in full


def test_ctp_roundtrip(tmp_path):
    k = 7
    m = random_dna(30, seed=331)
    r1 = random_dna(20, seed=332) + m + random_dna(20, seed=333)
    r2 = random_dna(20, seed=334) + m + random_dna(20, seed=335)
    g = build_g([(r1, 0), (r2, 0)], k)
    links = thread_all(g, [(r1, 0), (r2, 0)])
    p = str(tmp_path / "links.ctp.gz")
    ctpio.save_ctp(p, g, links)
    links2 = ctpio.load_ctp(p, g)
    np.testing.assert_array_equal(np.asarray(links.offsets),
                                  np.asarray(links2.offsets))
    np.testing.assert_array_equal(np.asarray(links.nj),
                                  np.asarray(links2.nj))
    np.testing.assert_array_equal(np.asarray(links.seq),
                                  np.asarray(links2.seq))
    np.testing.assert_array_equal(np.asarray(links.nseen),
                                  np.asarray(links2.nseen))
    # walking with reloaded links gives identical contigs
    seed = row_of(g, r1[:k])
    c1, _ = lwalk.assemble_contigs_linked(g, links, np.array([seed]))
    c2, _ = lwalk.assemble_contigs_linked(g, links2, np.array([seed]))
    assert c1 == c2


def test_cli_thread_contigs_lossless(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    from test_ctx_io import write_fasta
    k = 9
    seq = random_dna(800, seed=341)
    full = flanked(seq, k, seed=5)
    fa = str(tmp_path / "seq.fa")
    write_fasta(fa, [full])
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "links.ctp.gz")
    outfa = str(tmp_path / "contigs.fa")
    assert mctx(["build", "-k", str(k), "--sample", "s", "--seq", fa, ctx]) == 0
    assert mctx(["thread", "--seq", fa, "-o", ctp, ctx]) == 0
    assert mctx(["contigs", "--no-reseed", "--no-missing-check",
                 "-p", ctp, "-o", outfa, ctx]) == 0
    seqs = [l.strip() for l in open(outfa) if not l.startswith(">")]
    best = max(seqs, key=len)
    assert canon(best) == canon(full)


def test_primed_contigs_from_middle_seed():
    """Priming direction 1 with direction 0's walk lets a mid-sequence
    seed reconstruct more than a cold two-direction walk (ref
    graph_walker_prime)."""
    k = 9
    seq = random_dna(600, seed=351)
    full = flanked(seq, k, seed=7)
    g = build_g([(full, 0)], k)
    links = thread_all(g, [(full, 0)])
    n = int(g.n)
    rows = np.arange(0, n, 5)
    cold, _ = lwalk.assemble_contigs_linked(
        g, links, rows, colour=0, max_len=len(full) + 100)
    primed, _ = lwalk.assemble_contigs_primed(
        g, links, rows, colour=0, max_len=len(full) + 100)
    assert sum(map(len, primed)) >= sum(map(len, cold))
    # primed contigs are still exact substrings of the truth
    rc = revcomp_str(full)
    for c in primed:
        assert c in full or c in rc or revcomp_str(c) in full
    # and at least one primed mid-seed contig reaches full length
    best = max(primed, key=len)
    assert canon(best) == canon(full)


def test_large_k_multiword_end_to_end():
    """k=63 (W=2 words): build, lookup, thread, linked walk — the
    multiword code paths (ref largeK test dir)."""
    k = 63
    seq = random_dna(900, seed=361)
    full = flanked(seq, k, seed=11)
    g = build_g([(full, 0)], k)
    assert g.W == 2
    assert int(g.n) == len({canon(full[i:i + k])
                            for i in range(len(full) - k + 1)})
    links = thread_all(g, [(full, 0)])
    seed_row = row_of(g, full[:k])
    contigs, stats = lwalk.assemble_contigs_linked(
        g, links, np.array([seed_row]), colour=0,
        max_len=len(full) + 100)
    assert canon(contigs[0]) == canon(full)


def test_missing_info_check_halts():
    """At a fork where one branch has no link support, the missing-info
    check halts the walk (MISSING_LINKS); without the check the links
    resolve it (ref graph_walker.h:89-99 / --no-missing-check)."""
    k = 9
    pre = random_dna(40, seed=370)
    alt_in = random_dna(40, seed=374)  # second path INTO the stem
    stem = random_dna(30, seed=371)
    brA = "A" + random_dna(30, seed=372)
    brB = "C" + random_dna(30, seed=373)
    r1 = pre + stem + brA          # threaded: links through the fork
    r2 = alt_in + stem + brB       # builds branch B + a merge at stem
    g = build_g([(r1, 0), (r2, 0)], k)
    links = thread_all(g, [(r1, 0)])  # thread ONLY r1
    assert links.nlinks > 0
    seed = row_of(g, pre[:k])
    relaxed, s0 = lwalk.assemble_contigs_linked(
        g, links, np.array([seed]), colour=0, missing_check=False)
    strict, s1 = lwalk.assemble_contigs_linked(
        g, links, np.array([seed]), colour=0, missing_check=True)
    assert canon(relaxed[0]) == canon(r1)
    # strict walk must stop at (or before) the unexplained fork
    assert len(strict[0]) < len(relaxed[0])
    from mccortex_tpu.graph.traverse import MISSING_LINKS
    assert MISSING_LINKS in s1[0]


def test_pickup_overflow_counted():
    # >16 distinct links on one node (a ladder of forks with
    # reconvergent spacers gives 4^3 = 64 junction strings from the
    # shared core): the per-node pickup cap must COUNT the overflow,
    # never silently drop — the reference's lists are unbounded
    import numpy as np
    import itertools
    from mccortex_tpu.links import walk as lwalk
    from mccortex_tpu.links import thread as lthread
    from mccortex_tpu.graph import build as gbuild
    from util import random_dna
    from test_graph_build import batchify
    k = 9
    core = random_dna(20, seed=555)
    s1 = random_dna(14, seed=556)
    s2 = random_dna(14, seed=557)
    s3 = random_dna(14, seed=559)
    tail = random_dna(14, seed=558)
    seqs = [(core + a + s1 + b + s2 + c + s3 + d + tail, 0)
            for a, b, c, d in itertools.product("ACGT", repeat=4)]
    g = gbuild.build(batchify(seqs), k)
    links = lthread.thread_reads(g, batchify(seqs), 1)
    off = np.asarray(links.offsets)
    cnt = off[1:] - off[:-1]
    v = int(cnt.argmax())
    assert cnt[v] > 16, cnt.max()
    st = lwalk.linked_init(g, links, np.array([v >> 1], np.int32),
                           np.array([v & 1], np.uint8), 80)
    st = lwalk.walk_linked(g, links, st, 0, max_steps=60)
    assert int(np.asarray(st.n_drop).sum()) > 0
    # every walk entry point surfaces drops via report_drops: warning
    # on stderr + accumulation into DROP_COUNTS (VERDICT r2 item 9)
    import io
    import contextlib
    lwalk.DROP_COUNTS.clear()
    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        nd = lwalk.report_drops(st, "testctx")
    assert nd == int(np.asarray(st.n_drop).sum())
    assert "link pickups dropped during testctx" in buf.getvalue()
    assert lwalk.DROP_COUNTS["testctx"] == nd


def test_hop_walk_linked_equivalence():
    """Interior-hop linked walking (get_hopinfo + fill_hop_outputs)
    must produce exactly the per-node walk's contigs, halt statuses and
    vertex paths, on a repeat-rich two-colour graph with links."""
    import numpy as np
    import jax.numpy as jnp
    from mccortex_tpu.graph import build as gbuild
    from mccortex_tpu.links import thread as lthread
    from mccortex_tpu.links import walk as lwalk
    from util import random_dna, seq_to_codes

    k = 11
    rng = np.random.default_rng(909)
    unit = random_dna(40, seed=910)
    parts = []
    for i in range(6):
        parts.append(random_dna(60, seed=920 + i))
        parts.append(unit)
    genome = "".join(parts) + random_dna(60, seed=940)
    reads = [genome[i:i + 50] for i in range(0, len(genome) - 50, 7)]
    bases = np.stack([seq_to_codes(s) for s in reads])
    g = gbuild.build([(bases, 0), (bases[::2], 1)], k, ncols=2)
    links = lthread.thread_reads(g, [(bases, 0), (bases[::2], 1)], 2)
    assert links.nlinks > 0

    n = int(g.n)
    seeds = (np.arange(24) * 13) % n
    from mccortex_tpu.graph import adjacency as adjmod
    adj = adjmod.get_adjacency(g)
    hopinfo = lwalk.get_hopinfo(g, links)
    for colour in (0, 1, None):
        st_a = lwalk.linked_init(g, links, jnp.asarray(seeds, jnp.int32),
                                 jnp.zeros(len(seeds), jnp.uint8), 512)
        st_a = lwalk.walk_linked_chunked(g, links, st_a, colour, 513,
                                         adj=adj)
        st_b = lwalk.linked_init(g, links, jnp.asarray(seeds, jnp.int32),
                                 jnp.zeros(len(seeds), jnp.uint8), 512)
        st_b = lwalk.walk_linked_chunked(g, links, st_b, colour, 513,
                                         adj=adj, hopinfo=hopinfo,
                                         chunk=4096)
        ob, ov = lwalk.fill_hop_outputs(g, st_b)
        la = np.asarray(st_a.base.out_len)
        lb = np.asarray(st_b.base.out_len)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(np.asarray(st_a.base.status),
                                      np.asarray(st_b.base.status))
        oa = np.asarray(st_a.base.out_bases)
        va = np.asarray(st_a.base.out_vert)
        for i in range(len(seeds)):
            np.testing.assert_array_equal(oa[i, :la[i]], ob[i, :la[i]],
                                          err_msg=f"bases col={colour} "
                                                  f"walker {i}")
            np.testing.assert_array_equal(va[i, :la[i]], ov[i, :la[i]],
                                          err_msg=f"verts col={colour} "
                                                  f"walker {i}")
        # hops actually happened (the optimisation is live)
        if colour == 0:
            assert int(np.asarray(st_b.hop_cnt).sum()) > 0
