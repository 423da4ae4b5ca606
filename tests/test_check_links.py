"""Link walkability checks (ref gpath_checks.c / ctx_health_check.c)."""

import numpy as np

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.links import thread as lthread, check as lcheck
from util import random_dna
from test_graph_build import batchify


def test_valid_links_pass():
    k = 9
    m = random_dna(40, seed=980)
    r1 = random_dna(25, seed=981) + m + random_dna(25, seed=982)
    r2 = random_dna(25, seed=983) + m + random_dna(25, seed=984)
    g = gbuild.build(batchify([(r1, 0), (r2, 0)]), k)
    links = lthread.thread_reads(g, batchify([(r1, 0), (r2, 0)]), 1)
    assert links.nlinks > 0
    nchecked, nbad, bad = lcheck.check_links(g, links)
    assert nchecked >= links.nlinks
    assert nbad == 0, bad


def test_corrupt_link_detected():
    import jax.numpy as jnp
    from mccortex_tpu.links import store as lstore
    k = 9
    m = random_dna(40, seed=990)
    r1 = random_dna(25, seed=991) + m + random_dna(25, seed=992)
    r2 = random_dna(25, seed=993) + m + random_dna(25, seed=994)
    g = gbuild.build(batchify([(r1, 0), (r2, 0)]), k)
    links = lthread.thread_reads(g, batchify([(r1, 0), (r2, 0)]), 1)
    assert links.nlinks > 0
    # corrupt every link's first junction base (junction 0 sits at
    # bits 62-63 of seq word 0; flip one bit so it stays a valid base
    # code but the wrong one)
    seq = np.asarray(links.seq).copy()
    seq[: links.nlinks, 0] ^= np.uint64(1) << np.uint64(63)
    bad_links = links.replace(seq=jnp.asarray(seq))
    nchecked, nbad, bad = lcheck.check_links(g, bad_links)
    assert nbad > 0
