"""Paired-end threading tests: links must span the insert gap and
resolve repeats longer than a single read (the PE headline capability,
ref results 'PE links' NG50 rows)."""

import numpy as np
import pytest

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.links import thread as lthread
from mccortex_tpu.links import walk as lwalk

from util import random_dna, revcomp_str, seq_to_codes
from test_graph_build import batchify
from test_links import row_of, canon
from test_ctx_io import write_fasta


def make_pairs(genome, n, rlen, ins, seed=0):
    """Perfect FR pairs with fragment length = 2*rlen + ins."""
    import random
    rng = random.Random(seed)
    frag = 2 * rlen + ins
    p1, p2 = [], []
    for _ in range(n):
        s = rng.randrange(0, len(genome) - frag)
        p1.append(genome[s:s + rlen])
        p2.append(revcomp_str(genome[s + frag - rlen:s + frag]))
    return p1, p2


def test_pe_links_resolve_long_repeat():
    # repeat longer than a read but shorter than a fragment: single-end
    # links cannot resolve it, PE links can
    k = 11
    rep = random_dna(60, seed=900)   # repeat longer than rlen=40
    ua, ub = random_dna(80, seed=901), random_dna(80, seed=902)
    uc, ud = random_dna(80, seed=903), random_dna(80, seed=904)
    genome = ua + rep + ub + uc + rep + ud
    rlen, ins = 40, 30
    g = gbuild.build(batchify([(genome, 0)]), k)

    p1, p2 = make_pairs(genome, 400, rlen, ins, seed=905)
    L = rlen
    c1 = np.stack([seq_to_codes(s, pad_to=L) for s in p1])
    c2 = np.stack([seq_to_codes(s, pad_to=L) for s in p2])
    pe = lthread.thread_reads_pe(g, [(c1, c2, 0)], 1)
    assert pe.nlinks > 0

    # single-end links from the same reads
    se = lthread.thread_reads(g, [(np.concatenate([c1, c2]), 0)], 1)

    seed = row_of(g, ua[:k])
    c_se, _ = lwalk.assemble_contigs_linked(g, se, np.array([seed]),
                                            max_len=len(genome) + 50)
    c_pe, _ = lwalk.assemble_contigs_linked(g, pe, np.array([seed]),
                                            max_len=len(genome) + 50)
    # PE walk reconstructs the full genome; SE stops inside the repeat
    assert canon(c_pe[0]) == canon(genome), (len(c_pe[0]), len(genome))
    assert len(c_se[0]) < len(genome)


def test_cli_thread_pe(tmp_path):
    from mccortex_tpu.cli.main import main as mctx
    k = 11
    genome = random_dna(600, seed=910)
    rlen, ins = 50, 40
    p1, p2 = make_pairs(genome, 150, rlen, ins, seed=911)
    fa = str(tmp_path / "g.fa")
    f1 = str(tmp_path / "r1.fa")
    f2 = str(tmp_path / "r2.fa")
    write_fasta(fa, [genome])
    write_fasta(f1, p1)
    write_fasta(f2, p2)
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "pe.ctp.gz")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq2", f1, f2, ctx]) == 0
    assert mctx(["thread", "--seq2", f1, f2, "-o", ctp, ctx]) == 0
    import gzip
    txt = gzip.open(ctp, "rt").read()
    assert "num_paths" in txt
