"""Server links/--disk mode, DiskGraphReader, and check -p
(VERDICT r1 item 9 parity)."""

import json

import numpy as np

from util import random_dna
from test_ctx_io import write_fasta


def _setup(tmp_path, k=9):
    from mccortex_tpu.cli.main import main as mctx
    m = random_dna(40, seed=1000)
    r1 = random_dna(25, seed=1001) + m + random_dna(25, seed=1002)
    r2 = random_dna(25, seed=1003) + m + random_dna(25, seed=1004)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [r1, r2])
    ctx = str(tmp_path / "g.ctx")
    ctp = str(tmp_path / "l.ctp.gz")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq", fa, ctx]) == 0
    assert mctx(["thread", "--seq", fa, "-o", ctp, ctx]) == 0
    assert mctx(["index", ctx]) == 0
    return ctx, ctp, (r1, r2, m)


def test_disk_reader_matches_memory(tmp_path):
    from mccortex_tpu.io import ctx as ictx
    ctx, _ctp, _ = _setup(tmp_path)
    h, keys, covg, edges = ictx.read_ctx(ctx)
    dg = ictx.DiskGraphReader(ctx)
    assert dg.n == len(keys)
    rng = np.random.default_rng(3)
    for i in rng.integers(0, len(keys), 20):
        hit = dg.lookup(keys[int(i)])
        assert hit is not None
        row, cv, ed = hit
        assert row == int(i)
        np.testing.assert_array_equal(cv, covg[int(i)])
        np.testing.assert_array_equal(ed, edges[int(i)])
    # absent kmer
    fake = np.array([0x155555555] * keys.shape[1], np.uint64)
    if not (keys == fake).all(axis=1).any():
        assert dg.lookup(fake) is None
    dg.close()


def test_server_links_and_disk(tmp_path, capsys, monkeypatch):
    import io, sys
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctp as ctpio
    from mccortex_tpu.cli.commands import _load_graph
    from mccortex_tpu.links.walk import link_vertices
    from mccortex_tpu.utils.text import kmers_to_strings
    ctx, ctp, _ = _setup(tmp_path)
    # find a kmer with links
    h, g = _load_graph(ctx)
    links = ctpio.load_ctp(ctp, g)
    lv = np.asarray(link_vertices(links, g.capacity))
    row = int(lv[0]) >> 1
    km = kmers_to_strings(np.asarray(g.keys)[row:row + 1], g.k)[0]

    monkeypatch.setattr(sys, "stdin", io.StringIO(km + "\n"))
    assert mctx(["server", "-p", ctp, ctx]) == 0
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    resp = json.loads(out[-1])
    assert resp["find"] and len(resp["links"]) >= 1
    assert set(resp["links"][0]) == {"forward", "juncs", "colours"}
    assert all(c in "ACGT" for c in resp["links"][0]["juncs"])

    monkeypatch.setattr(sys, "stdin", io.StringIO(km + "\n"))
    assert mctx(["server", "--disk", ctx]) == 0
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    resp2 = json.loads(out[-1])
    assert resp2["find"] and resp2["colours"] == resp["colours"]


def test_check_with_links(tmp_path, capsys):
    from mccortex_tpu.cli.main import main as mctx
    ctx, ctp, _ = _setup(tmp_path)
    assert mctx(["check", "-p", ctp, ctx]) == 0


def test_disk_reader_k63_two_words(tmp_path):
    # multi-word keys: memcmp order of big-endian void rows must equal
    # multiword lexicographic key order
    from mccortex_tpu.cli.main import main as mctx
    from mccortex_tpu.io import ctx as ictx
    from util import random_dna
    from test_ctx_io import write_fasta
    k = 63
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [random_dna(400, seed=2200)])
    ctx = str(tmp_path / "g.ctx")
    assert mctx(["build", "-k", str(k), "--sample", "s",
                 "--seq", fa, ctx]) == 0
    assert mctx(["index", ctx]) == 0
    h, keys, covg, edges = ictx.read_ctx(ctx)
    assert keys.shape[1] == 2
    dg = ictx.DiskGraphReader(ctx)
    rng = np.random.default_rng(4)
    for i in rng.integers(0, len(keys), 12):
        hit = dg.lookup(keys[int(i)])
        assert hit is not None and hit[0] == int(i)
    dg.close()
