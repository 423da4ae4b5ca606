"""Byte-level golden-file regression tests.

The reference binary cannot be built in this image (submodules are not
vendored), so the goldens are generated ONCE by this framework from a
deterministic fixture and locked in by sha256 (tests/goldens/
MANIFEST.json): any byte change to .ctx/.ctp serialisation, call files,
or VCF output fails here — the role of mccortex's tests/ recipe suite
(SURVEY.md §4 tier 2).  Regenerate deliberately with
MCTX_REGEN_GOLDENS=1 after an intentional format change.
"""

import gzip
import hashlib
import json
import os
import subprocess
import sys

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
MANIFEST = os.path.join(GOLD, "MANIFEST.json")
K = 11


def _fixture_seqs():
    rng = np.random.default_rng(123456)
    dna = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    genome = dna(400)
    alt = genome[:200] + ("A" if genome[200] != "A" else "C") \
        + genome[201:]
    reads = []
    for start in range(0, 360, 20):        # 2x tiling of both haplotypes
        reads.append(genome[start:start + 60])
        reads.append(alt[start:start + 60])
    return genome, reads


def _run_pipeline(tmp):
    from mccortex_tpu.cli.main import main as mctx
    genome, reads = _fixture_seqs()
    fa = os.path.join(tmp, "reads.fa")
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    ref_fa = os.path.join(tmp, "ref.fa")
    with open(ref_fa, "w") as f:
        f.write(f">chr1\n{genome}\n")
    ctx = os.path.join(tmp, "g.ctx")
    ctp = os.path.join(tmp, "l.ctp.gz")
    bub = os.path.join(tmp, "bubbles.txt.gz")
    vcf = os.path.join(tmp, "out.vcf")
    assert mctx(["build", "-k", str(K), "--sample", "golden",
                 "--seq", fa, ctx]) == 0
    assert mctx(["thread", "--seq", fa, "-o", ctp, ctx]) == 0
    assert mctx(["bubbles", "-o", bub, "-p", ctp, ctx]) == 0
    assert mctx(["calls2vcf", "-o", vcf, bub, ref_fa]) == 0
    return {"g.ctx": ctx, "l.ctp.gz": ctp, "bubbles.txt.gz": bub,
            "out.vcf": vcf}


def _digest(path):
    """sha256 of content: gz members decompressed (gzip stores mtime)
    and volatile JSON-header provenance fields (cmd paths, cwd, dates)
    scrubbed before hashing."""
    import re
    data = open(path, "rb").read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    for field in (b"cmd", b"cwd", b"date"):
        data = re.sub(b'"' + field + b'": "[^"]*"',
                      b'"' + field + b'": "X"', data)
    data = re.sub(rb"##(reference|fileDate|fileDate=.*|source)=[^\n]*",
                  b"##X", data)
    return hashlib.sha256(data).hexdigest()


def test_pipeline_outputs_match_goldens(tmp_path):
    outs = _run_pipeline(str(tmp_path))
    digests = {name: _digest(p) for name, p in outs.items()}
    if os.environ.get("MCTX_REGEN_GOLDENS") or \
            not os.path.exists(MANIFEST):
        os.makedirs(GOLD, exist_ok=True)
        for name, p in outs.items():
            with open(p, "rb") as src, \
                    open(os.path.join(GOLD, name), "wb") as dst:
                dst.write(src.read())
        json.dump(digests, open(MANIFEST, "w"), indent=1)
        pytest.skip("goldens (re)generated")
    want = json.load(open(MANIFEST))
    assert digests == want, {
        n: (digests.get(n), want.get(n))
        for n in set(digests) | set(want)
        if digests.get(n) != want.get(n)}


def test_golden_ctx_reloads():
    if not os.path.exists(MANIFEST):
        pytest.skip("no goldens yet")
    from mccortex_tpu.io import ctx as ictx
    h, keys, covg, edges = ictx.read_ctx(os.path.join(GOLD, "g.ctx"))
    assert h.kmer_size == K and len(keys) > 0
    assert (np.diff(keys[:, 0].astype(np.int64)) >= 0).all() or \
        keys.shape[1] > 1
