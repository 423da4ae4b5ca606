"""Differential fuzzing vs the independent python references (VERDICT r2
weak item 6 mitigation: goldens lock byte-stability only; these fuzz
framework-vs-python-ref over many random genomes).

CI runs a bounded sample; scripts/fuzz_lossless.py runs the full 100+
genome sweep (results documented in ROUND3.md).
"""

import numpy as np
import pytest

from graph_ref import build_ref_graph
from test_graph_build import batchify, graph_to_dict
from util import random_dna

from mccortex_tpu.graph import build as gbuild
from mccortex_tpu.links import walk as lwalk


def canon(s):
    from util import revcomp_str
    return min(s, revcomp_str(s))


@pytest.mark.parametrize("k", [9, 21])
def test_fuzz_graph_vs_pyref(k):
    """Graph store (keys, per-colour covg, edge bytes) must equal the
    string-level python reference on random multi-colour inputs.  Fixed
    shapes per k so the compiled programs are reused across genomes."""
    rng = np.random.default_rng(9000 + k)
    for it in range(12):
        ncols = int(rng.integers(1, 3))
        inputs = []
        for c in range(ncols):
            nseq = int(rng.integers(1, 3))
            for _ in range(nseq):
                seq = random_dna(240, seed=int(rng.integers(1 << 30)))
                if rng.random() < 0.3:   # inject Ns (contig splits)
                    p = int(rng.integers(0, len(seq)))
                    seq = seq[:p] + "N" + seq[p + 1:]
                inputs.append((seq, c))
        # duplicate one sequence sometimes (coverage aggregation)
        if rng.random() < 0.5:
            inputs.append(inputs[0])
        ref = build_ref_graph(inputs, k, ncols=ncols)
        g = gbuild.build(batchify(inputs, pad_to=241), k, ncols=ncols)
        got = graph_to_dict(g, k)
        assert got == ref, (it, len(got), len(ref))


@pytest.mark.parametrize("k", [9, 31, 63])
def test_fuzz_lossless_multi_k(k):
    """The reference's signature lossless property (tests/lossless) over
    several random genomes at several k, including two-word k=63."""
    from test_links import build_g, thread_all, row_of, flanked
    rng = np.random.default_rng(7100 + k)
    n_iter = 6 if k < 63 else 3
    for it in range(n_iter):
        seq = random_dna(300, seed=int(rng.integers(1 << 30)))
        full = flanked(seq, k, seed=int(rng.integers(1 << 30)))
        g = build_g([(full, 0)], k)
        links = thread_all(g, [(full, 0)])
        seed_row = row_of(g, full[:k])
        contigs, stats = lwalk.assemble_contigs_linked(
            g, links, np.array([seed_row]), colour=0,
            max_len=len(full) + 100)
        assert canon(contigs[0]) == canon(full), (k, it, len(contigs[0]),
                                                  len(full), stats)


def test_fuzz_unitigs_vs_pyref():
    """Unitig decomposition equals the python reference walker on random
    genomes (same total sequence content, same unitig multiset)."""
    from graph_ref import ref_unitigs
    from mccortex_tpu.graph import unitigs as U
    from test_links import build_g
    rng = np.random.default_rng(7300)
    k = 11
    for it in range(8):
        seqs = [(random_dna(200, seed=int(rng.integers(1 << 30))), 0)
                for _ in range(int(rng.integers(1, 4)))]
        g = build_g(seqs, k)
        ref = build_ref_graph(seqs, k)
        want = sorted(canon(u) for u in ref_unitigs(ref, k))
        got = sorted(canon(s) for s in U.extract_unitigs(g))
        assert got == want, (it, len(got), len(want))


def _leftalign(refseq, pos, r, a):
    """Left-aligned minimal (pos, ref, alt) (bcftools norm semantics)."""
    changed = True
    while changed:
        changed = False
        if r and a and r[-1] == a[-1] and (len(r) > 1 or len(a) > 1):
            if len(r) > 1 and len(a) > 1:
                r, a = r[:-1], a[:-1]
                changed = True
            elif pos > 0:
                prev = refseq[pos - 1]
                r, a = prev + r[:-1], prev + a[:-1]
                pos -= 1
                changed = True
        if len(r) > 1 and len(a) > 1 and r[0] == a[0]:
            r, a = r[1:], a[1:]
            pos += 1
            changed = True
    return pos, r, a


def test_fuzz_bubbles_to_vcf_variant_recovery():
    """Caller differential gate: random ref + donor with planted SNPs,
    deletions and insertions; every planted variant must come out of
    bubbles -> calls2vcf as a left-align-equivalent VCF record (the
    caller may emit redundant shifted duplicates per branch — those are
    normalised away, as bcftools norm does downstream)."""
    from mccortex_tpu.calls import bubbles as bub
    from mccortex_tpu.calls import calls2vcf as c2v
    from mccortex_tpu.graph import kmer_occur as KO
    k = 21
    rng = np.random.default_rng(778)
    for it in range(4):
        ref = random_dna(1500, seed=int(rng.integers(1 << 30)))
        poss = sorted(rng.choice(np.arange(100, 1300, 4 * k), size=4,
                                 replace=False))
        donor = ref
        shift = 0
        truth = []
        for p in poss:
            p = int(p)
            p2 = p + shift
            kind = int(rng.integers(0, 3))
            if kind == 0:      # SNP
                alt = "ACGT"[("ACGT".index(donor[p2]) + 1) % 4]
                donor = donor[:p2] + alt + donor[p2 + 1:]
                truth.append((p, ref[p], alt))
            elif kind == 1:    # deletion of 1-3bp
                d = int(rng.integers(1, 4))
                truth.append(_leftalign(ref, p - 1, ref[p - 1:p + d],
                                        ref[p - 1]))
                donor = donor[:p2] + donor[p2 + d:]
                shift -= d
            else:              # insertion of 1-3bp
                ins = random_dna(int(rng.integers(1, 4)),
                                 seed=int(rng.integers(1 << 30)))
                truth.append(_leftalign(ref, p - 1, ref[p - 1],
                                        ref[p - 1] + ins))
                donor = donor[:p2] + ins + donor[p2:]
                shift += len(ins)
        g = gbuild.build(batchify([(ref, 0), (donor, 1)]), k, ncols=2)
        bl = bub.call_bubbles(g, None)
        calls = [{"name": f"b{i}", "flank5p": bb.flank5p,
                  "flank3p": bb.flank3p,
                  "branches": [(j, br)
                               for j, br in enumerate(bb.branches)]}
                 for i, bb in enumerate(bl)]
        recs, _dropped = c2v.bubbles_to_vcf(
            calls, KO.RefGenome(["chr1"], [ref]), k)
        got = {_leftalign(ref, r.pos, r.ref, r.alts[0]) for r in recs}
        for t in truth:
            assert t in got, (it, t, sorted(got))


def test_fuzz_breakpoints_deletion_recovery(tmp_path):
    """SV differential gate: large planted deletions (80-200bp — beyond
    bubble reach) must come back through breakpoints -> calls2vcf with
    the right length and position."""
    from mccortex_tpu.cli.main import main as mctx
    rng = np.random.default_rng(551)
    k = 21
    for it in range(3):
        ref = random_dna(2000, seed=int(rng.integers(1 << 30)))
        dstart = int(rng.integers(500, 1000))
        dlen = int(rng.integers(80, 200))
        donor = ref[:dstart] + ref[dstart + dlen:]
        fa_ref = str(tmp_path / f"ref{it}.fa")
        open(fa_ref, "w").write(f">chr1\n{ref}\n")
        fa_d = str(tmp_path / f"d{it}.fa")
        open(fa_d, "w").write(f">d\n{donor}\n")
        ctx = str(tmp_path / f"g{it}.ctx")
        assert mctx(["build", "-k", str(k), "-s", "ref", "-1", fa_ref,
                     "-s", "donor", "-1", fa_d, ctx]) == 0
        brk = str(tmp_path / f"brk{it}.txt.gz")
        assert mctx(["breakpoints", "-s", fa_ref, "-o", brk, ctx]) == 0
        vcf = str(tmp_path / f"b{it}.vcf")
        assert mctx(["calls2vcf", "-o", vcf, brk, fa_ref]) == 0
        recs = [ln.split("\t") for ln in open(vcf)
                if not ln.startswith("#")]
        hit = any(abs(len(r[3]) - len(r[4])) == dlen
                  and abs(int(r[1]) - 1 - dstart) <= 2 for r in recs)
        assert hit, (it, dstart, dlen,
                     [(r[1], len(r[3]), len(r[4])) for r in recs])
