"""Caller differential sweep: planted-variant recovery over many random
genomes (the big-brother of tests/test_fuzz.py's bounded versions).

Per genome: random ref, donor with planted SNPs + 1-3bp indels; build
the 2-colour graph, call bubbles, decompose to VCF, and require every
planted variant (left-align normalised).  Every N genomes also plants
one large deletion and checks the breakpoints path.

Usage: python scripts/fuzz_callers.py [n_genomes] [seed]
Prints one summary line; exits nonzero on any miss.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import tempfile

import numpy as np


def leftalign(refseq, pos, r, a):
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


def random_dna(n, rng):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def main():
    n_genomes = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    import jax  # noqa: F401
    from mccortex_tpu.graph import build as gbuild
    from mccortex_tpu.calls import bubbles as bub
    from mccortex_tpu.calls import calls2vcf as c2v
    from mccortex_tpu.graph import kmer_occur as KO
    from mccortex_tpu.constants import CHAR_TO_BASE
    from mccortex_tpu.cli.main import main as mctx

    rng = np.random.default_rng(seed)
    k = 21
    total = missed = 0
    sv_total = sv_missed = 0
    tmp = tempfile.mkdtemp()

    def codes(s):
        return CHAR_TO_BASE[np.frombuffer(s.encode(), np.uint8)][None, :]

    for it in range(n_genomes):
        glen = int(rng.integers(1200, 2400))
        ref = random_dna(glen, rng)
        nvar = int(rng.integers(2, 6))
        slots = np.arange(100, glen - 200, 4 * k)
        if len(slots) < nvar:
            continue
        poss = sorted(int(x) for x in
                      rng.choice(slots, size=nvar, replace=False))
        donor = ref
        shift = 0
        truth = []
        for pp in poss:
            p2 = pp + shift
            kind = int(rng.integers(0, 3))
            if kind == 0:
                alt = "ACGT"[("ACGT".index(donor[p2]) + 1) % 4]
                donor = donor[:p2] + alt + donor[p2 + 1:]
                truth.append((pp, ref[pp], alt))
            elif kind == 1:
                d = int(rng.integers(1, 4))
                truth.append(leftalign(ref, pp - 1,
                                       ref[pp - 1:pp + d], ref[pp - 1]))
                donor = donor[:p2] + donor[p2 + d:]
                shift -= d
            else:
                ins = random_dna(int(rng.integers(1, 4)), rng)
                truth.append(leftalign(ref, pp - 1, ref[pp - 1],
                                       ref[pp - 1] + ins))
                donor = donor[:p2] + ins + donor[p2:]
                shift += len(ins)
        g = gbuild.build([(codes(ref), 0), (codes(donor), 1)], k,
                         ncols=2)
        bl = bub.call_bubbles(g, None)
        calls = [{"name": f"b{i}", "flank5p": bb.flank5p,
                  "flank3p": bb.flank3p,
                  "branches": [(j, br)
                               for j, br in enumerate(bb.branches)]}
                 for i, bb in enumerate(bl)]
        recs, _ = c2v.bubbles_to_vcf(calls, KO.RefGenome(["c"], [ref]),
                                     k)
        got = {leftalign(ref, r.pos, r.ref, r.alts[0]) for r in recs}
        for t in truth:
            total += 1
            if t not in got:
                missed += 1
                print(f"MISS genome {it}: {t}", file=sys.stderr)

        if it % 10 == 0:
            # SV path: one large deletion through breakpoints
            sv_total += 1
            dstart = int(rng.integers(400, glen - 600))
            dlen = int(rng.integers(80, 250))
            dn = ref[:dstart] + ref[dstart + dlen:]
            fa_r = f"{tmp}/r{it}.fa"
            fa_d = f"{tmp}/d{it}.fa"
            open(fa_r, "w").write(f">c\n{ref}\n")
            open(fa_d, "w").write(f">d\n{dn}\n")
            ctx = f"{tmp}/g{it}.ctx"
            brk = f"{tmp}/k{it}.txt.gz"
            vcf = f"{tmp}/v{it}.vcf"
            assert mctx(["build", "-q", "-f", "-k", str(k), "-s", "r",
                         "-1", fa_r, "-s", "d", "-1", fa_d, ctx]) == 0
            assert mctx(["breakpoints", "-q", "-f", "-s", fa_r,
                         "-o", brk, ctx]) == 0
            assert mctx(["calls2vcf", "-q", "-f", "-o", vcf, brk,
                         fa_r]) == 0
            rows = [ln.split("\t") for ln in open(vcf)
                    if not ln.startswith("#")]
            hit = any(abs(len(r[3]) - len(r[4])) == dlen
                      and abs(int(r[1]) - 1 - dstart) <= 2 for r in rows)
            if not hit:
                sv_missed += 1
                print(f"SV MISS genome {it}: del {dstart}+{dlen}",
                      file=sys.stderr)
        if (it + 1) % 20 == 0:
            print(f"... {it + 1}/{n_genomes} genomes, "
                  f"{total - missed}/{total} variants, "
                  f"{sv_total - sv_missed}/{sv_total} SVs",
                  file=sys.stderr)
            # XLA:CPU in-process compile cap (CLAUDE.md): clear caches
            jax.clear_caches()

    print(f"fuzz_callers: {n_genomes} genomes | small variants "
          f"{total - missed}/{total} | large deletions "
          f"{sv_total - sv_missed}/{sv_total}")
    return 1 if (missed or sv_missed) else 0


if __name__ == "__main__":
    sys.exit(main())
