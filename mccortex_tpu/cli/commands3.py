"""Third batch: breakpoints, calls2vcf, vcfcov, vcfgeno.
(ref src/commands/{ctx_breakpoints,ctx_calls2vcf,ctx_vcfcov,
ctx_vcfgeno}.c)
"""

from __future__ import annotations

import argparse
import gzip
import json

import numpy as np

from .main import register
from .commands import _status, _load_graph


def cmd_breakpoints(argv):
    p = argparse.ArgumentParser(prog="mctx breakpoints")
    p.add_argument("--seq", required=True, help="trusted reference FASTA")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-p", "--paths", action="append", default=[])
    p.add_argument("--minref", type=int, default=5)
    p.add_argument("--maxref", type=int, default=1000)
    p.add_argument("ctx")
    args = p.parse_args(argv)
    from ..calls import breakpoints as bk
    from ..graph import kmer_occur as KO
    from ..io import ctp as ctpio
    import mccortex_tpu
    h, g = _load_graph(args.ctx)
    ref = KO.RefGenome.from_fasta(args.seq)
    links = ctpio.load_link_store(args.paths, g) if args.paths else None
    calls = bk.call_breakpoints(g, ref, links, min_ref=args.minref,
                                max_ref=args.maxref)
    hdr = {
        "file_format": "CtxBreakpoints",
        "format_version": 4,
        "ncols": h.ncols,
        "kmer_size": g.k,
        "generator": f"mccortex_tpu {mccortex_tpu.__version__}",
        "commands": [{"cmd": "mctx breakpoints",
                      "min_ref_flank_kmers": args.minref,
                      "max_search_kmers": args.maxref}],
    }
    with gzip.open(args.out, "wt") as fh:
        fh.write(json.dumps(hdr, indent=2))
        fh.write("\n\n# generated with mccortex_tpu\n\n")
        for i, bp in enumerate(calls):
            runs5 = bp.flank5p_runs or [dict(bp.flank5p_run, qoffset=0)]
            runs3 = bp.flank3p_runs or [dict(bp.flank3p_run, qoffset=0)]
            c5 = ",".join(_run_str(ref, r, g.k) for r in runs5)
            c3 = ",".join(_run_str(ref, r, g.k) for r in runs3)
            cols = ",".join(map(str, sorted(set(bp.cols))))
            fh.write(f">brkpnt.call{i}.5pflank chr={c5}\n{bp.flank5p_seq}\n")
            fh.write(f">brkpnt.call{i}.3pflank chr={c3}\n{bp.flank3p_seq}\n")
            fh.write(f">brkpnt.call{i}.path cols={cols}\n"
                     f"{bp.allele_seq}\n\n")
    _status(f"found {len(calls)} breakpoints -> {args.out}")
    return 0


def cmd_calls2vcf(argv):
    p = argparse.ArgumentParser(prog="mctx calls2vcf")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-F", "--flanks", default=None,
                   help="SAM of mapped 5' flanks (ref ctx_calls2vcf -F)")
    p.add_argument("-Q", "--min-mapq", type=int, default=30,
                   help="min MAPQ for -F placements [30]")
    p.add_argument("calls", help="bubble or breakpoint call file")
    p.add_argument("ref", help="reference FASTA")
    args = p.parse_args(argv)
    from ..calls import calls2vcf as c2v
    from ..graph import kmer_occur as KO
    from ..io import callfile, vcf as vcfio
    ref = KO.RefGenome.from_fasta(args.ref)
    hdr, calls = callfile.read_call_file(args.calls)
    k = hdr.get("kmer_size")
    if not k:
        raise ValueError(f"{args.calls}: header lacks kmer_size")
    fmt = hdr.get("file_format", "")
    if fmt == "CtxBreakpoints":
        records, dropped = _breakpoint_calls_to_vcf(calls, ref, k, c2v)
    else:
        sam_places = None
        if args.flanks:
            sam_places = c2v.load_flank_sam(args.flanks, ref,
                                            args.min_mapq)
        records, dropped = c2v.bubbles_to_vcf(calls, ref, k,
                                              sam_places=sam_places)
    out = vcfio.VcfFile(
        headers=vcfio.std_headers(
            args.ref, contigs=[(n, len(s))
                               for n, s in zip(ref.names, ref.seqs)]),
        sample_names=[], records=records)
    vcfio.write_variants(args.out, out)
    _status(f"wrote {len(records)} variants ({dropped} calls dropped)")
    return 0


def _run_str(ref, r, k):
    """One colinear ref-run annotation 'chrom:start-end:strand:qoffset'
    in the reference's korun_gzprint format (kmer_occur.c): 1-based
    INCLUSIVE base coordinates (end covers the last kmer's final base;
    start > end on the minus strand), qoffset 1-based in kmers."""
    if r["strand"] == 0:
        s, e = r["first"] + 1, r["last"] + k
    else:
        s, e = r["first"] + k, r["last"] + 1
    return (f"{ref.names[r['chrom']]}:{s}-{e}:"
            f"{'+' if r['strand'] == 0 else '-'}:"
            f"{int(r.get('qoffset', 0)) + 1}")


def _breakpoint_calls_to_vcf(calls, ref, k, c2v):
    """Adapt text breakpoint calls (with chr= annotations) into the
    direct decomposition path."""
    from ..calls.breakpoints import Breakpoint
    from ..align import nw
    from ..io import vcf as vcfio
    name_idx = {n: i for i, n in enumerate(ref.names)}
    records, dropped = [], 0
    for call in calls:
        try:
            # largest-match run choice per flank (ref decomp_brkpt_call:
            # 5' prefers the run nearest the break among the longest,
            # 3' the earliest re-contact among the longest)
            r5 = _largest_run(_parse_chr_runs(call, "flank5p",
                                              name_idx, k), False)
            r3 = _largest_run(_parse_chr_runs(call, "flank3p",
                                              name_idx, k), True)
            allele = call["branches"][0][1] if call["branches"] else ""
        except (KeyError, ValueError):
            dropped += 1
            continue
        if r5 is None or r3 is None or r5["chrom"] != r3["chrom"] or \
           r5["strand"] != r3["strand"]:
            dropped += 1     # unmapped / diff chrom / diff strands
            continue
        ci = r5["chrom"]
        cseq = ref.seqs[ci]
        fw = r5["strand"] == 0
        f5seq = call.get("flank5p", "")
        f3seq = call.get("flank3p", "")
        # footprints in forward ref coords (runs are kmer starts;
        # minus runs have first > last)
        f5lo, f5hi = (min(r5["first"], r5["last"]),
                      max(r5["first"], r5["last"]) + k)
        f3lo, f3hi = (min(r3["first"], r3["last"]),
                      max(r3["first"], r3["last"]) + k)
        # our 3' flank sequence starts AT the re-contact kmer, so the
        # allele/ref boundary sits k-1 bases into the 3' footprint
        if fw:
            ref_start, ref_end = f5hi, f3lo + (k - 1)
        else:
            ref_start, ref_end = f3hi - (k - 1), f5lo
        # flank bases beyond the matched runs join the allele (ref
        # decomp_brkpt_call flank trims); with our caller's runs these
        # are zero, but foreign files may differ
        trim5 = max(len(f5seq) - (r5["qoffset"] + (f5hi - f5lo)), 0)
        trim3 = min(max(r3["qoffset"], 0), len(f3seq))
        if ref_end < ref_start:
            # overlapping flank mappings: trim flanks into the allele
            diff = ref_start - ref_end
            t5 = min(diff, len(f5seq) - trim5)
            trim5 += t5
            diff -= t5
            t3 = min(diff, len(f3seq) - trim3)
            trim3 += t3
            diff -= t3
            if diff > 0:
                dropped += 1     # flanks overlap too much (ref -4)
                continue
            if fw:
                ref_start, ref_end = ref_start - t5, ref_end + t3
            else:
                ref_start, ref_end = ref_start - t3, ref_end + t5
        branch = ((f5seq[len(f5seq) - trim5:] if trim5 else "")
                  + allele + f3seq[:trim3])
        if not fw:
            from ..utils.dna import revcomp
            branch = revcomp(branch)
        recs = nw.decompose(cseq[ref_start:ref_end], branch, ref_start,
                            cseq)
        for (p0, r, a) in recs:
            if r != a:
                records.append(vcfio.VcfRecord(
                    chrom=ref.names[ci], pos=p0, vid=call["name"],
                    ref=r, alts=[a]))
    return c2v._dedup(records), dropped


def _parse_chr_runs(call, which, name_idx, k):
    """Parse the comma-separated colinear-run list
    'chr=name:start-end:strand:qoffset,...' from a flank header (ref
    chrom_pos_list_parse, chrom_pos_list.c).  Coordinates are the
    1-based inclusive BASE range of _run_str; converted back to 0-based
    kmer-start first/last.  The legacy 3-field round-2 form (kmer-start
    coords, no qoffset) is still accepted."""
    hdr = call.get(which + "_hdr", "")
    for tok in hdr.split():
        if not tok.startswith("chr="):
            continue
        runs = []
        for body in tok[4:].split(","):
            parts = body.rsplit(":", 3)
            legacy = len(parts) < 4 or not parts[-1].isdigit() or \
                parts[-2] not in ("+", "-")
            if legacy:
                name, rng, strand = body.rsplit(":", 2)
                qoff = 1
            else:
                name, rng, strand, q = parts
                qoff = int(q)
            if name not in name_idx:
                continue
            s, e = (int(x) for x in rng.split("-"))
            if legacy:
                first, last = s - 1, e - 1
            elif strand == "+":
                first, last = s - 1, e - k
            else:
                first, last = s - k, e - 1
            runs.append({"chrom": name_idx[name], "first": first,
                         "last": last,
                         "strand": 0 if strand == "+" else 1,
                         "qoffset": qoff - 1,
                         "len": abs(last - first) + 1})
        return runs
    return []


def _largest_run(runs, use_first):
    """ref chrom_pos_list_get_largest: the longest run; ties broken by
    the lowest qoffset (use_first, 3' flank) or the highest (5')."""
    best = None
    for r in runs:
        if best is None or r["len"] > best["len"] or (
                r["len"] == best["len"]
                and (use_first == (r["qoffset"] < best["qoffset"]))):
            best = r
    return best


def cmd_vcfcov(argv):
    p = argparse.ArgumentParser(prog="mctx vcfcov")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-r", "--ref", required=True)
    p.add_argument("--max-nvars", type=int, default=8)
    p.add_argument("vcf")
    p.add_argument("ctx", nargs="+")
    args = p.parse_args(argv)
    from ..calls import genotyping as gt
    from ..graph import kmer_occur as KO
    from ..io import vcf as vcfio
    h, g = _load_graph(args.ctx[0])
    ref = KO.RefGenome.from_fasta(args.ref)
    vcf = vcfio.read_variants(args.vcf)
    if not vcf.sample_names:
        vcf.sample_names = [gi.sample_name for gi in h.ginfo]
    gt.vcfcov(vcf, ref, g, max_nvars=args.max_nvars)
    vcfio.write_variants(args.out, vcf)
    _status(f"annotated {len(vcf.records)} records with K{g.k}R/K{g.k}A")
    return 0


def cmd_vcfgeno(argv):
    p = argparse.ArgumentParser(prog="mctx vcfgeno")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-k", "--kmer", type=int, required=True)
    p.add_argument("--err", default="0.01",
                   help="per-sample error rates (comma list or one)")
    p.add_argument("--kcov", default=None,
                   help="kmer coverage per sample (comma list)")
    p.add_argument("--cov", default=None,
                   help="read depth per sample (comma list); "
                        "kcov = D*(R-k+1)/R")
    p.add_argument("--ploidy", default="2",
                   help="default ploidy (or per-sample comma list)")
    p.add_argument("--read-len", default="100",
                   help="mean read length per sample (comma list)")
    p.add_argument("vcf")
    args = p.parse_args(argv)
    from ..calls import vcfgeno as vg
    from ..io import vcf as vcfio
    if (args.kcov is None) == (args.cov is None):
        p.error("give exactly one of --kcov / --cov")
    vcf = vcfio.read_variants(args.vcf)
    S = max(len(vcf.sample_names), 1)

    def parse_list(s, cast=float):
        vals = [cast(x) for x in str(s).split(",")]
        return vals * S if len(vals) == 1 else vals

    k = args.kmer
    readlens = parse_list(args.read_len)
    readlensk = [max(r - k + 1, 1) for r in readlens]
    if args.kcov:
        kcovs = parse_list(args.kcov)
    else:
        covs = parse_list(args.cov)
        kcovs = [d * (r - k + 1) / r for d, r in zip(covs, readlens)]
    errs = parse_list(args.err)
    ploidies = parse_list(args.ploidy, int)
    ndone, nskip = vg.genotype_vcf(vcf, k, kcovs, errs, ploidies,
                                   readlensk)
    vcfio.write_variants(args.out, vcf)
    _status(f"genotyped {ndone} records ({nskip} skipped)")
    return 0


register("breakpoints", cmd_breakpoints, "call breakpoints vs reference")
register("calls2vcf", cmd_calls2vcf, "decompose calls into VCF")
register("vcfcov", cmd_vcfcov, "annotate VCF with kmer coverage")
register("vcfgeno", cmd_vcfgeno, "genotype VCF from kmer coverage")


# ---------------------------------------------------------------------------
# correct (ref ctx_correct.c) + links (ref ctx_links.c)
# ---------------------------------------------------------------------------

def cmd_correct(argv):
    p = argparse.ArgumentParser(prog="mctx correct")
    p.add_argument("--seq", action="append", default=[])
    p.add_argument("-2", "--seq2", action="append", nargs=2, default=[],
                   metavar=("R1", "R2"),
                   help="paired-end inputs: mates corrected with pair "
                        "context across the insert (ref ctx_correct)")
    p.add_argument("-l", "--min-frag-len", type=int, default=0)
    p.add_argument("-L", "--max-frag-len", type=int, default=1000)
    p.add_argument("-p", "--paths", action="append", default=[])
    p.add_argument("-o", "--out", required=True, help="output FASTA")
    p.add_argument("--colour", type=int, default=0)
    p.add_argument("-w", "--one-way", dest="one_way",
                   action="store_true", default=True,
                   help="one-way gap filling (conservative, default)")
    p.add_argument("-W", "--two-way", dest="one_way",
                   action="store_false",
                   help="two-way (meet-in-the-middle) gap filling")
    p.add_argument("-g", "--gap-hist", default=None,
                   help="save gap size distribution CSV")
    p.add_argument("-G", "--frag-hist", default=None,
                   help="save PE fragment size distribution CSV")
    p.add_argument("-d", "--gap-diff-const", type=float, default=5,
                   help="allowable gap: |exp-seen| <= exp*D + d")
    p.add_argument("-D", "--gap-diff-coeff", type=float, default=0.1,
                   help="gap tolerance coefficient")
    p.add_argument("ctx")
    args = p.parse_args(argv)
    if not args.seq and not args.seq2:
        p.error("at least one --seq/--seq2 required")
    from ..align import correct as acorrect
    from ..io import ctp as ctpio
    from ..io import seqio
    h, g = _load_graph(args.ctx)
    links = ctpio.load_link_store(args.paths, g) if args.paths else None
    aln_stats = acorrect.CorrectAlnStats()
    nreads = nfixed = ngaps = 0
    with open(args.out, "w") as out:
        for path in args.seq:
            names, seqs = [], []
            for rd in seqio.parse_reads(path):
                names.append(rd.name)
                seqs.append(rd.seq)
            if not seqs:
                continue
            from ..constants import CHAR_TO_BASE
            L = max(len(s) for s in seqs)
            arr = np.full((len(seqs), L), 4, np.uint8)
            for i, s in enumerate(seqs):
                arr[i, :len(s)] = CHAR_TO_BASE[
                    np.frombuffer(s.encode(), np.uint8)]
            res = acorrect.correct_batch(
                g, links, arr, colour=args.colour,
                one_way=args.one_way,
                gap_variance=args.gap_diff_coeff,
                gap_wiggle=args.gap_diff_const, aln_stats=aln_stats)
            for name, cr in zip(names, res):
                out.write(f">{name}\n{cr.display}\n")
                nreads += 1
                ngaps += cr.ngaps
                nfixed += cr.nfixed
        for r1, r2 in args.seq2:
            for c1, c2, _ in seqio.read_batches_pe(r1, r2):
                m1, m2 = acorrect.correct_pairs(
                    g, links, c1, c2, colour=args.colour,
                    frag_len_min=args.min_frag_len,
                    frag_len_max=args.max_frag_len,
                    one_way=args.one_way, aln_stats=aln_stats)
                for i, (a, b) in enumerate(zip(m1, m2)):
                    out.write(f">pair{nreads}/1\n{a.display}\n")
                    out.write(f">pair{nreads}/2\n{b.display}\n")
                    nreads += 1
                    ngaps += a.ngaps + b.ngaps
                    nfixed += a.nfixed + b.nfixed
    _status(f"corrected {nreads} reads: {nfixed}/{ngaps} gaps bridged")
    if aln_stats.num_gap_attempts:
        _status("[CorrectAln] " + aln_stats.summary())
    if args.gap_hist:
        aln_stats.dump_gaps(args.gap_hist)
    if args.frag_hist:
        aln_stats.dump_fraglen(args.frag_hist)
    return 0


def cmd_links(argv):
    """Clean, minimise and list links (ref ctx_links.c).

    Junction-tree semantics: --clean truncates each link at its first
    junction edge with coverage < N (not whole-link thresholding);
    --threshold auto-picks N per junction distance and takes the
    median; --covg-hist / --list / --plot inspect the trees.  Unlike
    the streaming reference, the whole link table is processed in one
    vectorised pass against the graph (kmer order = store row order).
    """
    p = argparse.ArgumentParser(prog="mctx links")
    p.add_argument("-c", "--clean", type=int, default=0,
                   help="remove junction choices with coverage < N")
    p.add_argument("-l", "--list", dest="list_csv", default=None,
                   help="write (SeqLen,Covg) CSV of link junction edges")
    p.add_argument("-P", "--plot", default=None,
                   help="write DOT of one kmer's link tree")
    p.add_argument("-T", "--threshold", default=None,
                   help="auto-pick cleaning threshold, write to file")
    p.add_argument("-H", "--covg-hist", default=None,
                   help="write dist x covg link coverage matrix CSV")
    p.add_argument("-D", "--max-dist", type=int, default=6)
    p.add_argument("-C", "--max-covg", type=int, default=100)
    p.add_argument("-L", "--limit", type=int, default=0,
                   help="only use links from first N kmers (row order)")
    p.add_argument("-o", "--out", default=None)
    p.add_argument("ctx")
    p.add_argument("ctp")
    args = p.parse_args(argv)
    from ..io import ctp as ctpio
    from ..links import link_tree as ltree
    from ..links import store as lstore
    h, g = _load_graph(args.ctx)
    links = ctpio.load_ctp(args.ctp, g)
    if args.clean and not args.out:
        p.error("Need to give --out <out.ctp.gz> with --clean")

    if args.limit:
        # restrict to links of the first N kmers with links (row order;
        # the reference limits by .ctp file order)
        offs = np.asarray(links.offsets)
        deg = np.diff(offs)
        kmer_has = (deg[0::2] + deg[1::2]) > 0
        rows = np.nonzero(kmer_has)[0][:args.limit]
        keep_v = np.zeros(len(deg), bool)
        keep_v[2 * rows] = keep_v[2 * rows + 1] = True
        lids = np.nonzero(np.repeat(keep_v, deg))[0]
        verts = np.repeat(np.arange(len(deg)), deg)[lids]
        links = lstore.assemble_csr(
            verts, np.asarray(links.seq)[lids],
            np.asarray(links.nj)[lids].astype(np.int64),
            np.asarray(links.nseen)[lids], g.capacity)
        _status(f"links: limited to first {len(rows)} kmers "
                f"({links.nlinks} links)")

    need_view = bool(args.list_csv or args.threshold or args.covg_hist
                     or args.clean)
    view = None
    if need_view:
        jpos, ok, _, _ = ltree.trace_juncpos(g, links)
        if not ok.all():
            _status(f"links: WARNING {int((~ok).sum())}/{len(ok)} links "
                    "not walkable in graph")
        view = ltree.LinkTreeView(g, links, jpos)

    if args.covg_hist or args.threshold:
        hists = view.covg_hist(args.max_dist, args.max_covg)
        if args.covg_hist:
            with open(args.covg_hist, "w") as fh:
                fh.write("dist," + ",".join(
                    str(c) for c in range(args.max_covg)) + "\n")
                for d in range(args.max_dist):
                    fh.write(f"{d}," + ",".join(
                        str(int(x)) for x in hists[d]) + "\n")
        if args.threshold:
            sug = ltree.suggest_cutoff(hists)
            with open(args.threshold, "w") as fh:
                ltree.write_threshold_file(fh, sug)
            _status(f"links: suggested_cutoff={sug['suggested_cutoff']}")

    keep = None
    if args.clean > 0:
        before = links.nlinks
        links, lstats = view.clean(args.clean)
        keep = view.keep_lengths(args.clean)
        _status(f"link clean: {before} -> {lstats['num_links']} links "
                f"({lstats['num_kmers_with_links']} kmers)")

    if args.list_csv:
        rows = view.list_rows(keep)
        with open(args.list_csv, "w") as fh:
            fh.write("SeqLen,Covg\n")
            for sl, cv in rows:
                fh.write(f"{sl},{cv}\n")

    if args.plot:
        offs = np.asarray(links.offsets)
        deg = np.diff(offs)
        rows = np.nonzero((deg[0::2] + deg[1::2]) > 0)[0]
        if len(rows):
            ki = min(args.limit - 1 if args.limit else 0, len(rows) - 1)
            with open(args.plot, "w") as fh:
                ltree.write_dot(g, links, int(rows[ki]), fh)

    if args.out:
        hdr = ctpio.load_ctp_header(args.ctp)
        ctpio.save_ctp(args.out, g, links,
                       sample_names=[gi.sample_name for gi in h.ginfo],
                       command="mctx links " + " ".join(argv),
                       prev_commands=hdr.get("commands"))
    return 0


register("correct", cmd_correct, "error-correct reads against the graph")
register("links", cmd_links, "clean / inspect link files")


def cmd_hashtest(argv):
    """Hidden micro-benchmark (role of ref ctx_exp_hashtest.c /
    mccortex.c:166-170): kmer-store insert + lookup throughput."""
    p = argparse.ArgumentParser(prog="mctx hashtest")
    p.add_argument("-n", "--num", type=int, default=1 << 20,
                   help="number of kmers")
    p.add_argument("-k", "--kmer", type=int, default=31)
    args = p.parse_args(argv)
    import time
    import jax.numpy as jnp
    from ..graph import build as gbuild
    from ..graph import store as gstore
    from ..ops import sorted as sops
    rng = np.random.default_rng(0)
    L = 256
    B = max(args.num // (L - args.kmer + 1), 1)
    bases = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    t0 = time.perf_counter()
    keys, covg, edges, nu = gbuild.count_batch(
        jnp.asarray(bases), args.kmer, 1, 0)
    keys.block_until_ready()
    t_ins = time.perf_counter() - t0
    nk = B * (L - args.kmer + 1)
    q = keys[jnp.asarray(rng.integers(0, max(int(nu), 1), args.num))]
    t0 = time.perf_counter()
    idx, found = sops.lookup(keys, q)
    idx.block_until_ready()
    t_lk = time.perf_counter() - t0
    _status(f"insert: {nk} kmers in {t_ins:.3f}s "
            f"({nk / t_ins / 1e6:.1f}M/s)")
    _status(f"lookup: {args.num} queries in {t_lk:.3f}s "
            f"({args.num / t_lk / 1e6:.1f}M/s)")
    return 0


register("hashtest", cmd_hashtest, "kmer store micro-benchmark")
