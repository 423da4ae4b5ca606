"""mctx subcommands (role of ref src/commands/ctx_*.c shells).

Each command: argparse parse, load inputs, run the tool, write outputs.
Registered incrementally as tools are implemented.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .main import register


from .common import status as _status, add_common, apply_common


# ---------------------------------------------------------------------------
# build (ref: src/commands/ctx_build.c)
# ---------------------------------------------------------------------------

def cmd_build(argv):
    p = argparse.ArgumentParser(
        prog="mctx build",
        description="reads -> coloured .ctx graph",
        epilog="colour tasks (order on the command line defines the "
               "colours): -s/--sample <name> starts a colour; "
               "-1/--seq <in>, -2/--seq2 <in1>:<in2> (or two args), "
               "-i/--seqi <interleaved> add that colour's reads; "
               "-g/--graph <in.ctx> slots an existing graph's colours "
               "in at its position (ref ctx_build.c)")
    p.add_argument("-k", "--kmer", type=int, required=True)
    p.add_argument("--sample", action="append", default=[],
                   help="start a new colour with this sample name")
    p.add_argument("--seq", action="append", default=[], nargs="+",
                   help="sequence file(s) for the current sample")
    p.add_argument("-Q", "--fq-cutoff", type=int, default=0)
    p.add_argument("-O", "--fq-offset", type=int, default=0,
                   help="FASTQ quality ASCII offset: 33 or 64 "
                        "[default: 0 = auto-detect per file]")
    p.add_argument("-H", "--cut-hp", type=int, default=0)
    p.add_argument("-M", "--matepair", default="FR",
                   choices=["FF", "FR", "RF", "RR"],
                   help="mate pair orientation for --seq2 PCR-duplicate "
                        "detection (ref ctx_build.c -M)")
    p.add_argument("-p", "--remove-pcr", action="store_true",
                   help="drop reads whose start kmers were already seen "
                        "as read starts (PCR duplicate removal)")
    p.add_argument("--sort", action="store_true",
                   help="sort output kmers (accepted for parity: the "
                        "TPU store is always sorted, .ctx is written "
                        "sorted regardless)")
    p.add_argument("-P", "--keep-pcr", action="store_true",
                   help="no PCR duplicate removal (default; parity flag "
                        "with ref ctx_build.c)")
    p.add_argument("-I", "--intersect", default=None,
                   help="only keep kmers also present in this graph "
                        "(ref ctx_build.c --intersect)")
    p.add_argument("--ref", default=None,
                   help="reference FASTA for mapped-CRAM inputs "
                        "(htslib resolves it via REF_PATH/M5; here "
                        "explicit; unmapped/embedded-ref CRAMs need "
                        "none)")
    p.add_argument("-o", "--out", dest="out_explicit", default=None)
    p.add_argument("out", nargs="?", default=None)
    add_common(p)
    # pair --sample/--seq by order on the command line
    args, tasks = _parse_build_tasks(p, argv)
    out = args.out_explicit or args.out
    if not out:
        p.error("output .ctx path required")
    if not tasks:
        p.error("at least one --sample ... --seq ... required")
    apply_common(args, out)

    from ..graph import build as gbuild
    from ..graph import store as gstore
    from ..io import ctx as ctxio
    from ..io import seqio
    if args.fq_offset:
        if args.fq_offset not in (33, 64):
            p.error("--fq-offset must be 33 or 64 (0 = auto)")
        seqio.FQ_OFFSET = args.fq_offset
    if args.ref:
        from ..graph import kmer_occur as _KO
        _rg = _KO.RefGenome.from_fasta(args.ref)
        seqio.CRAM_REF = {n: s for n, s in zip(_rg.names, _rg.seqs)}
    import jax.numpy as jnp

    from .common import check_kmer
    k = check_kmer(args.kmer, p)
    ginfo = []
    batches = []
    gmerge = []   # (colour offset, keys, covg, edges) from --graph files
    pcr = gbuild.PcrDupFilter(k) if args.remove_pcr else None
    ndup = 0
    colour = 0
    for task in tasks:
        if task[0] == "graph":
            h2, k2, c2, e2 = ctxio.read_ctx(task[1])
            if h2.kmer_size != k:
                p.error(f"--graph {task[1]}: kmer size "
                        f"{h2.kmer_size} != {k}")
            gmerge.append((colour, k2, c2, e2))
            ginfo.extend(h2.ginfo)
            _status(f"colour {colour}..{colour + h2.ncols - 1}: graph "
                    f"{task[1]} ({len(k2)} kmers)")
            colour += h2.ncols
            continue
        _, sample, files = task
        total_seq = 0
        nreads = 0

        def _mask(codes, quals):
            if quals is not None and args.fq_cutoff:
                return np.asarray(gbuild.mask_reads(
                    jnp.asarray(codes), jnp.asarray(quals),
                    fq_cutoff=args.fq_cutoff, hp_cutoff=args.cut_hp))
            if args.cut_hp:
                return np.asarray(gbuild.mask_reads(
                    jnp.asarray(codes), None, hp_cutoff=args.cut_hp))
            return codes

        def _emit(codes, quals):
            nonlocal total_seq, nreads
            codes = _mask(codes, quals)
            total_seq += int((codes < 4).sum())
            nreads += codes.shape[0]
            batches.append((codes, colour))

        for entry in files:
            kind = entry[0]
            if kind == "se":
                for codes, quals, _ in seqio.read_batches_native(
                        [entry[1]], colour=colour, overlap=k):
                    if pcr is not None:
                        keepm = pcr.filter_batch(codes)
                        ndup += int((~keepm).sum())
                        codes = codes[keepm]
                        quals = quals[keepm] if quals is not None                             else None
                        if codes.shape[0] == 0:
                            continue
                    _emit(codes, quals)
            elif kind == "pe":
                # pair-aware PCR: a pair is dropped only when BOTH
                # mates' start kmers were seen (ref build_graph.c:62)
                for c1, c2, _ in seqio.read_batches_pe(
                        entry[1], entry[2], colour=colour,
                        matedir=args.matepair):
                    if pcr is not None:
                        keepm = pcr.filter_batch(c1, c2)
                        ndup += int((~keepm).sum()) * 2
                        c1, c2 = c1[keepm], c2[keepm]
                        if c1.shape[0] == 0:
                            continue
                    _emit(c1, None)
                    _emit(c2, None)
            else:   # interleaved: even rows = r1, odd rows = r2
                for c1, c2, q1, q2, _ in seqio.read_batches_interleaved(
                        entry[1], colour=colour,
                        matedir=args.matepair):
                    if pcr is not None:
                        keepm = pcr.filter_batch(c1, c2)
                        ndup += int((~keepm).sum()) * 2
                        c1, c2 = c1[keepm], c2[keepm]
                        q1 = q1[keepm] if q1 is not None else None
                        q2 = q2[keepm] if q2 is not None else None
                        if c1.shape[0] == 0:
                            continue
                    _emit(c1, q1)
                    _emit(c2, q2)
        gi = ctxio.GraphInfo(sample_name=sample, total_sequence=total_seq,
                             mean_read_length=(total_seq // max(nreads, 1)))
        ginfo.append(gi)
        _status(f"colour {colour} '{sample}': {nreads} reads, "
                f"{total_seq} bases")
        colour += 1
    ncols = colour

    if args.keep_pcr and args.remove_pcr:
        p.error("--keep-pcr conflicts with --remove-pcr")
    if args.remove_pcr:
        _status(f"removed {ndup} PCR duplicate reads")
    budget = None
    if args.memory:
        from ..utils import membudget as mb
        from ..constants import nwords as _nw
        budget = mb.parse_mem(args.memory)
        cap = mb.kmers_in_budget(budget, _nw(k), ncols)
        _status(f"memory budget {mb.mem_str(budget)}: up to {cap} kmers")
    from .common import nkmers_hint, devices_arg
    n_dev = devices_arg(args)
    if n_dev > 1:
        from ..parallel import shard as psh
        mesh = psh.make_mesh(n_dev)
        _status(f"sharded build over {n_dev} devices "
                f"(kmer-space hash partition)")
        g = psh.build_sharded(batches, k, ncols, mesh,
                              capacity_hint=nkmers_hint(args))
    else:
        g = gbuild.build(batches, k, ncols=ncols,
                         capacity=nkmers_hint(args))
    if gmerge:
        hk, hc, he = gstore.to_host(g)
        allk, allc, alle = [hk], [hc], [he]
        for off, k2, c2, e2 in gmerge:
            cw = np.zeros((len(k2), ncols), hc.dtype)
            ew = np.zeros((len(k2), ncols), np.uint8)
            cw[:, off:off + c2.shape[1]] = c2
            ew[:, off:off + e2.shape[1]] = e2
            allk.append(k2)
            allc.append(cw)
            alle.append(ew)
        g = gstore.from_records(
            k, jnp.asarray(np.concatenate(allk)),
            jnp.asarray(np.concatenate(allc)),
            jnp.asarray(np.concatenate(alle)))
    if args.intersect:
        from ..ops import sorted as _sops
        hi_, ikeys, _ic, _ie = ctxio.read_ctx(args.intersect)
        if hi_.kmer_size != k:
            p.error(f"--intersect kmer size {hi_.kmer_size} != {k}")
        _idx, found = _sops.lookup(jnp.asarray(ikeys), g.keys)
        live = ~_sops.is_sentinel(g.keys)
        keep = np.asarray(found) & np.asarray(live)
        g = gstore.from_records(
            k, jnp.asarray(np.asarray(g.keys)[keep]),
            jnp.asarray(np.asarray(g.covg)[keep]),
            jnp.asarray(np.asarray(g.edges)[keep]))
        for gi in ginfo:
            gi.cleaning.is_graph_intersection = True
            gi.cleaning.intersection_name = args.intersect
        _status(f"intersected with {args.intersect}: {int(g.n)} kmers")
    if budget is not None:
        from ..utils import membudget as mb
        from ..constants import nwords as _nw
        used = mb.graph_mem_bytes(int(g.n), _nw(k), ncols)
        _status(mb.check_plan(budget, used))
    keys, covg, edges = gstore.to_host(g)
    hdr = ctxio.CtxHeader(kmer_size=k, ginfo=ginfo)
    ctxio.write_ctx(out, hdr, keys, covg, edges)
    _status(f"wrote {len(keys)} kmers x {ncols} colours to {out}")
    return 0


def _parse_build_tasks(p, argv):
    """Pair --sample with following --seq groups, preserving CLI order
    (ref ctx_build.c getopt loop; -g/--graph slots an existing .ctx
    file's colours in at its CLI position)."""
    tasks = []       # ("sample", name, files) | ("graph", path)
    cur_name, cur_files = None, []
    rest = []
    i = 0

    def _flush():
        nonlocal cur_name, cur_files
        if cur_name is not None:
            tasks.append(("sample", cur_name, cur_files))
        cur_name, cur_files = None, []

    while i < len(argv):
        a = argv[i]
        if a in ("-s", "--sample"):
            _flush()
            cur_name, cur_files = argv[i + 1], []
            i += 2
        elif a in ("-1", "--seq", "--seq1"):
            cur_files.append(("se", argv[i + 1]))
            i += 2
        elif a in ("-2", "--seq2"):
            # ref form "in1:in2" or two separate args
            if ":" in argv[i + 1]:
                f1, f2 = argv[i + 1].split(":", 1)
                cur_files.append(("pe", f1, f2))
                i += 2
            else:
                cur_files.append(("pe", argv[i + 1], argv[i + 2]))
                i += 3
        elif a in ("--seqi", "-i"):
            # interleaved mate pairs in one file (ref ctx_build.c -i)
            cur_files.append(("interleaved", argv[i + 1]))
            i += 2
        elif a in ("-g", "--graph"):
            _flush()
            tasks.append(("graph", argv[i + 1]))
            i += 2
        else:
            rest.append(a)
            i += 1
    _flush()
    args = p.parse_args(rest)
    return args, tasks


# ---------------------------------------------------------------------------
# view (ref: src/commands/ctx_view.c)
# ---------------------------------------------------------------------------

def cmd_view(argv):
    p = argparse.ArgumentParser(prog="mctx view")
    p.add_argument("-k", "--kmers", action="store_true")
    p.add_argument("-i", "--info", action="store_true")
    p.add_argument("-c", "--check", action="store_true")
    p.add_argument("ctx")
    add_common(p, memory=False, nkmers=False, threads=False)
    args = p.parse_args(argv)
    apply_common(args)
    if not (args.kmers or args.info or args.check):
        args.info = args.check = True

    from ..io import ctx as ctxio
    h, keys, covg, edges = ctxio.read_ctx(args.ctx)
    if args.info:
        print(f"version: {h.version}")
        print(f"kmer size: {h.kmer_size}")
        print(f"bitfields: {h.W}")
        print(f"colours: {h.ncols}")
        print(f"number of kmers: {len(keys)}")
        for i, gi in enumerate(h.ginfo):
            print(f"Colour {i}:")
            print(f"  sample name: '{gi.sample_name}'")
            print(f"  mean input contig length: {gi.mean_read_length}")
            print(f"  total sequence loaded:    {gi.total_sequence}")
    if args.kmers:
        _print_kmers(h, keys, covg, edges)
    if args.check:
        errs = check_graph_arrays(h.kmer_size, keys, covg, edges)
        for e in errs:
            print(f"check: {e}", file=sys.stderr)
        if errs:
            return 1
        _status("graph check passed")
    return 0


def _print_kmers(h, keys, covg, edges, out=None):
    """Text dump: '<kmer> <covg...> <edgestr...>'
    (ref: db_graph.c:698 db_graph_print_kmer2)."""
    out = out or sys.stdout
    from ..utils.text import kmers_to_strings, edges_to_strings
    kstrs = kmers_to_strings(keys, h.kmer_size)
    estrs = edges_to_strings(edges)
    for i in range(len(keys)):
        cov = " ".join(str(c) for c in covg[i])
        edg = " ".join(estrs[i])
        out.write(f"{kstrs[i]} {cov} {edg}\n")


def check_graph_arrays(k, keys, covg, edges):
    """Structural checks (role of ref ctx_health_check.c): sorted unique
    keys, canonical keys, no zero-covg kmers, edge symmetry."""
    from ..utils import checks
    return checks.check_graph_arrays(k, keys, covg, edges)


# ---------------------------------------------------------------------------

def cmd_check(argv):
    p = argparse.ArgumentParser(prog="mctx check")
    p.add_argument("-p", "--paths", action="append", default=[],
                   help="link files to verify against the graph "
                        "(ref ctx_health_check.c: gpath_checks_all_paths)")
    p.add_argument("ctx")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args)
    from ..io import ctx as ctxio
    h, keys, covg, edges = ctxio.read_ctx(args.ctx)
    errs = check_graph_arrays(h.kmer_size, keys, covg, edges)
    for e in errs:
        print(f"check: {e}", file=sys.stderr)
    if errs:
        return 1
    _status(f"{args.ctx}: OK ({len(keys)} kmers, {h.ncols} colours)")
    if args.paths:
        from ..io import ctp as ctpio
        from ..links import check as lcheck
        h2, g = _load_graph(args.ctx)
        links = ctpio.load_link_store(args.paths, g)
        nchecked, nbad, bad_ids = lcheck.check_links(g, links)
        if nbad:
            print(f"check: {nbad}/{nchecked} link walks FAILED "
                  f"(link ids {bad_ids[:10].tolist()}...)",
                  file=sys.stderr)
            return 1
        _status(f"links OK ({links.nlinks} links, "
                f"{nchecked} colour-walks verified)")
    return 0


register("build", cmd_build, "construct a coloured graph from reads")
register("view", cmd_view, "print graph info / kmers")
register("check", cmd_check, "validate graph file integrity")


# ---------------------------------------------------------------------------
# clean (ref: src/commands/ctx_clean.c)
# ---------------------------------------------------------------------------

def _load_graph(path):
    """Load a .ctx file into a DBGraph store."""
    import jax.numpy as jnp
    from ..graph import store as gstore
    from ..io import ctx as ctxio
    from ..ops import sorted as sops
    h, keys, covg, edges = ctxio.read_ctx(path)
    n = len(keys)
    if n == 0:
        return h, gstore.empty(h.kmer_size, 1, h.ncols)
    g = gstore.DBGraph(
        keys=jnp.asarray(keys), covg=jnp.asarray(covg),
        edges=jnp.asarray(edges), n=jnp.asarray(n, jnp.int64),
        k=h.kmer_size)
    return h, g


def _load_graphs(paths):
    """Load one or more .ctx files into a single store with colours
    concatenated in CLI order (role of ref graphs_load.c — every
    command taking '<in.ctx> [in2.ctx ...]' loads them all)."""
    if isinstance(paths, str):
        paths = [paths]
    if len(paths) == 1:
        return _load_graph(paths[0])
    import jax.numpy as jnp
    from ..graph import store as gstore
    from ..io import ctx as ctxio
    loaded = [ctxio.read_ctx(p) for p in paths]
    k = loaded[0][0].kmer_size
    for (h, *_), p in zip(loaded, paths):
        if h.kmer_size != k:
            raise ValueError(f"{p}: kmer size {h.kmer_size} != {k}")
    ncols = sum(h.ncols for h, *_ in loaded)
    allk, allc, alle, ginfo = [], [], [], []
    off = 0
    for h, keys, covg, edges in loaded:
        cw = np.zeros((len(keys), ncols), covg.dtype)
        ew = np.zeros((len(keys), ncols), np.uint8)
        cw[:, off:off + h.ncols] = covg
        ew[:, off:off + h.ncols] = edges
        ginfo.extend(h.ginfo)
        off += h.ncols
        allk.append(keys)
        allc.append(cw)
        alle.append(ew)
    g = gstore.from_records(
        k, jnp.asarray(np.concatenate(allk)),
        jnp.asarray(np.concatenate(allc)),
        jnp.asarray(np.concatenate(alle)))
    return ctxio.CtxHeader(kmer_size=k, ginfo=ginfo), g


def _save_graph(path, h, g):
    from ..graph import store as gstore
    from ..io import ctx as ctxio
    keys, covg, edges = gstore.to_host(g)
    ctxio.write_ctx(path, h, keys, covg, edges)


def cmd_clean(argv):
    p = argparse.ArgumentParser(prog="mctx clean")
    p.add_argument("-T", "--tips", type=int, default=0, nargs="?",
                   const=-1,
                   help="clip tips shorter than this (default 2k)")
    p.add_argument("-U", "--unitigs", type=int, default=0, nargs="?",
                   const=-1,
                   help="remove unitigs below covg threshold (default auto)")
    p.add_argument("-B", "--fallback", type=int, default=0,
                   help="threshold to use if auto-detection fails")
    p.add_argument("-N", "--ncols", type=int, default=None,
                   help="colours to process at once (ref memory knob; "
                        "the TPU store processes all colours in one "
                        "pass, accepted for parity)")
    p.add_argument("-S", "--sort", action="store_true",
                   help="output sorted by kmer (always true here: the "
                        "store is sorted)")
    p.add_argument("-c", "--covg-before", default=None,
                   help="save kmer/unitig coverage histogram CSV before "
                        "cleaning (ref ctx_clean.c -c)")
    p.add_argument("-C", "--covg-after", default=None,
                   help="coverage histogram CSV after cleaning")
    p.add_argument("-l", "--len-before", default=None,
                   help="unitig length histogram CSV before cleaning")
    p.add_argument("-L", "--len-after", default=None,
                   help="unitig length histogram CSV after cleaning")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("ctx", nargs="+")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out, args.covg_before, args.covg_after,
                 args.len_before, args.len_after)
    from ..graph import clean as gclean
    h, g = _load_graphs(args.ctx)
    k = h.kmer_size
    if args.memory:
        from ..utils import membudget as mb
        planned = mb.graph_mem_bytes(g.capacity, h.W, h.ncols)
        _status(mb.check_plan(mb.parse_mem(args.memory), planned))

    if args.covg_before or args.len_before:
        kh, uh, lh = gclean.cleaning_histograms(g)
        if args.covg_before:
            gclean.write_covg_csv(args.covg_before, kh, uh)
            _status(f"saved coverage histogram: {args.covg_before}")
        if args.len_before:
            gclean.write_len_csv(args.len_before, lh, k)
            _status(f"saved length histogram: {args.len_before}")

    tips = (2 * k) if args.tips == -1 else args.tips
    thresh = args.unitigs
    if thresh == -1:  # auto threshold from histogram fit
        hist = gclean.covg_histogram(g)
        cutoff, a, b, fp, fn = gclean.pick_kmer_threshold(hist)
        if cutoff < 0:
            if args.fallback > 0:
                cutoff = args.fallback
                _status(f"auto threshold failed; using fallback {cutoff}")
            else:
                p.error("could not pick cleaning threshold "
                        "(use --fallback <T>)")
        else:
            _status(f"auto cleaning threshold: <{cutoff} "
                    f"(alpha={a:.2f} beta={b:.2f} fp={fp:.4f} fn={fn:.4f})")
        thresh = cutoff

    before = int(g.n)
    g2 = gclean.clean_graph(g, covg_threshold=max(thresh, 0),
                            min_keep_tip=tips)
    _status(f"cleaned: {before} -> {int(g2.n)} kmers "
            f"(tips<{tips}, covg<{thresh})")
    if args.covg_after or args.len_after:
        kh, uh, lh = gclean.cleaning_histograms(g2)
        if args.covg_after:
            gclean.write_covg_csv(args.covg_after, kh, uh)
            _status(f"saved coverage histogram: {args.covg_after}")
        if args.len_after:
            gclean.write_len_csv(args.len_after, lh, k)
            _status(f"saved length histogram: {args.len_after}")
    for gi in h.ginfo:
        if tips:
            gi.cleaning.cleaned_tips = True
        if thresh > 0:
            gi.cleaning.cleaned_unitigs = True
            gi.cleaning.clean_unitigs_thresh = max(thresh, 0)
    _save_graph(args.out, h, g2)
    return 0


def cmd_unitigs(argv):
    p = argparse.ArgumentParser(prog="mctx unitigs")
    p.add_argument("-F", "--fasta", action="store_true",
                   help="FASTA output (default)")
    p.add_argument("-g", "--gfa", action="store_true",
                   help="GFA v1 output")
    p.add_argument("-d", "--dot", "--graphviz", action="store_true",
                   help="graphviz output")
    p.add_argument("-P", "--point", "--points", action="store_true",
                   help="with --dot, print unitigs as points")
    p.add_argument("--min-len", type=int, default=0,
                   help="minimum unitig length in bases")
    p.add_argument("-o", "--out", default="-",
                   help="output file [default: STDOUT]")
    p.add_argument("ctx", nargs="+")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    from ..graph import unitigs as gu
    h, g = _load_graphs(args.ctx)
    seqs = gu.extract_unitigs(g)
    seqs = [s for s in seqs if len(s) >= args.min_len]
    fh = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        if args.gfa or args.dot:
            from ..graph import unitig_graph as ug
            if args.gfa:
                ug.write_gfa(fh, g, seqs)
            else:
                ug.write_dot(fh, g, seqs, points=args.point)
        else:
            for i, s in enumerate(seqs):
                fh.write(f">unitig{i} length={len(s)}\n{s}\n")
    finally:
        if fh is not sys.stdout:
            fh.close()
    return 0


def cmd_inferedges(argv):
    p = argparse.ArgumentParser(prog="mctx inferedges")
    g1 = p.add_mutually_exclusive_group()
    g1.add_argument("--pop", action="store_true", default=True)
    g1.add_argument("--all", dest="all_edges", action="store_true")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("ctx")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    from ..graph import infer_edges as ie
    h, g = _load_graph(args.ctx)
    g2 = ie.infer_edges(g, pop_only=not args.all_edges)
    import numpy as np
    added = int((np.asarray(g2.edges) != np.asarray(g.edges)).sum())
    _status(f"inferred edges: {added} edge bytes changed")
    _save_graph(args.out, h, g2)
    return 0


register("clean", cmd_clean, "remove tips + low-coverage unitigs")
register("unitigs", cmd_unitigs, "dump unitigs as FASTA/GFA/DOT")
register("inferedges", cmd_inferedges, "infer population edges")


# ---------------------------------------------------------------------------
# contigs (ref: src/commands/ctx_contigs.c; linkless until .ctp wired in)
# ---------------------------------------------------------------------------

def cmd_contigs(argv):
    p = argparse.ArgumentParser(prog="mctx contigs")
    p.add_argument("-o", "--out", default="-")
    p.add_argument("-c", "--colour", type=int, default=0)
    p.add_argument("-N", "--ncontigs", type=int, default=0,
                   help="pull out at most N contigs "
                        "[default: 0 = no limit] (ref ctx_contigs.c -N)")
    g1 = p.add_mutually_exclusive_group()
    g1.add_argument("-r", "--reseed", dest="reseed", action="store_true",
                    help="sample seed kmers with replacement")
    g1.add_argument("-R", "--no-reseed", dest="reseed",
                    action="store_false",
                    help="do not reuse seed kmers already in a contig "
                         "[default, ref ctx_contigs.c:29]")
    p.set_defaults(reseed=False)
    p.add_argument("-s", "--seed", action="append", default=[],
                   help="seed kmers from a FASTA (reads must be kmer "
                        "length, ref ctx_contigs.c:27)")
    p.add_argument("-P", "--use-seed-paths", action="store_true",
                   help="seed contigs from unused links "
                        "(ref ctx_contigs.c:30)")
    p.add_argument("--max-len", type=int, default=65536,
                   help="max contig extension per direction (kmers)")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("-G", "--genome", type=int, default=0,
                   help="genome size (bases) for NG50 + confidence table")
    p.add_argument("-C", "--confid-cumul", type=float, default=-1.0,
                   help="halt when cumulative confidence < C "
                        "(ref ctx_contigs.c:32)")
    p.add_argument("-T", "--confid-step", type=float, default=-1.0,
                   help="halt when single-step confidence < C "
                        "(ref ctx_contigs.c:33)")
    p.add_argument("-S", "--confid-csv", default=None,
                   help="save the confidence table as CSV")
    p.add_argument("-p", "--paths", action="append", default=[],
                   help=".ctp link files (link-guided assembly)")
    p.add_argument("-M", "--no-missing-check", dest="missing_check",
                   action="store_false", default=True,
                   help="disable the missing-link-information halt "
                        "(ref contigs default: check enabled)")
    p.add_argument("ctx")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out, args.confid_csv)
    import numpy as np
    import jax.numpy as jnp
    from ..graph import traverse as T
    from ..utils.stats import contig_stats
    h, g = _load_graph(args.ctx)
    n = int(g.n)

    from .common import devices_arg
    n_dev = devices_arg(args)
    mesh = None
    if n_dev > 1:
        # walk_dp scaling mode: graph replicated on every device, the
        # seed batch sharded (parallel/shard.py walk_dp; linkless path)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as PS
        from ..parallel import shard as psh
        from ..graph import store as gstore_
        mesh = psh.make_mesh(n_dev)
        repl = NamedSharding(mesh, PS())
        g = gstore_.DBGraph(keys=jax.device_put(g.keys, repl),
                            covg=jax.device_put(g.covg, repl),
                            edges=jax.device_put(g.edges, repl),
                            n=g.n, k=g.k)
        _status(f"contigs: walkers sharded over {n_dev} devices")

    links = None
    if args.paths:
        from ..io import ctp as ctpio
        links = ctpio.load_link_store(args.paths, g)

    # confidence table from the .ctp contig-length histograms + genome
    # size (ref ctx_contigs.c:225-239 conf_table_update_hist)
    want_conf = (args.confid_cumul >= 0 or args.confid_step >= 0 or
                 args.confid_csv)
    conf_arr = None
    if want_conf:
        if not args.genome:
            p.error("--confid-* / --confid-csv require --genome")
        from ..graph import contig_confidence as cc
        from ..io import ctp as ctpio
        hist = {}
        for pth in args.paths:
            ph = ctpio.load_ctp_header(pth)
            for lng, cnt in ctpio.contig_hist_from_header(
                    ph, args.colour).items():
                hist[lng] = hist.get(lng, 0) + cnt
        table = cc.conf_table(args.genome, hist)
        if args.confid_csv:
            with open(args.confid_csv, "w") as fh:
                cc.print_table(table, fh)
            _status(f"saved confidence table -> {args.confid_csv}")
        if links is None and (args.confid_cumul >= 0 or
                              args.confid_step >= 0):
            p.error("--confid-* need -p link files")
        conf_arr = jnp.asarray(table.astype(np.float32))

    seed_rows = None
    if args.seed:
        from ..io import seqio
        from ..ops import kmer as kops
        from ..ops import sorted as sops
        from ..constants import CHAR_TO_BASE
        found_rows = []
        nmiss = 0
        for codes, _, _ in seqio.read_batches(args.seed):
            if codes.shape[1] != g.k:
                raise SystemExit(
                    f"--seed reads must be kmer length ({g.k}): "
                    f"got {codes.shape[1]}")
            kk = kops.pack_kmers(jnp.asarray(codes), g.k)
            keys, _ = kops.canonical(kk, g.k)
            idx, fnd = sops.lookup(g.keys, keys)
            fnd = np.asarray(fnd)
            found_rows.append(np.asarray(idx)[fnd])
            nmiss += int((~fnd).sum())
        seed_rows = (np.concatenate(found_rows) if found_rows
                     else np.zeros(0, np.int64))
        if nmiss:
            _status(f"contigs: {nmiss} seed kmers not found in graph")

    out = sys.stdout if args.out == "-" else open(args.out, "w")
    visited = np.zeros(n, dtype=bool)
    lengths = []
    stop_counts = np.zeros(len(T.STATUS_STR), np.int64)
    ncontig = 0
    batch = args.batch
    order = seed_rows if seed_rows is not None else np.arange(n)
    if args.ncontigs > 0 and seed_rows is None:
        # ref -N: pull contigs from random kmers
        order = np.random.default_rng(0).permutation(n)
    used_links = (np.zeros(links.nlinks, bool)
                  if links is not None else None)
    conf_kw = dict(conf_table=conf_arr, min_step=args.confid_step,
                   min_cumul=args.confid_cumul)
    for s0 in range(0, len(order), batch):
        if args.ncontigs > 0 and ncontig >= args.ncontigs:
            break
        seeds = order[s0:s0 + batch]
        if not args.reseed:
            seeds = seeds[~visited[seeds]]
        if len(seeds) == 0:
            continue
        extra = None
        if links is not None:
            from ..links import walk as lwalk
            contigs, stats, extra = lwalk.assemble_contigs_primed(
                g, links, seeds, colour=args.colour, max_len=args.max_len,
                missing_check=args.missing_check,
                track_used=args.use_seed_paths, return_extra=True,
                **conf_kw)
            if args.use_seed_paths:
                used_links |= extra["used"]
        else:
            contigs, stats = T.assemble_linkless_contigs(
                g, seeds, colour=args.colour, max_len=args.max_len,
                mesh=mesh)
        for i, c in enumerate(contigs):
            if args.ncontigs > 0 and ncontig >= args.ncontigs:
                break
            if not args.reseed:
                # a later seed in this batch may already be covered by an
                # earlier contig (the reference checks seed-by-seed,
                # assemble_contigs.c:223)
                if visited[int(seeds[i])]:
                    continue
                _mark_contig_kmers(g, c, visited)
            hdr = (f">contig{ncontig} length={len(c)} "
                   f"seed={int(seeds[i])}")
            if extra is not None and conf_arr is not None:
                hdr += (f" lf.conf={extra['cum_conf'][i, 1]:.5f}"
                        f" lf.max_gap={int(extra['max_gap'][i, 1])}"
                        f" rt.conf={extra['cum_conf'][i, 0]:.5f}"
                        f" rt.max_gap={int(extra['max_gap'][i, 0])}")
            out.write(f"{hdr}\n{c}\n")
            lengths.append(len(c))
            # both directions' halt reasons (ref assemble_stats
            # stop_causes table)
            for s_ in np.asarray(stats[i]).reshape(-1):
                stop_counts[int(s_) % len(T.STATUS_STR)] += 1
            ncontig += 1

    # second pass: seed from links never fully used in a contig
    # (ref assemble_contigs.c _assemble_from_paths)
    if args.use_seed_paths and links is not None:
        from ..links import walk as lwalk
        has_col = np.asarray(links.nseen)[:, args.colour] > 0
        unused = np.nonzero(has_col & ~used_links)[0]
        _status(f"contigs: seeding from {len(unused)} unused links")
        for s0 in range(0, len(unused), batch):
            lids = unused[s0:s0 + batch]
            contigs, stats = lwalk.assemble_contigs_from_paths(
                g, links, lids, colour=args.colour,
                max_len=args.max_len,
                missing_check=args.missing_check, **conf_kw)
            for i, c in enumerate(contigs):
                out.write(f">contig{ncontig} length={len(c)} "
                          f"seedpath={int(lids[i])}\n{c}\n")
                lengths.append(len(c))
                ncontig += 1

    if out is not sys.stdout:
        out.close()
    st = contig_stats(lengths, genome_size=args.genome or None)
    _status(f"contigs: {st['n']} total={st['total']} max={st['max']} "
            f"N50={st['n50']} NG50={st['ng50']}")
    if stop_counts.sum():
        # halt-reason table (ref assemble_stats.c stop_causes)
        parts = [f"{T.STATUS_STR[i]}={int(c)}"
                 for i, c in enumerate(stop_counts) if c]
        _status("contigs halt reasons: " + " ".join(parts))
    return 0


def _mark_contig_kmers(g, contig, visited):
    import numpy as np
    import jax.numpy as jnp
    from ..constants import CHAR_TO_BASE
    from ..ops import kmer as kops
    from ..ops import sorted as sops
    k = g.k
    codes = CHAR_TO_BASE[np.frombuffer(contig.encode(), np.uint8)]
    if len(codes) < k:
        return
    kmers, valid = kops.rolling_kmers(jnp.asarray(codes[None]), k)
    keys, _ = kops.canonical(kmers, k)
    idx, found = sops.lookup(g.keys, keys[0])
    rows = np.asarray(idx)[np.asarray(valid[0]) & np.asarray(found)]
    visited[rows[rows < len(visited)]] = True


register("contigs", cmd_contigs, "assemble contigs from the graph")


# ---------------------------------------------------------------------------
# thread / pview (ref: src/commands/ctx_thread.c, ctx_pview.c)
# ---------------------------------------------------------------------------

def cmd_thread(argv):
    p = argparse.ArgumentParser(prog="mctx thread")
    p.add_argument("-1", "--seq", action="append", default=[],
                   help="read files to thread")
    p.add_argument("-p", "--paths", action="append", default=[],
                   help="existing .ctp files to load first")
    p.add_argument("-o", "--out", required=True, help="output .ctp[.gz]")
    p.add_argument("--colour", type=int, default=0,
                   help="link colour to record")
    p.add_argument("--gap-fill", dest="gap_fill", action="store_true",
                   default=True,
                   help="bridge read errors through the graph while "
                        "threading (default, ref one-way gap filling)")
    p.add_argument("--no-gap-fill", dest="gap_fill",
                   action="store_false")
    p.add_argument("-2", "--seq2", action="append", nargs=2, default=[],
                   metavar=("R1", "R2"),
                   help="paired-end read files (links span fragments); "
                        "ref form -2 in1:in2 also accepted")
    p.add_argument("-i", "--seqi", action="append", default=[],
                   help="interleaved paired-end reads in one file "
                        "(ref ctx_thread.c -i)")
    p.add_argument("-M", "--matepair", default="FR",
                   choices=["FF", "FR", "RF", "RR"],
                   help="mate pair orientation [default: FR]")
    p.add_argument("-O", "--fq-offset", type=int, default=0,
                   help="FASTQ ASCII offset: 33/64 [default: 0 = auto]")
    p.add_argument("-H", "--cut-hp", type=int, default=0,
                   help="break reads at homopolymer runs >= this "
                        "(ref ctx_thread.c -H)")
    p.add_argument("-X", "--max-context", type=int, default=None,
                   help="kmers of aligned context to prime gap walkers "
                        "with on either side of a gap [default: 200]")
    p.add_argument("-e", "--end-check", dest="end_check",
                   action="store_true", default=True,
                   help="verify the walker agrees with the read after "
                        "bridging a gap [default: on]")
    p.add_argument("-E", "--no-end-check", dest="end_check",
                   action="store_false")
    p.add_argument("-0", "--zero-paths", action="store_true",
                   help="zero counts on initially loaded links (use "
                        "when -p links came from sequence re-used by "
                        "this run; ref ctx_thread.c -0)")
    p.add_argument("-u", "--use-new-paths", action="store_true",
                   help="use links as they are being added (higher err "
                        "rate; ref default: no)")
    p.add_argument("-L", "--max-frag-len", "--frag-len", type=int,
                   dest="frag_len", default=1000,
                   help="max fragment length for insert-gap bridging "
                        "(ref ctx_thread.c -L)")
    p.add_argument("-l", "--min-frag-len", type=int, default=0,
                   help="min fragment length for --seq2 "
                        "(ref ctx_thread.c -l)")
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
    p.add_argument("-Q", "--fq-cutoff", type=int, default=0,
                   help="mask bases with quality < Q before threading "
                        "(ref ctx_thread.c -Q)")
    p.add_argument("-d", "--gap-diff-const", type=float, default=5,
                   help="allowable gap: |exp-seen| <= exp*D + d "
                        "(ref ctx_thread.c -d)")
    p.add_argument("-D", "--gap-diff-coeff", type=float, default=0.1,
                   help="gap tolerance coefficient (ref -D)")
    p.add_argument("-x", "--print-contigs", action="store_true",
                   help="debug: print each aligned node-path run")
    p.add_argument("-y", "--print-paths", action="store_true",
                   help="debug: dump the built links as text")
    p.add_argument("-z", "--print-reads", action="store_true",
                   help="debug: print each read as threaded")
    p.add_argument("ctx")
    add_common(p)
    args = p.parse_args(_expand_pe_colon(argv))
    apply_common(args, args.out, args.gap_hist, args.frag_hist)
    if not args.seq and not args.seq2 and not args.seqi:
        p.error("at least one --seq/--seq2/--seqi required")
    from ..links import thread as lthread
    from ..links import store as lstore
    from ..io import ctp as ctpio
    from ..io import seqio
    from ..align.correct import CorrectAlnStats
    if args.fq_offset:
        if args.fq_offset not in (33, 64):
            p.error("--fq-offset must be 33 or 64 (0 = auto)")
        seqio.FQ_OFFSET = args.fq_offset
    h, g = _load_graph(args.ctx)
    ncols = max(h.ncols, args.colour + 1)
    stats = lthread.ThreadStats(ncols)
    aln_stats = CorrectAlnStats()
    def _mask_q(codes, quals):
        if (args.fq_cutoff and quals is not None) or args.cut_hp:
            from ..graph import build as gbuild
            import jax.numpy as jnp
            return np.asarray(gbuild.mask_reads(
                jnp.asarray(codes),
                jnp.asarray(quals) if quals is not None else None,
                fq_cutoff=args.fq_cutoff if quals is not None else 0,
                hp_cutoff=args.cut_hp))
        return codes

    batches = [(_mask_q(codes, quals), args.colour)
               for codes, quals, _ in seqio.read_batches(args.seq)]
    if args.print_reads:
        _basechars = np.array(list("ACGTN"))
        for bcodes, _c in batches:
            for row in np.asarray(bcodes):
                s = "".join(_basechars[np.minimum(row, 4)])
                print(f"read: {s.rstrip('N')}")
    # loaded links guide the gap-fill walkers (ref generate_paths
    # threads against already-loaded paths; -u additionally exposes
    # links added THIS run to later batches)
    prev_for_gapfill = (ctpio.load_link_store(args.paths, g)
                        if args.paths else None)
    if args.zero_paths and prev_for_gapfill is not None:
        import jax.numpy as _jnp
        prev_for_gapfill = prev_for_gapfill.replace(
            nseen=_jnp.zeros_like(prev_for_gapfill.nseen))
    from .common import devices_arg
    n_dev = devices_arg(args)
    if args.gap_fill:
        if n_dev > 1:
            _status("thread: --devices applies to --no-gap-fill "
                    "threading; gap-fill runs single-device")
        links = lthread.thread_reads_gapfill(
            g, batches, ncols, links_prev=prev_for_gapfill,
            stats=stats, one_way=args.one_way,
            gap_variance=args.gap_diff_coeff,
            gap_wiggle=args.gap_diff_const,
            max_context=args.max_context, end_check=args.end_check,
            use_new_paths=args.use_new_paths, aln_stats=aln_stats)
    elif batches:
        devs = None
        if n_dev > 1:
            import jax
            devs = jax.devices()[:n_dev]
            _status(f"thread: read batches sharded over {n_dev} "
                    "devices (store replicated)")
        links = lthread.thread_reads(g, batches, ncols, stats=stats,
                                     devices=devs)
    else:
        links = None
    if args.print_contigs and batches:
        for bcodes, _c in batches:
            idx, orient, valid = lthread.reads_to_node_paths(
                g, np.asarray(bcodes), g.k)
            idx, orient, valid = (np.asarray(idx), np.asarray(orient),
                                  np.asarray(valid))
            for b in range(idx.shape[0]):
                segs = []
                run = []
                for j in range(idx.shape[1]):
                    if valid[b, j]:
                        run.append(f"{idx[b, j]}:{int(orient[b, j])}")
                    elif run:
                        segs.append(" ".join(run))
                        run = []
                if run:
                    segs.append(" ".join(run))
                print(f"contig[{b}]: " + " | ".join(segs))
    pe_inputs = list(args.seq2)
    if args.seqi:
        pass  # handled below via interleaved batches
    if pe_inputs or args.seqi:
        from ..links import store as lstore2
        pair_batches = []
        for r1, r2 in pe_inputs:
            for c1, c2, _ in seqio.read_batches_pe(
                    r1, r2, colour=args.colour, matedir=args.matepair):
                pair_batches.append((c1, c2, args.colour))
        for fi in args.seqi:
            for c1, c2, _q1, _q2, _ in seqio.read_batches_interleaved(
                    fi, colour=args.colour, matedir=args.matepair):
                pair_batches.append((c1, c2, args.colour))
        pe_links = lthread.thread_reads_pe(
            g, pair_batches, ncols, links_prev=prev_for_gapfill,
            frag_len_min=args.min_frag_len,
            frag_len_max=args.frag_len, stats=stats,
            one_way=args.one_way, max_context=args.max_context,
            end_check=args.end_check, aln_stats=aln_stats)
        links = pe_links if links is None else lstore2.merge_stores(
            links, pe_links, g.capacity)
    prev_commands = []
    if args.paths:
        if args.zero_paths:
            _status("zeroing link counts for loaded links")
        links = lstore.merge_stores(prev_for_gapfill, links, g.capacity)
        # accumulate contig hists + provenance from the input link files
        # (ref ctx_thread.c:208 gpath_reader_load_contig_hist)
        for pth in args.paths:
            phdr = ctpio.load_ctp_header(pth)
            prev_commands.extend(phdr.get("commands", []))
            for c in range(ncols):
                for lng, cnt in ctpio.contig_hist_from_header(
                        phdr, c).items():
                    stats.add_contig(c, lng, cnt)
    npe = sum(c1.shape[0] for r1, r2 in args.seq2
              for c1, _, _ in seqio.read_batches_pe(r1, r2)) \
        if args.seq2 else 0
    _status(f"threaded {sum(b.shape[0] for b, _ in batches)} reads + "
            f"{npe} pairs -> {links.nlinks} links")
    if aln_stats.num_gap_attempts:
        _status("[CorrectAln] " + aln_stats.summary())
    if args.gap_hist:
        aln_stats.dump_gaps(args.gap_hist)
        _status(f"[CorrectAln] saved gap size distribution to: "
                f"{args.gap_hist}")
    if args.frag_hist:
        aln_stats.dump_fraglen(args.frag_hist)
        _status(f"[CorrectAln] saved fragment size distribution to: "
                f"{args.frag_hist}")
    ctpio.save_ctp(args.out, g, links,
                   sample_names=[gi.sample_name for gi in h.ginfo],
                   command="mctx thread " + " ".join(argv),
                   contig_hists=stats.contig_hists,
                   prev_commands=prev_commands)
    if args.print_paths:
        import gzip as _gz
        opener = _gz.open if args.out.endswith(".gz") else open
        with opener(args.out, "rt") as fh:
            for line in fh:
                if not line.startswith("#"):
                    sys.stdout.write(line)
    return 0


def _expand_pe_colon(argv):
    """Rewrite the ref's '-2 in1:in2' form to the two-arg form."""
    out = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-2", "--seq2") and i + 1 < len(argv) \
                and ":" in argv[i + 1]:
            f1, f2 = argv[i + 1].split(":", 1)
            out.extend([a, f1, f2])
            i += 2
        else:
            out.append(a)
            i += 1
    return out


def cmd_pview(argv):
    p = argparse.ArgumentParser(prog="mctx pview")
    p.add_argument("ctx")
    p.add_argument("ctp")
    args = p.parse_args(argv)
    import gzip
    with open(args.ctp, "rb") as probe:
        is_gz = probe.read(2) == b"\x1f\x8b"
    opener = gzip.open if is_gz else open
    with opener(args.ctp, "rt") as fh:
        sys.stdout.write(fh.read())
    return 0


register("thread", cmd_thread, "thread reads through the graph -> links")
register("pview", cmd_pview, "print a link file as text")


# ---------------------------------------------------------------------------
# bubbles (ref: src/commands/ctx_bubbles.c)
# ---------------------------------------------------------------------------

def cmd_bubbles(argv):
    p = argparse.ArgumentParser(prog="mctx bubbles")
    p.add_argument("-o", "--out", required=True, help="output .txt.gz")
    p.add_argument("-p", "--paths", action="append", default=[])
    p.add_argument("-A", "--max-allele", type=int, default=300)
    p.add_argument("-F", "--max-flank", type=int, default=1000)
    p.add_argument("-H", "--haploid", default="",
                   help="comma-separated haploid colour list; "
                        "'*' means all colours")
    p.add_argument("-S", "--keep-serial", dest="keep_serial",
                   action="store_true",
                   help="keep serial (chained) bubbles "
                        "(ref ctx_bubbles.c -S; higher FP)")
    p.add_argument("ctx", nargs="+")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    from ..calls import bubbles as bub
    from ..io import callfile
    from ..io import ctp as ctpio
    h, g = _load_graphs(args.ctx)
    links = None
    if args.paths:
        links = ctpio.load_link_store(args.paths, g)
    haploid = (list(range(h.ncols)) if args.haploid.strip() == "*"
               else [int(x) for x in args.haploid.split(",") if x != ""])
    from .common import devices_arg
    n_dev = devices_arg(args)
    mesh = None
    if n_dev > 1:
        # walk_dp scaling: graph + links replicated, walkers sharded
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as PS
        from ..parallel import shard as psh
        from ..graph import store as gstore_
        mesh = psh.make_mesh(n_dev)
        repl = NamedSharding(mesh, PS())
        g = gstore_.DBGraph(keys=jax.device_put(g.keys, repl),
                            covg=jax.device_put(g.covg, repl),
                            edges=jax.device_put(g.edges, repl),
                            n=g.n, k=g.k)
        if links is not None:
            links = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, repl), links)
        _status(f"bubbles: walkers sharded over {n_dev} devices")
    bl = bub.call_bubbles(g, links, max_allele=args.max_allele,
                          max_flank=args.max_flank, haploid_cols=haploid,
                          remove_serial=not args.keep_serial, mesh=mesh)
    callfile.write_bubble_file(
        args.out, bl, g.k, h.ncols, args.max_allele, args.max_flank,
        sample_names=[gi.sample_name for gi in h.ginfo])
    _status(f"found {len(bl)} bubbles -> {args.out}")
    return 0


register("bubbles", cmd_bubbles, "call bubbles between colours")
