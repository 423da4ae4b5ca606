"""Second batch of mctx subcommands: subgraph, join, pjoin, reads,
coverage, dist, sort, uniqkmers, rmsubstr, popbubbles, server.
(ref: corresponding src/commands/ctx_*.c shells)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .main import register
from .commands import _status, _load_graph, _load_graphs, _save_graph
from .common import add_common, apply_common


# ---------------------------------------------------------------------------
# subgraph (ref ctx_subgraph.c)
# ---------------------------------------------------------------------------

def cmd_subgraph(argv):
    p = argparse.ArgumentParser(prog="mctx subgraph")
    p.add_argument("-1", "--seq", action="append", required=True)
    p.add_argument("-d", "--dist", type=int, default=0,
                   help="number of kmers to extend by [default: 0]")
    p.add_argument("-v", "--invert", action="store_true",
                   help="dump kmers NOT in the subgraph")
    p.add_argument("-U", "--unitigs", action="store_true",
                   help="grab whole unitigs containing seed kmers")
    p.add_argument("-N", "--ncols", type=int, default=None,
                   help="colours to load at once (ref memory knob; all "
                        "colours load in one pass here)")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("ctx", nargs="+")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    from ..graph import subgraph as sg
    from ..io import seqio
    h, g = _load_graphs(args.ctx)
    batches = [codes for codes, _, _ in seqio.read_batches(args.seq)]
    g2 = sg.subgraph(g, batches, dist=args.dist, invert=args.invert,
                     whole_unitigs=args.unitigs)
    _status(f"subgraph: {int(g.n)} -> {int(g2.n)} kmers")
    _save_graph(args.out, h, g2)
    return 0


# ---------------------------------------------------------------------------
# join (ref ctx_join.c): merge graphs with colour offsets
# ---------------------------------------------------------------------------

def cmd_join(argv):
    p = argparse.ArgumentParser(prog="mctx join")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--flatten", action="store_true",
                   help="sum all colours into one")
    p.add_argument("-i", "--intersect", action="append", default=[],
                   help="only keep kmers present in this graph "
                        "(ref ctx_join.c -i; repeatable = intersection "
                        "of all of them); the graph itself is NOT "
                        "merged into the output")
    p.add_argument("-N", "--ncols", type=int, default=None,
                   help="colours to load at once (ref memory knob; "
                        "accepted for parity)")
    p.add_argument("-S", "--sort", action="store_true",
                   help="output sorted graph (always true: .ctx is "
                        "written sorted)")
    p.add_argument("ctx", nargs="+",
                   help="input graphs; 'N:file.ctx' loads file at colour "
                        "offset N")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    import jax.numpy as jnp
    from ..io import ctx as ctxio

    inputs = []
    for spec in args.ctx:
        off, cols = None, None
        path = spec
        if ":" in spec and spec.split(":")[0].isdigit():
            off, path = spec.split(":", 1)
            off = int(off)
        if ":" in path and not path.split(":")[-1].endswith(".ctx"):
            # colour selection suffix: "in.ctx:0,2-3,*"
            path, colspec = path.rsplit(":", 1)
            cols = _parse_colour_range(colspec)
        h, keys, covg, edges = ctxio.read_ctx(path)
        if cols is not None:
            sel = [c for c in cols if c < h.ncols] if cols != "*" \
                else list(range(h.ncols))
            covg = covg[:, sel]
            edges = edges[:, sel]
            h.ginfo = [h.ginfo[c] for c in sel]
            keep = covg.sum(axis=1) > 0
            keys, covg, edges = keys[keep], covg[keep], edges[keep]
        inputs.append((off, h, keys, covg, edges))

    k = inputs[0][1].kmer_size
    for off, h, *_ in inputs:
        if h.kmer_size != k:
            raise ValueError("kmer sizes differ between inputs")

    # assign colour offsets
    ncols_out = 0
    ginfo = []
    placed = []
    next_off = 0
    for off, h, keys, covg, edges in inputs:
        o = off if off is not None else next_off
        placed.append((o, h, keys, covg, edges))
        next_off = max(next_off, o + h.ncols)
        ncols_out = max(ncols_out, o + h.ncols)
    if args.flatten:
        ncols_out = 1

    ginfo = [ctxio.GraphInfo() for _ in range(ncols_out)]
    allk, allc, alle = [], [], []
    for o, h, keys, covg, edges in placed:
        C = h.ncols
        cw = np.zeros((len(keys), ncols_out), np.uint32)
        ew = np.zeros((len(keys), ncols_out), np.uint8)
        if args.flatten:
            cw[:, 0] = covg.sum(axis=1)
            for c in range(C):
                ew[:, 0] |= edges[:, c]
        else:
            cw[:, o:o + C] = covg
            ew[:, o:o + C] = edges
            for c in range(C):
                gi = ginfo[o + c]
                gi.sample_name = h.ginfo[c].sample_name
                gi.total_sequence += h.ginfo[c].total_sequence
                gi.mean_read_length = max(gi.mean_read_length,
                                          h.ginfo[c].mean_read_length)
        allk.append(keys)
        allc.append(cw)
        alle.append(ew)

    from ..graph import store as gs
    keys = jnp.asarray(np.concatenate(allk))
    covg = jnp.asarray(np.concatenate(allc))
    edges = jnp.asarray(np.concatenate(alle))
    g = gs.from_records(k, keys, covg, edges)
    for ipath in args.intersect:
        from ..ops import sorted as sops
        hi, ikeys, _ic, _ie = ctxio.read_ctx(ipath)
        if hi.kmer_size != k:
            raise ValueError(f"{ipath}: kmer size mismatch")
        _idx, found = sops.lookup(jnp.asarray(ikeys), g.keys)
        live = ~sops.is_sentinel(g.keys)
        keep = np.asarray(found) & np.asarray(live)
        kk = np.asarray(g.keys)[keep]
        cc = np.asarray(g.covg)[keep]
        ee = np.asarray(g.edges)[keep]
        g = gs.from_records(k, jnp.asarray(kk), jnp.asarray(cc),
                            jnp.asarray(ee))
        _status(f"intersected with {ipath}: {int(g.n)} kmers remain")
    hdr = ctxio.CtxHeader(kmer_size=k, ginfo=ginfo)
    _save_graph(args.out, hdr, g)
    _status(f"joined {len(inputs)} graphs -> {int(g.n)} kmers x "
            f"{ncols_out} colours")
    return 0


def _parse_colour_range(spec):
    """Parse "1,3-5" colour selections (ref basic/range.h)."""
    if spec == "*":
        return "*"
    out = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


# ---------------------------------------------------------------------------
# pjoin (ref ctx_pjoin.c)
# ---------------------------------------------------------------------------

def cmd_pjoin(argv):
    p = argparse.ArgumentParser(prog="mctx pjoin")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-g", "--graph", default=None,
                   help="alias for the positional graph argument "
                        "(ref ctx_pjoin.c -g: sizes the table from a "
                        "graph file)")
    p.add_argument("-c", "--outcols", type=int, default=None,
                   help="number of colours in the output link file")
    p.add_argument("-r", "--noredundant", action="store_true",
                   help="remove redundant links (duplicates merge, "
                        "strict prefixes drop; ref gpath_subset "
                        "rmsubstr)")
    p.add_argument("ctx", nargs="?", default=None)
    p.add_argument("ctp", nargs="+")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    from ..io import ctp as ctpio
    from ..links import store as lstore
    import jax.numpy as jnp
    ctxpath = args.graph or args.ctx
    if ctxpath is None:
        p.error("a graph file is required (positional or -g)")
    if args.graph and args.ctx:
        # both given: the positional was actually the first .ctp
        args.ctp.insert(0, args.ctx)
    h, g = _load_graph(ctxpath)
    links = ctpio.load_link_store(args.ctp, g)
    if args.noredundant:
        before = links.nlinks
        links = lstore.rmsubstr_store(links)
        _status(f"noredundant: {before} -> {links.nlinks} links")
    if args.outcols is not None:
        C = links.nseen.shape[1]
        if args.outcols < C:
            p.error(f"--outcols {args.outcols} < input colours {C}")
        if args.outcols > C:
            ns = np.zeros((links.nlinks, args.outcols), np.uint32)
            ns[:, :C] = np.asarray(links.nseen)
            links = links.replace(nseen=jnp.asarray(ns))
    ctpio.save_ctp(args.out, g, links,
                   sample_names=[gi.sample_name for gi in h.ginfo])
    _status(f"merged {len(args.ctp)} link files -> {links.nlinks} links")
    return 0


# ---------------------------------------------------------------------------
# reads (ref ctx_reads.c): filter reads by graph membership
# ---------------------------------------------------------------------------

def _reads_touch_graph(g, reads):
    """Vectorised membership test: True per read iff any kmer is in the
    graph.  Pads to a few fixed length buckets so jit compiles O(1)
    programs instead of one per read length."""
    import jax.numpy as jnp
    from ..links import thread as lthread
    from ..constants import CHAR_TO_BASE
    out = np.zeros(len(reads), bool)
    buckets = {}
    for i, rd in enumerate(reads):
        if len(rd.seq) < g.k:
            continue
        L = 1 << max(len(rd.seq) - 1, 1).bit_length()
        buckets.setdefault(L, []).append(i)
    for L, idxs in buckets.items():
        arr = np.full((len(idxs), L), 4, np.uint8)
        for r, i in enumerate(idxs):
            s = reads[i].seq
            arr[r, :len(s)] = CHAR_TO_BASE[
                np.frombuffer(s.encode(), np.uint8)]
        _, _, valid = lthread.reads_to_node_paths(g, arr, g.k)
        out[np.asarray(idxs)] = np.asarray(valid).any(axis=1)
    return out


class _SeqWriter:
    """FASTA/FASTQ writer, gz if the path ends .gz (ref basic/seqout.c)."""

    def __init__(self, path, fmt):
        import gzip
        self.fmt = fmt
        self.fh = (gzip.open(path, "wt") if str(path).endswith(".gz")
                   else (sys.stdout if path == "-" else open(path, "w")))

    def write(self, rd):
        if self.fmt == "fastq":
            q = rd.quals
            qs = ("".join(chr(min(int(x), 93) + 33) for x in q)
                  if q is not None else "?" * len(rd.seq))
            self.fh.write(f"@{rd.name}\n{rd.seq}\n+\n{qs}\n")
        else:
            self.fh.write(f">{rd.name}\n{rd.seq}\n")

    def close(self):
        if self.fh is not sys.stdout:
            self.fh.close()


def cmd_reads(argv):
    p = argparse.ArgumentParser(
        prog="mctx reads",
        description="filter reads by graph membership (ref ctx_reads.c); "
                    "a pair is kept when EITHER mate touches the graph")
    p.add_argument("-1", "--seq", action="append", default=[],
                   help="<in>[:<O>] — write kept reads to <O>.fq.gz "
                        "(plain <in> uses -o)")
    p.add_argument("-2", "--seq2", action="append", default=[],
                   help="<in1>:<in2>:<O> — paired output <O>.{1,2}.fq.gz")
    p.add_argument("-i", "--seqi", action="append", default=[],
                   help="<in>:<O> — interleaved pairs, output "
                        "<O>.{1,2}.fq.gz")
    p.add_argument("-F", "--format", default="fastq",
                   type=lambda s: s.lower(),
                   choices=["fasta", "fastq"],
                   help="output format [default: FASTQ, ref ctx_reads.c]")
    p.add_argument("-o", "--out", default=None,
                   help="output for plain --seq inputs")
    p.add_argument("-v", "--invert", action="store_true",
                   help="keep reads/pairs with NO kmer in graph")
    p.add_argument("ctx")
    add_common(p)
    args = p.parse_args(argv)
    from ..io import seqio
    h, g = _load_graph(args.ctx)
    ext = ".fq.gz" if args.format == "fastq" else ".fa.gz"
    kept = total = 0

    CHUNK = 4096

    def _chunks(it, n=CHUNK):
        buf = []
        for x in it:
            buf.append(x)
            if len(buf) >= n:
                yield buf
                buf = []
        if buf:
            yield buf

    def _filter_se(path, wr):
        nonlocal kept, total
        for rds in _chunks(seqio.parse_reads(path)):
            total += len(rds)
            touch = _reads_touch_graph(g, rds)
            for rd, t in zip(rds, touch):
                if bool(t) != args.invert:
                    wr.write(rd)
                    kept += 1

    for spec in args.seq:
        if ":" in spec:
            path, obase = spec.rsplit(":", 1)
            apply_common(args, obase + ext)
            wr = _SeqWriter(obase + ext, args.format)
        else:
            if not args.out:
                p.error(f"--seq {spec}: give <in>:<out> or -o")
            apply_common(args, args.out)
            fmt = args.format
            if not args.out.endswith(".gz") and not any(
                    args.out.endswith(e) for e in (".fq", ".fastq")):
                fmt = "fasta" if args.out.endswith((".fa", ".fasta")) \
                    else args.format
            wr = _SeqWriter(args.out, fmt)
            path = spec
        _filter_se(path, wr)
        wr.close()

    def _filter_pairs(pair_iter, obase):
        nonlocal kept, total
        w1 = _SeqWriter(obase + ".1" + ext, args.format)
        w2 = _SeqWriter(obase + ".2" + ext, args.format)
        for pairs in _chunks(pair_iter):
            total += 2 * len(pairs)
            t1 = _reads_touch_graph(g, [p[0] for p in pairs])
            t2 = _reads_touch_graph(g, [p[1] for p in pairs])
            for (r1, r2), t in zip(pairs, t1 | t2):
                if bool(t) != args.invert:
                    w1.write(r1)
                    w2.write(r2)
                    kept += 2
        w1.close()
        w2.close()

    for spec in args.seq2:
        try:
            in1, in2, obase = spec.rsplit(":", 2)
        except ValueError:
            p.error(f"--seq2 needs <in1>:<in2>:<out>: {spec}")
        apply_common(args, obase + ".1" + ext, obase + ".2" + ext)
        _filter_pairs(zip(seqio.parse_reads(in1), seqio.parse_reads(in2)),
                      obase)
    for spec in args.seqi:
        try:
            in1, obase = spec.rsplit(":", 1)
        except ValueError:
            p.error(f"--seqi needs <in>:<out>: {spec}")
        apply_common(args, obase + ".1" + ext, obase + ".2" + ext)

        def _pairs(path):
            it = seqio.parse_reads(path)
            while True:
                try:
                    r1 = next(it)
                    r2 = next(it)
                except StopIteration:
                    return
                yield r1, r2
        _filter_pairs(_pairs(in1), obase)
    if not (args.seq or args.seq2 or args.seqi):
        p.error("at least one -1/--seq, -2/--seq2 or -i/--seqi required")
    _status(f"kept {kept}/{total} reads")
    return 0


# ---------------------------------------------------------------------------
# coverage (ref ctx_coverage.c)
# ---------------------------------------------------------------------------

_DEGREE_SYMBOLS = [".", "/", "[", "\\", "-", "{", "]", "}", "X"]


def cmd_coverage(argv):
    p = argparse.ArgumentParser(prog="mctx coverage")
    p.add_argument("-1", "-s", "--seq", action="append", required=True)
    p.add_argument("-e", "--edges", action="store_true",
                   help="print edges too (hex nibbles)")
    p.add_argument("-E", "--degree", "--degrees", action="store_true",
                   help="print in/out degree per kmer: 00. 01/ 02[ "
                        "10\\ 11- 12{ 20] 21} 22X (ref ctx_coverage -E)")
    p.add_argument("-o", "--out", default="-")
    p.add_argument("ctx", nargs="+")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    import jax.numpy as jnp
    from ..constants import CHAR_TO_BASE
    from ..links import thread as lthread
    from ..utils.text import edges_to_strings
    from ..io import seqio
    h, g = _load_graphs(args.ctx)
    out = sys.stdout if args.out == "-" else open(args.out, "w")

    def _node_paths_padded(arr):
        # pow2 length bucket -> bounded compile count over many reads
        L = 1 << max(len(arr) - 1, 1).bit_length()
        pad = np.full((1, L), 4, np.uint8)
        pad[0, :len(arr)] = arr
        i, o, v = lthread.reads_to_node_paths(g, pad, g.k)
        return np.asarray(i[0]), np.asarray(o[0]), np.asarray(v[0])

    for path in args.seq:
        for rd in seqio.parse_reads(path):
            arr = CHAR_TO_BASE[np.frombuffer(rd.seq.encode(), np.uint8)]
            out.write(f">{rd.name}\n")
            if len(arr) < g.k:
                out.write("\n")
                continue
            idxn, orn, vn = _node_paths_padded(arr)
            npos = len(arr) - g.k + 1
            covg = np.asarray(g.covg)
            for c in range(h.ncols):
                vals = [str(covg[idxn[i], c]) if vn[i] else "0"
                        for i in range(npos)]
                out.write(" ".join(vals) + "\n")
            if args.edges or args.degree:
                edges = np.asarray(g.edges)
                e_read = edges[idxn[:npos]]           # (npos, C)
                # orient the edge byte along the read (ref
                # fetch_node_edges: reverse orientation swaps nibbles)
                rev = orn[:npos] == 1
                e_or = np.where(rev[:, None],
                                ((e_read >> 4) | (e_read << 4))
                                .astype(np.uint8),
                                e_read)
                e_or = np.where(vn[:npos, None], e_or, 0)
            if args.edges:
                for c in range(h.ncols):
                    estrs = edges_to_strings(e_or[:, c:c + 1])
                    out.write(" ".join(
                        estrs[i][0] if vn[i] else "........"
                        for i in range(npos)) + "\n")
            if args.degree:
                popc = np.array([bin(x).count("1") for x in range(16)])
                for c in range(h.ncols):
                    eb = e_or[:, c]
                    ind = np.minimum(popc[(eb >> 4) & 0xF], 2)
                    outd = np.minimum(popc[eb & 0xF], 2)
                    out.write("".join(
                        _DEGREE_SYMBOLS[3 * i_ + o_]
                        for i_, o_ in zip(ind, outd)) + "\n")
    if out is not sys.stdout:
        out.close()
    return 0


# ---------------------------------------------------------------------------
# dist (ref ctx_dist_matrix.c)
# ---------------------------------------------------------------------------

def cmd_dist(argv):
    p = argparse.ArgumentParser(prog="mctx dist")
    p.add_argument("-o", "--out", default="-",
                   help="output matrix, tab separated [default: STDOUT]")
    p.add_argument("ctx")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    h, g = _load_graph(args.ctx)
    covg = np.asarray(g.covg)[:int(g.n)] > 0
    C = h.ncols
    mat = covg.T.astype(np.int64) @ covg.astype(np.int64)
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    out.write("\t" + "\t".join(gi.sample_name for gi in h.ginfo) + "\n")
    for i in range(C):
        out.write(h.ginfo[i].sample_name + "\t"
                  + "\t".join(str(mat[i, j]) for j in range(C)) + "\n")
    if out is not sys.stdout:
        out.close()
    return 0


# ---------------------------------------------------------------------------
# sort / index (ref ctx_sort.c, ctx_index.c) — our graphs are always
# written sorted; sort re-sorts foreign files, index emits block offsets
# ---------------------------------------------------------------------------

def cmd_sort(argv):
    p = argparse.ArgumentParser(prog="mctx sort")
    p.add_argument("-o", "--out", default=None,
                   help="output file [default: overwrite input in place]")
    p.add_argument("ctx")
    add_common(p)
    args = p.parse_args(argv)
    # in-place rewrite of the input is the ref default: no force check
    apply_common(args, args.out if args.out != args.ctx else None)
    from ..io import ctx as ctxio
    h, keys, covg, edges = ctxio.read_ctx(args.ctx)
    order = np.lexsort(tuple(keys[:, w] for w in range(h.W - 1, -1, -1)))
    ctxio.write_ctx(args.out or args.ctx, h, keys[order], covg[order],
                    edges[order])
    _status(f"sorted {len(keys)} kmers")
    return 0


def cmd_index(argv):
    p = argparse.ArgumentParser(prog="mctx index")
    p.add_argument("-b", "--block-kmers", type=int, default=None,
                   help="kmers per block [default: 4096]")
    p.add_argument("-s", "--block-size", default=None,
                   help="block size in BYTES, e.g. 4M (ref ctx_index.c "
                        "-s; converted to kmers from the record size)")
    p.add_argument("-o", "--out", default=None)
    p.add_argument("ctx")
    add_common(p, memory=False, nkmers=False, threads=False)
    args = p.parse_args(argv)
    from ..io import ctx as ctxio
    from ..utils.text import kmers_to_strings
    from .common import parse_size
    h, keys, covg, edges = ctxio.read_ctx(args.ctx)
    out = args.out or (args.ctx + ".idx")
    apply_common(args, out)
    bk = args.block_kmers
    if args.block_size is not None:
        if bk is not None:
            p.error("give either --block-kmers or --block-size")
        recbytes = 8 * h.W + h.ncols * 5
        bk = max(1, parse_size(args.block_size) // recbytes)
    if bk is None:
        bk = 4096
    with open(out, "w") as fh:
        fh.write("#block_start_kmer\tindex\tnkmers\n")
        for s in range(0, len(keys), bk):
            kstr = kmers_to_strings(keys[s:s + 1], h.kmer_size)[0]
            fh.write(f"{kstr}\t{s}\t{min(bk, len(keys) - s)}\n")
    _status(f"indexed {len(keys)} kmers in blocks of {bk}")
    return 0


# ---------------------------------------------------------------------------
# uniqkmers (ref ctx_uniqkmers.c)
# ---------------------------------------------------------------------------

def cmd_uniqkmers(argv):
    p = argparse.ArgumentParser(prog="mctx uniqkmers")
    p.add_argument("-k", "--kmer", type=int, required=True)
    p.add_argument("-F", "--flank", default=None,
                   help="FASTA whose sequences get unique flanks appended")
    p.add_argument("-g", "--graph", default=None,
                   help="also avoid kmers in this .ctx graph")
    p.add_argument("-1", "--seq", action="append", default=[],
                   help="also avoid kmers present in this sequence file "
                        "(ref ctx_uniqkmers.c -1)")
    p.add_argument("-o", "--out", default="-",
                   help="output file [default: STDOUT]")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("num", type=int)
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    import random
    from ..utils.dna import revcomp
    rng = random.Random(args.seed)
    k = args.kmer
    from .common import check_kmer
    check_kmer(args.kmer, p)
    import functools
    ofh = sys.stdout if args.out == "-" else open(args.out, "w")
    print = functools.partial(__import__("builtins").print,  # noqa: A001
                              file=ofh)

    taken = set()

    def add_seq_kmers(seq):
        for i in range(len(seq) - k + 1):
            km = seq[i:i + k]
            taken.add(min(km, revcomp(km)))

    seqs = []
    if args.flank:
        from ..io import seqio
        for rd in seqio.parse_reads(args.flank):
            seqs.append((rd.name, rd.seq))
            add_seq_kmers(rd.seq)
    for sf in args.seq:
        from ..io import seqio
        for rd in seqio.parse_reads(sf):
            add_seq_kmers(rd.seq)
    if args.graph:
        from ..io import ctx as ctxio
        from ..utils.text import kmers_to_strings
        h, keys, _, _ = ctxio.read_ctx(args.graph)
        if h.kmer_size == k:
            taken.update(kmers_to_strings(keys, k))

    def fresh_kmer():
        while True:
            km = "".join(rng.choice("ACGT") for _ in range(k))
            key = min(km, revcomp(km))
            if key not in taken:
                taken.add(key)
                return km

    if args.flank:
        # append a unique kmer either side of each sequence, retrying
        # until the junction-crossing kmers are unique too
        # (role of ref uniqkmers -F in tests/lossless)
        for name, seq in seqs:
            for _ in range(1000):
                left, right = fresh_kmer(), fresh_kmer()
                full = left + seq + right
                border = [full[i:i + k]
                          for i in range(0, 2 * k)] +                          [full[i:i + k]
                          for i in range(len(full) - 2 * k,
                                         len(full) - k + 1)]
                counts = {}
                for i in range(len(full) - k + 1):
                    key = min(full[i:i + k], revcomp(full[i:i + k]))
                    counts[key] = counts.get(key, 0) + 1
                if all(counts[min(b, revcomp(b))] == 1 for b in border):
                    print(f">{name}")
                    print(full)
                    break
            else:
                raise ValueError("could not generate unique flanks")
    for i in range(args.num):
        print(f">kmer{i}")
        print(fresh_kmer())
    if ofh is not sys.stdout:
        ofh.close()
    return 0


# ---------------------------------------------------------------------------
# rmsubstr (ref ctx_rmsubstr.c)
# ---------------------------------------------------------------------------

def cmd_rmsubstr(argv):
    p = argparse.ArgumentParser(prog="mctx rmsubstr")
    p.add_argument("-o", "--out", default="-")
    p.add_argument("-k", "--kmer", type=int, default=None,
                   help="kmer size used for candidate matching in the "
                        "ref (matching here is exact substring search; "
                        "accepted for parity)")
    p.add_argument("-F", "--format", default="fasta",
                   type=lambda s: s.lower(),
                   choices=["fasta", "fastq"],
                   help="output format [default: FASTA]")
    p.add_argument("-v", "--invert", action="store_true",
                   help="only print sequences that ARE substrings of "
                        "others (ref ctx_rmsubstr.c -v)")
    p.add_argument("fasta", nargs="+")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    from ..io import seqio
    from ..utils.dna import revcomp
    reads = [rd for f in args.fasta for rd in seqio.parse_reads(f)]
    reads.sort(key=lambda r: -len(r.seq))
    kept, dropped = [], []
    for rd in reads:
        rc = revcomp(rd.seq)
        dup = any(rd.seq in other or rc in other for other, _r in kept)
        (dropped if dup else kept).append((rd.seq, rd))
    out = _SeqWriter(args.out, args.format)
    for _seq, rd in (dropped if args.invert else kept):
        out.write(rd)
    out.close()
    _status(f"rmsubstr: kept {len(kept)}/{len(reads)}")
    return 0


# ---------------------------------------------------------------------------
# popbubbles (ref ctx_pop_bubbles.c)
# ---------------------------------------------------------------------------

def cmd_popbubbles(argv):
    p = argparse.ArgumentParser(prog="mctx popbubbles")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("-C", "--max-covg", type=int, default=-1,
                   help="only pop if removed branch covg <= this")
    p.add_argument("-L", "--max-len", type=int, default=-1)
    p.add_argument("-D", "--max-diff", type=int, default=-1,
                   help="only pop bubbles whose branch lengths differ "
                        "by at most D kmers (ref ctx_pop_bubbles.c -D)")
    p.add_argument("ctx", nargs="+")
    add_common(p)
    args = p.parse_args(argv)
    apply_common(args, args.out)
    from ..calls import pop_bubbles as pb
    h, g = _load_graphs(args.ctx)
    g2, npopped = pb.pop_bubbles(g, max_covg=args.max_covg,
                                 max_len=args.max_len,
                                 max_kdiff=args.max_diff)
    _status(f"popped {npopped} bubbles: {int(g.n)} -> {int(g2.n)} kmers")
    _save_graph(args.out, h, g2)
    return 0


# ---------------------------------------------------------------------------
# server (ref ctx_server.c): JSON kmer queries on stdin/stdout
# ---------------------------------------------------------------------------

def cmd_server(argv):
    p = argparse.ArgumentParser(prog="mctx server")
    p.add_argument("-p", "--paths", action="append", default=[],
                   help="link files: responses include the kmer's links "
                        "(ref ctx_server.c:194)")
    p.add_argument("-D", "--disk", action="store_true",
                   help="serve from the sorted .ctx on disk via its "
                        ".idx block index (ref ctx_server.c --disk + "
                        "graph_search.h) — O(1) memory")
    p.add_argument("-S", "--single-line", action="store_true",
                   help="responses on a single line (always true here; "
                        "accepted for parity, ref ctx_server.c -S)")
    p.add_argument("-C", "--coverages", action="store_true",
                   help="include per-colour coverages in responses "
                        "(ref loads them only with -C; always loaded "
                        "here — the flag gates the response field)")
    p.add_argument("-E", "--edges", action="store_true",
                   help="include per-sample edges in responses")
    p.add_argument("ctx")
    add_common(p, threads=False)
    args = p.parse_args(argv)
    apply_common(args)
    import json
    from ..utils import npkmer as npk
    from ..utils.text import edges_to_strings
    from ..io import ctx as ctxio

    link_info = None
    if args.disk:
        if args.paths:
            p.error("--disk serves the graph only (links need "
                    "in-memory row resolution); drop -p or --disk")
        dg = ctxio.DiskGraphReader(args.ctx)
        h = dg.h
        k = h.kmer_size
        n_kmers = dg.n
        _status(f"server ready (k={k}, {n_kmers} kmers, DISK mode); "
                "enter kmer or 'info'; ctrl-D to quit")
    else:
        h, g = _load_graph(args.ctx)
        covg = np.asarray(g.covg)
        edges = np.asarray(g.edges)
        k = g.k
        n_kmers = int(g.n)
        if args.paths:
            from ..io import ctp as ctpio
            from ..links import store as lstore
            from ..links.walk import link_vertices
            links = ctpio.load_link_store(args.paths, g)
            lv = np.asarray(link_vertices(links, g.capacity))
            link_info = (links, lv)
        _status(f"server ready (k={k}, {n_kmers} kmers); "
                "enter kmer, 'info', or 'random'; ctrl-D to quit")

    def links_of(row):
        if link_info is None:
            return None
        links, lv = link_info
        from ..links import store as lstore
        import jax.numpy as jnp
        out = []
        off = np.asarray(links.offsets)
        nseen = np.asarray(links.nseen)
        nj = np.asarray(links.nj)
        for o in (0, 1):
            v = 2 * row + o
            for lid in range(int(off[v]), int(off[v + 1])):
                juncs = "".join(
                    "ACGT"[int(np.asarray(lstore.unpack_junc(
                        links.seq[jnp.asarray([lid])],
                        jnp.asarray([j]))).reshape(-1)[0])]
                    for j in range(int(nj[lid])))
                out.append({"forward": o == 0, "juncs": juncs,
                            "colours": [int(x) for x in nseen[lid]]})
        return out

    for line in sys.stdin:
        q = line.strip()
        if not q:
            continue
        if q == "info":
            print(json.dumps({"kmer_size": k, "num_kmers": n_kmers,
                              "ncols": h.ncols}))
            continue
        if q == "random" and not args.disk:
            import random
            row = random.randrange(n_kmers)
            from ..utils.text import kmers_to_strings
            q = kmers_to_strings(np.asarray(g.keys)[row:row + 1], k)[0]
        if len(q) != k or any(c not in "ACGTacgt" for c in q):
            print(json.dumps({"error": f"expected {k}bp kmer"}))
            continue
        qkeys, _, _ = npk.seq_canonical_keys(q.upper(), k)
        if args.disk:
            hit = dg.lookup(qkeys[0])
            if hit is None:
                print(json.dumps({"key": q, "find": False}))
            else:
                _r, cv, ed = hit
                print(json.dumps({
                    "key": q, "find": True,
                    "colours": [int(c) for c in cv],
                    "edges": edges_to_strings(ed[None, :])[0]}))
            sys.stdout.flush()
            continue
        from ..ops import sorted as sops
        import jax.numpy as jnp
        row, found = sops.lookup(g.keys, jnp.asarray(qkeys))
        if not bool(found[0]):
            print(json.dumps({"key": q, "find": False}))
        else:
            r = int(row[0])
            # union edges -> left/right base lists (ref kmer_response:
            # ctx_server.c:93-106, both uppercased)
            ue = np.bitwise_or.reduce(edges[r]).astype(np.uint8)
            ustr = edges_to_strings(np.array([[ue]]))[0][0]
            left = "".join(c for c in ustr[:4] if c != ".").upper()
            right = "".join(c for c in ustr[4:] if c != ".")
            resp = {"key": q, "find": True,
                    "colours": [int(c) for c in covg[r]],
                    "left": left, "right": right,
                    "edges": edges_to_strings(edges[r][None, :])[0]}
            lk = links_of(r)
            if lk is not None:
                resp["links"] = lk
            print(json.dumps(resp))
        sys.stdout.flush()
    return 0


register("subgraph", cmd_subgraph, "extract BFS neighbourhood of seeds")
register("join", cmd_join, "merge graphs with colour offsets")
register("pjoin", cmd_pjoin, "merge link files")
register("reads", cmd_reads, "filter reads by graph membership")
register("coverage", cmd_coverage, "per-kmer coverage of query seqs")
register("dist", cmd_dist, "colour x colour shared-kmer matrix")
register("sort", cmd_sort, "sort a graph file's kmer records")
register("index", cmd_index, "write a block index for a sorted graph")
register("rmsubstr", cmd_rmsubstr, "remove duplicate/substring seqs")
register("popbubbles", cmd_popbubbles, "pop simple bubbles")
register("server", cmd_server, "interactive kmer query server")
register("uniqkmers", cmd_uniqkmers, "emit unique kmers / flank seqs")


# ---------------------------------------------------------------------------
# exp_abc (hidden; ref ctx_exp_abc.c): traversal-consistency experiment
# ---------------------------------------------------------------------------

def cmd_exp_abc(argv):
    """Measures how often `if A->B and A->B->C then B->C` holds
    (ref ctx_exp_abc.c:14-20): walk from a random node A; take B
    mid-path and C at the end; re-walk from B and compare against the
    A-walk's suffix.  Result classes mirror RES_* (ctx_exp_abc.c:52)."""
    p = argparse.ArgumentParser(prog="mctx exp_abc")
    p.add_argument("-p", "--paths", action="append", default=[])
    p.add_argument("-N", "--repeat", type=int, default=2000)
    p.add_argument("-M", "--max-AB-dist", type=int, dest="maxab",
                   default=1000)
    p.add_argument("-P", "--print", dest="print_failed",
                   action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("ctx")
    args = p.parse_args(argv)
    import jax.numpy as jnp
    from ..links import store as lstore, walk as lwalk
    from ..utils.text import kmers_to_strings
    h, g = _load_graph(args.ctx)
    links = lstore.empty(g.capacity, g.ncols)
    if args.paths:
        from ..io import ctp as ctpio
        links = ctpio.load_link_store(args.paths, g)
    rng = np.random.default_rng(args.seed)
    N = args.repeat
    rows = rng.integers(0, int(g.n), N).astype(np.int32)
    orients = rng.integers(0, 2, N).astype(np.uint8)
    cap = min(2 * args.maxab + 2, 4096)
    st = lwalk.linked_init(g, links, jnp.asarray(rows),
                           jnp.asarray(orients), cap)
    st = lwalk.walk_linked(g, links, st, 0, max_steps=cap)
    lwalk.report_drops(st, "exp_abc")
    pv = np.asarray(st.base.out_vert)
    pl_ = np.asarray(st.base.out_len)
    # B at the midpoint of each A-walk
    res = {"RES_ABC_SUCCESS": 0, "RES_BC_WRONG": 0,
           "RES_BC_OVERSHOT": 0, "RES_NO_TRAVERSAL": 0,
           "RES_AB_FAILED": 0}
    bsel = []
    for i in range(N):
        if pl_[i] < 2:
            res["RES_AB_FAILED"] += 1
            continue
        mid = min(args.maxab, int(pl_[i]) // 2)
        bsel.append((i, mid))
    if bsel:
        bi = np.array([v >> 1 for _i, m in bsel
                       for v in [pv[_i, m - 1]]], np.int32)
        bo = np.array([v & 1 for _i, m in bsel
                       for v in [pv[_i, m - 1]]], np.uint8)
        st2 = lwalk.linked_init(g, links, jnp.asarray(bi),
                                jnp.asarray(bo), cap)
        st2 = lwalk.walk_linked(g, links, st2, 0, max_steps=cap)
        lwalk.report_drops(st2, "exp_abc")
        qv = np.asarray(st2.base.out_vert)
        ql = np.asarray(st2.base.out_len)
        for j, (i, mid) in enumerate(bsel):
            want = pv[i, mid:pl_[i]]
            got = qv[j, :ql[j]]
            nw_ = len(want)
            if ql[j] == 0 and nw_ > 0:
                res["RES_NO_TRAVERSAL"] += 1
            elif len(got) >= nw_ and (got[:nw_] == want).all():
                if len(got) > nw_:
                    res["RES_BC_OVERSHOT"] += 1
                else:
                    res["RES_ABC_SUCCESS"] += 1
            else:
                res["RES_BC_WRONG"] += 1
                if args.print_failed:
                    krow = pv[i, mid - 1] >> 1
                    ks = kmers_to_strings(
                        np.asarray(g.keys)[krow:krow + 1], g.k)[0]
                    print(f">failed_B_{i}\n{ks}")
    total = max(N, 1)
    for name, cnt in res.items():
        _status(f"{name}: {cnt} / {N} ({100.0 * cnt / total:.2f}%)")
    return 0


register("exp_abc", cmd_exp_abc,
         "traversal consistency experiment (hidden)")
