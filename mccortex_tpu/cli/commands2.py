"""Second batch of mctx subcommands: subgraph, join, pjoin, reads,
coverage, dist, sort, uniqkmers, rmsubstr, popbubbles, server.
(ref: corresponding src/commands/ctx_*.c shells)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .main import register
from .commands import _status, _load_graph, _save_graph


# ---------------------------------------------------------------------------
# subgraph (ref ctx_subgraph.c)
# ---------------------------------------------------------------------------

def cmd_subgraph(argv):
    p = argparse.ArgumentParser(prog="mctx subgraph")
    p.add_argument("--seq", action="append", required=True)
    p.add_argument("--dist", type=int, default=0)
    p.add_argument("--invert", action="store_true")
    p.add_argument("--unitigs", action="store_true",
                   help="grab whole unitigs containing seed kmers")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("ctx")
    args = p.parse_args(argv)
    from ..graph import subgraph as sg
    from ..io import seqio
    h, g = _load_graph(args.ctx)
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
    p.add_argument("ctx", nargs="+",
                   help="input graphs; 'N:file.ctx' loads file at colour "
                        "offset N")
    args = p.parse_args(argv)
    import jax.numpy as jnp
    from ..graph import store as gstore
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
    p.add_argument("ctx")
    p.add_argument("ctp", nargs="+")
    args = p.parse_args(argv)
    from ..io import ctp as ctpio
    h, g = _load_graph(args.ctx)
    links = ctpio.load_link_store(args.ctp, g)
    ctpio.save_ctp(args.out, g, links,
                   sample_names=[gi.sample_name for gi in h.ginfo])
    _status(f"merged {len(args.ctp)} link files -> {links.nlinks} links")
    return 0


# ---------------------------------------------------------------------------
# reads (ref ctx_reads.c): filter reads by graph membership
# ---------------------------------------------------------------------------

def cmd_reads(argv):
    p = argparse.ArgumentParser(prog="mctx reads")
    p.add_argument("--seq", action="append", required=True)
    p.add_argument("-o", "--out", required=True, help="output FASTA")
    p.add_argument("--invert", action="store_true",
                   help="keep reads with NO kmer in graph")
    p.add_argument("ctx")
    args = p.parse_args(argv)
    import jax.numpy as jnp
    from ..io import seqio
    from ..links import thread as lthread
    h, g = _load_graph(args.ctx)
    kept = total = 0
    with open(args.out, "w") as out:
        for path in args.seq:
            for rd in seqio.parse_reads(path):
                total += 1
                codes = np.frombuffer(rd.seq.encode(), np.uint8)
                from ..constants import CHAR_TO_BASE
                arr = CHAR_TO_BASE[codes][None, :]
                if arr.shape[1] < g.k:
                    touch = False
                else:
                    _, _, valid = lthread.reads_to_node_paths(
                        g, jnp.asarray(arr), g.k)
                    touch = bool(np.asarray(valid).any())
                if touch != args.invert:
                    out.write(f">{rd.name}\n{rd.seq}\n")
                    kept += 1
    _status(f"kept {kept}/{total} reads")
    return 0


# ---------------------------------------------------------------------------
# coverage (ref ctx_coverage.c)
# ---------------------------------------------------------------------------

def cmd_coverage(argv):
    p = argparse.ArgumentParser(prog="mctx coverage")
    p.add_argument("--seq", action="append", required=True)
    p.add_argument("--edges", action="store_true")
    p.add_argument("-o", "--out", default="-")
    p.add_argument("ctx")
    args = p.parse_args(argv)
    import jax.numpy as jnp
    from ..constants import CHAR_TO_BASE
    from ..links import thread as lthread
    from ..utils.text import edges_to_strings
    from ..io import seqio
    h, g = _load_graph(args.ctx)
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    for path in args.seq:
        for rd in seqio.parse_reads(path):
            arr = CHAR_TO_BASE[np.frombuffer(rd.seq.encode(), np.uint8)]
            out.write(f">{rd.name}\n")
            if len(arr) < g.k:
                out.write("\n")
                continue
            idx, orient, valid = lthread.reads_to_node_paths(
                g, jnp.asarray(arr[None]), g.k)
            idxn = np.asarray(idx[0])
            vn = np.asarray(valid[0])
            npos = len(arr) - g.k + 1
            covg = np.asarray(g.covg)
            for c in range(h.ncols):
                vals = [str(covg[idxn[i], c]) if vn[i] else "0"
                        for i in range(npos)]
                out.write(" ".join(vals) + "\n")
            if args.edges:
                edges = np.asarray(g.edges)
                for c in range(h.ncols):
                    estrs = edges_to_strings(
                        edges[idxn[:npos]][:, c:c + 1])
                    out.write(" ".join(
                        estrs[i][0] if vn[i] else "........"
                        for i in range(npos)) + "\n")
    if out is not sys.stdout:
        out.close()
    return 0


# ---------------------------------------------------------------------------
# dist (ref ctx_dist_matrix.c)
# ---------------------------------------------------------------------------

def cmd_dist(argv):
    p = argparse.ArgumentParser(prog="mctx dist")
    p.add_argument("ctx")
    args = p.parse_args(argv)
    h, g = _load_graph(args.ctx)
    covg = np.asarray(g.covg)[:int(g.n)] > 0
    C = h.ncols
    mat = covg.T.astype(np.int64) @ covg.astype(np.int64)
    print("\t" + "\t".join(gi.sample_name for gi in h.ginfo))
    for i in range(C):
        print(h.ginfo[i].sample_name + "\t"
              + "\t".join(str(mat[i, j]) for j in range(C)))
    return 0


# ---------------------------------------------------------------------------
# sort / index (ref ctx_sort.c, ctx_index.c) — our graphs are always
# written sorted; sort re-sorts foreign files, index emits block offsets
# ---------------------------------------------------------------------------

def cmd_sort(argv):
    p = argparse.ArgumentParser(prog="mctx sort")
    p.add_argument("-o", "--out", default=None)
    p.add_argument("ctx")
    args = p.parse_args(argv)
    from ..io import ctx as ctxio
    h, keys, covg, edges = ctxio.read_ctx(args.ctx)
    order = np.lexsort(tuple(keys[:, w] for w in range(h.W - 1, -1, -1)))
    ctxio.write_ctx(args.out or args.ctx, h, keys[order], covg[order],
                    edges[order])
    _status(f"sorted {len(keys)} kmers")
    return 0


def cmd_index(argv):
    p = argparse.ArgumentParser(prog="mctx index")
    p.add_argument("--block-kmers", type=int, default=4096)
    p.add_argument("-o", "--out", default=None)
    p.add_argument("ctx")
    args = p.parse_args(argv)
    from ..io import ctx as ctxio
    from ..utils.text import kmers_to_strings
    h, keys, covg, edges = ctxio.read_ctx(args.ctx)
    out = args.out or (args.ctx + ".idx")
    bk = args.block_kmers
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
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("num", type=int)
    args = p.parse_args(argv)
    import random
    from ..utils.dna import revcomp
    rng = random.Random(args.seed)
    k = args.kmer

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
    return 0


# ---------------------------------------------------------------------------
# rmsubstr (ref ctx_rmsubstr.c)
# ---------------------------------------------------------------------------

def cmd_rmsubstr(argv):
    p = argparse.ArgumentParser(prog="mctx rmsubstr")
    p.add_argument("-o", "--out", default="-")
    p.add_argument("fasta")
    args = p.parse_args(argv)
    from ..io import seqio
    from ..utils.dna import revcomp
    reads = list(seqio.parse_reads(args.fasta))
    reads.sort(key=lambda r: -len(r.seq))
    kept = []
    for rd in reads:
        rc = revcomp(rd.seq)
        dup = any(rd.seq in other or rc in other for other, _ in kept)
        if not dup:
            kept.append((rd.seq, rd.name))
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    for seq, name in kept:
        out.write(f">{name}\n{seq}\n")
    if out is not sys.stdout:
        out.close()
    _status(f"rmsubstr: kept {len(kept)}/{len(reads)}")
    return 0


# ---------------------------------------------------------------------------
# popbubbles (ref ctx_pop_bubbles.c)
# ---------------------------------------------------------------------------

def cmd_popbubbles(argv):
    p = argparse.ArgumentParser(prog="mctx popbubbles")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--max-covg", type=int, default=-1,
                   help="only pop if removed branch covg <= this")
    p.add_argument("--max-len", type=int, default=-1)
    p.add_argument("ctx")
    args = p.parse_args(argv)
    from ..calls import pop_bubbles as pb
    h, g = _load_graph(args.ctx)
    g2, npopped = pb.pop_bubbles(g, max_covg=args.max_covg,
                                 max_len=args.max_len)
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
    p.add_argument("--disk", action="store_true",
                   help="serve from the sorted .ctx on disk via its "
                        ".idx block index (ref ctx_server.c --disk + "
                        "graph_search.h) — O(1) memory")
    p.add_argument("ctx")
    args = p.parse_args(argv)
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
            resp = {"key": q, "find": True,
                    "colours": [int(c) for c in covg[r]],
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
