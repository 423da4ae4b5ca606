"""At-scale smoke+perf run (BASELINE config 1 analog): E.coli-sized
synthetic genome -> build -> clean -> contigs, timed on the current
device.  Usage: python scripts/scale_test.py [genome_mb] [coverage] [batch]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def main():
    gsize = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_600_000
    cov = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    err = 0.003
    rlen = 150
    k = 31

    import _tpu_wait
    _tpu_wait.arm_watchdog({"phase": "scale_test"})
    import jax
    _tpu_wait.wait_backend()
    import jax.numpy as jnp
    import mccortex_tpu
    from mccortex_tpu.graph import build as gbuild
    from mccortex_tpu.graph import store as gstore
    from mccortex_tpu.graph import clean as gclean
    from mccortex_tpu.graph import traverse as T
    from mccortex_tpu.utils.stats import contig_stats

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, gsize, dtype=np.uint8)
    # plant repeat families (~8% of the genome): a uniform random
    # genome has no junctions after cleaning, which makes the
    # link-dependent phases (thread / linked contigs / correct)
    # trivially easy; real genomes are repeat-ridden
    n_fam = max(4, gsize // 300_000)
    copies_per_fam = 24
    for f in range(n_fam):
        ulen = int(rng.integers(500, 1500))
        unit = rng.integers(0, 4, ulen, dtype=np.uint8)
        for _ in range(copies_per_fam):
            p = int(rng.integers(0, gsize - ulen))
            genome[p:p + ulen] = unit
    nreads = int(gsize * cov / rlen)
    starts = rng.integers(0, gsize - rlen, nreads)
    reads = np.lib.stride_tricks.sliding_window_view(
        genome, rlen)[starts].copy()
    nerr = int(err * reads.size)
    ei = rng.integers(0, nreads, nerr)
    ej = rng.integers(0, rlen, nerr)
    reads[ei, ej] = rng.integers(0, 4, nerr, dtype=np.uint8)
    print(f"genome {gsize/1e6:.1f}Mb, {nreads} reads x {rlen}bp "
          f"({cov:.0f}x, {err*100}% err)", file=sys.stderr)

    # 32768 reads x 150bp = 3.9M records/epoch: the compute-bound regime
    # (bench.py shapes); smaller batches leave the chip idle between
    # RPCs
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
    t0 = time.perf_counter()
    # pad the tail batch with invalid reads: every read counts toward
    # coverage (a truncating batcher silently lowered it ~4%)
    batches = []
    for i in range(0, nreads, B):
        chunk = reads[i:i + B]
        if chunk.shape[0] < B:
            chunk = np.concatenate(
                [chunk, np.full((B - chunk.shape[0], rlen), 4, np.uint8)])
        batches.append((chunk, 0))
    g = gbuild.build(batches, k, ncols=1)
    g.keys.block_until_ready()
    t_build = time.perf_counter() - t0
    total_kmers = nreads * (rlen - k + 1)
    print(f"build(cold): {t_build:.1f}s  {int(g.n)} kmers  "
          f"({total_kmers/t_build/1e6:.2f}M kmer-obs/s)", file=sys.stderr)
    # warm pass: same shapes, compiled executables reused -> steady state
    t0 = time.perf_counter()
    g = gbuild.build(batches, k, ncols=1)
    g.keys.block_until_ready()
    t_build = time.perf_counter() - t0
    print(f"build(warm): {t_build:.1f}s  "
          f"({total_kmers/t_build/1e6:.2f}M kmer-obs/s)", file=sys.stderr)

    # device-ingest pass: reads pre-staged on device (2-bit packed) —
    # the build pipeline without the tunnel/PCIe H2D.  On the axon
    # tunnel (~22 MB/s) packed H2D alone floors e2e at ~70M obs/s for
    # this recipe; local hosts move the same bytes at 10+ GB/s.
    staged = []
    for bases, colour in batches:
        packed, nmask, L = gbuild.pack_reads_np(bases)
        pd = jax.device_put(packed)
        nd = jax.device_put(nmask) if nmask is not None else None
        staged.append(((pd, nd, L), colour))
    staged[-1][0][0].block_until_ready()
    t0 = time.perf_counter()
    g = gbuild.build(staged, k, ncols=1)
    g.keys.block_until_ready()
    t_build_dev = time.perf_counter() - t0
    print(f"build(device-ingest): {t_build_dev:.1f}s  "
          f"({total_kmers/t_build_dev/1e6:.2f}M kmer-obs/s)",
          file=sys.stderr)
    del staged

    t0 = time.perf_counter()
    hist = gclean.covg_histogram(g)
    cutoff, a, b_, fp, fn = gclean.pick_kmer_threshold(hist)
    thr = cutoff if cutoff > 0 else 2
    g2 = gclean.clean_graph(g, covg_threshold=thr, min_keep_tip=2 * k)
    g2.keys.block_until_ready()
    t_clean = time.perf_counter() - t0
    print(f"clean(cold): {t_clean:.1f}s threshold<{thr} "
          f"{int(g.n)} -> {int(g2.n)} kmers", file=sys.stderr)
    t0 = time.perf_counter()
    g2 = gclean.clean_graph(g, covg_threshold=thr, min_keep_tip=2 * k)
    g2.keys.block_until_ready()
    t_clean = time.perf_counter() - t0
    print(f"clean(warm): {t_clean:.1f}s", file=sys.stderr)

    # batched lookup throughput on the full-size store
    Q = 1 << 20
    qk = g2.keys[jnp.asarray(
        rng.integers(0, max(int(g2.n), 1), Q))]
    idx, found = gstore.lookup(g2, qk)
    idx.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        idx, found = gstore.lookup(g2, qk)
    idx.block_until_ready()
    t_lookup = (time.perf_counter() - t0) / 5
    print(f"lookup: {Q/t_lookup/1e6:.1f}M kmers/s "
          f"(batch {Q>>20}Mi, store {int(g2.n)})", file=sys.stderr)

    # contigs from a seed sample
    t0 = time.perf_counter()
    seeds = rng.integers(0, int(g2.n), 256)
    contigs, stats = T.assemble_linkless_contigs(
        g2, seeds, colour=0, max_len=200_000)
    t_contig = time.perf_counter() - t0
    st = contig_stats([len(c) for c in contigs], genome_size=gsize)
    print(f"contigs(cold, 256 seeds): {t_contig:.1f}s N50={st['n50']} "
          f"max={st['max']}", file=sys.stderr)
    t0 = time.perf_counter()
    contigs, stats = T.assemble_linkless_contigs(
        g2, seeds, colour=0, max_len=200_000)
    t_contig = time.perf_counter() - t0
    print(f"contigs(warm): {t_contig:.1f}s", file=sys.stderr)

    # identity: the longest contig must be a perfect genome substring
    best = max(contigs, key=len)
    gstr = "".join("ACGT"[c] for c in genome)
    from mccortex_tpu.utils.dna import revcomp
    exact = best in gstr or revcomp(best) in gstr
    print(f"longest contig {len(best)}bp exact-match: {exact}",
          file=sys.stderr)

    # thread (generate_paths SE, no gap fill) — the link build phase
    # (ref generate_paths.c:499); measured over a read subsample
    from mccortex_tpu.links import thread as lthread
    n_thr = min(nreads, 131072)
    tbat = []
    for i in range(0, n_thr, B):
        chunk = reads[i:i + B]
        if chunk.shape[0] < B:
            chunk = np.concatenate(
                [chunk, np.full((B - chunk.shape[0], rlen), 4,
                                np.uint8)])
        tbat.append((chunk, 0))
    t0 = time.perf_counter()
    links = lthread.thread_reads(g2, tbat, 1)
    links.offsets.block_until_ready()
    t_thread_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    links = lthread.thread_reads(g2, tbat, 1)
    links.offsets.block_until_ready()
    t_thread = time.perf_counter() - t0
    print(f"thread(cold/warm): {t_thread_c:.1f}/{t_thread:.1f}s  "
          f"{n_thr} reads -> {links.nlinks} links "
          f"({n_thr / t_thread / 1e3:.1f}k reads/s warm)",
          file=sys.stderr)

    # linked contigs (walk_linked pickup path) on the same seeds
    from mccortex_tpu.links import walk as lwalk
    t0 = time.perf_counter()
    lcontigs, _ = lwalk.assemble_contigs_primed(
        g2, links, seeds, colour=0, max_len=200_000)
    t_lcontig_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    lcontigs, _ = lwalk.assemble_contigs_primed(
        g2, links, seeds, colour=0, max_len=200_000)
    t_lcontig = time.perf_counter() - t0
    print(f"linked-contigs(cold/warm, 256 seeds): "
          f"{t_lcontig_c:.1f}/{t_lcontig:.1f}s", file=sys.stderr)

    # correct (gap-fill read correction, ref ctx_correct.c)
    from mccortex_tpu.align import correct as acorrect
    n_cor = min(nreads, 8192)
    cor_reads = reads[:n_cor]
    t0 = time.perf_counter()
    res = acorrect.correct_batch(g2, links, cor_reads, colour=0)
    t_correct_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = acorrect.correct_batch(g2, links, cor_reads, colour=0)
    t_correct = time.perf_counter() - t0
    n_changed = sum(1 for r in res if r.seq and "N" not in r.seq)
    print(f"correct(cold/warm, {n_cor} reads): "
          f"{t_correct_c:.1f}/{t_correct:.1f}s "
          f"({n_cor / t_correct / 1e3:.2f}k reads/s warm)",
          file=sys.stderr)

    print(json.dumps({
        "genome_mb": gsize / 1e6, "coverage": cov,
        "build_warm_s": round(t_build, 1),
        "build_kmer_obs_per_s": round(total_kmers / t_build),
        "build_dev_s": round(t_build_dev, 1),
        "build_dev_kmer_obs_per_s": round(total_kmers / t_build_dev),
        "clean_s": round(t_clean, 1),
        "lookup_mkmers_per_s": round(Q / t_lookup / 1e6, 1),
        "contigs_s": round(t_contig, 1),
        "thread_s": round(t_thread, 1),
        "thread_reads_per_s": round(n_thr / t_thread),
        "n_links": int(links.nlinks),
        "linked_contigs_s": round(t_lcontig, 1),
        "correct_s": round(t_correct, 1),
        "correct_reads_per_s": round(n_cor / t_correct),
        "n50": st["n50"], "longest_exact": bool(exact),
        "kmers_raw": int(g.n), "kmers_clean": int(g2.n),
    }))


if __name__ == "__main__":
    main()
