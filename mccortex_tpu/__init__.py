"""mccortex_tpu — TPU-native linked de Bruijn graph engine.

A from-scratch, TPU-first framework with the capabilities of McCortex
(mcveanlab/mccortex): multi-sample ("coloured") linked de Bruijn graphs,
link (path) threading, contig assembly, error correction, bubble and
breakpoint variant calling, and kmer-coverage genotyping.

Design (see SURVEY.md §7):
  * kmers are 2-bit packed into uint64 words, canonicalised and hashed by
    vectorised JAX ops / Pallas kernels;
  * the graph is a sorted, hash-partitioned kmer store per chip with
    batched binary-search lookups (replaces the reference's open-addressing
    hash table, ref src/graph/hash_table.c);
  * traversal runs as masked batched walkers under jax.lax loops;
  * multi-chip scaling = shard the canonical kmer space over a
    jax.sharding.Mesh and exchange records with all_to_all collectives.

64-bit integer support is required for the kmer codec; we enable jax x64
mode at import time (TPU emulates u64 as u32 pairs; hot Pallas kernels use
explicit u32-pair layouts).
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
