"""Edge-byte helpers (ref: src/graph/db_node.h:179-230).

One byte per kmer per colour.  Bit (nuc + 4*orient) set means: traversing
the stored key in `orient`entation, the next base is `nuc`.  The low
nibble is FORWARD (next) edges; the high nibble is REVERSE-orientation
edges, i.e. complements of preceding bases.
"""

import numpy as np
import jax.numpy as jnp

# reverse the bit order of a nibble (ref: db_node.h rev_nibble_lookup)
REV_NIBBLE = np.array([0b0000, 0b1000, 0b0100, 0b1100,
                       0b0010, 0b1010, 0b0110, 0b1110,
                       0b0001, 0b1001, 0b0101, 0b1101,
                       0b0011, 0b1011, 0b0111, 0b1111], dtype=np.uint8)

POPCOUNT4 = np.array([bin(i).count("1") for i in range(16)], dtype=np.uint8)


def edge_bit(nuc, orient):
    """1 << (nuc + 4*orient) as uint8 (ref: db_node.h nuc_orient_to_edge)."""
    return (jnp.uint8(1) << (nuc + (orient << 2))).astype(jnp.uint8)


def with_orientation(edges, orient):
    """Nibble of next-edges when traversing in `orient`
    (ref: db_node.h edges_with_orientation)."""
    return (edges >> (orient.astype(jnp.uint8) << 2)) & jnp.uint8(0xF)


def outdegree(edges, orient):
    nib = with_orientation(edges, orient)
    return jnp.asarray(POPCOUNT4)[nib.astype(jnp.int32)]


def indegree(edges, orient):
    return outdegree(edges, 1 - orient)


def has_edge(edges, nuc, orient):
    return ((edges >> (nuc + (orient.astype(jnp.uint8) << 2))) & 1).astype(bool)


def as_fw_nibble(edges, orient):
    """Edges on the forward strand regardless of orientation
    (ref: db_node.h edges_as_nibble)."""
    rev = jnp.asarray(REV_NIBBLE)[((edges >> 4) & 0xF).astype(jnp.int32)]
    return jnp.where(orient.astype(bool), rev, edges & jnp.uint8(0xF))


def union_colours(edges):
    """OR edge bytes across the colour axis (last axis)."""
    return jnp.bitwise_or.reduce(edges, axis=-1) if hasattr(jnp.bitwise_or, "reduce") \
        else _union_fallback(edges)


def _union_fallback(edges):
    out = edges[..., 0]
    for c in range(1, edges.shape[-1]):
        out = out | edges[..., c]
    return out
