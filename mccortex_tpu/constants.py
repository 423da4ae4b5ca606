"""Shared constants and tiny type helpers.

Base encoding follows the reference convention (ref: src/basic/dna.h:9-24):
A=0, C=1, G=2, T=3, complement(n) = 3-n (= ~n & 3).  Code 4 marks an
invalid/N base in our padded device arrays (the reference instead splits
reads on non-ACGT chars before kmerising; we mask).

Edge bytes follow ref src/graph/db_node.h:179-195: bit (nuc + 4*orient) set
means "traversing this kmer-key in `orient` the next base is `nuc`"; the
low nibble holds forward-orientation (next) edges, the high nibble holds
reverse-orientation edges (i.e. complements of preceding bases).
"""

import numpy as np

BASE_A, BASE_C, BASE_G, BASE_T = 0, 1, 2, 3
BASE_INVALID = 4  # padding / N

FORWARD, REVERSE = 0, 1

BASE_CHARS = np.frombuffer(b"ACGT", dtype=np.uint8)

# char (ascii) -> base code; non-ACGT -> 4
CHAR_TO_BASE = np.full(256, BASE_INVALID, dtype=np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CHAR_TO_BASE[_c] = _i
for _i, _c in enumerate(b"acgt"):
    CHAR_TO_BASE[_c] = _i



def nwords(k: int) -> int:
    """Number of 64-bit words to hold a k-mer (ref: binary_kmer.h:10)."""
    return (2 * k + 63) // 64


def check_k(k: int) -> None:
    if k < 3 or k % 2 == 0:
        raise ValueError(f"kmer size must be odd and >= 3, got {k}")
