"""Pure-Python reference helpers for tests (string-level ground truth).

Mirrors the style of the reference unit tests which build graphs from
string literals (ref: src/tests/bkmer_tests.c, graph_walker_tests.c).
"""

import random

import numpy as np

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}
BASE = {"A": 0, "C": 1, "G": 2, "T": 3}
CHR = "ACGT"


def revcomp_str(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s))


def key_str(s: str) -> str:
    rc = revcomp_str(s)
    return min(s, rc)


def kmer_to_words(s: str, W: int) -> list:
    """Pack kmer string into W uint64 words, word 0 most significant."""
    v = 0
    for c in s:
        v = (v << 2) | BASE[c]
    words = []
    for w in range(W):
        words.append((v >> (64 * (W - 1 - w))) & 0xFFFFFFFFFFFFFFFF)
    return words


def words_to_kmer(words, k: int) -> str:
    v = 0
    for w in words:
        v = (v << 64) | int(w)
    return "".join(CHR[(v >> (2 * (k - 1 - i))) & 3] for i in range(k))


def random_dna(n: int, seed=None) -> str:
    rng = random.Random(seed)
    return "".join(rng.choice(CHR) for _ in range(n))


def seq_to_codes(s: str, pad_to=None) -> np.ndarray:
    codes = np.array([BASE.get(c, 4) for c in s], dtype=np.uint8)
    if pad_to is not None and pad_to > len(codes):
        codes = np.concatenate(
            [codes, np.full(pad_to - len(codes), 4, dtype=np.uint8)])
    return codes


def kmers_of(s: str, k: int):
    """All (kmer, key, orient) triples of a sequence."""
    out = []
    for i in range(len(s) - k + 1):
        km = s[i:i + k]
        rc = revcomp_str(km)
        if rc < km:
            out.append((km, rc, 1))
        else:
            out.append((km, km, 0))
    return out
