"""Host-side text conversions for kmers and edges (numpy, no device)."""

from __future__ import annotations

import numpy as np

_CHARS = np.frombuffer(b"ACGT", np.uint8)

# reverse bit order of a nibble (ref: db_node.h rev_nibble_lookup)
_REV_NIBBLE = np.array([0, 8, 4, 12, 2, 10, 6, 14,
                        1, 9, 5, 13, 3, 11, 7, 15], dtype=np.uint8)


def kmers_to_strings(keys: np.ndarray, k: int) -> list:
    """(N, W) uint64 -> list of kmer strings."""
    N, W = keys.shape
    offs = 2 * (k - 1 - np.arange(k))
    widx = W - 1 - offs // 64
    sh = (offs % 64).astype(np.uint64)
    codes = ((keys[:, widx] >> sh) & np.uint64(3)).astype(np.uint8)
    chars = _CHARS[codes]
    return [bytes(row).decode() for row in chars]


def strings_to_kmers(strs, W: int) -> np.ndarray:
    from ..constants import CHAR_TO_BASE
    n = len(strs)
    if n == 0:
        return np.zeros((0, W), dtype=np.uint64)
    k = len(strs[0])
    if all(len(s) == k for s in strs):
        # vectorised: one byte buffer -> (n, k) codes -> tree-packed words
        codes = CHAR_TO_BASE[np.frombuffer(
            "".join(strs).encode(), np.uint8)].reshape(n, k).astype(
                np.uint64)
        pad = W * 32 - k
        if pad:
            codes = np.concatenate(
                [np.zeros((n, pad), np.uint64), codes], axis=1)
        v = codes.reshape(n, W, 32)
        width = 1
        while width < 32:
            v = (v[..., 0::2] << np.uint64(2 * width)) | v[..., 1::2]
            width *= 2
        return v[..., 0]
    out = np.zeros((n, W), dtype=np.uint64)
    for i, s in enumerate(strs):
        v = 0
        for c in s.encode():
            v = (v << 2) | int(CHAR_TO_BASE[c])
        for w in range(W):
            out[i, W - 1 - w] = (v >> (64 * w)) & 0xFFFFFFFFFFFFFFFF
    return out


def edges_to_strings(edges: np.ndarray) -> list:
    """(N, C) uint8 -> [[8-char string per colour]]
    (ref: db_node.c:105 db_node_get_edges_str: 'acgt'/'ACGT', '.' unset;
    left chars are preceding bases = rev_nibble of the high nibble)."""
    N, C = edges.shape
    left = _REV_NIBBLE[(edges >> 4) & 0xF]
    right = edges & 0xF
    out = []
    lower, upper = b"acgt", b"ACGT"
    for i in range(N):
        row = []
        for c in range(C):
            s = bytearray(b"........")
            for b in range(4):
                if left[i, c] >> b & 1:
                    s[b] = lower[b]
                if right[i, c] >> b & 1:
                    s[4 + b] = upper[b]
            row.append(s.decode())
        out.append(row)
    return out
