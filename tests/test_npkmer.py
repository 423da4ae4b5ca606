"""Host numpy kmer codec vs the device codec (ops/kmer.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mccortex_tpu.ops import kmer as kops
from mccortex_tpu.utils import npkmer as npk
from util import random_dna, revcomp_str


@pytest.mark.parametrize("k", [5, 11, 31, 33, 63])
def test_rolling_canonical_matches_device(k):
    seq = random_dna(300, seed=900 + k)
    codes = npk.seq_to_codes_np(seq)
    km_np, valid_np = npk.rolling_kmers_np(codes, k)
    key_np, or_np = npk.canonical_np(km_np, k)
    km_d, valid_d = kops.rolling_kmers(jnp.asarray(codes)[None], k)
    key_d, or_d = kops.canonical(km_d, k)
    vd = np.asarray(valid_d)[0]
    n = 300 - k + 1
    np.testing.assert_array_equal(valid_np, vd[:n])
    np.testing.assert_array_equal(key_np[valid_np],
                                  np.asarray(key_d)[0, :n][vd[:n]])
    np.testing.assert_array_equal(or_np[valid_np],
                                  np.asarray(or_d)[0, :n][vd[:n]])


def test_invalid_bases_masked():
    seq = "ACGTNNACGTACGTACGT"
    codes = npk.seq_to_codes_np(seq)
    km, valid = npk.rolling_kmers_np(codes, 5)
    # windows covering an N are invalid
    for i in range(len(valid)):
        assert valid[i] == ("N" not in seq[i:i + 5])


def test_seq_canonical_keys_string_truth():
    k = 7
    seq = random_dna(60, seed=930)
    keys, orient, pos = npk.seq_canonical_keys(seq, k)
    assert len(keys) == 60 - k + 1
    # string-level check on a few positions
    for j in (0, 10, 53):
        km = seq[j:j + k]
        canon = min(km, revcomp_str(km))
        got = keys[j]
        # decode via device unpack for independence
        from mccortex_tpu.utils.text import kmers_to_strings
        assert kmers_to_strings(got[None], k)[0] == canon
