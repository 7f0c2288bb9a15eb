"""Device encoder vs the literal TF-semantics oracle (reference encode.py)."""

import numpy as np
import pytest

from jaeger_tpu.ops import encode
from jaeger_tpu.seqops import crop
from jaeger_tpu.seqops.windows import encode_ascii, windows_from_sequences


def _device_tokens(seqs, crop_nt, masking=False):
    batch = windows_from_sequences(seqs, fragsize=max(crop_nt, max(len(s) for s in seqs)))
    toks = encode.encode_frames(
        batch.bases, batch.length, crop_size=crop_nt, masking=masking
    )
    return np.asarray(toks)


def test_full_length_matches_oracle(random_dna):
    crop_nt = crop.codons_to_nucleotides(40)  # 125 nt
    seqs = [random_dna(crop_nt) for _ in range(4)]
    dev = _device_tokens(seqs, crop_nt)
    for i, s in enumerate(seqs):
        ora = encode.encode_frames_oracle(s, crop_nt)
        assert ora.shape == (6, 40)
        np.testing.assert_array_equal(dev[i], ora)


def test_longer_than_crop_is_cropped(random_dna):
    crop_nt = crop.codons_to_nucleotides(10)
    seqs = [random_dna(crop_nt + 37)]
    dev = _device_tokens(seqs, crop_nt)
    ora = encode.encode_frames_oracle(seqs[0], crop_nt)
    np.testing.assert_array_equal(dev[0, :, : ora.shape[1]], ora)


@pytest.mark.parametrize("m", list(range(1, 40)) + [100, 101, 102, 123, 124])
def test_short_sequences_match_oracle_with_padding(random_dna, m):
    """Windows shorter than the crop: valid prefix matches, tail is 0."""
    crop_nt = crop.codons_to_nucleotides(40)
    s = random_dna(m)
    dev = _device_tokens([s], crop_nt)[0]
    ora = encode.encode_frames_oracle(s, crop_nt)
    p = ora.shape[1]
    assert p == max(0, crop.frame_length(m, crop_nt))
    np.testing.assert_array_equal(dev[:, :p], ora)
    assert (dev[:, p:] == 0).all()


def test_n_bases_are_masked(random_dna):
    crop_nt = crop.codons_to_nucleotides(10)
    s = list(random_dna(crop_nt))
    s[7] = "N"
    s = "".join(s)
    dev = _device_tokens([s], crop_nt)[0]
    ora = encode.encode_frames_oracle(s, crop_nt)
    np.testing.assert_array_equal(dev, ora)
    # every frame token whose trigram covers position 7 must be 0
    assert (dev == 0).sum() > 0


def test_soft_mask_semantics(random_dna):
    crop_nt = crop.codons_to_nucleotides(10)
    s = random_dna(crop_nt)
    soft = s[:6].lower() + s[6:]
    # masking off: lowercase folds to uppercase -> identical to unmasked
    np.testing.assert_array_equal(
        _device_tokens([soft], crop_nt)[0],
        encode.encode_frames_oracle(s, crop_nt),
    )
    # masking on: soft-masked trigrams become 0
    dev = _device_tokens([soft], crop_nt, masking=True)[0]
    ora = encode.encode_frames_oracle(soft, crop_nt, masking=True)
    np.testing.assert_array_equal(dev, ora)
    assert (dev[0, :2] == 0).all()  # first forward-frame codons masked


def test_reverse_frames_are_reverse_complement(random_dna):
    crop_nt = crop.codons_to_nucleotides(10)
    s = random_dna(crop_nt)
    comp = {"A": "T", "T": "A", "G": "C", "C": "G"}
    rc = "".join(comp[c] for c in reversed(s))
    dev_fwd = _device_tokens([s], crop_nt)[0]
    dev_rc = _device_tokens([rc], crop_nt)[0]
    # forward frames of the RC sequence == reverse frames of the original
    np.testing.assert_array_equal(dev_fwd[3:], dev_rc[:3])


def test_tokens_in_range(random_dna):
    crop_nt = crop.codons_to_nucleotides(20)
    dev = _device_tokens([random_dna(crop_nt) for _ in range(3)], crop_nt)
    assert dev.min() >= 0
    assert dev.max() <= 64


def test_nucleotide_onehot(random_dna):
    s = "AGCTN" + "A" * 10
    batch = windows_from_sequences([s], fragsize=15)
    oh = np.asarray(
        encode.encode_nucleotide(batch.bases, batch.length, crop_size=15)
    )
    assert oh.shape == (1, 2, 15, 4)
    # channel order A,G,C,T (reference encode.py:36-41)
    np.testing.assert_array_equal(oh[0, 0, 0], [1, 0, 0, 0])  # A
    np.testing.assert_array_equal(oh[0, 0, 1], [0, 1, 0, 0])  # G
    np.testing.assert_array_equal(oh[0, 0, 2], [0, 0, 1, 0])  # C
    np.testing.assert_array_equal(oh[0, 0, 3], [0, 0, 0, 1])  # T
    np.testing.assert_array_equal(oh[0, 0, 4], [0, 0, 0, 0])  # N -> zeros
    # reverse strand starts with complement of the last base (A -> T)
    np.testing.assert_array_equal(oh[0, 1, 0], [0, 0, 0, 1])


def test_ascii_encoding():
    ids = encode_ascii("ATGCNatgcX")
    np.testing.assert_array_equal(ids, [0, 1, 2, 3, 4, 5, 6, 7, 8, 4])
