"""Live parity of the CSV->NPZ converter against the reference's REAL
``dataops/convert.convert_dataset`` (which degrades gracefully to pure
Python when numba is absent, as in this image) — pins array values,
ragged layouts and archive metadata, not just our own expectations.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

ref_convert = pytest.importorskip("jaeger.dataops.convert")

from jaeger_tpu.dataops import convert as our_convert  # noqa: E402


def _csv(tmp_path, rng, n=10, lengths=(480, 500, 520)):
    """Rows covering sub-crop, exact-crop and super-crop lengths,
    including the m % 3 == 0 case whose frame count differs between the
    reference's TF and converter paths."""
    rows = []
    for i in range(n):
        L = lengths[i % len(lengths)]
        seq = "".join(rng.choice(list("ATGCN"), size=L,
                                 p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        rows.append(f"{i % 3},{seq}")
    p = tmp_path / "in.csv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def _compare(ref_path, our_path):
    r = np.load(ref_path, allow_pickle=True)
    o = np.load(our_path, allow_pickle=True)
    assert set(r.files) == set(o.files), (sorted(r.files), sorted(o.files))
    for k in r.files:
        a, b = r[k], o[k]
        if a.dtype == object:
            assert b.dtype == object and a.shape == b.shape, k
            for i in range(a.shape[0]):
                np.testing.assert_array_equal(a[i], b[i], err_msg=f"{k}[{i}]")
        elif a.dtype.kind == "U":
            assert str(a) == str(b), k
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)


@pytest.mark.parametrize("pad", [False, True])
def test_translated_matches_live_reference(tmp_path, rng, pad):
    csv = _csv(tmp_path, rng)
    ref_convert.convert_dataset(csv, str(tmp_path / "ref.npz"),
                                format="translated", crop_size=500,
                                num_classes=3, pad=pad)
    our_convert.convert_dataset(csv, str(tmp_path / "our.npz"),
                                format="translated", crop_size=500,
                                num_classes=3, pad=pad)
    _compare(tmp_path / "ref.npz", tmp_path / "our.npz")


@pytest.mark.parametrize("one_hot", [False, True])
def test_nucleotide_matches_live_reference(tmp_path, rng, one_hot):
    csv = _csv(tmp_path, rng, n=6, lengths=(180, 200))
    kw = dict(format="nucleotide", crop_size=200, num_classes=3,
              one_hot=one_hot, pad=True)
    ref_convert.convert_dataset(csv, str(tmp_path / "ref.npz"), **kw)
    our_convert.convert_dataset(csv, str(tmp_path / "our.npz"), **kw)
    _compare(tmp_path / "ref.npz", tmp_path / "our.npz")


@pytest.mark.parametrize("codon_map", [
    "cod_id",      # the reference's (quirkily named) dicodon map
    "aa_id", "murphy10_id", "pc5_id", "pc2_id",
])
def test_both_reduced_maps_match_live_reference(tmp_path, rng, codon_map):
    csv = _csv(tmp_path, rng, n=6, lengths=(300, 311, 322))
    kw = dict(format="both", crop_size=300, num_classes=3,
              codon_map=codon_map, pad=True)
    ref_convert.convert_dataset(csv, str(tmp_path / "ref.npz"), **kw)
    our_convert.convert_dataset(csv, str(tmp_path / "our.npz"), **kw)
    _compare(tmp_path / "ref.npz", tmp_path / "our.npz")


def test_multicrop_stride_matches_live_reference(tmp_path, rng):
    csv = _csv(tmp_path, rng, n=4, lengths=(700, 650))
    kw = dict(format="translated", crop_size=[200, 300], strides=[200, 300],
              num_classes=3, pad=True)
    ref_convert.convert_dataset(csv, str(tmp_path / "ref.npz"), **kw)
    our_convert.convert_dataset(csv, str(tmp_path / "our.npz"), **kw)
    _compare(tmp_path / "ref.npz", tmp_path / "our.npz")


def test_valid_codon_lengths_matches_reference_kernel():
    """Brute-force the length arithmetic against the reference's
    ``_single_codon_actual_lengths`` for every length 0..600."""
    lengths = np.arange(0, 601, dtype=np.int64)
    for crop in (104, 500, 501, 502):
        ref = ref_convert._single_codon_actual_lengths(lengths, crop)
        ours_raw = our_convert.valid_codon_lengths(lengths, crop)
        # the reference kernel additionally caps at crop//3 - 1
        ours = np.minimum(ours_raw, max(0, crop // 3 - 1))
        np.testing.assert_array_equal(ours, np.asarray(ref), err_msg=str(crop))


def test_balanced_permutation_matches_live_reference(rng):
    """The class-balanced deficit-scheduler permutation is seed-for-seed
    identical to the reference's (convert.py:1006-1080)."""
    labels = rng.integers(0, 3, size=200).astype(np.int64)
    for seed in (0, 7, 42):
        ref = np.asarray(
            ref_convert._class_interleaved_permutation(labels, seed))
        ours = np.asarray(
            our_convert._class_interleaved_permutation(labels, seed))
        np.testing.assert_array_equal(ours, ref)


def test_balance_classes_npz_matches_live_reference(tmp_path, rng):
    csv = _csv(tmp_path, rng, n=12, lengths=(480, 500))
    kw = dict(format="translated", crop_size=480, num_classes=3,
              pad=True, balance_classes=True, shuffle_seed=11)
    ref_convert.convert_dataset(csv, str(tmp_path / "ref.npz"), **kw)
    our_convert.convert_dataset(csv, str(tmp_path / "our.npz"), **kw)
    _compare(tmp_path / "ref.npz", tmp_path / "our.npz")
