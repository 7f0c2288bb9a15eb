"""Grouped batching + crop modes + CSV pipeline tests."""

import numpy as np

from jaeger_tpu.train.data import (
    apply_crop_mode,
    batches_from_csv,
    grouped_batches_from_csv,
)


def _csv(tmp_path, rows):
    p = tmp_path / "g.csv"
    p.write_text("".join(f"{label},{seq}\n" for label, seq in rows))
    return str(p)


def test_grouped_batching_exact_lengths(tmp_path, random_dna):
    rows = [(i % 3, random_dna(100 if i % 2 else 150)) for i in range(64)]
    csv = _csv(tmp_path, rows)
    batches = list(
        grouped_batches_from_csv(
            [csv], batch_size=8, num_classes=3, repeat=False
        )
    )
    assert batches
    for b in batches:
        # every row in a batch shares one buffer length == its true length
        assert (b["lengths"] == b["bases"].shape[1]).all()
        assert b["bases"].shape[1] in (100, 150)
    total = sum(len(b["lengths"]) for b in batches)
    assert total == 64


def test_grouped_batching_replica_multiple(tmp_path, random_dna):
    rows = [(0, random_dna(90)) for _ in range(21)]
    csv = _csv(tmp_path, rows)
    batches = list(
        grouped_batches_from_csv(
            [csv], batch_size=8, num_classes=3, replica_multiple=4,
            repeat=False,
        )
    )
    for b in batches:
        assert len(b["lengths"]) % 4 == 0
    assert sum(len(b["lengths"]) for b in batches) == 20  # 1 dropped


def test_grouped_batching_buckets(tmp_path, random_dna):
    rows = [(0, random_dna(np.random.default_rng(i).integers(60, 140)))
            for i in range(40)]
    csv = _csv(tmp_path, rows)
    batches = list(
        grouped_batches_from_csv(
            [csv], batch_size=8, num_classes=3, repeat=False,
            length_buckets=(64, 128, 256),
        )
    )
    for b in batches:
        assert b["bases"].shape[1] in (64, 128, 256)
        assert (b["lengths"] <= b["bases"].shape[1]).all()


def test_crop_mode_sample():
    rng = np.random.default_rng(0)
    batch = {"translated": np.ones((4, 6, 165), np.int32),
             "labels": np.zeros((4, 3), np.float32)}
    out = apply_crop_mode(batch, "sample", [305], rng)
    k = 305 // 3 - 1
    assert (out["translated"][..., :k] == 1).all()
    assert (out["translated"][..., k:] == 0).all()
    # original untouched
    assert (batch["translated"] == 1).all()


def test_crop_mode_range():
    rng = np.random.default_rng(0)
    batch = {"translated": np.ones((2, 6, 200), np.int32)}
    out = apply_crop_mode(batch, "range", [100, 400], rng)
    zeros_tail = (out["translated"] == 0).sum()
    assert zeros_tail > 0


def _crop_npz(tmp_path, lengths, name="crop.npz", ragged=None):
    """NPZ of full-length (6, L) token records (tokens 1..64, 0 = pad)."""
    rng = np.random.default_rng(1)
    n = len(lengths)
    ragged = ragged if ragged is not None else len(set(lengths)) > 1
    if ragged:
        feats = np.empty(n, dtype=object)
        for i, ln in enumerate(lengths):
            feats[i] = rng.integers(1, 65, size=(6, ln)).astype(np.int32)
    else:
        feats = rng.integers(
            1, 65, size=(n, 6, lengths[0])
        ).astype(np.int32)
    labels = np.arange(n) % 3
    p = tmp_path / name
    np.savez(p, translated=feats, labels=labels)
    return str(p), feats, labels


def test_cropped_npz_all_fans_out(tmp_path):
    from jaeger_tpu.train.data import cropped_batches_from_npz

    path, feats, labels = _crop_npz(tmp_path, [599] * 6, ragged=False)
    # crop 165 frames, stride == crop (no overlap): starts 0,165,330,
    # 434 (tail snap) = 4 variants/record -> 24 variants
    batches = list(cropped_batches_from_npz(
        path, batch_size=4, num_classes=3, crop_sizes=[165],
        crop_mode="all", repeat=False,
    ))
    total = sum(b["translated"].shape[0] for b in batches)
    assert total == 24  # 6 records x 4 sliding starts
    for b in batches:
        assert b["translated"].shape == (4, 6, 165)
        assert (b["translated"] > 0).all()  # full crops, no padding


def test_cropped_npz_all_multi_crop_padding(tmp_path):
    from jaeger_tpu.train.data import cropped_batches_from_npz

    path, feats, labels = _crop_npz(tmp_path, [200] * 4, ragged=False)
    batches = list(cropped_batches_from_npz(
        path, batch_size=2, num_classes=3, crop_sizes=[100, 200],
        crop_mode="all", repeat=False,
    ))
    total = sum(b["translated"].shape[0] for b in batches)
    # per record: crop 100 -> starts 0,100 (2 variants); crop 200 -> 1
    assert total == 4 * 3
    padded = sum(
        (b["translated"][j, :, 100:] == 0).all()
        for b in batches for j in range(b["translated"].shape[0])
    )
    assert padded > 0  # the 100-frame crops are zero-padded to 200


def test_cropped_npz_sample_one_variant_per_record(tmp_path):
    from jaeger_tpu.train.data import cropped_batches_from_npz

    path, feats, labels = _crop_npz(tmp_path, [400, 350, 500, 450])
    batches = list(cropped_batches_from_npz(
        path, batch_size=2, num_classes=3, crop_sizes=[165],
        overlap=0.5, crop_mode="sample", repeat=False,
    ))
    assert sum(b["translated"].shape[0] for b in batches) == 4


def test_cropped_npz_range_uniform_lengths(tmp_path):
    from jaeger_tpu.train.data import cropped_batches_from_npz

    path, feats, labels = _crop_npz(tmp_path, [300] * 8, ragged=False)
    b = next(cropped_batches_from_npz(
        path, batch_size=8, num_classes=3, crop_sizes=[50, 250],
        crop_mode="range", seed=3,
    ))
    assert b["translated"].shape == (8, 6, 250)
    lens = [(row > 0).any(axis=0).sum() for row in b["translated"]]
    assert min(lens) >= 50 and max(lens) <= 250
    assert len(set(lens)) > 1  # actually variable


def test_cropped_npz_fast_path_delegates(tmp_path):
    from jaeger_tpu.train.data import (
        batches_from_npz, cropped_batches_from_npz,
    )

    path, feats, labels = _crop_npz(tmp_path, [165] * 8, ragged=False)
    a = next(cropped_batches_from_npz(
        path, batch_size=4, num_classes=3, crop_sizes=[165],
        crop_mode="all", seed=11,
    ))
    b = next(batches_from_npz(path, batch_size=4, num_classes=3, seed=11))
    np.testing.assert_array_equal(a["translated"], b["translated"])
    np.testing.assert_array_equal(a["labels"], b["labels"])


def test_cropped_npz_rejects_bad_mode(tmp_path):
    import pytest

    from jaeger_tpu.train.data import cropped_batches_from_npz

    path, _, _ = _crop_npz(tmp_path, [200] * 2, ragged=False)
    with pytest.raises(ValueError, match="crop_mode"):
        next(cropped_batches_from_npz(
            path, batch_size=2, num_classes=3, crop_sizes=[100],
            crop_mode="bogus",
        ))


def test_csv_binary_labels(tmp_path, random_dna):
    rows = [(i % 2, random_dna(60)) for i in range(16)]
    csv = _csv(tmp_path, rows)
    b = next(batches_from_csv([csv], batch_size=8, crop_nt=60,
                              num_classes=1))
    assert b["labels"].shape == (8, 1)
    assert set(np.unique(b["labels"])) <= {0.0, 1.0}
