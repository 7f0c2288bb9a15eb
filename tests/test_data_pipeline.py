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


def test_csv_binary_labels(tmp_path, random_dna):
    rows = [(i % 2, random_dna(60)) for i in range(16)]
    csv = _csv(tmp_path, rows)
    b = next(batches_from_csv([csv], batch_size=8, crop_nt=60,
                              num_classes=1))
    assert b["labels"].shape == (8, 1)
    assert set(np.unique(b["labels"])) <= {0.0, 1.0}
