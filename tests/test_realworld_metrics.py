"""Real-world TSV scoring (scripts/calculate_metrics_realworld.py):
known-answer binary metrics, reliability cutoff, sample pairing."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

spec = importlib.util.spec_from_file_location(
    "cmr",
    Path(__file__).resolve().parent.parent
    / "scripts" / "calculate_metrics_realworld.py",
)
cmr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cmr)


@pytest.fixture()
def sample(tmp_path):
    preds = tmp_path / "preds"
    labels = tmp_path / "labels"
    preds.mkdir(), labels.mkdir()
    (preds / "gut_scaffolds_gt1500.tsv").write_text(
        "contig_id\tprediction\treliability_score\n"
        "c1\tphage\t0.95\nc2\tbacteria\t0.90\nc3\tphage\t0.40\n"
        "c4\tbacteria\t0.85\nc5\tphage\t0.99\n")
    (labels / "gut_labels.tsv").write_text(
        "contig_id\tfraction\nc1\tphage\nc2\tcellular\nc3\tcellular\n"
        "c4\tphage\nc5\tphage\nc6\tcellular\n")
    return preds, labels


def test_known_answer_binary_metrics(sample):
    preds, labels = sample
    row, cm = cmr.score_sample(preds / "gut_scaffolds_gt1500.tsv",
                               labels / "gut_labels.tsv")
    # tp=2 fp=1 fn=1 tn=1 on the 5 overlapping contigs
    assert row["precision"] == pytest.approx(2 / 3)
    assert row["recall"] == pytest.approx(2 / 3)
    assert row["accuracy"] == pytest.approx(0.6)
    assert row["balanced_accuracy"] == pytest.approx((2 / 3 + 1 / 2) / 2)
    np.testing.assert_array_equal(cm, [[1, 1], [1, 2]])
    assert row["num_contigs"] == 5
    assert row["support_phage"] == 3.0


def test_reliability_cutoff_demotes(sample):
    preds, labels = sample
    row, _ = cmr.score_sample(preds / "gut_scaffolds_gt1500.tsv",
                              labels / "gut_labels.tsv",
                              reliability_cutoff=0.8)
    # the 0.40-reliability phage call becomes cellular: tp=2 fp=0
    assert row["precision"] == 1.0
    assert row["recall"] == pytest.approx(2 / 3)
    assert row["frac_above_cutoff"] == pytest.approx(0.8)


def test_pairing_longest_prefix(sample, tmp_path):
    preds, labels = sample
    (preds / "orphan_sample.tsv").write_text("contig_id\tprediction\n")
    pairs = list(cmr.pair_samples(preds, labels))
    assert [(n, lp.name) for n, _, lp in pairs] == [
        ("gut_scaffolds_gt1500", "gut_labels.tsv")]
