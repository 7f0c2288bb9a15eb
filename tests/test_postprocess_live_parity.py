"""Live parity of host-side postprocess/util numerics against the real
reference package: reliability threshold tuning (AUROC/AUPRC/metric
sweep/best pick), calibration bins, and receptive-field arithmetic over
every parseable reference training config.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

ref_threshold = pytest.importorskip("jaeger.postprocess.threshold")
ref_rf = pytest.importorskip("jaeger.utils.receptive_field")

from jaeger_tpu.postprocess import threshold as our_threshold  # noqa: E402
from jaeger_tpu.utils import receptive_field as our_rf  # noqa: E402


def _scores_labels(rng, n=400):
    labels = (rng.random(n) < 0.6).astype(np.int32)
    scores = np.clip(
        0.55 * labels + 0.25 * rng.standard_normal(n) + 0.2, 0.0, 1.0
    )
    return scores.astype(np.float64), labels


@pytest.mark.parametrize("metric", ["f1-id", "f1-ood", "youden", "mcc"])
def test_threshold_sweep_matches_live_reference(rng, metric):
    scores, labels = _scores_labels(rng)
    ref_best, ref_rows, ref_summary = ref_threshold.tune_reliability_threshold(
        scores, labels, metric=metric
    )
    our_best, our_rows, our_summary = our_threshold.tune_reliability_threshold(
        scores, labels, metric=metric
    )
    assert our_best == pytest.approx(ref_best, abs=1e-12)
    for k, v in ref_summary.items():
        assert our_summary[k] == pytest.approx(v, rel=1e-6, abs=1e-12), k
    assert len(our_rows) == len(ref_rows)
    for rrow, orow in zip(ref_rows, our_rows):
        assert set(rrow) == set(orow)
        for k, v in rrow.items():
            assert orow[k] == pytest.approx(v, rel=1e-6, abs=1e-9), (
                rrow.get("threshold"), k)


def test_calibration_summary_matches_live_reference(rng):
    scores, labels = _scores_labels(rng)
    ref_ece, ref_brier, ref_bins = ref_threshold.calibration_summary(
        scores, labels, n_bins=10
    )
    our_ece, our_brier, our_bins = our_threshold.calibration_summary(
        scores, labels, n_bins=10
    )
    assert our_ece == pytest.approx(ref_ece, rel=1e-6)
    assert our_brier == pytest.approx(ref_brier, rel=1e-6)
    assert len(our_bins) == len(ref_bins)
    for rb, ob in zip(ref_bins, our_bins):
        for k, v in rb.items():
            assert ob[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k


def _reference_layer_stacks():
    from pathlib import Path

    from jaeger_tpu.utils.config import load_model_config

    ref = Path("/root/reference/train_config")
    if not ref.exists():
        return []
    broken = {"nn_config.yaml", "nn_config_baseline.yaml"}  # upstream syntax
    out = []
    for p in sorted(ref.glob("*.yaml")):
        if p.name in broken:
            continue
        cfg = load_model_config(p)
        layers = (cfg.get("model", {})
                  .get("representation_learner", {})
                  .get("hidden_layers"))
        if layers:
            out.append(pytest.param(layers, id=p.name))
    return out


def _has_hyena(layers) -> bool:
    return any(layer.get("name") == "hyena_block" for layer in layers)


@pytest.mark.parametrize("layers", _reference_layer_stacks())
def test_receptive_field_matches_live_reference(layers):
    """Equality on every stack the reference handles. Documented
    intentional divergence: the reference's walker ignores hyena_block
    (leaving RF unchanged, an upstream omission) while ours reports inf
    — a Hyena global FFT conv sees the whole window."""
    if _has_hyena(layers):
        import math

        rf, _ = our_rf.compute_receptive_field(layers)
        assert math.isinf(rf)
        ref, _ = ref_rf.compute_receptive_field(layers)
        assert ref == 1  # the upstream omission this corrects
        return
    assert our_rf.compute_receptive_field(layers) == \
        ref_rf.compute_receptive_field(layers)
