"""Live parity of the training metrics against the reference's real
Keras metric classes (``nnlib/metrics.py``) on identical logits/labels,
including streaming across multiple update batches.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

tf = pytest.importorskip("tensorflow")
ref_metrics = pytest.importorskip("jaeger.nnlib.metrics")

from jaeger_tpu.train import metrics as our_metrics  # noqa: E402


def _data(rng, n=120, c=4):
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    onehot = np.eye(c, dtype=np.float32)[labels]
    return logits, labels, onehot


@pytest.mark.parametrize("cls,fn", [
    ("PrecisionForClass", "precision_for_class"),
    ("RecallForClass", "recall_for_class"),
    ("SpecificityForClass", "specificity_for_class"),
])
@pytest.mark.parametrize("class_id", [0, 2])
def test_per_class_metrics_match_live(rng, cls, fn, class_id):
    logits, labels, onehot = _data(rng)
    m = getattr(ref_metrics, cls)(class_id=class_id)
    # stream in two batches like Keras fit would
    m.update_state(tf.constant(onehot[:50]), tf.constant(logits[:50]))
    m.update_state(tf.constant(onehot[50:]), tf.constant(logits[50:]))
    ref = float(m.result())
    ours = getattr(our_metrics, fn)(labels, logits, class_id=class_id)
    assert ours == pytest.approx(ref, rel=1e-5, abs=1e-6)


def test_macro_f1_matches_live(rng):
    logits, labels, onehot = _data(rng)
    m = ref_metrics.MacroF1Score(num_classes=4)
    m.update_state(tf.constant(onehot[:70]), tf.constant(logits[:70]))
    m.update_state(tf.constant(onehot[70:]), tf.constant(logits[70:]))
    ref = float(m.result())
    ours = our_metrics.macro_f1_score(labels, logits, num_classes=4)
    assert ours == pytest.approx(ref, rel=1e-5, abs=1e-6)


def test_binary_f1_matches_live(rng):
    n = 150
    logits = rng.standard_normal((n, 1)).astype(np.float32)
    labels = rng.integers(0, 2, size=(n, 1)).astype(np.float32)
    m = ref_metrics.BinaryF1Score()
    m.update_state(tf.constant(labels[:80]), tf.constant(logits[:80]))
    m.update_state(tf.constant(labels[80:]), tf.constant(logits[80:]))
    ref = float(m.result())
    ours = our_metrics.binary_f1_score(labels.reshape(-1), logits.reshape(-1))
    assert ours == pytest.approx(ref, rel=1e-5, abs=1e-6)
