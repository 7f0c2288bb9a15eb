"""Bundle evaluation on labeled datasets (CSV or converter NPZ).

Role parity: reference ``scripts/evaluate_saved_model.py`` — batch the
validation set through the model, emit overall accuracy, macro F1,
per-class precision/recall/F1 and the confusion matrix. The benchmark
sweep (``scripts/run_benchmark_evaluation.py``) aggregates these rows
across experiment directories.

TPU shape discipline: token batches are padded to one fixed
``(batch, 6, P)`` shape so the whole evaluation reuses a single
compiled program.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from jaeger_tpu.train import metrics as M


def _predict_tokens(model, variables, feats: np.ndarray,
                    batch_size: int) -> np.ndarray:
    """Apply the model over pre-encoded frame tokens in fixed batches."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(tokens):
        out = model.apply(variables, {"translated": tokens}, train=False)
        return out["prediction"]

    n = feats.shape[0]
    pad = (-n) % batch_size
    if pad:
        feats = np.concatenate([feats, np.zeros_like(feats[:pad])], axis=0)
    chunks = []
    for i in range(0, feats.shape[0], batch_size):
        chunks.append(np.asarray(fwd(jnp.asarray(feats[i:i + batch_size]))))
    return np.concatenate(chunks, axis=0)[:n]


def metrics_row(y_true: np.ndarray, logits: np.ndarray,
                num_classes: int) -> dict:
    """One flat metrics record (the sweep's CSV row)."""
    y_pred = np.argmax(logits, axis=1)
    row = {
        "n": int(y_true.shape[0]),
        "overall_accuracy": float((y_pred == y_true).mean()),
        "macro_f1": M.macro_f1_score(y_true, logits, num_classes),
    }
    for c in range(num_classes):
        row[f"precision_class_{c}"] = M.precision_for_class(y_true, logits, c)
        row[f"recall_class_{c}"] = M.recall_for_class(y_true, logits, c)
        row[f"f1_class_{c}"] = M.f1_for_class(y_true, logits, c)
    return row


def evaluate_bundle_on_npz(model_dir: str | Path, npz_path: str | Path,
                           batch_size: int = 512,
                           key: str = "translated"):
    """Evaluate a saved bundle on a converter NPZ.

    Returns ``(metrics_row, confusion_matrix, logits, y_true)``.
    Ragged object arrays are densified to the dataset max length.
    """
    from jaeger_tpu.models.artifacts import load_model
    from jaeger_tpu.train.data import _densify, load_npz_dataset

    model, variables, config, classes = load_model(model_dir)
    data = load_npz_dataset(npz_path, key)
    feats = data[key]
    if feats.dtype == object:
        feats = _densify(feats, np.arange(feats.shape[0]))
    y_true = np.asarray(data["labels"]).astype(np.int64).reshape(-1)

    logits = _predict_tokens(model, variables, feats, batch_size)
    k = logits.shape[1]
    return (metrics_row(y_true, logits, k),
            M.confusion_matrix(y_true, logits, k), logits, y_true)


def evaluate_bundle_on_csv(model_dir: str | Path, csv_path: str | Path,
                           batch_size: int = 512):
    """Evaluate a saved bundle on a ``label,sequence`` CSV.

    Raw sequences go through the engine's on-device encode path.
    Returns ``(metrics_row, confusion_matrix, logits, y_true)``.
    """
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.models.artifacts import load_model
    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.seqops.windows import BASE_N, encode_ascii

    model, variables, config, classes = load_model(model_dir)
    _, crop_nt = ModelBuilder(config).crop

    rows = []
    with open(csv_path) as fh:
        for line in fh:
            parts = line.strip().split(",")
            if len(parts) >= 2:
                try:
                    rows.append((int(parts[0]), parts[1]))
                except ValueError:
                    continue
    n = len(rows)
    bases = np.full((n, crop_nt), BASE_N, dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    y_true = np.zeros(n, dtype=np.int64)
    for i, (label, seq) in enumerate(rows):
        ids = encode_ascii(seq[:crop_nt])
        bases[i, : ids.shape[0]] = ids
        lengths[i] = ids.shape[0]
        y_true[i] = label

    engine = InferenceEngine(model, variables, batch_size=batch_size,
                             output_keys=("prediction",))
    logits = np.asarray(engine.predict_windows(bases, lengths)["prediction"])
    k = logits.shape[1]
    return (metrics_row(y_true, logits, k),
            M.confusion_matrix(y_true, logits, k), logits, y_true)
