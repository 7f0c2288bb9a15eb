#!/usr/bin/env python
"""Evaluate a trained model bundle on a labeled CSV.

Role parity: reference ``scripts/evaluate_saved_model.py`` /
``scripts/run_benchmark_evaluation.py`` — per-class precision/recall/F1,
macro-F1, confusion matrix, optional CSV output of per-row predictions.

Usage:
    python scripts/evaluate_model.py -m MODEL_DIR -i labeled.csv \
        [-o predictions.csv] [--batch 512]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-i", "--input", required=True,
                    help="label,sequence CSV")
    ap.add_argument("-o", "--output", default=None,
                    help="optional per-row prediction CSV")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import numpy as np

    from jaeger_tpu.models.artifacts import class_names_in_order, load_model
    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.seqops.windows import BASE_N, encode_ascii
    from jaeger_tpu.train import metrics as M

    model, variables, config, classes = load_model(args.model)
    indices, labels_names = class_names_in_order(classes)
    builder = ModelBuilder(config)
    _, crop_nt = builder.crop

    rows = []
    with open(args.input) as fh:
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

    engine = InferenceEngine(model, variables, batch_size=args.batch,
                             output_keys=("prediction",))
    logits = engine.predict_windows(bases, lengths)["prediction"]
    y_pred = np.argmax(logits, axis=1)

    names = labels_names or [str(i) for i in range(logits.shape[1])]
    print(M.classification_report(y_true, logits, names))
    print("\nconfusion matrix (rows=true, cols=pred):")
    print(M.confusion_matrix(y_true, logits, len(names)))
    summary = {
        "n": n,
        "accuracy": float((y_pred == y_true).mean()),
        "macro_f1": M.macro_f1_score(y_true, logits, len(names)),
    }
    print(json.dumps(summary))

    if args.output:
        with open(args.output, "w") as fh:
            fh.write("true,pred," + ",".join(
                f"logit_{c}" for c in names) + "\n")
            for i in range(n):
                fh.write(
                    f"{y_true[i]},{y_pred[i]},"
                    + ",".join(f"{v:.4f}" for v in logits[i]) + "\n"
                )


if __name__ == "__main__":
    main()
