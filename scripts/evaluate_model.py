#!/usr/bin/env python
"""Evaluate a trained model bundle on a labeled CSV or converter NPZ.

Role parity: reference ``scripts/evaluate_saved_model.py`` — per-class
precision/recall/F1, macro-F1, confusion matrix, optional CSV outputs
consumed by ``scripts/run_benchmark_evaluation.py``.

Usage:
    python scripts/evaluate_model.py -m MODEL_DIR -i labeled.csv \
        [-o predictions.csv] [--batch 512]
    python scripts/evaluate_model.py -m MODEL_DIR --npz val.npz \
        [--output-csv metrics.csv] [--output-cm cm.npy]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-i", "--input", default=None,
                    help="label,sequence CSV")
    ap.add_argument("--npz", default=None,
                    help="converter NPZ (translated tokens + labels)")
    ap.add_argument("-o", "--output", default=None,
                    help="optional per-row prediction CSV")
    ap.add_argument("--output-csv", default=None,
                    help="one-row metrics CSV (for the benchmark sweep)")
    ap.add_argument("--output-cm", default=None,
                    help="confusion matrix .npy")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()
    if (args.input is None) == (args.npz is None):
        ap.error("exactly one of -i/--input or --npz is required")

    import numpy as np

    from jaeger_tpu.models.artifacts import class_names_in_order, load_model
    from jaeger_tpu.train import metrics as M
    from jaeger_tpu.train.evaluate import (
        evaluate_bundle_on_csv, evaluate_bundle_on_npz,
    )

    if args.npz:
        row, cm, logits, y_true = evaluate_bundle_on_npz(
            args.model, args.npz, batch_size=args.batch)
    else:
        row, cm, logits, y_true = evaluate_bundle_on_csv(
            args.model, args.input, batch_size=args.batch)

    _, _, _, classes = load_model(args.model)
    _, label_names = class_names_in_order(classes)
    names = label_names or [str(i) for i in range(logits.shape[1])]

    print(M.classification_report(y_true, logits, names))
    print("\nconfusion matrix (rows=true, cols=pred):")
    print(cm)
    print(json.dumps(row))

    if args.output:
        y_pred = np.argmax(logits, axis=1)
        with open(args.output, "w") as fh:
            fh.write("true,pred," + ",".join(
                f"logit_{c}" for c in names) + "\n")
            for i in range(y_true.shape[0]):
                fh.write(
                    f"{y_true[i]},{y_pred[i]},"
                    + ",".join(f"{v:.4f}" for v in logits[i]) + "\n"
                )
    if args.output_csv:
        with open(args.output_csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(row))
            w.writeheader()
            w.writerow(row)
    if args.output_cm:
        np.save(args.output_cm, cm)


if __name__ == "__main__":
    main()
