#!/usr/bin/env python
"""Score jaeger-tpu prediction TSVs against real-world fraction labels.

Role parity: reference ``scripts/calculate_metrics_realworld.py`` —
pair per-sample prediction TSVs with ``<sample>_labels.tsv`` ground
truth (columns ``contig_id`` + ``fraction``), compute the binary
viral-detection metrics (precision/recall/F1/accuracy/balanced
accuracy), per-class precision/recall/F1/support, reliability
statistics, and write per-sample JSON/CSV/confusion outputs plus one
aggregate CSV.

A prediction counts as viral when its ``prediction`` is in
{phage, virus, viral}; predictions under ``--reliability-cutoff`` are
demoted to cellular for the binary task. Metrics run on the
intersection of contig ids (labels may cover more contigs than the
prediction TSV or vice versa).

Usage:
    python scripts/calculate_metrics_realworld.py \
        --predictions-dir preds/ --labels-dir labels/ --output-dir out/ \
        [--reliability-cutoff 0.8]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd

VIRAL = frozenset({"phage", "virus", "viral"})


def _prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


def pair_samples(predictions_dir: Path, labels_dir: Path):
    """Match each prediction TSV to the longest ``_``-prefix label file.

    ``gut_scaffolds_gt1500.tsv`` pairs with ``gut_labels.tsv`` (or
    ``gut_scaffolds_labels.tsv`` if that exists — longest prefix wins).
    """
    labels = {p.stem[: -len("_labels")]: p
              for p in labels_dir.glob("*_labels.tsv")}
    for pred in sorted(predictions_dir.glob("*.tsv")):
        tokens = pred.stem.split("_")
        label = next(
            (labels["_".join(tokens[:end])]
             for end in range(len(tokens), 0, -1)
             if "_".join(tokens[:end]) in labels),
            None,
        )
        if label is None:
            print(f"Warning: no label file found for sample "
                  f"'{pred.stem}'", file=sys.stderr)
            continue
        yield pred.stem, pred, label


def score_sample(pred_path: Path, label_path: Path,
                 reliability_cutoff: float = 0.0) -> tuple[dict, np.ndarray]:
    """Metrics dict + 2x2 binary confusion matrix for one sample."""
    preds = pd.read_csv(pred_path, sep="\t")
    if "contig_id" in preds.columns:
        preds["contig_id"] = preds["contig_id"].str.replace(
            "___", ",", regex=False)
    labels = pd.read_csv(label_path, sep="\t")
    for frame, col in ((preds, "prediction"), (labels, "fraction")):
        if col not in frame.columns:
            raise ValueError(f"missing required column {col!r}")

    merged = labels.merge(preds, on="contig_id", how="inner")
    if merged.empty:
        raise ValueError(
            f"no overlapping contig_ids between {pred_path.name} and "
            f"{label_path.name}")

    y_true = merged["fraction"].isin(VIRAL).to_numpy()
    y_pred = merged["prediction"].isin(VIRAL).to_numpy()
    if reliability_cutoff > 0 and "reliability_score" in merged.columns:
        y_pred = y_pred & (
            merged["reliability_score"].to_numpy() >= reliability_cutoff)

    tp = int((y_true & y_pred).sum())
    fp = int((~y_true & y_pred).sum())
    fn = int((y_true & ~y_pred).sum())
    tn = int((~y_true & ~y_pred).sum())
    precision, recall, f1 = _prf(tp, fp, fn)
    viral_recall = recall
    cellular_recall = tn / (tn + fp) if tn + fp else 0.0
    row: dict = {
        "sample": pred_path.stem,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "accuracy": (tp + tn) / len(y_true),
        "balanced_accuracy": (viral_recall + cellular_recall) / 2,
    }

    # multi-class metrics over the raw fraction / prediction names
    classes = sorted(set(merged["fraction"]) | set(merged["prediction"]))
    for cls in classes:
        t = (merged["fraction"] == cls).to_numpy()
        p = (merged["prediction"] == cls).to_numpy()
        cp, cr, cf = _prf(int((t & p).sum()), int((~t & p).sum()),
                          int((t & ~p).sum()))
        row[f"precision_{cls}"] = cp
        row[f"recall_{cls}"] = cr
        row[f"f1_{cls}"] = cf
        row[f"support_{cls}"] = float(t.sum())

    row.update({
        "num_contigs": int(len(y_true)),
        "num_viral_true": int(y_true.sum()),
        "num_cellular_true": int((~y_true).sum()),
        "num_viral_pred": int(y_pred.sum()),
        "reliability_cutoff": float(reliability_cutoff),
    })
    if "reliability_score" in preds.columns:
        rel = preds["reliability_score"]
        row["mean_reliability"] = float(rel.mean())
        row["median_reliability"] = float(rel.median())
        row["frac_above_cutoff"] = float(
            (rel >= reliability_cutoff).mean())

    cm = np.array([[tn, fp], [fn, tp]], dtype=np.int64)
    return row, cm


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Score prediction TSVs against fraction labels.")
    ap.add_argument("--predictions-dir", type=Path, required=True)
    ap.add_argument("--labels-dir", type=Path, required=True)
    ap.add_argument("--output-dir", type=Path, required=True)
    ap.add_argument("--reliability-cutoff", type=float, default=0.0)
    args = ap.parse_args()

    args.output_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for sample, pred_path, label_path in pair_samples(
            args.predictions_dir, args.labels_dir):
        try:
            row, cm = score_sample(pred_path, label_path,
                                   args.reliability_cutoff)
        except ValueError as exc:
            print(f"Warning: {sample}: {exc}", file=sys.stderr)
            continue
        rows.append(row)
        (args.output_dir / f"{sample}_metrics.json").write_text(
            json.dumps(row, indent=2))
        pd.DataFrame([row]).to_csv(
            args.output_dir / f"{sample}_metrics.csv", index=False)
        np.save(args.output_dir / f"{sample}_confusion_matrix.npy", cm)
        print(f"{sample}: f1={row['f1']:.3f} "
              f"acc={row['accuracy']:.3f} n={row['num_contigs']}")

    if not rows:
        print("No samples evaluated.", file=sys.stderr)
        return 1
    agg = pd.DataFrame(rows)
    agg.to_csv(args.output_dir / "all_samples_metrics.csv", index=False)
    print(f"wrote {len(rows)} samples to "
          f"{args.output_dir / 'all_samples_metrics.csv'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
