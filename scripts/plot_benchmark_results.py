#!/usr/bin/env python
"""Benchmark figures from the evaluation sweep CSV.

Role parity: reference ``scripts/plot_benchmark_results.py`` — per-class
F1 bars faceted by fragment length, accuracy/macro-F1 vs length curves,
and per-experiment confusion-matrix heatmaps, from the CSV written by
``scripts/run_benchmark_evaluation.py``.

Usage:
    python scripts/plot_benchmark_results.py \
        --metrics-csv evaluation_metrics.csv --out-dir figures/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

try:
    import seaborn as sns
except ImportError:  # pragma: no cover - seaborn is in the base image
    sns = None


def plot_f1_per_class(metrics: pd.DataFrame, out_dir: Path) -> None:
    f1_cols = [c for c in metrics.columns if c.startswith("f1_class_")]
    if not f1_cols:
        return
    melted = metrics.melt(
        id_vars=[c for c in ("length_bp", "input_type") if c in metrics],
        value_vars=f1_cols, var_name="class", value_name="f1",
    )
    melted["class"] = melted["class"].str.replace("f1_class_", "class ")
    if sns is not None and "length_bp" in melted:
        g = sns.catplot(data=melted, x="class", y="f1",
                        hue="input_type" if "input_type" in melted else None,
                        col="length_bp", kind="bar")
        g.fig.suptitle("Per-class F1 by length and input type", y=1.02)
    else:
        plt.figure(figsize=(8, 5))
        for name, grp in melted.groupby("class"):
            plt.bar(name, grp["f1"].mean())
        plt.ylabel("F1")
        plt.title("Per-class F1")
    plt.tight_layout()
    plt.savefig(out_dir / "f1_per_class_bar.png")
    plt.close("all")


def plot_accuracy_vs_length(metrics: pd.DataFrame, out_dir: Path) -> None:
    if "length_bp" not in metrics or metrics["length_bp"].eq("").all():
        return
    df = metrics[metrics["length_bp"] != ""].copy()
    df["length_bp"] = df["length_bp"].astype(int)
    plt.figure(figsize=(8, 5))
    for metric, style in (("overall_accuracy", "-o"), ("macro_f1", "--s")):
        for itype, grp in df.groupby("input_type"):
            grp = grp.sort_values("length_bp")
            plt.plot(grp["length_bp"], grp[metric], style,
                     label=f"{metric} ({itype})")
    plt.xlabel("fragment length (bp)")
    plt.ylabel("score")
    plt.ylim(0, 1.02)
    plt.legend()
    plt.title("Accuracy / macro-F1 vs fragment length")
    plt.tight_layout()
    plt.savefig(out_dir / "accuracy_vs_length.png")
    plt.close("all")


def plot_confusions(metrics: pd.DataFrame, out_dir: Path) -> None:
    if "cm_path" not in metrics:
        return
    for _, row in metrics.iterrows():
        path = Path(str(row["cm_path"]))
        if not path.exists():
            continue
        cm = np.load(path)
        plt.figure(figsize=(5, 4))
        if sns is not None:
            sns.heatmap(cm, annot=True, fmt="d", cbar=False, cmap="Blues")
        else:
            plt.imshow(cm, cmap="Blues")
            for (i, j), v in np.ndenumerate(cm):
                plt.text(j, i, str(v), ha="center", va="center")
        plt.xlabel("predicted")
        plt.ylabel("true")
        plt.title(row.get("experiment", path.stem))
        plt.tight_layout()
        plt.savefig(out_dir / f"{path.stem}.png")
        plt.close("all")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics-csv", type=Path, required=True)
    ap.add_argument("--out-dir", type=Path, default=Path("figures"))
    args = ap.parse_args()

    metrics = pd.read_csv(args.metrics_csv, keep_default_na=False)
    args.out_dir.mkdir(parents=True, exist_ok=True)
    plot_f1_per_class(metrics, args.out_dir)
    plot_accuracy_vs_length(metrics, args.out_dir)
    plot_confusions(metrics, args.out_dir)
    print(f"figures written to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
