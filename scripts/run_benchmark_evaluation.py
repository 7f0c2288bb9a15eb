#!/usr/bin/env python
"""Discover trained jaeger-tpu experiments and evaluate each.

Role parity: reference ``scripts/run_benchmark_evaluation.py`` — walk an
experiments root for ``experiment_*`` directories, pair each model with
its validation NPZ by fragment length and input type encoded in the
experiment name (``..._<N>bp...``, ``_trans`` => translated), evaluate,
and aggregate one metrics CSV for ``scripts/plot_benchmark_results.py``.

Differences from the reference: experiments hold jaeger-tpu bundles
(``params.msgpack`` + ``project.yaml``) instead of ``*_graph``
SavedModels, and evaluation runs in-process (one JAX runtime, one
compile per shape) instead of one subprocess per experiment.

Usage:
    python scripts/run_benchmark_evaluation.py \
        --experiments-root runs/ --data-root data/val/ \
        [--output-csv evaluation_metrics.csv] [--batch-size 512]
"""

from __future__ import annotations

import argparse
import csv
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def discover_experiments(experiments_root: Path, data_root: Path):
    """Yield ``(experiment_name, bundle_dir, val_npz)`` triples."""
    for exp_dir in sorted(experiments_root.iterdir()):
        if not exp_dir.is_dir() or not exp_dir.name.startswith("experiment_"):
            continue
        if (exp_dir / "params.msgpack").exists():
            bundle = exp_dir
        else:
            bundles = sorted(
                p.parent for p in exp_dir.glob("*/params.msgpack"))
            if not bundles:
                continue
            bundle = bundles[0]

        name = exp_dir.name.removeprefix("experiment_")
        m = re.search(r"(\d+)bp", name)
        length = m.group(1) if m else None
        input_type = "translated" if "_trans" in name else "nucleotide"
        val_npz = data_root / f"val_shuffled_{input_type}_{length}.npz"
        if not val_npz.exists():
            val_npz = data_root / f"val_shuffled_{input_type}.npz"
        yield exp_dir.name, bundle, val_npz


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments-root", type=Path, required=True)
    ap.add_argument("--data-root", type=Path, required=True)
    ap.add_argument("--output-csv", type=Path,
                    default=Path("evaluation_metrics.csv"))
    ap.add_argument("--cm-dir", type=Path, default=None,
                    help="directory for per-experiment confusion .npy")
    ap.add_argument("--batch-size", type=int, default=512)
    args = ap.parse_args()

    import numpy as np

    from jaeger_tpu.train.evaluate import evaluate_bundle_on_npz

    rows: list[dict] = []
    fieldnames: list[str] | None = None
    for exp_name, bundle, val_npz in discover_experiments(
            args.experiments_root, args.data_root):
        if not val_npz.exists():
            print(f"Warning: missing {val_npz} for {exp_name}",
                  file=sys.stderr)
            continue
        print(f"evaluating {exp_name}: {bundle} on {val_npz}")
        row, cm, _, _ = evaluate_bundle_on_npz(
            bundle, val_npz, batch_size=args.batch_size)

        m = re.search(r"(\d+)bp", exp_name)
        row["experiment"] = exp_name
        row["length_bp"] = m.group(1) if m else ""
        row["input_type"] = (
            "translated" if "_trans" in exp_name else "nucleotide")
        if args.cm_dir is not None:
            args.cm_dir.mkdir(parents=True, exist_ok=True)
            cm_path = args.cm_dir / f"{exp_name}_cm.npy"
            np.save(cm_path, cm)
            row["cm_path"] = str(cm_path)
        rows.append(row)
        if fieldnames is None:
            fieldnames = list(row)
        else:
            fieldnames += [k for k in row if k not in fieldnames]

    if not rows:
        print("No experiments evaluated.", file=sys.stderr)
        return 1

    with open(args.output_csv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=fieldnames, restval="")
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.output_csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
