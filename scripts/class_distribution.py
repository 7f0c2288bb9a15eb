#!/usr/bin/env python
"""Report the per-class fragment distribution of converter NPZ datasets.

Role parity: reference ``scripts/class_distribution.py`` — per-class
counts and percentages per file (flat or sharded-manifest NPZs),
pairwise train/val ratio comparison, and inverse-frequency class
weights ready to paste into ``training.classifier_class_weights``.

Usage:
    python scripts/class_distribution.py train.npz [val.npz ...] \
        [--names bacteria phage ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def label_counts(npz_path: Path) -> dict[int, int]:
    from jaeger_tpu.train.data import load_npz_dataset

    data = load_npz_dataset(npz_path)
    labels = np.asarray(data["labels"]).reshape(-1).astype(np.int64)
    values, counts = np.unique(labels, return_counts=True)
    return dict(zip(values.tolist(), counts.tolist()))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("npz", nargs="+", type=Path)
    ap.add_argument("--names", nargs="*", default=None,
                    help="class names by label index")
    args = ap.parse_args()

    def name(c: int) -> str:
        if args.names and c < len(args.names):
            return args.names[c]
        return f"class_{c}"

    per_file: dict[str, dict[int, int]] = {}
    for path in args.npz:
        counts = label_counts(path)
        per_file[path.name] = counts
        total = sum(counts.values())
        print(f"\n{path.name}  (n={total})")
        for c in sorted(counts):
            print(f"  {name(c):<16} {counts[c]:>10}  "
                  f"{100 * counts[c] / total:6.2f}%")
        # inverse-frequency weights normalised to mean 1
        k = len(counts)
        inv = {c: total / (k * counts[c]) for c in counts}
        weights = ", ".join(f"{inv[c]:.4f}" for c in sorted(inv))
        print(f"  classifier_class_weights: [{weights}]")

    files = list(per_file)
    for i in range(len(files)):
        for j in range(i + 1, len(files)):
            a, b = per_file[files[i]], per_file[files[j]]
            print(f"\ncount ratio {files[i]} / {files[j]}:")
            for c in sorted(set(a) | set(b)):
                ratio = a.get(c, 0) / b[c] if b.get(c) else float("inf")
                print(f"  {name(c):<16} {ratio:8.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
