#!/usr/bin/env python
"""Merge new fragments of one class while keeping its count fixed.

Role parity: reference ``scripts/balance_and_merge_eukarya.py``
(generalized to any class label) — add newly generated fragments of a
class to an existing training CSV without growing that class's share:
existing rows of the class are probabilistically dropped so that
``kept_existing + new == original count``, and all other rows pass
through untouched.

Usage:
    python scripts/balance_and_merge_class.py --existing train.csv \
        --new-rows big_euk.csv --output train_merged.csv \
        [--class-label 2] [--seed 42]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def count_label(path: Path, label: int) -> int:
    with open(path) as fh:
        return sum(1 for line in fh
                   if line.split(",", 1)[0] == str(label))


def merge(existing: Path, new_rows: Path, output: Path,
          class_label: int, seed: int) -> dict[str, int]:
    have = count_label(existing, class_label)
    incoming = count_label(new_rows, class_label)
    if incoming > have:
        raise SystemExit(
            f"new fragments of class {class_label} ({incoming}) exceed "
            f"the existing count ({have}); thin the new set or let the "
            f"class fraction grow intentionally")
    keep_p = (have - incoming) / have if have else 0.0

    rng = np.random.default_rng(seed)
    counts = {"kept_existing": 0, "dropped_existing": 0,
              "passed_through": 0, "new": incoming}
    output.parent.mkdir(parents=True, exist_ok=True)
    with open(existing) as fin, open(output, "w") as fout:
        for line in fin:
            if line.split(",", 1)[0] == str(class_label):
                if rng.random() < keep_p:
                    fout.write(line)
                    counts["kept_existing"] += 1
                else:
                    counts["dropped_existing"] += 1
            else:
                fout.write(line)
                counts["passed_through"] += 1
        with open(new_rows) as fnew:
            for line in fnew:
                fout.write(line)
    return counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--existing", type=Path, required=True)
    ap.add_argument("--new-rows", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--class-label", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    counts = merge(args.existing, args.new_rows, args.output,
                   args.class_label, args.seed)
    total_class = counts["kept_existing"] + counts["new"]
    print(f"kept {counts['kept_existing']} existing + {counts['new']} new "
          f"= {total_class} class-{args.class_label} rows "
          f"(dropped {counts['dropped_existing']}); "
          f"{counts['passed_through']} other rows passed through")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
