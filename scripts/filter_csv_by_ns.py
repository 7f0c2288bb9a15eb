#!/usr/bin/env python
"""Drop fragment-CSV rows with long ambiguous-nucleotide runs.

Role parity: reference ``scripts/filter_csv_by_ns.py`` — keep rows of a
``label,sequence[,...]`` CSV whose sequence has no run of more than
``--max-run`` consecutive N/n characters; rows are copied verbatim,
only the second field is inspected; per-class kept/removed counts are
printed.

Usage:
    python scripts/filter_csv_by_ns.py train.csv -o filtered.csv \
        [--max-run 10]
"""

from __future__ import annotations

import argparse
import re
from collections import Counter
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", type=Path)
    ap.add_argument("-o", "--output", type=Path, required=True)
    ap.add_argument("--max-run", type=int, default=10)
    args = ap.parse_args()

    run = re.compile(f"[Nn]{{{args.max_run + 1},}}")
    kept: Counter = Counter()
    removed: Counter = Counter()
    with open(args.input) as fin, open(args.output, "w") as fout:
        for line in fin:
            parts = line.rstrip("\n").split(",")
            if len(parts) < 2:
                continue
            label = parts[0]
            if run.search(parts[1]):
                removed[label] += 1
            else:
                kept[label] += 1
                fout.write(line)

    for label in sorted(set(kept) | set(removed)):
        print(f"label {label}: kept {kept[label]}, "
              f"removed {removed[label]}")
    print(f"wrote {sum(kept.values())} rows to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
