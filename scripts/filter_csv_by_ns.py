#!/usr/bin/env python
"""Drop fragment-CSV rows with long ambiguous-nucleotide runs.

Parity: reference ``scripts/filter_csv_by_ns.py`` (pinned live,
byte-for-byte, in ``tests/test_scripts_live_parity.py``) — keep rows of
a ``label,sequence[,...]`` CSV whose sequence has no run of more than
``--max-run`` consecutive N/n characters; rows are copied verbatim and
only the second field is inspected; headers/malformed rows pass through
verbatim; per-class kept/removed counts are printed.

Usage:
    python scripts/filter_csv_by_ns.py train.csv -o filtered.csv \
        [--max-run 5]
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
    ap.add_argument("--max-run", type=int, default=5)
    args = ap.parse_args()

    run = re.compile(rb"[Nn]{%d,}" % (args.max_run + 1))
    kept: Counter = Counter()
    removed: Counter = Counter()
    unparsed = 0
    with open(args.input, "rb") as fin, open(args.output, "wb") as fout:
        for line in fin:
            parts = line.split(b",", 2)
            try:
                label = int(parts[0])
            except (ValueError, IndexError):
                unparsed += 1
                fout.write(line)  # header/malformed: verbatim
                continue
            if len(parts) < 2:
                unparsed += 1
                fout.write(line)
                continue
            if run.search(parts[1]):
                removed[label] += 1
            else:
                kept[label] += 1
                fout.write(line)

    for label in sorted(set(kept) | set(removed)):
        print(f"label {label}: kept {kept[label]}, "
              f"removed {removed[label]}")
    if unparsed:
        print(f"passed through {unparsed} unparsed row(s)")
    print(f"wrote {sum(kept.values())} rows to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
