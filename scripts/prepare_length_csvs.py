#!/usr/bin/env python
"""Build per-length train/val fragment CSVs from a FASTA + label TSV.

Role parity: reference ``scripts/prepare_length_csvs.py`` — join
sequences with a tab-separated label file, shuffle once, carve a
validation fraction, and for each requested length emit
``train_<L>.csv`` / ``val_<L>.csv`` of ``label,sequence`` rows (one
length-L prefix per record; shorter records are dropped for that
length). The label map is configurable instead of hardcoded.

Usage:
    python scripts/prepare_length_csvs.py --fasta genomes.fa \
        --tsv labels.tsv --out-dir csvs/ --lengths 500 1000 2000 \
        [--label-map chromosome=0 virus=1 plasmid=2] \
        [--label-column 2] [--val-frac 0.1] [--seed 42]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_MAP = {"chromosome": 0, "virus": 1, "plasmid": 2}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fasta", required=True)
    ap.add_argument("--tsv", required=True,
                    help="TSV with sequence id in column 0 and the class "
                         "name in --label-column")
    ap.add_argument("--out-dir", type=Path, required=True)
    ap.add_argument("--lengths", type=int, nargs="+",
                    default=[500, 1000, 2000])
    ap.add_argument("--label-map", nargs="*", default=None,
                    help="name=id pairs (default chromosome=0 virus=1 "
                         "plasmid=2)")
    ap.add_argument("--label-column", type=int, default=2)
    ap.add_argument("--val-frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from jaeger_tpu.seqops.fasta import read_fasta

    label_map = DEFAULT_MAP
    if args.label_map:
        label_map = {}
        for pair in args.label_map:
            name, _, idx = pair.partition("=")
            label_map[name] = int(idx)

    labels: dict[str, int] = {}
    with open(args.tsv) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) > args.label_column:
                name = parts[args.label_column]
                if name in label_map:
                    labels[parts[0].split()[0]] = label_map[name]

    records = [
        (labels[header.split()[0]], seq.upper())
        for header, seq in read_fasta(args.fasta)
        if header.split()[0] in labels
    ]
    rng = np.random.default_rng(args.seed)
    rng.shuffle(records)
    n_val = int(len(records) * args.val_frac)
    splits = {"val": records[:n_val], "train": records[n_val:]}
    print(f"total {len(records)} records -> train "
          f"{len(splits['train'])}, val {len(splits['val'])}")

    args.out_dir.mkdir(parents=True, exist_ok=True)
    for length in args.lengths:
        for split, recs in splits.items():
            path = args.out_dir / f"{split}_{length}.csv"
            written = 0
            with open(path, "w") as out:
                for label, seq in recs:
                    if len(seq) >= length:
                        out.write(f"{label},{seq[:length]}\n")
                        written += 1
            print(f"wrote {path}: {written} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
