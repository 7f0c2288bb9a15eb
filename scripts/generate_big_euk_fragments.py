#!/usr/bin/env python3
"""Generate fixed-length, non-overlapping fragments from a eukaryote FASTA.

Parity target: reference ``scripts/generate_big_euk_fragments.py`` —
writes ``label,sequence`` CSV rows for every full-length fragment of
every contig at least ``frag_len`` long (uppercased; gz input supported
by the FASTA reader).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def fragment_fasta(input_fasta: Path, output_csv: Path, label: int,
                   frag_len: int, stride: int, min_len: int) -> int:
    from jaeger_tpu.seqops.fasta import read_fasta

    output_csv.parent.mkdir(parents=True, exist_ok=True)
    n_written = 0
    with open(output_csv, "w", newline="") as fh_out:
        for _name, seq in read_fasta(str(input_fasta)):
            seq = seq.upper()
            length = len(seq)
            if length < frag_len:
                continue
            for start in range(0, length - frag_len + 1, stride):
                frag = seq[start : start + frag_len]
                if len(frag) < min_len:
                    continue
                fh_out.write(f"{label},{frag}\n")
                n_written += 1
    return n_written


def main() -> None:
    p = argparse.ArgumentParser(
        description="Generate fixed-length fragments from a eukaryote "
                    "FASTA for Jaeger training.")
    p.add_argument("-i", "--input-fasta", required=True, type=Path)
    p.add_argument("-o", "--output-csv", required=True, type=Path)
    p.add_argument("--label", type=int, default=2, help="Eukarya label")
    p.add_argument("--frag-len", type=int, default=2000)
    p.add_argument("--stride", type=int, default=2000)
    p.add_argument("--min-len", type=int, default=2000)
    args = p.parse_args()

    n = fragment_fasta(args.input_fasta, args.output_csv, args.label,
                       args.frag_len, args.stride, args.min_len)
    print(f"wrote {n} fragments to {args.output_csv}")


if __name__ == "__main__":
    main()
