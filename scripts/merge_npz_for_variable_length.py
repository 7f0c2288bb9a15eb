#!/usr/bin/env python
"""Merge fixed-length converter NPZs into one mixed-length dataset.

Role parity: reference ``scripts/merge_npz_for_variable_length.py`` —
combine per-length NPZs (e.g. 500/1000/2000 bp conversions of the same
corpus) into a single dense NPZ whose frame tokens are zero-padded to
the longest crop, for variable-length training with runtime crop modes
(``training.crop_mode`` all/sample/range).

Output keeps the converter contract (``translated`` (N,6,Pmax),
``labels``, ``lengths``, ``translated_lengths``) so
``jaeger_tpu.train.data.batches_from_npz`` loads it unchanged; padding
tokens are 0 = the masked pad id, so masks stay exact.

Usage:
    python scripts/merge_npz_for_variable_length.py \
        --inputs train_500.npz train_1000.npz train_2000.npz \
        --output train_mixed.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", type=Path, nargs="+", required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--key", default="translated")
    args = ap.parse_args()

    from jaeger_tpu.train.data import load_npz_dataset

    feats: list[np.ndarray] = []
    labels: list[np.ndarray] = []
    lengths: list[np.ndarray] = []
    tlens: list[np.ndarray] = []
    for path in args.inputs:
        data = load_npz_dataset(path, key=args.key)
        f = data[args.key]
        if f.dtype == object:
            f = list(f)
        else:
            f = [f[i] for i in range(f.shape[0])]
        feats.extend(f)
        labels.append(np.asarray(data["labels"]).reshape(-1))
        n = len(f)
        lengths.append(np.asarray(
            data.get("lengths", np.zeros(n, np.int32))).reshape(-1))
        tlens.append(np.asarray(
            data.get("translated_lengths",
                     [a.shape[-1] for a in f])).reshape(-1))
        print(f"{path.name}: {n} fragments, P={f[0].shape[-1]}")

    max_p = max(a.shape[-1] for a in feats)
    out = np.zeros((len(feats),) + feats[0].shape[:-1] + (max_p,),
                   dtype=feats[0].dtype)
    for i, a in enumerate(feats):
        out[i, ..., : a.shape[-1]] = a

    np.savez_compressed(
        args.output,
        **{
            args.key: out,
            "labels": np.concatenate(labels),
            "lengths": np.concatenate(lengths),
            "translated_lengths": np.concatenate(tlens).astype(np.int32),
        },
    )
    print(f"wrote {out.shape[0]} fragments (P={max_p}) to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
