"""Training data-pipeline throughput benchmark (host side).

The reference's OWN headline performance numbers are training
data-pipeline rates (reference ``docs/_source/optimizations.md:410-417``,
BASELINE.md): ~130-317 batches/s for CSV live preprocessing and
~2,900-10,000 batches/s for preprocessed NPZ, on its GPU hosts, at
batch 96. This measures jaeger-tpu's equivalents on the same terms:

  - **CSV live**: `train/data.py::batches_from_csv` — shuffle buffer +
    raw base-ID assembly (the codon encoding itself runs fused on
    device, so "live preprocessing" leaves almost nothing on the host;
    that design IS the speedup).
  - **NPZ preprocessed**: `batches_from_npz` over a
    `dataops/convert.py::convert_dataset` artifact (dense path).
  - **NPZ runtime-crop**: `cropped_batches_from_npz` crop_mode=sample
    (the variable-length training path).

Run:  python scripts/data_pipeline_bench.py [--rows 200000] [--batch 96]
Prints one line per path plus a JSON summary; purely host-side (no
device work), so it runs anywhere.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_CSV_LIVE = (130, 317)      # batches/s, RTX 3500 Ada / L40S
REF_NPZ = (2_900, 10_000)      # batches/s, L40S / RTX 3500 Ada


def make_csv(path: Path, rows: int, seq_len: int, seed: int = 7) -> None:
    rng = random.Random(seed)
    bases = "ACGT"
    with open(path, "w") as fh:
        for _ in range(rows):
            seq = "".join(rng.choices(bases, k=seq_len))
            fh.write(f"{rng.randrange(3)},{seq}\n")


def timed_batches(it, n_batches: int, warmup: int = 20):
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return n_batches / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--seq-len", type=int, default=500)
    ap.add_argument("--n-batches", type=int, default=2_000)
    args = ap.parse_args()

    from jaeger_tpu.dataops.convert import convert_dataset
    from jaeger_tpu.train.data import (
        batches_from_csv,
        batches_from_npz,
        cropped_batches_from_npz,
    )

    results: dict[str, float] = {}
    with tempfile.TemporaryDirectory() as td:
        tdir = Path(td)
        csv = tdir / "train.csv"
        print(f"generating {args.rows} x {args.seq_len} nt CSV ...",
              flush=True)
        make_csv(csv, args.rows, args.seq_len)

        it = batches_from_csv(
            [csv], batch_size=args.batch, crop_nt=args.seq_len,
            num_classes=3,
        )
        rate = timed_batches(it, args.n_batches)
        results["csv_live"] = rate
        print(f"CSV live        : {rate:10.0f} batches/s "
              f"(reference GPUs: {REF_CSV_LIVE[0]}-{REF_CSV_LIVE[1]})",
              flush=True)

        npz = tdir / "train.npz"
        print("converting to NPZ ...", flush=True)
        convert_dataset(str(csv), str(npz), format="translated",
                        crop_size=args.seq_len, workers=4)
        it = batches_from_npz(npz, batch_size=args.batch, num_classes=3)
        rate = timed_batches(it, args.n_batches)
        results["npz_dense"] = rate
        print(f"NPZ preprocessed: {rate:10.0f} batches/s "
              f"(reference GPUs: {REF_NPZ[0]}-{REF_NPZ[1]})", flush=True)

        it = cropped_batches_from_npz(
            npz, batch_size=args.batch, num_classes=3,
            crop_sizes=[300], crop_mode="sample",
        )
        rate = timed_batches(it, args.n_batches)
        results["npz_runtime_crop"] = rate
        print(f"NPZ runtime-crop: {rate:10.0f} batches/s", flush=True)

    summary = {
        "batch": args.batch,
        "seq_len": args.seq_len,
        "batches_per_s": {k: round(v, 1) for k, v in results.items()},
        "reference_csv_live": REF_CSV_LIVE,
        "reference_npz": REF_NPZ,
        "vs_reference_best_csv": round(
            results["csv_live"] / REF_CSV_LIVE[1], 2),
        "vs_reference_best_npz": round(
            results["npz_dense"] / REF_NPZ[1], 2),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
