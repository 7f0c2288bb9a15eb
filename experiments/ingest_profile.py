"""Host-ingest per-leg attribution + worker-scaling curve (round 4).

The round-3 chip composite is ingest-bound at the reference's 2 kb
defaults (device 23.1k windows/s vs host ingest 12.7-21k,
E2E_BENCH_r03.json) — this experiment attributes the serial per-MB cost
leg by leg so optimization targets the dominant term instead of guesses:

  fasta_read     native FASTA streaming + ascii decode to Python str
  contig_ids     uppercase + base-ID encode (native, DUST OFF)
  sdust          the DUST delta (contig_ids with dust minus without)
  window_counts  per-window A/T/G/C counts (native)
  gather         window slicing ids[starts+arange] (numpy)
  gc_skew        scalar Python round() per window (parity-pinned)
  pipeline       full serial window_batches() wall (incl. flush/meta)

plus the measured worker-scaling curve (1/2/4 threads) of the full
pipeline — VERDICT r3 item 1 requires the curve, not an assertion.

Usage: python experiments/ingest_profile.py [--mb 20] [--out JSON]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FSIZE = 2000
STRIDE = 2000


def _drain(it) -> int:
    n = 0
    for b in it:
        n += len(b)
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=20.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from experiments.e2e_bench import make_metagenome
    from jaeger_tpu import native
    from jaeger_tpu.seqops import windows as W

    assert native.available(), "native lib required for the profile"

    work = Path("/tmp/jt_ingest_profile")
    work.mkdir(exist_ok=True)
    fasta = work / f"meta_{args.mb}mb.fasta"
    if not fasta.exists():
        info = make_metagenome(fasta, args.mb)
        (work / "info.json").write_text(json.dumps(info))
    info = json.loads((work / "info.json").read_text())
    mb = info["bases"] / 1e6
    print(f"corpus: {info['contigs']} contigs, {mb:.1f} MB")

    # --- load contigs once so per-leg timings exclude file IO ---
    contigs = [(h, s) for h, s in native.read_fasta_native(str(fasta))]
    n_windows = sum(len(s) // FSIZE for _, s in contigs)

    legs: dict[str, float] = {}

    def best(name, fn, repeats=args.repeats):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        legs[name] = min(ts)
        print(f"  {name:15s} {legs[name]*1e3:8.1f} ms  "
              f"{mb/legs[name]:7.1f} MB/s  "
              f"{n_windows/legs[name]:9.0f} windows/s-equiv")

    print("per-leg (serial, file preloaded):")
    best("fasta_read", lambda: _drain(
        iter(native.read_fasta_native(str(fasta)))) or None)

    best("contig_ids", lambda: [
        native.contig_ids_native(s, dustmask=False) for _, s in contigs])

    def _with_dust():
        return [native.contig_ids_native(s, dustmask=True)
                for _, s in contigs]
    best("contig_ids+dust", _with_dust)
    legs["sdust"] = legs["contig_ids+dust"] - legs["contig_ids"]
    print(f"  {'sdust (delta)':15s} {legs['sdust']*1e3:8.1f} ms  "
          f"{mb/max(legs['sdust'],1e-9):7.1f} MB/s")

    ids_all = _with_dust()
    starts_all = [np.arange(0, len(s) - FSIZE + 1, STRIDE, dtype=np.int64)
                  for _, s in contigs]

    best("window_counts", lambda: [
        native.window_counts_native(i, st, FSIZE)
        for i, st in zip(ids_all, starts_all)])

    best("gather", lambda: [
        i[st[:, None] + np.arange(FSIZE)]
        for i, st in zip(ids_all, starts_all)])

    counts_all = [native.window_counts_native(i, st, FSIZE)
                  for i, st in zip(ids_all, starts_all)]

    def _skew():
        for cts in counts_all:
            g, c = cts[:, 2], cts[:, 3]
            np.fromiter((W._gc_skew(gv, cv)
                         for gv, cv in zip(g.tolist(), c.tolist())),
                        dtype=np.float64, count=g.shape[0])
    best("gc_skew", _skew)

    # --- full pipeline + worker scaling ---
    print("full window_batches() wall (incl. file IO, flush, meta):")
    curve = {}
    for workers in (0, 2, 4):
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            n = _drain(W.window_batches(
                str(fasta), fragsize=FSIZE, stride=STRIDE,
                min_len=500, workers=workers))
            ts.append(time.perf_counter() - t0)
        wps = n / min(ts)
        curve[str(max(1, workers))] = wps
        print(f"  workers={max(1,workers)}: {wps:9.0f} windows/s "
              f"({n} windows, best of {args.repeats})")

    out = {
        "corpus_mb": round(mb, 2),
        "n_windows": n_windows,
        "fsize": FSIZE,
        "legs_ms": {k: round(v * 1e3, 1) for k, v in legs.items()},
        "legs_mb_per_s": {k: round(mb / v, 1)
                          for k, v in legs.items() if v > 1e-9},
        "worker_curve_windows_per_s": {k: round(v) for k, v in curve.items()},
    }
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
