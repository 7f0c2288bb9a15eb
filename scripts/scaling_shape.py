"""Scaling-shape harness: mesh inference at 1/2/4/8 virtual devices.

Runs the data-parallel inference engine over an N-device CPU mesh
(``--xla_force_host_platform_device_count``) at each width, measuring

* correctness — per-contig stats identical to the 1-device run at every
  width (the real guarantee: collective layout does not change results);
* shape — per-device windows/s relative efficiency. On the virtual CPU
  mesh the devices share one physical socket, so absolute numbers mean
  nothing and "efficiency" mostly validates that the sharded program
  does not serialize or blow up collective overhead as width grows
  (BASELINE.json north star: >=90% at 2 hosts measures on real ICI).

Writes SCALING_r0N.json at the repo root:
  {"widths": [...], "windows_per_s": [...], "per_device": [...],
   "efficiency_vs_1": [...], "identical_stats": true}

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_shape.py [--round 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--windows", type=int, default=4096)
    ap.add_argument("--crop", type=int, default=200, help="crop size nt")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    n_dev = len(jax.devices())
    if n_dev < 8:
        raise SystemExit(
            "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
        )

    import jax.numpy as jnp

    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.parallel import mesh as meshlib
    from jaeger_tpu.seqops.windows import WindowBatch

    cfg = {
        "model": {
            "name": "scaling_probe", "seed": 0, "classifier_out_dim": 3,
            "class_label_map": [
                {"class": "chromosome", "label": 0},
                {"class": "phage", "label": 1},
                {"class": "plasmid", "label": 2},
            ],
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 32},
            "string_processor": {"crop_size": args.crop,
                                 "seq_onehot": False},
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 64, "kernel_size": 7}},
                    {"name": "masked_dyt", "config": {}},
                    {"name": "gelu"},
                    {"name": "residual_block",
                     "config": {"block_size": 2, "filters": 64,
                                "kernel_size": 5, "dilation_rate": 3,
                                "norm_type": "masked_dyt"}},
                    # the reliability head needs an NMD source
                    # (builder raises otherwise)
                    {"name": "nmd", "config": {}},
                ],
                "pooling": "max",
            },
            "reliability_model": {
                "mode": "nmd",
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 1}}],
            },
            "classifier": {
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 3}}],
            },
        },
        "training": {},
    }
    builder = ModelBuilder(cfg, dtype=jnp.float32)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop

    rng = np.random.default_rng(0)
    n_win = args.windows
    contig = np.repeat(
        np.arange((n_win + 9) // 10, dtype=np.int32), 10
    )[:n_win]
    wb = WindowBatch(
        bases=rng.integers(0, 4, size=(n_win, crop_nt), dtype=np.uint8),
        length=np.full((n_win,), crop_nt, np.int32),
        contig=contig,
        start=np.zeros(n_win, np.int32),
        contig_end=(
            np.concatenate([contig[1:] != contig[:-1], [True]])
        ).astype(np.int8),
        ordinal=np.zeros(n_win, np.int32),
        seqlen=np.full((n_win,), crop_nt, np.int32),
        g=np.zeros(n_win, np.int32), c=np.zeros(n_win, np.int32),
        a=np.zeros(n_win, np.int32), t=np.zeros(n_win, np.int32),
        gc_skew=np.zeros(n_win, np.float32),
        headers=[f"c{i}" for i in range(int(contig.max()) + 1)],
    )

    widths = [1, 2, 4, 8]
    rates, baselines = [], None
    for w in widths:
        mesh = meshlib.data_mesh(w) if w > 1 else None
        engine = InferenceEngine(model, variables,
                                 batch_size=args.batch, mesh=mesh)
        # warmup/compile
        engine.predict_batches_reduced([wb], num_classes=3,
                                       with_reliability=True)
        t0 = time.perf_counter()
        stats, _ = engine.predict_batches_reduced(
            [wb], num_classes=3, with_reliability=True)
        dt = time.perf_counter() - t0
        rates.append(n_win / dt)
        if baselines is None:
            baselines = stats
        else:
            for g in baselines:
                for k in ("n_windows", "cls_counts"):
                    assert np.array_equal(baselines[g][k], stats[g][k]), (
                        f"width {w} diverged on contig {g} ({k})"
                    )
                np.testing.assert_allclose(
                    np.asarray(baselines[g]["pred_sum"], np.float32),
                    np.asarray(stats[g]["pred_sum"], np.float32),
                    rtol=1e-3, atol=1e-3,
                )
        print(f"width {w}: {n_win / dt:,.0f} windows/s "
              f"({n_win / dt / w:,.0f}/device)")

    per_device = [r / w for r, w in zip(rates, widths)]
    out = {
        "widths": widths,
        "windows_per_s": [round(r, 1) for r in rates],
        "per_device": [round(p, 1) for p in per_device],
        "efficiency_vs_1": [
            round(p / per_device[0], 3) for p in per_device
        ],
        "identical_stats": True,
        "note": "8 virtual CPU devices share one socket; shape/correctness "
                "harness, not absolute scaling (real ICI numbers need real "
                "chips)",
    }
    path = Path(__file__).resolve().parent.parent / (
        f"SCALING_r{args.round:02d}.json"
    )
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
