"""Benchmark: steady-state inference windows/s/chip on the flagship model.

Measures the full device path — host->device transfer of raw base IDs,
on-device 6-frame codon encoding, and the bf16 fragment-model forward —
which is the hot loop of `predict` (reference call stack SURVEY §3.1).

Baseline note: the reference publishes no absolute windows/s. BASELINE.md
documents its best GPU end-to-end data-pipeline rate as ~317 batches/s x
batch 64 on an L40S (CSV live preprocessing, the pipeline `predict`
uses) ~= 20,288 windows/s; `vs_baseline` is measured against that nominal.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_NOMINAL_WINDOWS_PER_S = 317 * 64  # L40S CSV pipeline, BASELINE.md


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder, load_model_config

    cfg = load_model_config(
        "/root/reference/train_config/nn_config_1500bp_nmd_merge_6_class_zeus.yaml"
    )
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop

    from jaeger_tpu.infer.engine import InferenceEngine

    batch = 1024
    n_windows = 64 * batch
    rng = np.random.default_rng(0)
    bases_np = rng.integers(0, 4, size=(n_windows, crop_nt), dtype=np.uint8)
    lengths_np = np.full((n_windows,), crop_nt, np.int32)

    engine = InferenceEngine(model, variables, batch_size=batch,
                             output_keys=("prediction", "reliability"))
    # warmup/compile
    engine.predict_windows(bases_np[: 2 * batch], lengths_np[: 2 * batch])

    # steady state through the pipelined engine (transfer + fused encode +
    # bf16 forward + per-batch host offload)
    t0 = time.perf_counter()
    out = engine.predict_windows(bases_np, lengths_np)
    dt = time.perf_counter() - t0
    assert out["prediction"].shape[0] == n_windows
    windows_per_s = n_windows / dt

    print(json.dumps({
        "metric": "inference windows/s/chip (1.2M fragment model, bf16, "
                  f"crop={crop_nt}nt, batch={batch})",
        "value": round(windows_per_s, 1),
        "unit": "windows/s",
        "vs_baseline": round(windows_per_s / REFERENCE_NOMINAL_WINDOWS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
