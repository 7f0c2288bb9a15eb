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

    batch = 1024
    rng = np.random.default_rng(0)
    bases_np = rng.integers(0, 4, size=(batch, crop_nt), dtype=np.uint8)
    lengths_np = np.full((batch,), crop_nt, np.int32)

    @jax.jit
    def fn(variables, bases, lengths):
        out = model.apply(variables, {"bases": bases, "lengths": lengths},
                          train=False)
        return out["prediction"].astype(jnp.float32)

    # warmup/compile
    out = fn(variables, jnp.asarray(bases_np), jnp.asarray(lengths_np))
    jax.block_until_ready(out)

    # steady state, including host->device transfer each step
    n_iter = 30
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(variables, jnp.asarray(bases_np), jnp.asarray(lengths_np))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    windows_per_s = n_iter * batch / dt

    print(json.dumps({
        "metric": "inference windows/s/chip (1.2M fragment model, bf16, "
                  f"crop={crop_nt}nt, batch={batch})",
        "value": round(windows_per_s, 1),
        "unit": "windows/s",
        "vs_baseline": round(windows_per_s / REFERENCE_NOMINAL_WINDOWS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
