"""Chip bench: the Hyena long-context template's device path.

BASELINE.json's config ladder ends with the Hyena full-contig model
(reference ``train_config/hyena_test.yaml`` class); this measures our
``train_config/hyena_fullcontig.yaml`` forward (on-device codon encode +
2 Hyena blocks via causal rFFT conv, bf16 with f32 FFT islands) as one
jitted program over device-resident inputs, varied per exec so the
relay's memoization cannot fake the number.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 256
N_EXECS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.utils.config import load_model_config

    cfg = load_model_config(
        Path(__file__).resolve().parent.parent
        / "train_config" / "hyena_fullcontig.yaml")
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop
    variables = jax.device_put(variables)

    @jax.jit
    def one_batch(variables, seed):
        bases = jax.random.randint(
            seed, (BATCH, crop_nt), 0, 4, dtype=jnp.int32
        ).astype(jnp.uint8)
        lengths = jnp.full((BATCH,), crop_nt, jnp.int32)
        out = model.apply(
            variables, {"bases": bases, "lengths": lengths}, train=False,
        )
        return jnp.sum(out["prediction"].astype(jnp.float32))

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    t0 = time.perf_counter()
    _ = float(combine([one_batch(variables, jax.random.PRNGKey(0))]))
    print(f"compile+first {time.perf_counter() - t0:.1f}s "
          f"(crop={crop_nt}nt, batch={BATCH})")

    iters = 2
    t0 = time.perf_counter()
    for i in range(iters):
        accs = [one_batch(variables, jax.random.PRNGKey(i * N_EXECS + j + 1))
                for j in range(N_EXECS)]
        _ = float(combine(accs))
    dt = (time.perf_counter() - t0) / iters
    wps = BATCH * N_EXECS / dt
    print(json.dumps({
        "model": "hyena_fullcontig (2 blocks, dim 32, crop 2003nt)",
        "windows_per_s": round(wps, 1),
        "ms_per_batch": round(dt / N_EXECS * 1000, 1),
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
