"""Chip ablation: where the flagship forward loses 3-4x vs the raw convs.

dedilate_bench measured the 12-conv d=3 chain alone at 87 TFLOPs (44 ms
at flagship shapes) while the full forward takes ~250 ms/2048 — dilation
is NOT the cost. This ablation rebuilds the model through the real
builder with cumulative/variant configs to localize the remaining
~200 ms:

  full            flagship as-is (baseline)
  conv13          embed + the 13 tower convs only (no norm/act/NMD/residual)
  conv13_dyt      + MaskedDYT after each conv
  conv13_dyt_gelu + exact GELU after each DYT
  full_relu       flagship with every activation = relu  (erf cost probe)
  full_gelu_tanh  flagship with approximate (tanh) GELU

Discipline: one jitted program per variant, varied on-device PRNG inputs
(the relay memoizes identical executions), scalar-fetch sync.
"""

from __future__ import annotations

import copy
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = 2048


def timeit(fn, n_iters=2, n_execs=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    _ = float(combine([fn(0)]))
    t0 = time.perf_counter()
    for i in range(n_iters):
        _ = float(combine([fn(i * n_execs + j + 1) for j in range(n_execs)]))
    return (time.perf_counter() - t0) / n_iters / n_execs


def conv_tower_cfg(base, with_dyt=False, with_gelu=False):
    cfg = copy.deepcopy(base)
    layers = [
        {"name": "masked_conv1d",
         "config": {"filters": 128, "kernel_size": 7}},
    ]
    for _ in range(12):
        layers.append(
            {"name": "masked_conv1d",
             "config": {"filters": 128, "kernel_size": 5,
                        "dilation_rate": 3, "padding": "same"}})
        if with_dyt:
            layers.append({"name": "masked_dyt", "config": {}})
        if with_gelu:
            layers.append({"name": "activation",
                           "config": {"activation": "gelu"}})
    cfg["model"]["representation_learner"]["hidden_layers"] = layers
    cfg["model"]["reliability_model"] = {
        "mode": "nmd",
        "hidden_layers": [{"name": "dense", "config": {"units": 1}}],
    }
    return cfg


def swap_activations(base, act):
    cfg = copy.deepcopy(base)

    def walk(entries):
        for e in entries:
            c = e.setdefault("config", {}) or {}
            e["config"] = c
            if e.get("name") == "activation" and c.get("activation") == "gelu":
                c["activation"] = act
            if e.get("name") == "residual_block":
                c["activation"] = act

    walk(cfg["model"]["representation_learner"]["hidden_layers"])
    return cfg


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config

    base = flagship_config()

    variants = [
        ("full", base),
        ("conv13", conv_tower_cfg(base)),
        ("conv13_dyt", conv_tower_cfg(base, with_dyt=True)),
        ("conv13_dyt_gelu",
         conv_tower_cfg(base, with_dyt=True, with_gelu=True)),
        ("full_relu", swap_activations(base, "relu")),
        ("full_gelu_tanh", swap_activations(base, "gelu_tanh")),
    ]

    for name, cfg in variants:
        builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
        model, variables = builder.init(batch=1)
        _, crop_nt = builder.crop

        @jax.jit
        def fwd(variables, seed):
            bases = jax.random.randint(
                jax.random.PRNGKey(seed), (BATCH, crop_nt), 0, 4,
                dtype=jnp.int32).astype(jnp.uint8)
            lengths = jnp.full((BATCH,), crop_nt, jnp.int32)
            out = model.apply(
                variables, {"bases": bases, "lengths": lengths}, train=False
            )
            return jnp.sum(out["prediction"].astype(jnp.float32))

        dt = timeit(lambda s: fwd(variables, s))
        print(f"{name:16s} {dt * 1e3:8.1f} ms/exec  "
              f"{BATCH / dt:8.0f} windows/s", flush=True)


if __name__ == "__main__":
    main()
