"""Attribute the axial-attention ladder row's chip time (round 5).

BENCH_r05 measured the axial 3-class 500bp config at 7.2k windows/s
(142 ms / 1024 windows) — ~3x slower per window than the flagship
despite ~1/20 the FLOPs. This script times the same dense program with
layers ablated from the config, bench.py discipline (in-program varied
RNG so the relay can't memoize, one jitted program per variant, 8
execs/fetch, best of `iters`):

  full        the ladder config as benched
  no_attn     axial_attention removed (conv tower + residual only)
  attn_only   conv tower removed (embedding straight into attention)
  blocks_1    num_blocks 2 -> 1 (half the attention layers)

Run on the chip: python experiments/axial_breakdown.py
"""

from __future__ import annotations

import copy
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _variant(cfg: dict, name: str) -> dict:
    cfg = copy.deepcopy(cfg)
    layers = cfg["model"]["representation_learner"]["hidden_layers"]

    def drop(layer_name: str):
        layers[:] = [l for l in layers if l["name"] != layer_name]

    if name == "no_attn":
        drop("axial_attention")
    elif name == "attn_only":
        drop("residual_block")
    elif name == "blocks_1":
        for l in layers:
            if l["name"] == "axial_attention":
                l["config"]["num_blocks"] = 1
    elif name != "full":
        raise ValueError(name)
    return cfg


def _measure(cfg: dict, bsz: int, seed0: int, n_execs: int = 8,
             iters: int = 3) -> float:
    from jaeger_tpu.models.builder import ModelBuilder

    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop

    @jax.jit
    def one_batch(variables, seed):
        k1, _ = jax.random.split(seed)
        bases = jax.random.randint(
            k1, (bsz, crop_nt), 0, 4, dtype=jnp.int32).astype(jnp.uint8)
        lengths = jnp.full((bsz,), crop_nt, jnp.int32)
        out = model.apply(variables, {"bases": bases, "lengths": lengths},
                          train=False, assume_dense=True)
        return jnp.sum(out["prediction"].astype(jnp.float32))

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    acc0 = one_batch(variables, jax.random.PRNGKey(seed0))
    _ = float(combine([acc0] * n_execs))
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        accs = [one_batch(variables,
                          jax.random.PRNGKey(seed0 + 1 + i * n_execs + j))
                for j in range(n_execs)]
        _ = float(combine(accs))
        best = min(best, (time.perf_counter() - t0) / n_execs)
    return best


def main() -> None:
    from jaeger_tpu.utils.config import load_model_config

    root = Path(__file__).resolve().parent.parent
    cfg = load_model_config(
        root / "train_config/fragment_3class_500bp_axial.yaml")
    bsz = 1024
    out = {}
    for i, name in enumerate(("full", "no_attn", "attn_only", "blocks_1")):
        ms = _measure(_variant(cfg, name), bsz, seed0=9000 + 97 * i) * 1e3
        out[name] = {"ms_per_batch": round(ms, 2),
                     "windows_per_s": round(bsz / ms * 1e3, 1)}
        print(f"{name:10s} {ms:8.2f} ms/{bsz}  "
              f"{bsz / ms * 1e3:9.1f} w/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
