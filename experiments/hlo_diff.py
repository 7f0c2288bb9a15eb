"""Diff the optimized TPU HLO of the built bench program vs the floor.

Compiles both (no execution), prints per-opcode counts and the compiler
cost analysis (flops / bytes accessed) to attribute the built model's
~17 ms/2048 overhead over the bare-jnp floor (experiments/floor_probe.py).
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 2048


def op_histogram(text: str) -> Counter:
    hist = Counter()
    for line in text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = \S+ ([a-z\-]+)\(", line)
        if m:
            op = m.group(1)
            if op == "fusion":
                kind = re.search(r'kind=(\w+)', line)
                op = f"fusion:{kind.group(1) if kind else '?'}"
            if op == "custom-call":
                tgt = re.search(r'custom_call_target="([^"]+)"', line)
                op = f"cc:{tgt.group(1) if tgt else '?'}"
            hist[op] += 1
    return hist


def summarize(name, compiled):
    text = compiled.as_text()
    hist = op_histogram(text)
    print(f"=== {name} ===")
    interesting = {k: v for k, v in hist.items() if k not in (
        "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
        "copy")}
    for k, v in sorted(interesting.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v}")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        for key in ("flops", "bytes accessed", "transcendentals",
                    "optimal_seconds"):
            if key in ca:
                print(f"  cost[{key}] = {ca[key]:.4g}")
    except Exception as e:  # pragma: no cover
        print(f"  (cost analysis unavailable: {e})")
    print(flush=True)
    return text


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config
    from jaeger_tpu.ops.encode import encode_frames

    cfg = flagship_config()
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop

    def bench_prog(variables, seed):
        bases = jax.random.randint(
            jax.random.PRNGKey(seed), (B, crop_nt), 0, 4, dtype=jnp.int32
        ).astype(jnp.uint8)
        lengths = jnp.full((B,), crop_nt, jnp.int32)
        out = model.apply(variables, {"bases": bases, "lengths": lengths},
                          train=False, assume_dense=True)
        return jnp.sum(out["prediction"].astype(jnp.float32))

    # --- floor (mirrors experiments/floor_probe.py floor3d) ---
    F, L, C_EMB, C, DEPTH = 6, 500, 196, 128, 12
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, DEPTH + 4)
    emb = jax.random.normal(ks[0], (65, C_EMB), jnp.bfloat16) * 0.1
    w7 = jax.random.normal(ks[1], (7, C_EMB, C), jnp.bfloat16) * 0.05
    ws = [jax.random.normal(ks[2 + i], (5, C, C), jnp.bfloat16) * 0.05
          for i in range(DEPTH)]
    wout = jax.random.normal(ks[-1], (C, 6), jnp.bfloat16) * 0.1

    def conv(x, w, dil=1):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME" if w.shape[0] == 5 else "VALID",
            rhs_dilation=(dil,), dimension_numbers=("NWC", "WIO", "NWC"))

    def dyt(x):
        return jnp.tanh(0.5 * x)

    act = partial(jax.nn.gelu, approximate=True)

    def floor_prog(seed):
        bases = jax.random.randint(
            jax.random.PRNGKey(seed), (B, 1505), 0, 4, dtype=jnp.int32
        ).astype(jnp.uint8)
        toks = encode_frames(bases, jnp.full((B,), 1505, jnp.int32), 1505)
        oh = jax.nn.one_hot(toks, 65, dtype=jnp.bfloat16)
        x = (oh @ emb).reshape(B * F, L, C_EMB)
        x = act(dyt(conv(x, w7)))
        for i in range(0, DEPTH, 2):
            h = act(dyt(conv(x, ws[i], 3)))
            h = dyt(conv(h, ws[i + 1], 3))
            x = act(h + x)
        x = x.reshape(B, F, x.shape[1], C)
        pooled = jnp.max(x, axis=(1, 2))
        return jnp.sum(pooled.astype(jnp.float32) @ wout.astype(jnp.float32))

    built = jax.jit(bench_prog).lower(variables, 0).compile()
    t1 = summarize("built bench program", built)
    floor = jax.jit(floor_prog).lower(0).compile()
    t2 = summarize("floor program", floor)

    Path("/tmp/hlo_built.txt").write_text(t1)
    Path("/tmp/hlo_floor.txt").write_text(t2)
    print("full HLO in /tmp/hlo_built.txt /tmp/hlo_floor.txt")


if __name__ == "__main__":
    main()
