"""Chip microbench: int8 conv chain vs bf16 at flagship shapes.

v5e int8 peak is ~2x bf16 (394 vs 197 TOPS). If XLA lowers an integer
conv onto the int8 MXU path, a quantized inference engine (the
reference ships TFLite/ONNX int8 engines; we ship int8 weight bundles)
could roughly double conv throughput. Measures:

  A. bf16 conv chain (baseline, ~87 TFLOPs at these shapes)
  B. int8 inputs/weights, int32 accumulation (preferred_element_type)
  C. int8 weights dequantized to bf16 inside the program (weight-only
     quantization — the cheap-memory variant)
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 2048 * 6
L = 500
C = 128
K = 5
DEPTH = 12


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


def main() -> None:
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, DEPTH)
    w_bf16 = [jax.random.normal(k, (K, C, C), jnp.bfloat16) * 0.05
              for k in ks]
    w_i8 = [jax.random.randint(k, (K, C, C), -127, 128, jnp.int32)
            .astype(jnp.int8) for k in ks]
    scales = [jnp.float32(0.05 / 127.0)] * DEPTH

    def conv(x, w, dil=3, **kw):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", rhs_dilation=(dil,),
            dimension_numbers=("NWC", "WIO", "NWC"), **kw,
        )

    def chain_bf16(seed):
        x = jax.random.normal(jax.random.PRNGKey(seed), (N, L, C),
                              jnp.bfloat16)
        for w in w_bf16:
            x = conv(x, w)
        return jnp.sum(x.astype(jnp.float32))

    def chain_int8(seed):
        xi = jax.random.randint(jax.random.PRNGKey(seed), (N, L, C),
                                -127, 128, jnp.int32).astype(jnp.int8)
        for w, s in zip(w_i8, scales):
            y = conv(xi, w, preferred_element_type=jnp.int32)
            # requantize to int8 for the next layer (per-tensor scale)
            yf = y.astype(jnp.bfloat16) * jnp.bfloat16(s)
            xi = jnp.clip(jnp.round(yf * 8.0), -127, 127).astype(jnp.int8)
        return jnp.sum(xi.astype(jnp.float32))

    def chain_wonly(seed):
        x = jax.random.normal(jax.random.PRNGKey(seed), (N, L, C),
                              jnp.bfloat16)
        for w, s in zip(w_i8, scales):
            wd = (w.astype(jnp.bfloat16)
                  * jnp.bfloat16(s))
            x = conv(x, wd)
        return jnp.sum(x.astype(jnp.float32))

    flops = 2 * N * L * C * C * K * DEPTH
    import os
    only = os.environ.get("INT8_ONLY", "")
    cases = [("bf16", chain_bf16), ("int8", chain_int8),
             ("w-only int8", chain_wonly)]
    if only:
        cases = [c for c in cases if c[0] in only.split(",")]
    for name, f in cases:
        dt = timeit(jax.jit(f))
        print(f"{name:12s} {dt * 1e3:8.1f} ms/exec  "
              f"{flops / dt / 1e12:6.1f} TFLOP-equiv/s", flush=True)


if __name__ == "__main__":
    main()
