"""Pallas prototype: int8 dilated conv with FUSED requantization.

XLA's int8 conv chain (int8_conv_bench.py) reaches only 1.18x over bf16
because the inter-layer requantization (int32 -> scale -> round/clip ->
int8) runs as separate elementwise passes over 750 MB activations. This
kernel keeps a row-block of the activation in VMEM, runs the K=5 dilated
taps as int8 MXU matmuls with int32 accumulation, and requantizes in
the epilogue before the int8 result ever leaves VMEM — per-layer HBM
traffic drops to int8-in + int8-out.

Layout: (N, L, C) with the whole L in VMEM per block (L=500, C=128:
a 16-row block is 1 MB int8 + 4 MB f32 accum — fits).

Usage: parity check (interpret) then chip timing of a 12-layer chain.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 2048 * 6
L = 500
C = 128
K = 5
DIL = 3
DEPTH = 12
ROWS = 8           # rows per grid step (VMEM: ~11 MB incl. int32 accum)


def _kernel(x_ref, w_ref, scale_ref, out_ref):
    """One int8 dilated conv layer + fused requant for a row block.

    x_ref:   (ROWS, L, C) int8
    w_ref:   (K, C, C) int8
    scale_ref: (1, 1) f32 in SMEM — combined (in_scale*w_scale/out_scale)
    out_ref: (ROWS, L, C) int8
    """
    x = x_ref[:]                          # (ROWS, L, C) int8
    scale = scale_ref[0, 0]
    acc = jnp.zeros((ROWS, L, C), jnp.int32)
    half = (K - 1) * DIL // 2
    # pad L with zeros for 'same' semantics, then 5 shifted matmuls
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
    for t in range(K):
        xt = jax.lax.slice_in_dim(xp, t * DIL, t * DIL + L, axis=1)
        acc = acc + jax.lax.dot_general(
            xt, w_ref[t],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    yf = acc.astype(jnp.float32) * scale
    out_ref[:] = jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_conv_layer(x, w, scale, interpret=False):
    n = x.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(n // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, L, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
        interpret=interpret,
    )(x, w, scale)


def xla_reference(x, w, scale):
    y = jax.lax.conv_general_dilated(
        x, jnp.swapaxes(w, 0, 0).transpose(0, 1, 2),
        (1,), "SAME", rhs_dilation=(DIL,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * scale[0, 0]
    return jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)


def timeit(fn, n_iters=2, n_execs=8):
    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    _ = float(combine([fn(0)]))
    t0 = time.perf_counter()
    for i in range(n_iters):
        _ = float(combine([fn(i * n_execs + j + 1) for j in range(n_execs)]))
    return (time.perf_counter() - t0) / n_iters / n_execs


def main() -> None:
    import os

    rng = np.random.default_rng(0)
    scale = jnp.full((1, 1), 1.0 / 64.0, jnp.float32)

    if os.environ.get("PALLAS_PARITY", "0") == "1":
        # interpret-mode parity — run on CPU (JAX_PLATFORMS=cpu); the
        # interpreter over the remote chip link is pathologically slow
        xs = jnp.asarray(rng.integers(-40, 40, (ROWS, L, C)), jnp.int8)
        ws = jnp.asarray(rng.integers(-8, 8, (K, C, C)), jnp.int8)
        got = int8_conv_layer(xs, ws, scale, interpret=True)
        want = xla_reference(xs, ws, scale)
        print("parity max |diff|:",
              int(jnp.max(jnp.abs(got.astype(jnp.int32)
                                  - want.astype(jnp.int32)))), flush=True)
        return

    # --- chip timing: 12-layer chain ---
    w_all = [jnp.asarray(rng.integers(-8, 8, (K, C, C)), jnp.int8)
             for _ in range(DEPTH)]

    def chain(seed):
        x = jax.random.randint(jax.random.PRNGKey(seed), (N, L, C),
                               -64, 64, jnp.int32).astype(jnp.int8)
        for w in w_all:
            x = int8_conv_layer(x, w, scale)
        return jnp.sum(x.astype(jnp.float32))

    flops = 2 * N * L * C * C * K * DEPTH
    dt = timeit(jax.jit(chain))
    print(f"pallas int8 chain  {dt * 1e3:8.1f} ms/exec  "
          f"{flops / dt / 1e12:6.1f} TFLOP-equiv/s "
          f"(XLA int8: 79.1 ms / bf16: 93.3 ms)", flush=True)


if __name__ == "__main__":
    main()
