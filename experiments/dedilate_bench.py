"""Chip microbenchmark: three formulations of the flagship's d=3 k5 conv.

The flagship tower is 12 'same'-padded stride-1 dilation-3 k5 convs at
(B*F=12288, L=159, C=128). Candidates (docs/optimizations.md round-2 list):

  A. dilated   — lax.conv_general_dilated with rhs_dilation=3 (current)
  B. phase     — algebraic de-dilation: pad L to a multiple of 3, reshape
                 (N, L/3, 3, C) -> (N*3, L/3, C), dense k5 'same' conv,
                 inverse reshape (exact identity)
  C. shiftmm   — 5 shifted matmuls: y = sum_t shift(x, (t-2)*3) @ W[t]

Each candidate runs a 12-conv chain in ONE jitted program with varied
inputs (the harness relay memoizes identical executions) and a scalar
fetch as the sync point — same discipline as bench.py.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = 2048 * 6
L = 159
C = 128
K = 5
D = 3
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
    kernels = [
        jax.random.normal(jax.random.fold_in(key, i), (K, C, C),
                          jnp.bfloat16) * 0.05
        for i in range(DEPTH)
    ]

    def conv_dilated(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", rhs_dilation=(D,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def conv_phase(x, w):
        n, length, c = x.shape
        lp = -(-length // D) * D
        xp = jnp.pad(x, ((0, 0), (0, lp - length), (0, 0)))
        xp = xp.reshape(n, lp // D, D, c).transpose(0, 2, 1, 3)
        xp = xp.reshape(n * D, lp // D, c)
        y = jax.lax.conv_general_dilated(
            xp, w, (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = y.reshape(n, D, lp // D, c).transpose(0, 2, 1, 3)
        return y.reshape(n, lp, c)[:, :length]

    def conv_shiftmm(x, w):
        n, length, c = x.shape
        half = (K - 1) * D // 2
        xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
        y = None
        for t in range(K):
            term = jnp.einsum(
                "nlc,cf->nlf", xp[:, t * D : t * D + length, :], w[t]
            )
            y = term if y is None else y + term
        return y

    def chain(conv, seed):
        x = jax.random.normal(jax.random.PRNGKey(seed), (N, L, C),
                              jnp.bfloat16)
        for w in kernels:
            x = conv(x, w)
        return jnp.sum(x.astype(jnp.float32))

    flops = 2 * N * L * C * C * K * DEPTH

    # numeric identity check (small, on-chip)
    xs = jax.random.normal(jax.random.PRNGKey(9), (4, L, C), jnp.bfloat16)
    ya = conv_dilated(xs, kernels[0])
    for name, f in (("phase", conv_phase), ("shiftmm", conv_shiftmm)):
        yb = f(xs, kernels[0])
        err = float(jnp.max(jnp.abs((ya - yb).astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
        print(f"identity {name}: max abs err {err:.4g} (scale {scale:.3g})")

    for name, f in (("A dilated", conv_dilated), ("B phase", conv_phase),
                    ("C shiftmm", conv_shiftmm)):
        fn = jax.jit(partial(chain, f))
        dt = timeit(fn)
        print(f"{name:10s} {dt * 1e3:8.1f} ms/exec  "
              f"{flops / dt / 1e12:6.1f} TFLOPs")


if __name__ == "__main__":
    main()
