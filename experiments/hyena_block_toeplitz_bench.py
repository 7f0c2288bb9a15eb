"""Chip A/B: causal long-conv lowering past the direct-Toeplitz cap.

The bf16 Hyena path runs the depthwise causal convolution as a
triangular-Toeplitz MXU matmul for L <= 1024 (4.9x over the TPU FFT
lowering, docs/optimizations.md). Longer crops (e.g. a 5 kb full-contig
window -> L = 1664 codons) previously fell back to the FFT form; the
blocked banded-Toeplitz form (models/layers.py::
_causal_block_toeplitz_convolve) keeps them on the MXU with operator
memory N*C^2*D instead of L^2*D.

Measures, at (B, D, L) = (256, 32, 1664) — one Hyena projection stream
per exec at the 5 kb crop — with bench.py discipline (in-program varied
RNG so the relay's memoization cannot fake it, several execs per fetch,
best of rounds):

  fft      f32 rFFT convolution (the pre-round-4 L>1024 path)
  blocked  blocked banded-Toeplitz MXU form (f32 accumulation)

Usage: python experiments/hyena_block_toeplitz_bench.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, D, L = 256, 32, 1664
N_EXECS = 4


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models import layers as lyr

    def inputs(seed):
        ku, kh = jax.random.split(jax.random.PRNGKey(seed))
        u = jax.random.normal(ku, (B, D, L), jnp.float32)
        decay = jnp.exp(-jnp.arange(L, dtype=jnp.float32) / 200.0)
        h = jax.random.normal(kh, (D, L), jnp.float32) * decay[None]
        return u, h

    def fft_form(u32, h32):
        n = 2 * L - 1
        H = jnp.fft.rfft(h32, n=n, axis=-1)
        U = jnp.fft.rfft(u32, n=n, axis=-1)
        return jnp.fft.irfft(U * H[None], n=n, axis=-1)[..., :L]

    variants = {
        "fft": fft_form,
        "blocked": lyr._causal_block_toeplitz_convolve,
    }
    results = {}
    for name, fn in variants.items():
        @jax.jit
        def one(seed, fn=fn):
            u, h = inputs(seed)
            return jnp.sum(fn(u, h).astype(jnp.float32))

        @jax.jit
        def combine(accs):
            return jnp.sum(jnp.stack(accs))

        t0 = time.perf_counter()
        _ = float(combine([one(0)]))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for it in range(3):
            t0 = time.perf_counter()
            accs = [one(it * N_EXECS + j + 1) for j in range(N_EXECS)]
            _ = float(combine(accs))
            best = min(best, (time.perf_counter() - t0) / N_EXECS)
        results[name] = best * 1e3
        print(f"{name}: {best * 1e3:.2f} ms/exec", flush=True)

    print(json.dumps({
        "shape": [B, D, L],
        "ms_fft": round(results["fft"], 2),
        "ms_blocked": round(results["blocked"], 2),
        "speedup": round(results["fft"] / results["blocked"], 2),
    }))


if __name__ == "__main__":
    main()
