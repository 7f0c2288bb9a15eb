"""Chip A/B: chunked-scan banded-Toeplitz vs FFT causal conv at long L.

Round-5 verdict item 2: the Hyena MXU path capped at L=4096; real
full-contig windows are 10-30k codons. `_causal_chunked_scan_convolve`
(lax.scan over block-delta, one (D, C, C) operator block live at a
time) extends the MXU path; this measures it against the TPU FFT
lowering at full-contig lengths on hyena_fullcontig-like shapes
(D=32, 6-frame single-window batch). bench.py discipline: in-program
varied RNG inputs, several execs per scalar fetch, best of 3.

Usage: python experiments/hyena_longctx_bench.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

B = 6          # one full-contig window = 6 frame streams
D = 32
LENGTHS = (8192, 32768)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.layers import _causal_chunked_scan_convolve

    def fft_form(u32, h32):
        L = u32.shape[-1]
        n = 2 * L - 1
        H = jnp.fft.rfft(h32, n=n, axis=-1)
        U = jnp.fft.rfft(u32, n=n, axis=-1)
        return jnp.fft.irfft(U * H[None], n=n, axis=-1)[..., :L]

    results = {}
    for L in LENGTHS:
        for name, fn in (("scan", lambda u, h: _causal_chunked_scan_convolve(
                              u, h, chunk=512)),
                         ("fft", fft_form)):
            @jax.jit
            def one(seed, _fn=fn, _L=L):
                k1, k2 = jax.random.split(seed)
                u = jax.random.normal(k1, (B, D, _L), jnp.float32)
                h = jax.random.normal(k2, (D, _L), jnp.float32) \
                    * jnp.exp(-jnp.arange(_L) / (_L / 8.0))
                return jnp.sum(_fn(u, h))

            @jax.jit
            def combine(accs):
                return jnp.sum(jnp.stack(accs))

            n_execs = 4
            _ = float(combine([one(jax.random.PRNGKey(0))] * n_execs))
            best = float("inf")
            for it in range(3):
                t0 = time.perf_counter()
                accs = [one(jax.random.PRNGKey(it * n_execs + j + 1))
                        for j in range(n_execs)]
                _ = float(combine(accs))
                best = min(best, (time.perf_counter() - t0) / n_execs)
            results[(L, name)] = best * 1000
            print(f"L={L:6d} {name:4s} {best*1e3:9.2f} ms/exec", flush=True)
        r = results[(L, 'fft')] / results[(L, 'scan')]
        print(f"L={L:6d} scan speedup over fft: {r:.2f}x", flush=True)
    print({f"L{k[0]}_{k[1]}": round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
