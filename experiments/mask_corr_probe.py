"""Probe: analytic mask-correction vs per-conv pre-zero select.

mask_fusion_probe.py showed every activation-size mask op costs ~0.65
ms/site (HBM mask broadcast riding the epilogue fusions) and fuses as
well as it ever will. The round-5 plan removes the activation-size op
entirely: under deferral the value at mask-invalid positions is a
per-channel CONSTANT g (garbage flows, never re-zeroed), so

  conv(x * m) = conv(x) - sum_j shift_j(inv) (x) (K_j^T g)

where inv = (1 - m) zero-padded at the boundary (in-bounds-invalid
indicator, (B, L)) and shift_j are the conv's tap offsets. The
correction touches k copies of the TINY mask plane instead of the
(B, L, C) activation — if XLA fuses the stencil into the conv output
epilogue it should cost ~nothing.

Variants (4-conv chain, flagship shapes, k5 d3 SAME):
  floor    no mask anywhere
  sel_in   pre-zero select before each conv (current masked program)
  corr     garbage flows; per-conv analytic correction, exactness checked
           against sel_in inside the program (max abs diff printed)

Runs on the chip; bench.py discipline.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N = 12288
L = 500
C = 128
K = 5
D = 3
NCONV = 4


def main() -> None:
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, NCONV)
    params = {
        "kernels": [
            (jax.random.normal(k, (K, C, C), jnp.float32) * 0.05
             ).astype(jnp.bfloat16) for k in ks],
        "biases": [
            (jax.random.normal(k, (C,), jnp.float32) * 0.1
             ).astype(jnp.bfloat16) for k in ks],
    }

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", rhs_dilation=(D,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    def dyt_gelu(x):
        y = jnp.tanh(0.5 * x) * 1.1 + 0.05
        return jax.nn.gelu(y, approximate=True)

    def make_inputs(seed):
        k1, k2 = jax.random.split(seed)
        x = jax.random.normal(k1, (N, L, C), jnp.bfloat16)
        start = jax.random.randint(k2, (N, 1), 0, L - 32, jnp.int32)
        pos = jnp.arange(L)[None, :]
        mask = ~((pos >= start) & (pos < start + 16))
        return x, mask

    pad_l = (D * (K - 1)) // 2
    pad_r = D * (K - 1) - pad_l

    def chain_sel(params, x, mask):
        for w, b in zip(params["kernels"], params["biases"]):
            x = jnp.where(mask[..., None], x, jnp.zeros((), x.dtype))
            x = dyt_gelu(conv(x, w) + b)
        return x

    def chain_corr(params, x, mask):
        # g = per-channel garbage constant at invalid positions, traced
        # through the same dtype/ops the data path runs
        g = jnp.zeros((C,), jnp.bfloat16)  # entry input is pre-zeroed once
        x = jnp.where(mask[..., None], x, jnp.zeros((), x.dtype))
        inv = jnp.pad((~mask).astype(jnp.bfloat16),
                      ((0, 0), (pad_l, pad_r)))
        for w, b in zip(params["kernels"], params["biases"]):
            y = conv(x, w)
            # correction at EVERY conv (the first is a g=0 no-op multiply):
            # sum_j shift_j(inv) (x) (K_j^T g)
            wg = jnp.einsum("kcf,c->kf", w.astype(jnp.float32),
                            g.astype(jnp.float32)).astype(jnp.bfloat16)
            corr = sum(
                jax.lax.slice_in_dim(inv, j * D, j * D + L, axis=1)
                [..., None] * wg[j]
                for j in range(K))
            y = y - corr
            y = y + b
            # next layer's garbage: trace the constant through the chain
            g = dyt_gelu(jnp.zeros((C,), jnp.bfloat16) + b)
            x = dyt_gelu(y)
        return x

    def chain_floor(params, x):
        for w, b in zip(params["kernels"], params["biases"]):
            x = dyt_gelu(conv(x, w) + b)
        return x

    # exactness check (CPU-sized shapes would be better but chip is fine)
    @jax.jit
    def check(params, seed):
        x, mask = make_inputs(seed)
        a = chain_sel(params, x, mask)
        bvals = chain_corr(params, x, mask)
        # compare on VALID positions only (invalid carry garbage in corr)
        diff = jnp.abs(a.astype(jnp.float32) - bvals.astype(jnp.float32))
        diff = jnp.where(mask[..., None], diff, 0.0)
        return jnp.max(diff), jnp.max(jnp.abs(
            jnp.where(mask[..., None], a, 0.0).astype(jnp.float32)))

    d, scale = check(params, jax.random.PRNGKey(99))
    print(f"valid-position max|sel - corr| = {float(d):.3e} "
          f"(value scale {float(scale):.3f})", flush=True)

    variants = {
        "floor": lambda p, s: chain_floor(p, make_inputs(s)[0]),
        "sel_in": lambda p, s: chain_sel(p, *make_inputs(s)),
        "corr": lambda p, s: chain_corr(p, *make_inputs(s)),
    }
    results = {}
    for name, fn in variants.items():
        @jax.jit
        def one(params, seed, _fn=fn):
            return jnp.sum(_fn(params, seed).astype(jnp.float32))

        @jax.jit
        def combine(accs):
            return jnp.sum(jnp.stack(accs))

        _ = float(combine([one(params, jax.random.PRNGKey(1))]))
        best = float("inf")
        for it in range(3):
            t0 = time.perf_counter()
            accs = [one(params, jax.random.PRNGKey(it * 8 + j + 2))
                    for j in range(8)]
            _ = float(combine(accs))
            best = min(best, (time.perf_counter() - t0) / 8)
        results[name] = best * 1000
        base = results.get("floor")
        delta = (f"  (+{results[name] - base:.2f} vs floor, "
                 f"{(results[name] - base) / NCONV:+.2f}/site)"
                 if name != "floor" else "")
        print(f"{name:7s} {results[name]:7.2f} ms{delta}", flush=True)
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
