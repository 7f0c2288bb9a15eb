"""Mechanism probe: WHY does a per-layer mask select cost ~1.3 ms/site?

Round-4 attribution (experiments/masked_breakdown.py) pinned the masked
program's remaining 15.3 ms/2048 on the 12 conv pre-zero multiplies. An
elementwise select SHOULD fuse into the conv-input producer chain (DYT →
gelu → select is one elementwise fusion) and cost ~nothing, yet it
measures a full HBM round-trip per site. Before designing the fix
(round-5 verdict item 1) this probe isolates the mechanism on a bare
4-conv chain at flagship shapes:

  floor     conv(+bias) -> DYT -> gelu, x4, no mask anywhere
  sel_in    + jnp.where(mask[...,None], x, 0) before each conv
            (the current MaskedConv1D pre-zero form)
  mul_in    + x * maskf where maskf is (N,L,1) bf16 (multiply form)
  sel_out   the select rides after gelu (output side) instead
  bigmask   mask pre-broadcast to (N,L,C) bf16 ONCE; per-site multiply
            reads the full-size mask (tests whether the per-site cost is
            the (N,L)->(N,L,C) lane-broadcast relayout, not the multiply)
  selpad    mask kept as (N,L,8) bf16 (8-lane padded), per-site multiply
            via m[:, :, :1] slice-broadcast

Also dumps compiled-HLO fusion summaries for floor/sel_in so the fusion
boundaries are visible, not guessed.

Discipline = bench.py: in-program varied RNG, 8 execs per scalar fetch,
best of 3. Runs on the chip.
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N = 12288   # B*F at batch 2048
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
    kernels = [jax.random.normal(k, (K, C, C), jnp.float32) * 0.05
               for k in ks]
    biases = [jax.random.normal(k, (C,), jnp.float32) * 0.1 for k in ks]
    params = {
        "kernels": [k.astype(jnp.bfloat16) for k in kernels],
        "biases": [b.astype(jnp.bfloat16) for b in biases],
    }

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", rhs_dilation=(D,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    def dyt_gelu(x):
        y = jnp.tanh(0.5 * x) * 1.1 + 0.05
        return jax.nn.gelu(y, approximate=True)

    def make_inputs(seed, with_mask):
        k1, k2 = jax.random.split(seed)
        x = jax.random.normal(k1, (N, L, C), jnp.bfloat16)
        if not with_mask:
            return x, None
        start = jax.random.randint(k2, (N, 1), 0, L - 32, jnp.int32)
        pos = jnp.arange(L)[None, :]
        mask = ~((pos >= start) & (pos < start + 16))
        return x, mask

    def chain(params, x, mask, mode):
        maskf = None
        bigm = None
        if mask is not None:
            if mode == "mul_in":
                maskf = mask[..., None].astype(jnp.bfloat16)
            elif mode == "bigmask":
                bigm = jnp.broadcast_to(
                    mask[..., None], (N, L, C)).astype(jnp.bfloat16)
            elif mode == "selpad":
                maskf = jnp.broadcast_to(
                    mask[..., None], (N, L, 8)).astype(jnp.bfloat16)
        for w, b in zip(params["kernels"], params["biases"]):
            if mask is not None:
                if mode == "sel_in":
                    x = jnp.where(mask[..., None], x, jnp.zeros((), x.dtype))
                elif mode == "mul_in":
                    x = x * maskf
                elif mode == "bigmask":
                    x = x * bigm
                elif mode == "selpad":
                    x = x * maskf[:, :, :1]
            y = conv(x, w) + b
            y = dyt_gelu(y)
            if mask is not None and mode == "sel_out":
                y = jnp.where(mask[..., None], y, jnp.zeros((), y.dtype))
            x = y
        return jnp.sum(x.astype(jnp.float32))

    modes = ["floor", "sel_in", "mul_in", "sel_out", "bigmask", "selpad"]
    results = {}
    for mode in modes:
        with_mask = mode != "floor"

        @jax.jit
        def one(params, seed, _mode=mode, _wm=with_mask):
            x, mask = make_inputs(seed, _wm)
            return chain(params, x, mask, _mode)

        @jax.jit
        def combine(accs):
            return jnp.sum(jnp.stack(accs))

        # HLO fusion summary for the two key variants
        if mode in ("floor", "sel_in"):
            txt = one.lower(params, key).compile().as_text()
            fusions = re.findall(r"^\s*(?:ROOT\s+)?%?[\w.-]+ = \S+ fusion\(.*",
                                 txt, re.M)
            convs = [ln for ln in txt.splitlines() if "convolution" in ln]
            print(f"--- {mode}: {len(fusions)} fusions, "
                  f"{len(convs)} convolution ops")
            for ln in fusions[:24]:
                shape = ln.strip().split(" = ")[1].split(" fusion")[0]
                kind = re.search(r"kind=(\w+)", ln)
                print(f"    fusion {shape} {kind.group(1) if kind else ''}")

        _ = float(combine([one(params, jax.random.PRNGKey(1))]))
        best = float("inf")
        for it in range(3):
            t0 = time.perf_counter()
            accs = [one(params, jax.random.PRNGKey(it * 8 + j + 2))
                    for j in range(8)]
            _ = float(combine(accs))
            best = min(best, (time.perf_counter() - t0) / 8)
        results[mode] = best * 1000
        base = results.get("floor")
        delta = (f"  (+{results[mode] - base:.2f} ms vs floor, "
                 f"{(results[mode] - base) / NCONV:+.2f}/site)"
                 if mode != "floor" else "")
        print(f"{mode:9s} {results[mode]:7.2f} ms{delta}", flush=True)
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
