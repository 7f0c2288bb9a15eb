"""Per-sublayer attribution + candidate lowerings for axial attention.

experiments/axial_breakdown.py pinned the axial ladder row's 142 ms/1024
on the attention blocks (conv tower alone: 6 ms). This probe times each
sublayer at the exact axial shapes (B=1024, F=6, L=165, C=64, H=4,
dh=16) and races the flax MHA core against hand-rolled exact
formulations, chip discipline (varied in-program RNG, 8 execs/fetch,
best of 3):

  len_attn     TransformerEncoder (length-axis MHA + FFN) x1
  frame_attn   CrossFrameAttention (frame-axis MHA + FFN) x1
  len_mha      length-axis flax MHA only (no FFN, no norms)
  frame_mha    frame-axis flax MHA only
  len_hand     hand einsum attention, fused QKV, length axis
  frame_hand   hand einsum attention, fused QKV, frame axis
  frame_vpu    frame scores as mul+reduce (VPU form; F=6 tiny)

Run on the chip: python experiments/axial_attn_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import flax.linen as nn

B, F, L, C, H = 1024, 6, 165, 64, 4
DH = C // H
DT = jnp.bfloat16


class HandAttn(nn.Module):
    """Exact MHA with one fused QKV projection and explicit einsums."""

    axis: str = "length"  # or "frame"
    vpu_scores: bool = False

    @nn.compact
    def __call__(self, x):
        b, f, l, c = x.shape
        if self.axis == "length":
            h = x.reshape(b * f, l, c)
        else:
            h = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * l, f, c)
        n, s, _ = h.shape
        qkv = nn.Dense(3 * C, dtype=DT, param_dtype=jnp.float32,
                       name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, s, H, DH)
        k = k.reshape(n, s, H, DH)
        v = v.reshape(n, s, H, DH)
        scale = jnp.asarray(1.0 / (DH ** 0.5), DT)
        if self.vpu_scores:
            # contraction over dh=16 as fused mul+reduce (VPU) — the
            # batch dim is huge and s tiny, so MXU tiles are mostly pad
            scores = jnp.sum(q[:, :, None] * k[:, None, :], axis=-1)
            scores = jnp.transpose(scores, (0, 3, 1, 2)) * scale
        else:
            scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
        w = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", w, v).reshape(n, s, C)
        o = nn.Dense(C, dtype=DT, param_dtype=jnp.float32, name="out")(o)
        if self.axis == "length":
            return o.reshape(b, f, l, c)
        return jnp.transpose(o.reshape(b, l, f, c), (0, 2, 1, 3))


def _measure(apply_fn, params, seed0: int, n_execs: int = 8,
             iters: int = 3) -> float:
    @jax.jit
    def one(params, seed):
        x = jax.random.normal(seed, (B, F, L, C), DT)
        return jnp.sum(apply_fn(params, x).astype(jnp.float32))

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    a0 = one(params, jax.random.PRNGKey(seed0))
    _ = float(combine([a0] * n_execs))
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        accs = [one(params, jax.random.PRNGKey(seed0 + 1 + i * n_execs + j))
                for j in range(n_execs)]
        _ = float(combine(accs))
        best = min(best, (time.perf_counter() - t0) / n_execs)
    return best * 1e3


def main() -> None:
    from jaeger_tpu.models import layers as Lz

    # init on a tiny batch: params are B-independent and flax init runs
    # the forward EAGERLY (a full-batch VPU-form init materializes the
    # unfused (n,s,s,H,dh) product — 21 GB at the length axis)
    x0 = jnp.zeros((2, F, L, C), DT)
    variants = {}

    te = Lz.TransformerEncoder(C, H, 128, 0.1, dtype=DT)
    variants["len_attn"] = (
        lambda p, x, m=te: m.apply(p, x, None, False)[0],
        te.init(jax.random.PRNGKey(0), x0, None, False))

    cf = Lz.CrossFrameAttention(C, H, 128, 0.1, dtype=DT)
    variants["frame_attn"] = (
        lambda p, x, m=cf: m.apply(p, x, None, False)[0],
        cf.init(jax.random.PRNGKey(1), x0, None, False))

    class MhaOnly(nn.Module):
        axis: str = "length"

        @nn.compact
        def __call__(self, x):
            b, f, l, c = x.shape
            if self.axis == "length":
                h = x.reshape(b * f, l, c)
            else:
                h = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * l, f, c)
            o = Lz._MHA(C, H, 0.0, dtype=DT, name="mha")(h)
            if self.axis == "length":
                return o.reshape(b, f, l, c)
            return jnp.transpose(o.reshape(b, l, f, c), (0, 2, 1, 3))

    for name, mod in (
        ("len_mha", MhaOnly("length")),
        ("frame_mha", MhaOnly("frame")),
        ("len_hand", HandAttn("length")),
        ("frame_hand", HandAttn("frame")),
        ("frame_vpu", HandAttn("frame", vpu_scores=True)),
    ):
        variants[name] = (
            lambda p, x, m=mod: m.apply(p, x),
            mod.init(jax.random.PRNGKey(2), x0))

    out = {}
    for i, (name, (fn, params)) in enumerate(variants.items()):
        ms = _measure(fn, params, seed0=11000 + 131 * i)
        out[name] = round(ms, 2)
        print(f"{name:11s} {ms:8.2f} ms/{B}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
