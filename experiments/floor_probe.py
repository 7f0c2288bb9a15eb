"""Attainable-floor probe: the flagship's math in bare jnp, no masks.

Rebuilds the flagship forward (encode -> one-hot embed matmul -> k7 conv
-> 3x[2x residual(2x d3 conv + DYT) ] -> tanh-GELU -> global max pool ->
heads) as raw jnp in (N, L, C) layout with NO mask propagation, NO
(B,F,L,C) reshapes, NO NMD. If this floor is well below the built
model's ~142 ms/2048 (tanh-GELU full model), the gap is mask/layout overhead worth removing;
if it matches, the model is at its ceiling.

Also: the same floor WITH the 4-D layout round-trips, to isolate layout
cost from mask cost.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 2048
F = 6
L = 500          # codon frames at crop 1505nt (1505//3 - 1)
C_EMB = 196
C = 128
DEPTH = 12       # d3 k5 convs in residual pairs


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

    from jaeger_tpu.ops.encode import encode_frames

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
            rhs_dilation=(dil,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def dyt(x):
        return jnp.tanh(0.5 * x)

    act = partial(jax.nn.gelu, approximate=True)

    def tower(x):  # x: (N, L, C_emb)
        x = conv(x, w7)          # valid k7 -> L-6
        x = act(dyt(x))
        for i in range(0, DEPTH, 2):
            h = act(dyt(conv(x, ws[i], 3)))
            h = dyt(conv(h, ws[i + 1], 3))
            x = act(h + x)
        return x

    def heads(x, n):  # x: (N', Lc, C) -> (B, 6)
        x = x.reshape(n, F, x.shape[1], C)
        pooled = jnp.max(x, axis=(1, 2))
        return pooled.astype(jnp.float32) @ wout.astype(jnp.float32)

    def floor3d(seed):
        bases = jax.random.randint(
            jax.random.PRNGKey(seed), (B, 1505), 0, 4, dtype=jnp.int32
        ).astype(jnp.uint8)
        toks = encode_frames(bases, jnp.full((B,), 1505, jnp.int32), 1505)
        oh = jax.nn.one_hot(toks, 65, dtype=jnp.bfloat16)
        x = oh @ emb                       # (B, F, L, C_emb)
        x = x.reshape(B * F, L, C_EMB)
        x = tower(x)
        return jnp.sum(heads(x, B))

    def floor4d(seed):
        """Same math but reshaping (B,F,L,C) <-> (B*F,L,C) around EVERY
        conv, as the built MaskedConv1D does."""
        bases = jax.random.randint(
            jax.random.PRNGKey(seed), (B, 1505), 0, 4, dtype=jnp.int32
        ).astype(jnp.uint8)
        toks = encode_frames(bases, jnp.full((B,), 1505, jnp.int32), 1505)
        oh = jax.nn.one_hot(toks, 65, dtype=jnp.bfloat16)
        x = oh @ emb

        def c4(x, w, dil=1):
            b, f, ln, c = x.shape
            y = conv(x.reshape(b * f, ln, c), w, dil)
            return y.reshape(b, f, y.shape[1], w.shape[-1])

        x = c4(x, w7)
        x = act(dyt(x))
        for i in range(0, DEPTH, 2):
            h = act(dyt(c4(x, ws[i], 3)))
            h = dyt(c4(h, ws[i + 1], 3))
            x = act(h + x)
        pooled = jnp.max(x, axis=(1, 2))
        return jnp.sum(pooled.astype(jnp.float32) @ wout.astype(jnp.float32))

    for name, f in (("floor 3d (no masks)", floor3d),
                    ("floor 4d reshapes", floor4d)):
        dt = timeit(jax.jit(f))
        print(f"{name:22s} {dt * 1e3:8.1f} ms/exec  {B / dt:8.0f} windows/s",
              flush=True)


if __name__ == "__main__":
    main()
