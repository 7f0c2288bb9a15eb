"""Train-backward probe (round-4 verdict item 7): one targeted round on
the transposed-conv MXU-tiling hypothesis, then close with data.

Round-3 attribution: the full step runs at ~79% of FLOP-pro-rata parity
with the 44%-of-peak forward, attributed to the backward's conv
layouts. A conv backward has two pieces:

  dX = conv(dY, flip(W))          — shape-similar to the forward (fine)
  dW = "conv" contracting x with dY over (batch*frames, L) — XLA lowers
       this as a batch-group conv whose output is tiny (k, Cin, Cout)
       and whose contraction rides the conv engine's tiling.

Candidate: express dW as K explicit matmuls —
  dW[k] = X[:, k*dil : k*dil+L_out, :] (reshaped (B*L, Cin))^T @ dY
— a pure large-contraction matmul (B*F*L ~ 6M rows at flagship shapes),
which the MXU tiles natively. This probe measures, per flagship conv
shape (and per dilation of the chain):

  A. jax.grad through lax.conv_general_dilated (XLA's backward)
  B. the manual VJP: dX conv + K-sliced matmul dW
  C. (control) forward conv alone

on the chip with varied inputs, bench.py discipline. If B beats A, the
custom_vjp goes into MaskedConv1D; if not, the question closes with
numbers like the forward's de-dilation dead end.

Usage: python experiments/bwd_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# flagship conv-chain shapes: (B*F, L, C) activations, k=5/7, dil 1/2/4
BF = 6 * 1024          # batch 1024 x 6 frames
L = 494
CIN = COUT = 128
SHAPES = [
    # (kernel, dilation, cin) — entry conv is k7 cin=65 (folded one-hot)
    (7, 1, 65),
    (5, 1, 128),
    (5, 2, 128),
    (5, 4, 128),
]


def timeit(fn, args_fn, n_execs=8, rounds=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    _ = float(combine([fn(*args_fn(0))]))
    best = float("inf")
    for it in range(rounds):
        t0 = time.perf_counter()
        accs = [fn(*args_fn(it * n_execs + j + 1)) for j in range(n_execs)]
        _ = float(combine(accs))
        best = min(best, (time.perf_counter() - t0) / n_execs)
    return best * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16

    for k, dil, cin in SHAPES:
        span = dil * (k - 1) + 1
        l_out = L - span + 1  # VALID, stride 1

        def make_inputs(seed, cin=cin, l_out=l_out):
            kx, kd, kw = jax.random.split(jax.random.PRNGKey(seed), 3)
            x = jax.random.normal(kx, (BF, L, cin), dt)
            dy = jax.random.normal(kd, (BF, l_out, COUT), dt)
            w = jax.random.normal(kw, (k, cin, COUT), dt)
            return x, dy, w

        conv = lambda x, w, dil=dil: jax.lax.conv_general_dilated(
            x, w, (1,), "VALID", rhs_dilation=(dil,),
            dimension_numbers=("NWC", "WIO", "NWC"))

        @jax.jit
        def fwd_only(seed):
            x, dy, w = make_inputs(seed)
            return jnp.sum(conv(x, w).astype(jnp.float32))

        @jax.jit
        def xla_bwd(seed):
            x, dy, w = make_inputs(seed)

            def loss(x, w):
                # multiply in bf16 so the conv cotangent stays bf16 (the
                # real train step's backward precision)
                return jnp.sum((conv(x, w) * dy).astype(jnp.float32))

            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
            return (jnp.sum(gx.astype(jnp.float32))
                    + jnp.sum(gw.astype(jnp.float32)))

        @jax.jit
        def manual_bwd(seed, k=k, dil=dil, l_out=l_out, cin=cin):
            x, dy, w = make_inputs(seed)
            # dX: conv of padded dY with the flipped kernel, same dilation
            pad = dil * (k - 1)
            gx = jax.lax.conv_general_dilated(
                dy, jnp.flip(w, 0).transpose(0, 2, 1), (1,),
                [(pad, pad)], rhs_dilation=(dil,),
                dimension_numbers=("NWC", "WIO", "NWC"))
            # dW: K sliced matmuls, contraction over BF*l_out rows
            dyf = dy.reshape(BF * l_out, COUT)
            gw = jnp.stack([
                jax.lax.dot_general(
                    jax.lax.dynamic_slice_in_dim(x, j * dil, l_out, axis=1)
                       .reshape(BF * l_out, cin),
                    dyf,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for j in range(k)
            ]).astype(dt)
            return (jnp.sum(gx.astype(jnp.float32))
                    + jnp.sum(gw.astype(jnp.float32)))

        f = timeit(fwd_only, lambda s: (s,))
        a = timeit(xla_bwd, lambda s: (s,))
        b = timeit(manual_bwd, lambda s: (s,))
        print(f"k={k} dil={dil} cin={cin:3d}: fwd {f:7.2f} ms | "
              f"fwd+bwd XLA {a:7.2f} ms | fwd+bwd manual {b:7.2f} ms | "
              f"bwd XLA {a - f:6.2f} vs manual {b - f:6.2f} "
              f"({(a - f) / max(b - f, 1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
