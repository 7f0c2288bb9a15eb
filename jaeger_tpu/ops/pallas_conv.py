"""Fused Pallas conv block for the masked CNN hot path.

The fragment models' inner loop is `conv1d -> norm/DYT -> activation`
repeated ~10x. XLA runs the conv on the MXU well (~50% peak in isolation)
but each elementwise stage re-reads/re-writes the (B*F, L, C) activation
from HBM. This kernel keeps one (TN, TL, C) tile resident in VMEM and
does, in a single pass:

    y = act( DYT_or_bias( sum_j x[:, j:j+TL, :] @ w[j] ) )

i.e. the k-tap convolution as k shifted (TN*TL, C) x (C, C) MXU matmuls
with f32 accumulation, followed by the fused bias / Dynamic-Tanh affine
and activation, writing bf16 once.

Halo handling: the input is laid out per L-tile with its (k-1) halo
baked in (one extra ~(k-1)/TL fraction of HBM traffic), so every grid
step reads an exactly-aligned block — no overlapping block indexing or
manual DMA needed, and the kernel runs identically under interpret mode.

Scope: stride 1, dilation 1, SAME padding, C_in == C_out (the hot
configuration in every bundled config). Correctness is pinned against
the XLA reference in interpret mode (tests/test_pallas_conv.py); enable
on hardware with ``JAEGER_TPU_PALLAS=1``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pallas_enabled() -> bool:
    return os.environ.get("JAEGER_TPU_PALLAS", "0") == "1"


def _kernel(x_ref, w_ref, bias_ref, dyt_ref, out_ref, *, k: int,
            tile_l: int, act: str, use_dyt: bool):
    tn = out_ref.shape[0]
    c = out_ref.shape[2]
    x = x_ref[:, 0]                        # (TN, TL + k - 1, C)

    acc = jnp.zeros((tn * tile_l, c), jnp.float32)
    for j in range(k):
        xj = x[:, j : j + tile_l, :].reshape(tn * tile_l, c)
        acc = acc + jnp.dot(
            xj, w_ref[j], preferred_element_type=jnp.float32
        )

    if use_dyt:
        y = jnp.tanh(acc * dyt_ref[0]) * dyt_ref[1] + dyt_ref[2]
    else:
        y = acc + bias_ref[...]
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "tanh":
        y = jnp.tanh(y)
    out_ref[...] = y.reshape(tn, tile_l, c).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "use_dyt", "tile_n", "tile_l", "interpret"),
)
def fused_conv_block(
    x: jnp.ndarray,                     # (N, L, C)
    w: jnp.ndarray,                     # (k, C, C)
    bias: jnp.ndarray | None = None,    # (C,)
    dyt: jnp.ndarray | None = None,     # (3, C): alpha row, gamma, beta
    act: str = "none",
    use_dyt: bool = False,
    tile_n: int = 8,
    tile_l: int = 256,
    interpret: bool = False,
):
    """SAME, stride-1, dilation-1 fused conv + (bias|DYT) + activation."""
    n, length, c = x.shape
    k = w.shape[0]
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l

    n_pad = -n % tile_n
    l_pad = -length % tile_l
    xp = jnp.pad(x, ((0, n_pad), (pad_l, pad_r + l_pad), (0, 0)))
    n_t = (n + n_pad) // tile_n
    l_t = (length + l_pad) // tile_l

    # per-tile halo layout: (N, l_t, TL + k - 1, C)
    xh = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(xp, j * tile_l, tile_l + k - 1, 1)
            for j in range(l_t)
        ],
        axis=1,
    )

    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    if dyt is None:
        dyt = jnp.zeros((3, c), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, tile_l=tile_l, act=act,
                          use_dyt=use_dyt),
        grid=(n_t, l_t),
        in_specs=[
            pl.BlockSpec((tile_n, 1, tile_l + k - 1, c),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((k, c, c), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((3, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_l, c),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n + n_pad, length + l_pad, c), x.dtype
        ),
        interpret=interpret,
    )(xh, w.astype(x.dtype), bias.astype(jnp.float32),
      dyt.astype(jnp.float32))
    return out[:n, :length, :]


def reference_conv_block(x, w, bias=None, dyt=None, act="none",
                         use_dyt=False):
    """Plain XLA reference for the fused kernel (tests + fallback)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    if use_dyt:
        y = jnp.tanh(y * dyt[0]) * dyt[1] + dyt[2]
    elif bias is not None:
        y = y + bias
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "tanh":
        y = jnp.tanh(y)
    return y.astype(x.dtype)
