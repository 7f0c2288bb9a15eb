"""Fused Pallas conv block vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jaeger_tpu.ops.pallas_conv import fused_conv_block, reference_conv_block


def _data(rng, n=16, length=500, c=128, k=5):
    x = jnp.asarray(rng.normal(size=(n, length, c)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(k, c, c)).astype(np.float32) * 0.05
    )
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    dyt = jnp.asarray(
        np.stack([
            np.full(c, 0.5, np.float32),
            rng.normal(size=c).astype(np.float32),
            rng.normal(size=c).astype(np.float32),
        ])
    )
    return x, w, bias, dyt


@pytest.mark.parametrize("k", [3, 5, 7])
def test_conv_bias_matches(rng, k):
    x, w, bias, _ = _data(rng, n=8, length=300, c=128, k=k)
    out = fused_conv_block(x, w, bias=bias, interpret=True,
                           tile_n=8, tile_l=128)
    ref = reference_conv_block(x, w, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_conv_dyt_gelu_matches(rng):
    x, w, _, dyt = _data(rng, n=8, length=256, c=128, k=5)
    out = fused_conv_block(x, w, dyt=dyt, use_dyt=True, act="gelu",
                           interpret=True, tile_n=8, tile_l=128)
    ref = reference_conv_block(x, w, dyt=dyt, use_dyt=True, act="gelu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ragged_tile_sizes(rng):
    """N and L not multiples of the tile sizes."""
    x, w, bias, _ = _data(rng, n=10, length=333, c=128, k=5)
    out = fused_conv_block(x, w, bias=bias, act="relu", interpret=True,
                           tile_n=8, tile_l=128)
    ref = reference_conv_block(x, w, bias=bias, act="relu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_bf16(rng):
    x, w, bias, _ = _data(rng, n=8, length=256, c=128, k=5)
    out = fused_conv_block(x.astype(jnp.bfloat16), w, bias=bias,
                           interpret=True, tile_n=8, tile_l=128)
    ref = reference_conv_block(x.astype(jnp.bfloat16), w, bias=bias)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )
