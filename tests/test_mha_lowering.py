"""The hand-lowered _MHA is exactly flax's MultiHeadDotProductAttention.

Round-5 perf: _MHA keeps flax's param tree and math but picks the
lowering per sequence length (einsum for long axes, VPU mul+reduce
scores for the tiny frame axis) — chip-measured 1.30x/1.65x at the
axial config's shapes (experiments/axial_attn_probe.py). These tests
pin that the swap is invisible: identical param trees, identical eval
outputs (bitwise for the einsum branch; reduce-order tolerance for the
VPU branch), mask semantics preserved.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from jaeger_tpu.models.layers import _MHA

C, H = 64, 4


def _flax_mha(dtype):
    return nn.MultiHeadDotProductAttention(
        num_heads=H, qkv_features=C, out_features=C, dropout_rate=0.0,
        deterministic=True, dtype=dtype, param_dtype=jnp.float32)


@pytest.mark.parametrize("s,dtype,exact", [
    (165, jnp.float32, True),    # einsum branch: identical contraction
    (165, jnp.bfloat16, True),
    (6, jnp.float32, False),     # VPU branch: different reduce order
    (6, jnp.bfloat16, False),
])
def test_matches_flax(s, dtype, exact):
    x = jax.random.normal(jax.random.PRNGKey(0), (32, s, C), dtype)
    ours = _MHA(C, H, 0.1, dtype=dtype)
    ref = _flax_mha(dtype)
    params = ref.init(jax.random.PRNGKey(1), x, x)
    # the param trees must be interchangeable — checkpoints and the
    # Keras weight converter must see no difference
    ours_params = ours.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(ours_params)
            == jax.tree_util.tree_structure(params))
    assert (jax.tree.map(lambda a: a.shape, ours_params)
            == jax.tree.map(lambda a: a.shape, params))

    y_ref = np.asarray(ref.apply(params, x, x), np.float32)
    y_ours = np.asarray(ours.apply(params, x, train=False), np.float32)
    if exact:
        np.testing.assert_array_equal(y_ours, y_ref)
    else:
        # f32-accumulated VPU scores mirror the MXU dot; only the
        # f32 accumulation ORDER differs from the einsum branch
        np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("s", [6, 165])
def test_mask_semantics_match_flax(s):
    x = jax.random.normal(jax.random.PRNGKey(2), (8, s, C), jnp.float32)
    mask = jax.random.bernoulli(
        jax.random.PRNGKey(3), 0.7, (8, 1, 1, s))
    mask = mask.at[:, :, :, 0].set(True)  # keep a valid key per row
    ours = _MHA(C, H, 0.0, dtype=jnp.float32)
    ref = _flax_mha(jnp.float32)
    params = ref.init(jax.random.PRNGKey(4), x, x)
    y_ref = np.asarray(ref.apply(params, x, x, mask=mask), np.float32)
    y_ours = np.asarray(
        ours.apply(params, x, attn_mask=mask, train=False), np.float32)
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-5, atol=1e-6)


def test_dropout_active_in_train_mode():
    """Train-mode dropout on the attention weights still perturbs the
    output (the RNG stream differs from flax's — only determinism in
    eval mode is contractual)."""
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 165, C), jnp.float32)
    m = _MHA(C, H, 0.5, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(6), x)
    y_eval = m.apply(params, x, train=False)
    y_train = m.apply(params, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))
