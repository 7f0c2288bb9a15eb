"""Deferred DYT re-mask: exactness + static-analysis pins.

The builder skips a DYT norm's trailing re-zero of masked positions when
every consumer up to the next self-masking barrier handles masked
positions itself (``builder._defer_scan``) — the re-zero was the entire
masked-vs-dense flagship gap (24.8 ms/2048, each re-mask one extra HBM
round-trip of the (B,F,L,128) activation; experiments/masked_breakdown.py).
These tests pin that the optimization is *exact*: outputs and gradients of
the deferred program are bit-identical to the always-re-mask program, and
that the analysis refuses configs whose consumers need the zeros
(reference semantics: Keras DYT re-zeroes unconditionally,
nnlib/v2/layers.py:385-455).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaeger_tpu.models import builder as builder_mod
from jaeger_tpu.models.builder import (ModelBuilder, _defer_scan,
                                       _freeze_layers)
from jaeger_tpu.models.flagship import _inline_flagship


def _masked_batch(crop_nt, batch=4, seed=0):
    bases = jax.random.randint(
        jax.random.PRNGKey(seed), (batch, crop_nt), 0, 4, jnp.int32
    ).astype(jnp.uint8)
    # an interior N run (token 0 -> masked) plus a short final row so the
    # length tail path is exercised too
    bases = bases.at[:, 100:160].set(4)
    lengths = jnp.full((batch,), crop_nt, jnp.int32)
    lengths = lengths.at[-1].set(crop_nt // 2)
    return {"bases": bases, "lengths": lengths}


def _randomized(variables, seed=7):
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    out = [
        jax.random.normal(k, l.shape, l.dtype) * 0.3
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def _build_pair(dtype):
    cfg_on = _inline_flagship()
    b_on = ModelBuilder(cfg_on, dtype=dtype)
    model_on, variables = b_on.init(batch=1)

    cfg_off = _inline_flagship()
    cfg_off["model"]["defer_remask"] = False
    b_off = ModelBuilder(cfg_off, dtype=dtype)
    model_off, _ = b_off.init(batch=1)

    _, crop_nt = b_on.crop
    return model_on, model_off, _randomized(variables), crop_nt


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flagship_outputs_bit_identical(dtype):
    model_on, model_off, variables, crop_nt = _build_pair(dtype)
    batch = _masked_batch(crop_nt)
    out_on = model_on.apply(variables, batch, train=False)
    out_off = model_off.apply(variables, batch, train=False)
    assert set(out_on) == set(out_off)
    for k in out_on:
        np.testing.assert_array_equal(
            np.asarray(out_on[k]), np.asarray(out_off[k]), err_msg=k
        )


def test_flagship_gradients_bit_identical():
    model_on, model_off, variables, crop_nt = _build_pair(jnp.float32)
    batch = _masked_batch(crop_nt)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(model):
        def f(p):
            out, _ = model.apply(
                {"params": p, **rest}, batch, train=True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(3)},
            )
            return (jnp.sum(out["prediction"].astype(jnp.float32))
                    + jnp.sum(out["reliability"].astype(jnp.float32)))
        return f

    g_on = jax.grad(loss(model_on))(params)
    g_off = jax.grad(loss(model_off))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g_on, g_off,
    )


def test_deferred_program_is_actually_different():
    """Guard against the A/B comparison becoming vacuous: the deferred
    build must carry garbage at masked positions somewhere internally.
    Probe MaskedDYT directly with defer on/off."""
    from jaeger_tpu.models import layers as L

    x = jnp.full((1, 1, 8, 4), 2.0, jnp.float32)
    mask = jnp.array([[[True] * 4 + [False] * 4]])
    v = L.MaskedDYT().init(jax.random.PRNGKey(0), x, mask)
    v = jax.tree_util.tree_map(lambda l: l + 0.5, v)  # nonzero beta
    y_keep, _ = L.MaskedDYT(defer_mask=False).apply(v, x, mask)
    y_defer, _ = L.MaskedDYT(defer_mask=True).apply(v, x, mask)
    assert np.all(np.asarray(y_keep)[0, 0, 4:] == 0.0)
    assert np.all(np.asarray(y_defer)[0, 0, 4:] != 0.0)
    np.testing.assert_array_equal(
        np.asarray(y_keep)[0, 0, :4], np.asarray(y_defer)[0, 0, :4]
    )


def test_flagship_analysis_defers_everything():
    cfg = _inline_flagship()["model"]["representation_learner"]
    frozen = _freeze_layers(cfg["hidden_layers"])
    pooling = cfg["pooling"]
    for i, (name, _) in enumerate(frozen):
        if name in ("masked_dyt", "residual_block"):
            assert _defer_scan(frozen, i + 1, pooling), (i, name)


@pytest.mark.parametrize(
    "tail,pooling,expect",
    [
        # safe: next layer is a masked conv (pre-zeroes its input)
        ([{"name": "masked_conv1d", "config": {"filters": 4, "kernel_size": 3}}],
         None, True),
        # safe: elementwise chain then masked pooling
        ([{"name": "activation", "config": {"activation": "gelu"}}], "max", True),
        ([{"name": "nmd", "config": {}}], "average", True),
        # unsafe: plain conv consumes masked values into valid outputs
        ([{"name": "conv1d", "config": {"filters": 4, "kernel_size": 3}}],
         "max", False),
        # unsafe: masked conv explicitly opted out of masking
        ([{"name": "masked_conv1d",
           "config": {"filters": 4, "kernel_size": 3, "use_masking": False}}],
         "max", False),
        # unsafe: plain batchnorm's statistics rely on masked zeros
        ([{"name": "batchnorm", "config": {}}], "max", False),
        # unsafe: FFT/global mixing layers
        ([{"name": "hyena_block", "config": {"dim": 8}}], "max", False),
        ([{"name": "masked_bilstm", "config": {"units": 8}}], "max", False),
        # unsafe: gated pooling takes an unmasked length max
        ([], "gatedframe", False),
        # unsafe: stack ends with no pooler (per-position output escapes)
        ([], None, False),
        # safe: masked layernorm pre-masks (barrier), even with an unsafe
        # pooler after it
        ([{"name": "masked_layernorm", "config": {}}], "gatedframe", True),
    ],
)
def test_defer_scan_cases(tail, pooling, expect):
    frozen = _freeze_layers(tail)
    assert _defer_scan(frozen, 0, pooling) is expect


def test_defer_scan_residual_block_erases():
    # residual_block pre-zeroes both its conv path and (under deferral) its
    # identity shortcut, so upstream deferred garbage dies at the block —
    # even when what follows is unsafe
    frozen = _freeze_layers([
        {"name": "residual_block", "config": {"filters": 4, "kernel_size": 3}},
    ])
    assert _defer_scan(frozen, 0, "gatedframe") is True
    # ... unless the block itself opted out of masking
    frozen_unmasked = _freeze_layers([
        {"name": "residual_block",
         "config": {"filters": 4, "kernel_size": 3, "use_masking": False}},
    ])
    assert _defer_scan(frozen_unmasked, 0, "gatedframe") is False


def test_dense_batch_unaffected():
    """assume_dense and deferred-masked agree on an all-dense batch (the
    split-mixed engine contract relies on this)."""
    model_on, _, variables, crop_nt = _build_pair(jnp.bfloat16)
    bases = jax.random.randint(
        jax.random.PRNGKey(1), (4, crop_nt), 0, 4, jnp.int32
    ).astype(jnp.uint8)
    lengths = jnp.full((4,), crop_nt, jnp.int32)
    batch = {"bases": bases, "lengths": lengths}
    out_m = model_on.apply(variables, batch, train=False)
    out_d = model_on.apply(variables, batch, train=False, assume_dense=True)
    for k in out_m:
        np.testing.assert_array_equal(
            np.asarray(out_m[k]), np.asarray(out_d[k]), err_msg=k
        )
