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
    # ... or the un-deferred program would NOT have zeros at the block's
    # input (zeroed=False): its raw-x identity shortcut then consumes
    # masked values that mask growth can validate, so it cannot erase
    assert _defer_scan(frozen, 0, "gatedframe", zeroed=False) is False
    # a zeroed-killing PASSES layer (batchnorm affine) before the block
    # downgrades the state the same way
    frozen_bn = _freeze_layers([
        {"name": "masked_batchnorm", "config": {}},
        {"name": "residual_block", "config": {"filters": 4, "kernel_size": 3}},
    ])
    assert _defer_scan(frozen_bn, 0, "gatedframe", zeroed=True) is False


def _rl_patch(hidden_layers, pooling="max"):
    cfg = _inline_flagship()
    cfg["model"]["representation_learner"] = {
        "hidden_layers": hidden_layers, "pooling": pooling,
    }
    return cfg


def _ab_pair_outputs(hidden_layers, dtype=jnp.float32):
    cfg_on = _rl_patch(hidden_layers)
    b_on = ModelBuilder(cfg_on, dtype=dtype)
    model_on, variables = b_on.init(batch=1)
    cfg_off = _rl_patch(hidden_layers)
    cfg_off["model"]["defer_remask"] = False
    model_off, _ = ModelBuilder(cfg_off, dtype=dtype).init(batch=1)
    _, crop_nt = b_on.crop
    variables = _randomized(variables)
    if "batch_stats" in variables:
        # keep moving variances positive (randomized negatives NaN the
        # rsqrt and would make the A/B vacuously NaN==NaN)
        variables = {
            **variables,
            "batch_stats": jax.tree_util.tree_map(
                lambda l: jnp.abs(l) + 0.5, variables["batch_stats"]
            ),
        }
    batch = _masked_batch(crop_nt)
    out_on = model_on.apply(variables, batch, train=False)
    assert all(np.isfinite(np.asarray(v)).all() for v in out_on.values())
    return out_on, model_off.apply(variables, batch, train=False)


def test_batchnorm_residual_model_bit_identical():
    """REGRESSION (round 4): a masked_batchnorm-normed residual model —
    the reference program never re-zeroes after the affine norm, so the
    block's raw identity shortcut carries nonzero masked values that
    mask_mode='any' growth exposes. Deferral must leave this model
    untouched; the unfixed shared pre-zero changed the live-reference TSV
    (tests/test_e2e_live_reference.py)."""
    layers = [
        {"name": "masked_conv1d", "config": {"filters": 8, "kernel_size": 3}},
        {"name": "masked_batchnorm", "config": {"return_nmd": True}},
        {"name": "activation", "config": {"activation": "gelu"}},
        {"name": "residual_block",
         "config": {"block_size": 2, "filters": 8, "kernel_size": 3,
                    "dilation_rate": 2, "norm_type": "masked_batchnorm"}},
    ]
    out_on, out_off = _ab_pair_outputs(layers)
    for k in out_on:
        np.testing.assert_array_equal(
            np.asarray(out_on[k]), np.asarray(out_off[k]), err_msg=k
        )


def test_dyt_stack_with_unremasked_input_bit_identical():
    """A DYT-normed stack whose INPUT is not re-masked in the un-deferred
    program (batchnorm precedes it): the first block must keep the raw
    shortcut, and inner defers must stay gated on the next block's
    pre-zero."""
    layers = [
        {"name": "masked_conv1d", "config": {"filters": 8, "kernel_size": 3}},
        {"name": "masked_batchnorm", "config": {}},
        {"name": "activation", "config": {"activation": "gelu"}},
        {"name": "residual_block",
         "config": {"block_size": 2, "filters": 8, "kernel_size": 3,
                    "norm_type": "masked_dyt"}},
        {"name": "masked_dyt", "config": {}},
        {"name": "nmd", "config": {}},
    ]
    out_on, out_off = _ab_pair_outputs(layers)
    for k in out_on:
        np.testing.assert_array_equal(
            np.asarray(out_on[k]), np.asarray(out_off[k]), err_msg=k
        )


def test_block_raw_shortcut_kept_when_input_not_remasked():
    """Deterministic per-position pin for the round-4 regression: with
    input_remasked=False, deferral must be inert — the identity shortcut
    carries RAW x (reference semantics), not a pre-zeroed copy. Checked at
    block level (no pooling) so a boundary position that mask growth
    validates compares directly; the model-level A/Bs above can hide this
    behind the masked max."""
    from jaeger_tpu.models import layers as L

    b, f, length, c = 2, 1, 48, 8
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (b, f, length, c), jnp.float32) + 0.7
    mask = jnp.ones((b, f, length), bool)
    mask = mask.at[:, :, 16:32].set(False)   # interior invalid run

    kw = dict(filters=c, kernel_size=3, norm_type="masked_batchnorm")
    block_def = L.ResidualBlock(
        defer_internal_mask=True, defer_output_mask=True,
        input_remasked=False, **kw,
    )
    block_ref = L.ResidualBlock(
        defer_internal_mask=False, defer_output_mask=False,
        input_remasked=False, **kw,
    )
    variables = block_def.init(jax.random.PRNGKey(0), x, mask)
    variables = _randomized(variables)
    # keep moving variances positive (randomized negatives NaN the rsqrt)
    variables = {
        **variables,
        "batch_stats": jax.tree_util.tree_map(
            lambda l: jnp.abs(l) + 0.5, variables["batch_stats"]
        ),
    }
    y_def, m_def = block_def.apply(variables, x, mask)
    y_ref, m_ref = block_ref.apply(variables, x, mask)
    np.testing.assert_array_equal(np.asarray(m_def), np.asarray(m_ref))
    grown = np.asarray(m_def) & ~np.asarray(mask)
    assert grown.any(), "mask_mode='any' must validate boundary positions"
    # compare everywhere the output mask is valid — includes the grown band
    valid = np.asarray(m_def)[..., None]
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(y_def), 0.0),
        np.where(valid, np.asarray(y_ref), 0.0),
    )
    # and the grown band must actually carry the raw (nonzero) shortcut —
    # guard against this assertion going vacuous
    assert np.abs(np.asarray(y_ref)[grown]).max() > 0


def test_flagship_blocks_input_is_remasked():
    """The perf guard for the fix: every flagship residual block must keep
    its shared input pre-zero (input_remasked=True at each block site) —
    otherwise the masked-program win silently reverts to raw shortcuts."""
    cfg = _inline_flagship()["model"]["representation_learner"]
    frozen = _freeze_layers(cfg["hidden_layers"])
    zeroed = False
    saw_block = False
    for name, lcfg in frozen:
        if name == "residual_block":
            saw_block = True
            assert zeroed, "flagship block input must be provably re-masked"
        zeroed = builder_mod._zeroed_after(name, dict(lcfg), zeroed)
    assert saw_block


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
