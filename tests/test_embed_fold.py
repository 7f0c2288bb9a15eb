"""Embedding->entry-conv folding (MaskedConv1D ``fold_table``).

The embedding is linear, so ``conv(onehot(tok) @ T, K)`` equals
``conv(onehot(tok), einsum(T, K))``; the builder uses the folded form in
bf16 (models/builder.py can_fold) so the MXU contracts over vocab instead
of embedding width and the embedded (B, F, L, E) intermediate never hits
HBM. These tests pin:

  * module-level f32 equivalence (masked + dense) to the unfolded path;
  * that masked tokens (token 0, the encode contract) contribute exactly
    zero, matching ``apply_mask``;
  * builder-level: bf16 builds fold, f32 builds do not (golden-logit
    stability for converted weights), param trees identical;
  * bf16 masked-vs-dense program bit-equality on all-dense inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaeger_tpu.models import layers as L
from jaeger_tpu.models.builder import ModelBuilder


def _conv_vars(conv, table, tokens, mask):
    emb = jax.nn.one_hot(tokens, table.shape[0], dtype=jnp.float32) @ table
    return conv.init(jax.random.PRNGKey(1), emb, mask, False), emb


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    B, F, Lw, V, E, C = 3, 6, 40, 66, 17, 8
    tokens = jnp.asarray(rng.integers(0, V, (B, F, Lw)), jnp.int32)
    table = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32) * 0.1)
    conv = L.MaskedConv1D(filters=C, kernel_size=7, dtype=jnp.float32)
    return tokens, table, conv


def test_fold_matches_unfolded_masked(setup):
    tokens, table, conv = setup
    mask = tokens != 0
    vars_, emb = _conv_vars(conv, table, tokens, mask)
    y_ref, m_ref = conv.apply(vars_, emb, mask, False)
    y_fold, m_fold = conv.apply(vars_, tokens, mask, False, fold_table=table)
    np.testing.assert_allclose(y_fold, y_ref, rtol=1e-5, atol=1e-6)
    assert bool(jnp.all(m_ref == m_fold))


def test_fold_matches_unfolded_dense(setup):
    tokens, table, conv = setup
    tokens = jnp.maximum(tokens, 1)  # no masked tokens
    vars_, emb = _conv_vars(conv, table, tokens, None)
    y_ref, _ = conv.apply(vars_, emb, None, False)
    y_fold, _ = conv.apply(vars_, tokens, None, False, fold_table=table)
    np.testing.assert_allclose(y_fold, y_ref, rtol=1e-5, atol=1e-6)


def test_masked_tokens_contribute_zero(setup):
    """Row-0 zeroing == apply_mask for token-0 positions: with masking
    on, the folded output must be independent of the table's row 0
    (masked positions carry token 0 by the encode contract)."""
    tokens, table, conv = setup
    tokens = tokens.at[:, :, ::5].set(0)
    mask = tokens != 0
    vars_, _ = _conv_vars(conv, table, tokens, mask)
    y1, _ = conv.apply(vars_, tokens, mask, False, fold_table=table)
    table2 = table.at[0].set(99.0)
    y2, _ = conv.apply(vars_, tokens, mask, False, fold_table=table2)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


CONFIG = {
    "model": {
        "name": "fold_tiny",
        "seed": 7,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "a", "label": 0},
            {"class": "b", "label": 1},
            {"class": "c", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 12},
        "string_processor": {"crop_size": 60, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 3}},
                {"name": "masked_dyt", "config": {}},
            ],
            "pooling": "max",
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    },
    "training": {},
}


def _apply(dtype, assume_dense=False):
    b = ModelBuilder(CONFIG, dtype=dtype)
    model, variables = b.init(batch=1)
    _, crop_nt = b.crop
    rng = np.random.default_rng(3)
    bases = jnp.asarray(rng.integers(0, 4, (4, crop_nt)), jnp.uint8)
    lengths = jnp.full((4,), crop_nt, jnp.int32)
    out = model.apply(
        variables, {"bases": bases, "lengths": lengths}, train=False,
        assume_dense=assume_dense,
    )
    return b, variables, out


def test_builder_bf16_folds_f32_does_not(monkeypatch):
    calls = []
    real = L.MaskedConv1D.__call__

    def spy(self, x, mask=None, train=False, fold_table=None):
        calls.append(fold_table is not None)
        return real(self, x, mask, train, fold_table)

    monkeypatch.setattr(L.MaskedConv1D, "__call__", spy)
    _apply(jnp.bfloat16)
    assert calls[0] is True, "bf16 build must fold the embedding"
    calls.clear()
    _apply(jnp.float32)
    assert not any(calls), "f32 build must keep the literal two-op form"


def test_builder_param_tree_unchanged_by_fold():
    bb, vb, _ = _apply(jnp.bfloat16)
    bf, vf, _ = _apply(jnp.float32)
    assert (jax.tree_util.tree_structure(vb)
            == jax.tree_util.tree_structure(vf))


def test_bf16_folded_close_to_f32():
    _, vf, out_f = _apply(jnp.float32)
    b = ModelBuilder(CONFIG, dtype=jnp.bfloat16)
    model, _ = b.init(batch=1)
    _, crop_nt = b.crop
    rng = np.random.default_rng(3)
    bases = jnp.asarray(rng.integers(0, 4, (4, crop_nt)), jnp.uint8)
    lengths = jnp.full((4,), crop_nt, jnp.int32)
    out_b = model.apply(vf, {"bases": bases, "lengths": lengths}, train=False)
    np.testing.assert_allclose(
        np.asarray(out_b["prediction"], np.float32),
        np.asarray(out_f["prediction"]),
        rtol=0.1, atol=5e-2,
    )


def test_bf16_dense_program_matches_masked_bitwise():
    """All-dense inputs: the folded masked program (row-0 zeroed) and the
    folded dense program must agree bit-for-bit, like the f32 pin in
    test_dense_path.py."""
    _, _, out_masked = _apply(jnp.bfloat16, assume_dense=False)
    _, _, out_dense = _apply(jnp.bfloat16, assume_dense=True)
    np.testing.assert_array_equal(
        np.asarray(out_masked["prediction"], np.float32),
        np.asarray(out_dense["prediction"], np.float32),
    )


def test_fold_gradients_flow_to_table():
    """Training in bf16 uses the folded form; the embedding table must
    still receive nonzero gradients through the einsum."""
    b = ModelBuilder(CONFIG, dtype=jnp.bfloat16)
    model, variables = b.init(batch=1)
    _, crop_nt = b.crop
    rng = np.random.default_rng(5)
    bases = jnp.asarray(rng.integers(0, 4, (4, crop_nt)), jnp.uint8)
    lengths = jnp.full((4,), crop_nt, jnp.int32)

    def loss(params):
        out = model.apply(
            {**variables, "params": params},
            {"bases": bases, "lengths": lengths}, train=False,
        )
        return jnp.sum(out["prediction"].astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(variables["params"])
    g = grads["embedding"]["embedding"]
    assert float(jnp.max(jnp.abs(g))) > 0.0
