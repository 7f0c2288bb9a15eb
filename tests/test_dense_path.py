"""Maskless dense fast path: exactness vs the masked program.

The engine selects a maskless forward (``assume_dense=True``) per device
batch when every window fills the model's crop with unambiguous bases —
there the mask is all-true and masking is an identity, but skipping its
propagation saves ~30% of the flagship forward (floor_probe ablation).
These tests pin that the selection predicate is safe and the outputs
match the masked program.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jaeger_tpu.infer.engine import InferenceEngine
from jaeger_tpu.models.builder import ModelBuilder

CONFIG = {
    "model": {
        "name": "dense_tiny",
        "seed": 5,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 8},
        "string_processor": {"crop_size": 100, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 3}},
                {"name": "masked_dyt", "config": {}},
                {"name": "gelu"},
                {"name": "residual_block",
                 "config": {"block_size": 1, "filters": 8,
                            "kernel_size": 3, "dilation_rate": 3,
                            "norm_type": "masked_dyt"}},
                {"name": "nmd", "config": {}},
            ],
            "pooling": "max",
        },
        "reliability_model": {
            "mode": "nmd",
            "hidden_layers": [{"name": "dense", "config": {"units": 1}}],
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    },
    "training": {},
}


@pytest.fixture(scope="module")
def built():
    b = ModelBuilder(CONFIG)
    model, variables = b.init()
    return b, model, variables


def test_dense_forward_matches_masked(built):
    b, model, variables = built
    _, crop_nt = b.crop
    rng = np.random.default_rng(0)
    bases = jnp.asarray(
        rng.integers(0, 4, size=(4, crop_nt), dtype=np.uint8))
    lengths = jnp.full((4,), crop_nt, jnp.int32)
    inp = {"bases": bases, "lengths": lengths}
    masked = model.apply(variables, inp, train=False)
    dense = model.apply(variables, inp, train=False, assume_dense=True)
    for k in masked:
        np.testing.assert_allclose(
            np.asarray(masked[k], np.float32),
            np.asarray(dense[k], np.float32),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_predicate_full_clean_batch(built):
    b, model, variables = built
    _, crop_nt = b.crop
    eng = InferenceEngine(model, variables, batch_size=4)
    rng = np.random.default_rng(1)
    bases = rng.integers(0, 4, size=(4, crop_nt), dtype=np.uint8)
    lengths = np.full(4, crop_nt, np.int32)
    assert eng._dense_batch(bases, lengths)

    # one N anywhere inside the crop breaks density
    with_n = bases.copy()
    with_n[2, crop_nt // 2] = 4
    assert not eng._dense_batch(with_n, lengths)

    # a short window breaks density
    short = lengths.copy()
    short[0] = crop_nt - 1
    assert not eng._dense_batch(bases, short)

    # soft-masked bases (IDs 5-8) are fine when the model does not use
    # soft-masking (tokens are identical to the uppercase bases)...
    soft = bases.copy()
    soft[1, 3] = 5
    assert not model.masking_enabled
    assert eng._dense_batch(soft, lengths)

    # ...but not when it does
    cfg2 = {"model": {**CONFIG["model"],
                      "string_processor": {"crop_size": 100,
                                           "seq_onehot": False,
                                           "masking": True}},
            "training": {}}
    b2 = ModelBuilder(cfg2)
    m2, v2 = b2.init()
    eng2 = InferenceEngine(m2, v2, batch_size=4)
    assert m2.masking_enabled
    assert not eng2._dense_batch(soft, lengths)
    assert eng2._dense_batch(bases, lengths)


def test_engine_mixed_batches_match_masked_only(built):
    """Windows mixing dense batches, N-containing windows and short
    windows must produce outputs identical to an engine that never takes
    the dense path."""
    b, model, variables = built
    _, crop_nt = b.crop
    rng = np.random.default_rng(2)
    n = 10
    bases = rng.integers(0, 4, size=(n, crop_nt + 20), dtype=np.uint8)
    lengths = np.full(n, crop_nt + 20, np.int32)
    bases[3, 7] = 4          # N inside the crop
    lengths[6] = crop_nt - 30  # short window
    bases[6, lengths[6]:] = 4

    eng = InferenceEngine(model, variables, batch_size=5)
    out = eng.predict_windows(bases, lengths)

    class NeverDense(InferenceEngine):
        def _plan_batch(self, b_, ln_, n_valid_):
            return False, None, None  # masked program on every batch

    ref = NeverDense(model, variables, batch_size=5)
    out_ref = ref.predict_windows(bases, lengths)
    assert any(k[1] is True for k in eng._compiled), list(eng._compiled)
    # batch 0 (windows 0-4) has the N -> masked; batch 1 (5-9) has the
    # short window -> masked; force one dense batch too:
    clean = rng.integers(0, 4, size=(5, crop_nt + 20), dtype=np.uint8)
    out2 = eng.predict_windows(clean, np.full(5, crop_nt + 20, np.int32))
    out2_ref = ref.predict_windows(clean, np.full(5, crop_nt + 20, np.int32))
    for k in out:
        np.testing.assert_allclose(out[k], out_ref[k],
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    for k in out2:
        np.testing.assert_allclose(out2[k], out2_ref[k],
                                   rtol=1e-5, atol=1e-5, err_msg=k)
