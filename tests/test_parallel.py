"""Multi-device sharding tests (8 virtual CPU devices).

What the reference never had (SURVEY §4 takeaway): actual multi-chip
tests. Data-parallel inference and training must be numerically
consistent with single-device execution, and batch-norm statistics must
be global across shards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaeger_tpu.models.builder import ModelBuilder
from jaeger_tpu.parallel import mesh as meshlib

CONFIG = {
    "model": {
        "name": "par_tiny",
        "seed": 0,
        "classifier_out_dim": 3,
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 8},
        "string_processor": {"crop_size": 30, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 3}},
                {"name": "masked_batchnorm", "config": {}},
                {"name": "gelu"},
            ],
            "pooling": "average",
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
    _, crop_nt = b.crop
    return b, model, variables, crop_nt


def _inputs(n, crop_nt, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "bases": jnp.asarray(
            rng.integers(0, 4, size=(n, crop_nt), dtype=np.uint8)
        ),
        "lengths": jnp.full((n,), crop_nt, jnp.int32),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_inference_matches_single(built):
    b, model, variables, crop_nt = built
    inputs = _inputs(16, crop_nt)
    ref = model.apply(variables, inputs, train=False)["prediction"]

    mesh = meshlib.data_mesh()
    data = meshlib.shard_along(mesh)
    rep = meshlib.replicate(mesh)

    @jax.jit
    def fwd(v, x, l):
        return model.apply(v, {"bases": x, "lengths": l},
                           train=False)["prediction"]

    sharded = jax.jit(fwd, in_shardings=(rep, data, data))
    v_rep = jax.device_put(variables, rep)
    x = jax.device_put(inputs["bases"], data)
    l = jax.device_put(inputs["lengths"], data)
    out = sharded(v_rep, x, l)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_engine_with_mesh_matches_single(built):
    from jaeger_tpu.infer.engine import InferenceEngine

    b, model, variables, crop_nt = built
    rng = np.random.default_rng(1)
    bases = rng.integers(0, 4, size=(24, crop_nt), dtype=np.uint8)
    lengths = np.full((24,), crop_nt, np.int32)

    single = InferenceEngine(model, variables, batch_size=8)
    ref = single.predict_windows(bases, lengths)["prediction"]

    mesh = meshlib.data_mesh()
    eng = InferenceEngine(model, variables, batch_size=8, mesh=mesh)
    out = eng.predict_windows(bases, lengths)["prediction"]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sharded_train_step_global_batchnorm(built):
    """Batch-norm stats under SPMD must be global (identical to running
    the whole batch on one device)."""
    from jaeger_tpu.train.loop import (
        StepConfig, TrainState, make_train_step, shard_train_step,
    )
    from jaeger_tpu.train.optimizers import make_optimizer

    b, model, variables, crop_nt = built
    tx = make_optimizer("sgd", {"learning_rate": 0.01})
    cfg = StepConfig(loss_name="categorical_crossentropy")
    step = make_train_step(model, cfg)

    rng = np.random.default_rng(2)
    n = 16
    batch = {
        "bases": jnp.asarray(
            rng.integers(0, 4, size=(n, crop_nt), dtype=np.uint8)
        ),
        "lengths": jnp.full((n,), crop_nt, jnp.int32),
        "labels": jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 3, n)), 3
        ),
    }
    key = jax.random.PRNGKey(0)

    # single device
    state1 = TrainState.create(variables, tx)
    state1, m1 = jax.jit(step)(state1, batch, key)

    # sharded over 8 devices
    mesh = meshlib.data_mesh()
    sharded = shard_train_step(step, mesh)
    state2 = jax.device_put(
        TrainState.create(variables, tx), meshlib.replicate(mesh)
    )
    batch_sh = jax.device_put(batch, meshlib.shard_along(mesh))
    state2, m2 = sharded(state2, batch_sh, key)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    # global batch-norm moving stats identical
    mm1 = jax.tree.leaves(state1.batch_stats)
    mm2 = jax.tree.leaves(state2.batch_stats)
    for a, c in zip(mm1, mm2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)
    # params after one step identical
    p1 = jax.tree.leaves(state1.params)
    p2 = jax.tree.leaves(state2.params)
    for a, c in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)


def test_metrics_module():
    from jaeger_tpu.train import metrics as M

    y = np.array([0, 0, 1, 1, 2, 2])
    logits = np.eye(3)[np.array([0, 1, 1, 1, 2, 0])]
    assert M.precision_for_class(y, logits, 1) == pytest.approx(2 / 3)
    assert M.recall_for_class(y, logits, 1) == pytest.approx(1.0)
    assert M.specificity_for_class(y, logits, 0) == pytest.approx(3 / 4)
    cm = M.confusion_matrix(y, logits, 3)
    assert cm.sum() == 6 and cm[1, 1] == 2
    report = M.classification_report(y, logits, ["a", "b", "c"])
    assert "macro-f1" in report
    assert M.binary_f1_score(np.array([1, 0, 1]),
                             np.array([2.0, -1.0, 3.0])) == 1.0
