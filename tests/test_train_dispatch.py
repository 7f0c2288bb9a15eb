"""Dense-program dispatch + remat for the training step (round 3).

Chip evidence (experiments/train_breakdown.py): the flagship train-mode
forward is +28% maskless, and the batch-2048 backward overflows HBM
without rematerialization. These tests pin the two levers' exactness.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaeger_tpu.models.builder import ModelBuilder
from jaeger_tpu.train.loop import (
    StepConfig,
    TrainState,
    make_dispatching_train_step,
    make_train_step,
)
from jaeger_tpu.train.optimizers import make_optimizer


def _tiny_config(masking=True):
    return {
        "name": "dispatch_tiny", "seed": 3, "classifier_out_dim": 3,
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 8},
        "string_processor": {"crop_size": 33, "seq_onehot": False,
                             "masking": masking,
                             "classifier_labels": [0, 1, 2],
                             "classifier_labels_map": [0, 1, 2]},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 3,
                            "padding": "same"}},
                {"name": "gelu"},
                {"name": "residual_block",
                 "config": {"filters": 8, "kernel_size": 3,
                            "block_size": 2, "use_masking": masking}},
            ],
            "pooling": "average",
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    }


def _batch(rng, crop_nt, batch=8, with_n=False):
    bases = rng.integers(0, 4, size=(batch, crop_nt)).astype(np.uint8)
    if with_n:
        bases[1, 5] = 4
    labels = np.zeros((batch, 3), np.float32)
    labels[np.arange(batch), rng.integers(0, 3, batch)] = 1.0
    return {"bases": bases,
            "lengths": np.full((batch,), crop_nt, np.int32),
            "labels": labels}


@pytest.fixture
def built(rng):
    builder = ModelBuilder({"model": _tiny_config()})
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop
    return model, variables, crop_nt


def _state(variables):
    # SGD for exactness tests: its update is proportional to the
    # gradient, so float-rounding-level grad noise stays rounding-level
    # in the params. (Adam normalizes analytically-zero grads — e.g.
    # conv biases feeding BN — to full-size sign-flipped updates.)
    tx = make_optimizer("sgd", {"learning_rate": 0.01})
    return TrainState.create(variables, tx)


def test_dense_step_equals_masked_step_on_dense_batch(built, rng):
    """assume_dense is an identity when the mask is all-true: one step
    from the same state produces identical params and metrics."""
    model, variables, crop_nt = built
    batch = _batch(rng, crop_nt)
    key = jax.random.PRNGKey(0)

    cfg = StepConfig(heads=("prediction",))
    from dataclasses import replace

    s1, m1 = make_train_step(model, cfg)(_state(variables), batch, key)
    s2, m2 = make_train_step(model, replace(cfg, assume_dense=True))(
        _state(variables), batch, key)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s1.params, s2.params)


def test_dispatch_selects_program_per_batch(built, rng, monkeypatch):
    """Clean batches run the dense program; a batch containing an N (or a
    short window) falls back to the masked program."""
    model, variables, crop_nt = built
    import jaeger_tpu.train.loop as loop_mod

    picked = []
    real = loop_mod.make_train_step

    def spy(mdl, cfg):
        fn = real(mdl, cfg)

        def wrapped(state, batch, rng_):
            picked.append(cfg.assume_dense)
            return fn(state, batch, rng_)

        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", spy)
    step = make_dispatching_train_step(model, StepConfig(
        heads=("prediction",)))
    state = _state(variables)
    key = jax.random.PRNGKey(1)

    # the spy append runs at TRACE time, so `picked` records one entry
    # per program COMPILE — which is exactly the lazy-compile contract
    state, _ = step(state, _batch(rng, crop_nt), key)
    assert picked == [True]
    state, _ = step(state, _batch(rng, crop_nt, with_n=True), key)
    assert picked == [True, False]
    short = _batch(rng, crop_nt)
    short["lengths"][0] = crop_nt - 1
    state, _ = step(state, short, key)
    assert picked == [True, False]  # masked program REUSED, no recompile

    # training still progresses through the dispatcher
    _, metrics = step(state, _batch(rng, crop_nt), key)
    assert picked == [True, False]  # dense program reused too
    assert np.isfinite(float(metrics["loss"]))


def test_dispatch_on_mesh_matches_single_device(built, rng):
    """SPMD dispatch: the 8-device sharded step produces the same params
    as the single-device step (global gradient collectives are exact)."""
    from jaeger_tpu.parallel import mesh as meshlib

    model, variables, crop_nt = built
    batch = _batch(rng, crop_nt, batch=16)
    key = jax.random.PRNGKey(2)
    cfg = StepConfig(heads=("prediction",))

    # fresh buffers per run: the dispatcher's jitted steps donate state,
    # and both states alias the fixture's variables otherwise
    s_one, m_one = make_dispatching_train_step(model, cfg)(
        _state(jax.tree.map(jnp.copy, variables)), batch, key)
    mesh = meshlib.data_mesh()
    s_mesh, m_mesh = make_dispatching_train_step(model, cfg, mesh=mesh)(
        _state(jax.tree.map(jnp.copy, variables)), batch, key)
    assert float(m_one["loss"]) == pytest.approx(
        float(m_mesh["loss"]), rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s_one.params, s_mesh.params)


def test_remat_exactness(rng):
    """model.remat rematerializes residual blocks under grad: outputs,
    losses and every gradient match the non-remat build exactly (same
    program semantics, different scheduling)."""
    cfg_plain = {"model": _tiny_config()}
    cfg_remat = {"model": {**_tiny_config(), "remat": True}}

    b1 = ModelBuilder(cfg_plain)
    model1, variables = b1.init(batch=1)
    _, crop_nt = b1.crop
    model2 = ModelBuilder(cfg_remat).build()

    batch = _batch(rng, crop_nt)
    key = jax.random.PRNGKey(3)
    step_cfg = StepConfig(heads=("prediction",))

    # identical param tree: remat must not rename or restructure params
    v2 = ModelBuilder(cfg_remat).init(batch=1)[1]
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(v2["params"]))

    s1, m1 = make_train_step(model1, step_cfg)(_state(variables), batch, key)
    s2, m2 = make_train_step(model2, step_cfg)(_state(variables), batch, key)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        s1.params, s2.params)
    # inference is untouched by the flag
    out1 = model1.apply(variables, {
        "bases": jnp.asarray(batch["bases"]),
        "lengths": jnp.asarray(batch["lengths"])}, train=False)
    out2 = model2.apply(variables, {
        "bases": jnp.asarray(batch["bases"]),
        "lengths": jnp.asarray(batch["lengths"])}, train=False)
    np.testing.assert_allclose(np.asarray(out1["prediction"]),
                               np.asarray(out2["prediction"]),
                               rtol=1e-6, atol=1e-7)


def test_remat_exactness_hyena(rng):
    """remat also wraps Hyena blocks — the long-context regime it is
    actually for (the (order+1) full-length projection streams are the
    memory wall): step params/loss match the non-remat build."""
    import copy

    from tests.test_hyena_seq_cli import CFG

    cfg_plain = copy.deepcopy(CFG)
    cfg_remat = copy.deepcopy(CFG)
    cfg_remat["model"]["remat"] = True

    b1 = ModelBuilder(cfg_plain)
    model1, variables = b1.init()
    _, crop_nt = b1.crop
    model2 = ModelBuilder(cfg_remat).build()
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(
                ModelBuilder(cfg_remat).init()[1]["params"]))

    batch = _batch(rng, crop_nt, batch=4)
    batch["labels"] = batch["labels"][:, :3]
    key = jax.random.PRNGKey(4)
    step_cfg = StepConfig(heads=("prediction",))
    s1, m1 = make_train_step(model1, step_cfg)(_state(variables), batch, key)
    s2, m2 = make_train_step(model2, step_cfg)(_state(variables), batch, key)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s1.params, s2.params)


def test_bounded_step_equals_masked_step_on_qualifying_batch(built, rng):
    """The bounded-mask train step (mask_layers=cut) equals the full
    masked step BITWISE on batches whose invalid runs qualify — params
    AND batch statistics. The fixture's residual block uses the default
    masked_batchnorm norms, so this pins the one genuinely non-trivial
    leg: train-mode BN batch statistics post-cut keep the eps-carrying
    masked-stats graph under a barrier'd all-true mask
    (ResidualBlock.bn_stats_all_true); a dense-stats BN there would
    drift the moving stats with the dispatcher's program choice."""
    from dataclasses import replace

    from jaeger_tpu.models.builder import mask_cut_plan
    from jaeger_tpu.ops.encode import bounded_mask_levels

    model, variables, crop_nt = built
    plans = mask_cut_plan(
        {"model": _tiny_config()}["model"]["representation_learner"])
    assert plans, "tiny config must yield cut plans"
    batch = _batch(rng, crop_nt, with_n=True)  # short N run -> qualifies
    levels = bounded_mask_levels(batch["bases"], batch["lengths"],
                                 crop_nt, True, plans)
    assert (levels >= 0).all()
    key = jax.random.PRNGKey(1)

    cfg = StepConfig(heads=("prediction",))
    for cut, _ib, _eb in plans:  # both cut tiers (A: in-block, B: index)
        s1, m1 = make_train_step(model, cfg)(_state(variables), batch, key)
        s2, m2 = make_train_step(model, replace(cfg, mask_layers=cut))(
            _state(variables), batch, key)
        assert float(m1["loss"]) == float(m2["loss"]), cut
        # gradients are the same function's; XLA's backward fuses the two
        # graphs differently, so a few reduce orders differ at 1 ulp
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8,
                err_msg=str(cut)),
            s1.params, s2.params)
        # the moving batch statistics are forward-side state: BITWISE,
        # so the dispatcher's program choice cannot drift training state
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=str(cut)),
            s1.batch_stats, s2.batch_stats)


def test_dispatch_selects_bounded_tier(built, rng, monkeypatch):
    """The dispatching step uses the bounded program for qualifying
    masked batches, the full masked program for long-run batches."""
    from jaeger_tpu.train import loop as L

    model, variables, crop_nt = built
    calls = []
    real = L.make_train_step

    def spy(m, cfg):
        calls.append((cfg.assume_dense, cfg.mask_layers))
        return real(m, cfg)

    monkeypatch.setattr(L, "make_train_step", spy)
    step = L.make_dispatching_train_step(model, StepConfig(
        heads=("prediction",)))
    key = jax.random.PRNGKey(2)

    state = _state(variables)
    state, _ = step(state, _batch(rng, crop_nt, with_n=True), key)
    assert calls and calls[-1][0] is False and calls[-1][1] is not None

    long_run = _batch(rng, crop_nt)
    long_run["bases"][0, 2:29] = 4  # run longer than every bound
    state, _ = step(state, long_run, key)
    assert calls[-1] == (False, None)

    state, _ = step(state, _batch(rng, crop_nt), key)
    assert calls[-1][0] is True
