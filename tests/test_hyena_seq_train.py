"""Sequence-sharded Hyena TRAINING as a product path (round 3).

The ppermute ring (parallel/hyena_sp) is differentiable, so full-contig
Hyena models can train with their long convolutions length-sharded over
a `seq` mesh axis — activations stay O(L/n) per chip. These tests pin:

1. one train step under the seq mesh == the unsharded step (params,
   loss) at widths 2 and 4;
2. the `jaeger train` path: a config with `model.parallel.seq_axis`
   trains through the seq mesh end-to-end, and the saved bundle strips
   the runtime knob so it loads/predicts anywhere.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from jaeger_tpu.models.builder import ModelBuilder
from jaeger_tpu.train.loop import (
    StepConfig,
    TrainState,
    make_dispatching_train_step,
)
from jaeger_tpu.train.optimizers import make_optimizer

from tests.test_hyena_seq_cli import CFG


def _seq_cfg():
    cfg = copy.deepcopy(CFG)
    cfg["model"]["parallel"] = {"seq_axis": "seq"}
    return cfg


def _batch(rng, crop_nt, batch=4):
    bases = rng.integers(0, 4, size=(batch, crop_nt)).astype(np.uint8)
    labels = np.zeros((batch, 3), np.float32)
    labels[np.arange(batch), rng.integers(0, 3, batch)] = 1.0
    return {"bases": bases,
            "lengths": np.full((batch,), crop_nt, np.int32),
            "labels": labels}


def _state(variables):
    # SGD: update proportional to gradient (rounding noise stays noise)
    tx = make_optimizer("sgd", {"learning_rate": 0.01})
    return TrainState.create(jax.tree.map(jnp.copy, variables), tx)


@pytest.mark.parametrize("width", [2, 4])
def test_seq_sharded_step_matches_unsharded(width, rng):
    plain_b = ModelBuilder(CFG)
    plain_model, variables = plain_b.init()
    _, crop_nt = plain_b.crop
    seq_model = ModelBuilder(_seq_cfg()).build()

    batch = _batch(rng, crop_nt)
    key = jax.random.PRNGKey(0)
    cfg = StepConfig(heads=("prediction",))

    s_ref, m_ref = make_dispatching_train_step(plain_model, cfg)(
        _state(variables), batch, key)
    mesh = Mesh(np.array(jax.devices()[:width]), ("seq",))
    s_seq, m_seq = make_dispatching_train_step(
        seq_model, cfg, seq_mesh=mesh)(_state(variables), batch, key)

    assert float(m_ref["loss"]) == pytest.approx(
        float(m_seq["loss"]), rel=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
        s_ref.params, s_seq.params)


def test_train_command_seq_sharded(tmp_path, rng):
    """`jaeger train` on a parallel.seq_axis config: trains through the
    seq mesh, saves a bundle WITHOUT the runtime knob, and the bundle
    predicts unsharded."""
    import yaml

    from jaeger_tpu.commands.train import train_fragment_core
    from jaeger_tpu.models.artifacts import load_model

    csv = tmp_path / "train.csv"
    with csv.open("w") as fh:
        for i in range(48):
            label = i % 3
            seq = "".join(rng.choice(list("ACGT"), size=300))
            fh.write(f"{label},{seq}\n")

    cfg = _seq_cfg()
    cfg["training"] = {
        "batch_size": 8, "classifier_epochs": 1,
        "classifier_train_steps": 3,
        "optimizer": "adam",
        "optimizer_params": {"learning_rate": 0.003},
        "loss_classifier": "categorical_crossentropy",
        "fragment_classifier_data": {
            "train": [{"class": ["a", "b", "c"], "path": [str(csv)],
                       "label": [0, 1, 2]}],
        },
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    r = train_fragment_core(str(cfg_path), output_dir=str(tmp_path / "m"))
    assert np.isfinite(r["history"]["classifier"][-1]["loss"])

    saved = yaml.safe_load((tmp_path / "m" / "project.yaml").read_text())
    assert "parallel" not in saved.get("model", saved)  # knob stripped

    model, variables, _, _ = load_model(tmp_path / "m")
    _, crop_nt = ModelBuilder(CFG).crop
    b = _batch(np.random.default_rng(1), crop_nt)
    out = model.apply(variables, {
        "bases": jnp.asarray(b["bases"]),
        "lengths": jnp.asarray(b["lengths"])}, train=False)
    assert np.isfinite(np.asarray(out["prediction"], np.float32)).all()

    # regression: the same config must also train when NO seq mesh can
    # materialize (use_mesh=False / one device / seq_shard 1) — the
    # command falls back to the unsharded twin instead of tracing a
    # seq_axis model without an ambient mesh
    r2 = train_fragment_core(str(cfg_path),
                             output_dir=str(tmp_path / "m_nomesh"),
                             use_mesh=False)
    assert np.isfinite(r2["history"]["classifier"][-1]["loss"])
