"""Training stack tests: optimizers, callbacks, checkpoints, threshold,
refinement, losses, full orchestration."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp


class TestOptimizers:
    def test_factory_names(self):
        from jaeger_tpu.train.optimizers import make_optimizer

        for name in ["adam", "adamw", "sgd", "rmsprop", "adagrad"]:
            tx = make_optimizer(name, {"learning_rate": 0.01})
            params = {"w": jnp.ones(3)}
            state = tx.init(params)
            g = {"w": jnp.ones(3)}
            updates, _ = tx.update(g, state, params)
            assert jnp.isfinite(updates["w"]).all()

    def test_lr_mutation(self):
        from jaeger_tpu.train.optimizers import (
            get_learning_rate, make_optimizer, set_learning_rate,
        )

        tx = make_optimizer("adam", {"learning_rate": 0.01, "clipnorm": 1.0})
        state = tx.init({"w": jnp.ones(3)})
        assert get_learning_rate(state) == pytest.approx(0.01)
        state = set_learning_rate(state, 0.005)
        assert get_learning_rate(state) == pytest.approx(0.005)

    def test_accumulation(self):
        from jaeger_tpu.train.optimizers import make_optimizer

        tx = make_optimizer("adam", {"learning_rate": 0.1},
                            accumulation_steps=2)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        u1, state = tx.update({"w": jnp.ones(3)}, state, params)
        # first of two accumulation steps: no update applied yet
        assert float(jnp.abs(u1["w"]).max()) == 0.0
        u2, state = tx.update({"w": jnp.ones(3)}, state, params)
        assert float(jnp.abs(u2["w"]).max()) > 0.0

    def test_cosine_schedule(self):
        from jaeger_tpu.train.optimizers import make_schedule

        sched = make_schedule(
            {"lr_schedule": "cosine", "learning_rate": 0.1,
             "decay_steps": 100}
        )
        assert sched(0) == pytest.approx(0.1)
        assert sched(100) < 0.001


class TestCallbacks:
    def test_early_stopping(self):
        from jaeger_tpu.train.callbacks import EarlyStopping

        es = EarlyStopping(patience=2, restore_best_weights=True)
        assert not es.on_epoch_end({"val_loss": 1.0}, params="p1", epoch=0)
        assert not es.on_epoch_end({"val_loss": 1.1}, params="p2", epoch=1)
        assert es.on_epoch_end({"val_loss": 1.2}, params="p3", epoch=2)
        assert es.best_params == "p1"

    def test_reduce_lr(self):
        from jaeger_tpu.train.callbacks import ReduceLROnPlateau

        rl = ReduceLROnPlateau(patience=1, factor=0.5, min_lr=1e-4)
        assert rl.on_epoch_end({"val_loss": 1.0}, 0.01) is None
        new = rl.on_epoch_end({"val_loss": 1.5}, 0.01)
        assert new == pytest.approx(0.005)

    def test_state_roundtrip(self):
        from jaeger_tpu.train.callbacks import EarlyStopping

        es = EarlyStopping()
        es.on_epoch_end({"val_loss": 0.5})
        es2 = EarlyStopping()
        es2.restore(es.state())
        assert es2.best == 0.5

    def test_build_from_config(self):
        from jaeger_tpu.train.callbacks import build_callbacks

        cbs = build_callbacks([
            {"name": "EarlyStopping", "params": {"patience": 5}},
            {"name": "ReduceLROnPlateau", "params": {"factor": 0.1}},
            {"name": "TerminateOnNaN"},
        ])
        assert cbs["early_stopping"].patience == 5
        assert cbs["reduce_lr"].factor == 0.1
        assert cbs["nan_guard"].on_step(float("nan"))


class TestCheckpoint:
    def test_save_restore_latest_best(self, tmp_path):
        from jaeger_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
        v1 = {"params": {"w": jnp.ones(3)}}
        mgr.save(0, v1, {"val_loss": 1.0})
        mgr.save(1, {"params": {"w": jnp.ones(3) * 2}}, {"val_loss": 0.5})
        mgr.save(2, {"params": {"w": jnp.ones(3) * 3}}, {"val_loss": 0.8})
        assert mgr.latest()["epoch"] == 2
        assert mgr.best()["epoch"] == 1
        restored = mgr.restore(mgr.best(), v1)
        np.testing.assert_allclose(restored["params"]["w"], 2.0)
        # keep=2 pruned epoch 0
        assert len(mgr._index()) == 2

    def test_training_state_persistence(self, tmp_path):
        from jaeger_tpu.train.callbacks import EarlyStopping, ReduceLROnPlateau
        from jaeger_tpu.train.checkpoint import TrainingStatePersistence

        cbs = {"early_stopping": EarlyStopping(),
               "reduce_lr": ReduceLROnPlateau()}
        cbs["early_stopping"].on_epoch_end({"val_loss": 0.7})
        persist = TrainingStatePersistence(tmp_path)
        persist.save(3, 0.001, cbs)
        cbs2 = {"early_stopping": EarlyStopping(),
                "reduce_lr": ReduceLROnPlateau()}
        state = TrainingStatePersistence(tmp_path).restore_into(cbs2)
        assert state["epoch"] == 3
        assert cbs2["early_stopping"].best == 0.7


class TestThreshold:
    def test_tuning_separable(self):
        from jaeger_tpu.postprocess.threshold import tune_reliability_threshold

        rng = np.random.default_rng(0)
        scores = np.concatenate([
            rng.uniform(0.6, 1.0, 200), rng.uniform(0.0, 0.4, 200)
        ])
        labels = np.concatenate([np.ones(200), np.zeros(200)])
        best, rows, summary = tune_reliability_threshold(scores, labels)
        assert 0.4 <= best <= 0.6
        assert summary["auroc"] > 0.99
        assert summary["auprc"] > 0.99

    def test_requires_both_classes(self):
        from jaeger_tpu.postprocess.threshold import tune_reliability_threshold

        with pytest.raises(ValueError):
            tune_reliability_threshold(np.ones(10), np.ones(10))

    def test_calibration(self):
        from jaeger_tpu.postprocess.threshold import calibration_summary

        scores = np.array([0.1, 0.9, 0.9, 0.1])
        labels = np.array([0, 1, 1, 0])
        ece, brier, rows = calibration_summary(scores, labels, n_bins=2)
        assert ece == pytest.approx(0.1, abs=1e-6)
        assert brier == pytest.approx(0.01, abs=1e-6)

    def test_outputs_written(self, tmp_path):
        from jaeger_tpu.postprocess.threshold import (
            tune_reliability_threshold, write_threshold_outputs,
        )

        scores = np.array([0.9, 0.8, 0.2, 0.1])
        labels = np.array([1, 1, 0, 0])
        best, rows, _ = tune_reliability_threshold(scores, labels)
        best_path, sweep_path = write_threshold_outputs(tmp_path, best, rows)
        assert float(best_path.read_text()) == best
        assert sweep_path.read_text().startswith("threshold,")


class TestRefinement:
    def _window_df(self, rng, n=200):
        from jaeger_tpu.postprocess.refinement import CLASSES, SCORE_COLS

        true = rng.integers(0, len(CLASSES), n)
        S = rng.normal(size=(n, len(CLASSES)))
        S[np.arange(n), true] += 4.0
        df = pd.DataFrame(S, columns=SCORE_COLS)
        df["true"] = [CLASSES[i] for i in true]
        df["contig_id"] = [f"c{i % 10}" for i in range(n)]
        return df

    def test_fit_refine_aggregate(self):
        from jaeger_tpu.postprocess import refinement as R

        rng = np.random.default_rng(0)
        df = R.add_score_features(self._window_df(rng))
        df["prediction"] = df["top_class"]
        taus = R.fit_thresholds(df, quantile=0.05)
        assert all(k in taus for k in R.CLASSES)
        refined = R.refine(df, taus)
        assert "refined_prediction" in refined.columns
        # confident windows keep their class
        frac_kept = (refined["refined_prediction"] != "unknown").mean()
        assert frac_kept > 0.8
        contig = R.aggregate_contig(refined, mode="gated")
        assert len(contig) == 10
        assert {"contig_call", "contig_margin"} <= set(contig.columns)

    def test_save_load(self, tmp_path):
        from jaeger_tpu.postprocess import refinement as R

        taus = {c: {"logit": 0.1, "margin": 0.2, "n": 50}
                for c in R.CLASSES}
        path = tmp_path / "refine.yaml"
        R.save_refinement(taus, path, jaeger_model="m1", quantile=0.05)
        meta = R.load_refinement(path, expect_model="m1")
        assert meta["taus"]["phage"]["logit"] == pytest.approx(0.1)
        with pytest.raises(ValueError):
            R.load_refinement(path, expect_model="other")


class TestLosses:
    def test_ce_matches_manual(self):
        from jaeger_tpu.train.losses import categorical_crossentropy

        logits = jnp.array([[2.0, 0.0, 0.0]])
        labels = jnp.array([[1.0, 0.0, 0.0]])
        expected = -np.log(np.exp(2) / (np.exp(2) + 2))
        assert float(
            categorical_crossentropy(labels, logits)
        ) == pytest.approx(expected, rel=1e-5)

    def test_bce(self):
        from jaeger_tpu.train.losses import binary_crossentropy

        logits = jnp.array([[10.0], [-10.0]])
        labels = jnp.array([[1.0], [0.0]])
        assert float(binary_crossentropy(labels, logits)) < 1e-3

    def test_arcface(self):
        from jaeger_tpu.train.losses import ArcFaceLoss

        af = ArcFaceLoss(num_classes=3, embedding_dim=8)
        v = af.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                    jnp.zeros((4, 8)))
        emb = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        labels = jax.nn.one_hot(jnp.array([0, 1, 2, 0]), 3)
        loss = af.apply(v, labels, emb)
        assert jnp.isfinite(loss)
        # gradient flows into centroids
        g = jax.grad(lambda p: af.apply({"params": p}, labels, emb))(
            v["params"]
        )
        assert float(jnp.abs(g["class_weights"]).max()) > 0

    def test_supcon(self):
        from jaeger_tpu.train.losses import supervised_contrastive_loss

        feats = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
        labels = jnp.array([0, 0, 1, 1, 2, 2, 0, 1])
        loss = supervised_contrastive_loss(labels, feats)
        assert jnp.isfinite(loss)

    def test_hierarchical(self):
        from jaeger_tpu.train.losses import hierarchical_loss

        logits = jax.random.normal(jax.random.PRNGKey(0), (4, 6))
        y = jnp.array([0, 2, 4, 5])
        parent_of = [0, 0, 1, 1, 2, 2]
        groups = [[0, 1], [2, 3], [4, 5]]
        loss = hierarchical_loss(y, logits, parent_of, groups)
        assert jnp.isfinite(loss)

    def test_regularization(self):
        from jaeger_tpu.train.losses import regularization_loss

        params = {"rep": {"conv_0": {"kernel": jnp.ones((2, 2))}}}
        loss = regularization_loss(params, [("rep/.*kernel", "l2", 0.5)])
        assert float(loss) == pytest.approx(2.0)


def test_frame_shuffle_augmentation(rng):
    """frame_perm permutes encoded frames exactly; identity perm is a
    no-op (reference shuffle_frames, seqops/encode.py:175-177)."""
    import jax.numpy as jnp
    import numpy as np

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.train.data import with_frame_shuffle

    cfg = {
        "model": {
            "name": "fs", "seed": 0, "classifier_out_dim": 2,
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated", "embedding_size": 4},
            "string_processor": {"crop_size": 20, "seq_onehot": False},
            "representation_learner": {
                "hidden_layers": [{"name": "masked_conv1d",
                                   "config": {"filters": 4,
                                              "kernel_size": 3}}],
                "pooling": "average",
            },
            "classifier": {"hidden_layers": [
                {"name": "dense", "config": {"units": 2}}]},
        },
        "training": {},
    }
    b = ModelBuilder(cfg)
    model, variables = b.init()
    _, crop_nt = b.crop
    bases = rng.integers(0, 4, size=(3, crop_nt), dtype=np.uint8)
    lengths = np.full(3, crop_nt, np.int32)
    base_in = {"bases": jnp.asarray(bases), "lengths": jnp.asarray(lengths)}

    y0 = model.apply(variables, base_in, train=False)["prediction"]
    ident = jnp.tile(jnp.arange(6, dtype=jnp.int32), (3, 1))
    y1 = model.apply(variables, {**base_in, "frame_perm": ident},
                     train=False)["prediction"]
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    # device-side frame_perm == feeding host-permuted tokens (the model
    # itself is frame-symmetric under mean pooling, so compare via the
    # pre-encoded input path rather than output inequality)
    from jaeger_tpu.ops.encode import encode_frames

    perm_np = np.stack([[5, 4, 3, 2, 1, 0], [2, 0, 1, 4, 5, 3],
                        [0, 1, 2, 3, 4, 5]]).astype(np.int32)
    perm = jnp.asarray(perm_np)
    y2 = model.apply(variables, {**base_in, "frame_perm": perm},
                     train=False)["prediction"]
    tokens = np.asarray(encode_frames(jnp.asarray(bases),
                                      jnp.asarray(lengths),
                                      crop_size=crop_nt))
    permuted = np.take_along_axis(tokens, perm_np[:, :, None], axis=1)
    y3 = model.apply(variables, {"translated": jnp.asarray(permuted)},
                     train=False)["prediction"]
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y3))

    # the batch wrapper emits valid permutations
    batches = with_frame_shuffle(
        iter([{"translated": np.zeros((5, 6, 7)),
               "labels": np.zeros((5, 2))}]), seed=1)
    out = next(batches)
    assert out["frame_perm"].shape == (5, 6)
    assert (np.sort(out["frame_perm"], axis=1) == np.arange(6)).all()


def test_save_path_guard(tmp_path):
    """Foreign content blocks training; own layout, resume and force
    pass (reference nnlib/builder.py:1431-1447)."""
    import pytest

    from jaeger_tpu.commands.train import ensure_save_path_available

    d = tmp_path / "out"
    ensure_save_path_available(d)            # missing dir: fine
    d.mkdir()
    ensure_save_path_available(d)            # empty: fine
    (d / "params.msgpack").write_bytes(b"x")
    (d / "checkpoints").mkdir()
    ensure_save_path_available(d)            # own layout: fine
    (d / "precious_data.h5").write_bytes(b"keep me")
    with pytest.raises(SystemExit):
        ensure_save_path_available(d)        # foreign content: abort
    assert (d / "precious_data.h5").read_bytes() == b"keep me"
    ensure_save_path_available(d, force=True)
    ensure_save_path_available(d, resuming=True)


def test_mixed_precision_training(tmp_path, rng):
    """training.mixed_precision: bfloat16 trains with bf16 compute and
    f32 params (reference mixed_bfloat16 policy)."""
    import numpy as np
    import yaml

    from jaeger_tpu.commands.train import train_fragment_core
    from jaeger_tpu.models.artifacts import load_model

    from tests.test_resume_e2e import _write_fixture

    cfg_path = _write_fixture(tmp_path, rng)
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["training"]["mixed_precision"] = "bfloat16"
    # a second conv so the int8 auto-calibration has a quantizable layer
    # (the embed-folded ENTRY conv intentionally stays bf16)
    cfg["model"]["representation_learner"]["hidden_layers"].append(
        {"name": "masked_conv1d",
         "config": {"filters": 8, "kernel_size": 3, "padding": "same"}})
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    out = tmp_path / "bf16_model"
    r = train_fragment_core(str(cfg_path), output_dir=str(out),
                            use_mesh=False)
    assert r["history"]["classifier"]
    assert np.isfinite(r["history"]["classifier"][-1]["loss"])
    _, variables, _, _ = load_model(out)
    leaf = variables["params"]["classifier"]["dense_0"]["kernel"]
    assert np.asarray(leaf).dtype == np.float32  # params stay f32

    # save_model auto-calibrates the opt-in int8 MXU bundle beside the
    # float weights (model_saving.save_int8, default on) and the CLI's
    # --int8 resolution finds it (docs/int8_qualification.md)
    assert r["int8_path"] == str(out / "int8")
    assert (out / "int8" / "params_int8.msgpack").exists()
    assert (out / "int8" / "quantization.yaml").exists()
    from jaeger_tpu.cli import _resolve_int8_bundle

    assert _resolve_int8_bundle(str(out)) == str(out / "int8")
    _, int8_vars, _, _ = load_model(out / "int8")
    assert "quant" in int8_vars  # int8 MXU execution collection


def test_label_smoothing():
    """Keras CategoricalCrossentropy(label_smoothing) semantics."""
    import numpy as np

    from jaeger_tpu.train.losses import categorical_crossentropy

    y = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1]])
    logits = jnp.asarray([[4.0, 0.0, 0.0], [0.0, 4.0, 0.0]])
    plain = float(categorical_crossentropy(y, logits))
    smooth = float(categorical_crossentropy(y, logits,
                                            label_smoothing=0.1))
    assert smooth > plain  # smoothing penalizes confident logits
    # hand value: y' = [0.9333.., 0.0333.., 0.0333..]
    logp = jax.nn.log_softmax(logits, -1)
    ys = y * 0.9 + 0.1 / 3
    expect = float(-(ys * logp).sum(-1).mean())
    assert smooth == pytest.approx(expect, rel=1e-6)


def test_class_frequency_bias_init(tmp_path, rng):
    """bias_initializer: calculate_from_data sets the head bias to the
    label-frequency log-prior (reference nnlib/builder.py:896-950)."""
    import numpy as np
    import yaml

    from jaeger_tpu.commands.train import train_fragment_core
    from jaeger_tpu.train.data import class_frequency_bias

    from tests.test_resume_e2e import _write_fixture

    cfg_path = _write_fixture(tmp_path, rng)
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["model"]["classifier"]["hidden_layers"][-1]["config"][
        "bias_initializer"] = "calculate_from_data"
    cfg["training"]["classifier_epochs"] = 0  # init only, no training
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    # imbalanced data: 60/20/10
    csv = tmp_path / "train.csv"
    lines = csv.read_text().splitlines()
    rows = [ln for ln in lines if ln[0] == "0"][:30]
    rows += [ln for ln in lines if ln[0] == "1"][:20]
    rows += [ln for ln in lines if ln[0] == "2"][:10]
    csv.write_text("\n".join(rows) + "\n")

    expect = class_frequency_bias(csv, kind="softmax",
                                  label_map=[0, 1, 2])
    np.testing.assert_allclose(
        expect, np.log(np.array([30, 20, 10]) / 60), rtol=1e-6)

    out = tmp_path / "bias_model"
    r = train_fragment_core(str(cfg_path), output_dir=str(out),
                            use_mesh=False, save=False)
    # with 0 epochs the saved-state path is skipped; check via a fresh
    # run's variables by re-invoking the private hook
    from jaeger_tpu.commands.train import _apply_frequency_biases
    from jaeger_tpu.models.builder import ModelBuilder

    b = ModelBuilder(cfg)
    _, variables = b.init()
    v2 = _apply_frequency_biases(
        cfg, variables, [str(csv)], cfg["training"],
        cfg["model"]["string_processor"])
    np.testing.assert_allclose(
        np.asarray(v2["params"]["classifier"]["dense_0"]["bias"]),
        expect, rtol=1e-6)


def test_generate_reliability_train_wiring(tmp_path, rng, caplog):
    """--generate_reliability_data wiring parity (reference
    commands/train.py:895-940): reliability_data_generation's
    raw_csv_paths.{train,val} and output_dir are honored, configured
    fragment_reliability_data paths are ignored with a warning, the
    builder errors clearly when reliability_model has no NMD source,
    and a missing raw CSV raises the reference's guidance."""
    import logging

    import yaml

    from jaeger_tpu.commands.train import train_fragment_core

    from tests.test_resume_e2e import _write_fixture

    cfg_path = _write_fixture(tmp_path, rng)
    cfg = yaml.safe_load(cfg_path.read_text())

    # reliability_model without any NMD tap -> reference's clear error
    cfg["model"]["reliability_model"] = {
        "mode": "nmd",
        "hidden_layers": [{"name": "dense",
                           "config": {"units": 1, "dtype": "float32"}}],
    }
    cfg["training"]["classifier_epochs"] = 1
    cfg["training"]["classifier_train_steps"] = 2
    cfg["training"]["reliability_epochs"] = 1
    cfg["training"]["reliability_train_steps"] = 2
    cfg["training"]["loss_reliability"] = "binary_crossentropy"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    with pytest.raises(ValueError, match="produced no NMD tensor"):
        train_fragment_core(str(cfg_path), output_dir=str(tmp_path / "m0"),
                            use_mesh=False, save=False,
                            generate_reliability=True)

    # add the tap; point generation at dedicated raw CSVs + output_dir
    cfg["model"]["representation_learner"]["hidden_layers"].append(
        {"name": "masked_batchnorm", "config": {"return_nmd": True}})
    raw_train = tmp_path / "raw_train.csv"
    raw_val = tmp_path / "raw_val.csv"
    for path, n in ((raw_train, 40), (raw_val, 12)):
        with open(path, "w") as fh:
            for i in range(n):
                seq = "".join(rng.choice(list("ACGT"), size=100))
                fh.write(f"{i % 3},{seq}\n")
    gen_out = tmp_path / "relgen_custom"
    cfg["training"]["reliability_data_generation"] = {
        "raw_csv_paths": {"train": str(raw_train), "val": str(raw_val)},
        "output_dir": str(gen_out),
        "id_threshold": 0.0,
        "synthetic_ood_threshold": 0.0,
        "synthetic_ood_multiplier": 0.5,
        "inference_batch_size": 16,
    }
    # configured fragment paths must be ignored with a warning
    cfg["training"]["fragment_reliability_data"] = {
        "train": [{"class": ["x"], "path": [str(raw_train)], "label": [0]}],
    }
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    with caplog.at_level(logging.WARNING, logger="jaeger_tpu"):
        r = train_fragment_core(
            str(cfg_path), output_dir=str(tmp_path / "m1"),
            use_mesh=False, save=False, generate_reliability=True)
    assert any("ignoring" in rec.message and "fragment_reliability_data"
               in rec.message for rec in caplog.records)
    assert r["history"]["reliability"]
    # generation landed in the configured output_dir, named per input
    assert (gen_out / "reliability_train.csv").exists()
    assert (gen_out / "reliability_val.csv").exists()
    assert (gen_out / "raw_train_preds.csv").exists()
    assert (gen_out / "raw_val_preds.csv").exists()

    # no raw CSV anywhere -> the reference's guidance error
    cfg["training"]["reliability_data_generation"] = {}
    cfg["training"]["fragment_classifier_data"] = {}
    cfg["training"]["classifier_epochs"] = 0
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    with pytest.raises(ValueError, match="raw_csv_paths.train"):
        train_fragment_core(str(cfg_path), output_dir=str(tmp_path / "m2"),
                            use_mesh=False, save=False,
                            generate_reliability=True)


def test_dvf_template_one_epoch_training(tmp_path, rng):
    """The shipped DVF-style nucleotide template trains end-to-end for
    one epoch and saves a loadable bundle (reference integration parity:
    tests/integration/test_dvf_training.py)."""
    import numpy as np
    import yaml

    from jaeger_tpu.commands.train import train_fragment_core
    from jaeger_tpu.models.artifacts import load_model

    cfg = yaml.safe_load(
        open("train_config/fragment_3class_500bp_dvf.yaml"))
    csv = tmp_path / "train.csv"
    pools = {0: "ATGCATGC", 1: "GGGGCCCC", 2: "AAAATTTT"}
    with open(csv, "w") as fh:
        for i in range(48):
            label = i % 3
            seq = "".join(rng.choice(list(pools[label]), size=500))
            fh.write(f"{label},{seq}\n")
    cfg["training"]["batch_size"] = 16
    cfg["training"]["classifier_epochs"] = 1
    cfg["training"]["classifier_train_steps"] = 3
    cfg["training"]["fragment_classifier_data"] = {
        "train": [{"class": ["a", "b", "c"], "path": [str(csv)],
                   "label": [0, 1, 2]}],
    }
    cfg_path = tmp_path / "dvf.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    out = tmp_path / "dvf_model"
    r = train_fragment_core(str(cfg_path), output_dir=str(out),
                            use_mesh=False)
    assert r["history"]["classifier"]
    assert np.isfinite(r["history"]["classifier"][-1]["loss"])
    model, variables, config, classes = load_model(out)
    import jax.numpy as jnp

    outp = model.apply(
        variables,
        {"bases": jnp.zeros((2, 500), jnp.uint8),
         "lengths": jnp.full((2,), 500, jnp.int32)},
        train=False)
    assert outp["prediction"].shape == (2, 3)
