"""Checkpoint-resume end-to-end (file-level, like the reference's
test_checkpoint_resume): train, stop, resume from disk, continue."""

import numpy as np
import yaml


def _write_fixture(tmp_path, rng):
    csv = tmp_path / "train.csv"
    pools = {0: "ATGCATGC", 1: "GGGGCCCCATGC", 2: "AAAATTTTATGC"}
    with open(csv, "w") as fh:
        for i in range(90):
            label = i % 3
            seq = "".join(rng.choice(list(pools[label]), size=100))
            fh.write(f"{label},{seq}\n")
    cfg = {
        "model": {
            "name": "resume_tiny", "seed": 1, "classifier_out_dim": 3,
            "class_label_map": [
                {"class": "chromosome", "label": 0},
                {"class": "phage", "label": 1},
                {"class": "plasmid", "label": 2},
            ],
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 8},
            "string_processor": {"crop_size": 30, "seq_onehot": False,
                                 "buffer_size": 100,
                                 "classifier_labels": [0, 1, 2],
                                 "classifier_labels_map": [0, 1, 2]},
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 8, "kernel_size": 3}},
                ],
                "pooling": "average",
            },
            "classifier": {
                "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
            },
        },
        "training": {
            "batch_size": 16, "classifier_epochs": 2,
            "classifier_train_steps": 3,
            "optimizer": "adam",
            "optimizer_params": {"learning_rate": 0.01},
            "loss_classifier": "categorical_crossentropy",
            "loss_params_classifier": {"from_logits": True},
            "fragment_classifier_data": {
                "train": [{"class": ["a", "b", "c"],
                           "path": [str(csv)], "label": [0, 1, 2]}],
            },
        },
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    return cfg_path


def test_resume_continues_from_checkpoint(tmp_path, rng):
    from jaeger_tpu.commands.train import train_fragment_core
    from jaeger_tpu.train.checkpoint import CheckpointManager

    cfg_path = _write_fixture(tmp_path, rng)
    out = tmp_path / "model"

    r1 = train_fragment_core(str(cfg_path), output_dir=str(out),
                             use_mesh=False)
    assert (out / "params.msgpack").exists()
    mgr = CheckpointManager(out / "checkpoints" / "classifier")
    assert mgr.latest()["epoch"] == 1

    # resume with a higher epoch target: must start at epoch 2, not 0
    r2 = train_fragment_core(str(cfg_path), output_dir=str(out),
                             epochs_override=4, use_mesh=False,
                             from_last_checkpoint=True)
    epochs_run = [h["epoch"] for h in r2["history"]["classifier"]]
    assert epochs_run == [2, 3]
    assert mgr.latest()["epoch"] == 3

    # training-state file persisted
    state_file = out / "checkpoints" / "classifier" / "training_state.json"
    assert state_file.exists()


def test_convergence_marker_skips_finished_branch(tmp_path, rng):
    from jaeger_tpu.commands.train import train_fragment_core

    cfg_path = _write_fixture(tmp_path, rng)
    out = tmp_path / "model"
    train_fragment_core(str(cfg_path), output_dir=str(out), use_mesh=False)
    marker = out / "checkpoints" / "classifier" / "converged.json"
    assert marker.exists()
    # second run without overrides: classifier branch skipped (no new
    # history entries)
    r2 = train_fragment_core(str(cfg_path), output_dir=str(out),
                             use_mesh=False)
    assert "classifier" not in r2["history"]


def test_train_from_npz_dataset(tmp_path, rng):
    """data_format: numpy path end-to-end: optimize-data -> train."""
    import yaml

    from jaeger_tpu.commands.train import train_fragment_core
    from jaeger_tpu.dataops.convert import convert_dataset

    csv = tmp_path / "train.csv"
    pools = {0: "ATGCATGC", 1: "GGGGCCCCATGC", 2: "AAAATTTTATGC"}
    with open(csv, "w") as fh:
        for i in range(120):
            label = i % 3
            seq = "".join(rng.choice(list(pools[label]), size=100))
            fh.write(f"{label},{seq}\n")
    npz = tmp_path / "train.npz"
    convert_dataset(str(csv), str(npz), crop_size=95, compress="fast",
                    pad=True)

    cfg_path = _write_fixture(tmp_path, rng)
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["model"]["string_processor"]["data_format"] = "numpy"
    cfg["model"]["string_processor"]["crop_size"] = 30
    cfg["training"]["fragment_classifier_data"]["train"] = [
        {"class": ["a", "b", "c"], "path": [str(npz)], "label": [0, 1, 2]}
    ]
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    result = train_fragment_core(
        str(cfg_path), output_dir=str(tmp_path / "npz_model"),
        use_mesh=False,
    )
    assert result["history"]["classifier"]
    assert (tmp_path / "npz_model" / "params.msgpack").exists()


def test_ignore_convergence_retrains(tmp_path, rng):
    """--ignore-convergence retrains a branch the marker says is done."""
    from jaeger_tpu.commands.train import train_fragment_core

    cfg_path = _write_fixture(tmp_path, rng)
    out = tmp_path / "model"
    train_fragment_core(str(cfg_path), output_dir=str(out), use_mesh=False)
    # normal rerun: skipped
    r = train_fragment_core(str(cfg_path), output_dir=str(out),
                            use_mesh=False)
    assert "classifier" not in r["history"]
    # with the flag: trains again
    r2 = train_fragment_core(str(cfg_path), output_dir=str(out),
                             use_mesh=False, ignore_convergence=True)
    assert r2["history"]["classifier"]


def test_head_only_freezes_rep(tmp_path, rng):
    """--only-classification-head: rep/embedding params stay at their
    initial values while the classifier head still trains."""
    import numpy as np

    from flax import serialization

    from jaeger_tpu.commands.train import train_fragment_core
    from jaeger_tpu.models.artifacts import load_model
    from jaeger_tpu.models.builder import ModelBuilder
    import yaml

    cfg_path = _write_fixture(tmp_path, rng)
    cfg = yaml.safe_load(cfg_path.read_text())
    b = ModelBuilder(cfg)
    _, init_vars = b.init()

    out = tmp_path / "headonly"
    train_fragment_core(str(cfg_path), output_dir=str(out),
                        use_mesh=False, only_classification_head=True)
    _, trained, _, _ = load_model(out)

    def leaf(tree, *path):
        for p in path:
            tree = tree[p]
        return np.asarray(tree)

    np.testing.assert_array_equal(
        leaf(init_vars["params"], "rep", "masked_conv1d_0", "kernel"),
        leaf(trained["params"], "rep", "masked_conv1d_0", "kernel"))
    # classifier head DID move
    assert not np.array_equal(
        leaf(init_vars["params"], "classifier", "dense_0", "kernel"),
        leaf(trained["params"], "classifier", "dense_0", "kernel"))


def test_only_save_exports_checkpoint_weights(tmp_path, rng):
    """--only-save: no training happens; the bundle is re-exported from
    the last checkpoint (reference commands/train.py:529,734)."""
    import hashlib

    from jaeger_tpu.commands.train import train_fragment_core

    cfg_path = _write_fixture(tmp_path, rng)
    out = tmp_path / "model"
    train_fragment_core(str(cfg_path), output_dir=str(out), use_mesh=False)
    before = hashlib.sha1((out / "params.msgpack").read_bytes()).hexdigest()
    r = train_fragment_core(str(cfg_path), output_dir=str(out),
                            use_mesh=False, only_save=True,
                            ignore_convergence=True)
    assert not r["history"]  # nothing trained
    after = hashlib.sha1((out / "params.msgpack").read_bytes()).hexdigest()
    assert before == after  # checkpoint weights == saved weights


def test_resume_preserves_trained_frequency_bias(tmp_path, rng):
    """Resuming from a checkpoint must NOT re-apply the class-frequency
    bias initializer over the restored (trained) classifier bias."""
    import yaml

    from jaeger_tpu.commands.train import train_fragment_core
    from jaeger_tpu.train.checkpoint import CheckpointManager

    cfg_path = _write_fixture(tmp_path, rng)
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["model"]["classifier"]["hidden_layers"][0]["config"][
        "bias_initializer"] = "calculate_from_data"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    out = tmp_path / "model"
    train_fragment_core(str(cfg_path), output_dir=str(out), use_mesh=False)
    mgr = CheckpointManager(out / "checkpoints" / "classifier")
    import jax.numpy as jnp
    from jaeger_tpu.models.builder import ModelBuilder

    b = ModelBuilder(cfg)
    _, fresh = b.init()
    entry = mgr.latest()
    restored = mgr.restore(entry, fresh)
    trained_bias = np.asarray(restored["params"]["classifier"]["dense_0"]["bias"])

    # only-save path: restore + export, bias must be the trained one
    r = train_fragment_core(str(cfg_path), output_dir=str(out),
                            use_mesh=False, only_save=True,
                            ignore_convergence=True)
    from jaeger_tpu.models.artifacts import load_model

    _, saved, _, _ = load_model(out)
    np.testing.assert_array_equal(
        np.asarray(saved["params"]["classifier"]["dense_0"]["bias"]),
        trained_bias,
    )


def test_only_reliability_head_skips_classifier(tmp_path, rng):
    """--only-reliability-head trains the reliability branch without
    touching projection/classifier."""
    import yaml

    from jaeger_tpu.commands.train import train_fragment_core

    cfg_path = _write_fixture(tmp_path, rng)
    cfg = yaml.safe_load(cfg_path.read_text())
    # add a reliability head + 1 reliability epoch over the same CSV
    cfg["model"]["representation_learner"]["hidden_layers"].append(
        {"name": "masked_batchnorm", "config": {"return_nmd": True}})
    cfg["model"]["reliability_model"] = {
        "mode": "nmd",
        "hidden_layers": [{"name": "dense", "config": {"units": 1}}],
    }
    csv = cfg["training"]["fragment_classifier_data"]["train"][0]["path"][0]
    cfg["training"]["reliability_epochs"] = 1
    cfg["training"]["reliability_train_steps"] = 2
    cfg["training"]["loss_reliability"] = "binary_crossentropy"
    cfg["training"]["fragment_reliability_data"] = {
        "train": [{"class": ["id"], "path": [csv], "label": [0]}],
    }
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    out = tmp_path / "rel_only"
    r = train_fragment_core(str(cfg_path), output_dir=str(out),
                            use_mesh=False, only_reliability_head=True)
    assert "classifier" not in r["history"]
    assert "reliability" in r["history"]


def test_converged_rerun_preserves_trained_bundle(tmp_path, rng):
    """A rerun whose branches are all convergence-skipped must not
    overwrite the trained params with fresh init."""
    import hashlib

    from jaeger_tpu.commands.train import train_fragment_core

    cfg_path = _write_fixture(tmp_path, rng)
    out = tmp_path / "model"
    train_fragment_core(str(cfg_path), output_dir=str(out), use_mesh=False)
    before = hashlib.sha1((out / "params.msgpack").read_bytes()).hexdigest()
    train_fragment_core(str(cfg_path), output_dir=str(out), use_mesh=False)
    after = hashlib.sha1((out / "params.msgpack").read_bytes()).hexdigest()
    assert before == after


def test_resume_is_bitwise_continuation(tmp_path, rng):
    """Interrupted-then-resumed training equals uninterrupted training
    bit for bit: the optimizer state (Adam moments, schedule step)
    persists with each checkpoint and restores on resume — the reference
    documents NOT restoring moments as a known caveat
    (nnlib/builder.py:166-175); this pins that we beat it."""
    from jaeger_tpu.commands.train import train_fragment_core

    cfg_path = _write_fixture(tmp_path, rng)

    out_a = tmp_path / "uninterrupted"
    train_fragment_core(str(cfg_path), output_dir=str(out_a),
                        epochs_override=4, use_mesh=False)

    out_b = tmp_path / "interrupted"
    train_fragment_core(str(cfg_path), output_dir=str(out_b),
                        epochs_override=2, use_mesh=False)
    train_fragment_core(str(cfg_path), output_dir=str(out_b),
                        epochs_override=4, use_mesh=False,
                        from_last_checkpoint=True)

    a = (out_a / "params.msgpack").read_bytes()
    b = (out_b / "params.msgpack").read_bytes()
    assert a == b


def test_old_checkpoints_without_opt_state_still_resume(tmp_path, rng):
    """Pre-upgrade checkpoints (weights only) resume with fresh moments
    instead of crashing."""
    import json

    from jaeger_tpu.commands.train import train_fragment_core

    cfg_path = _write_fixture(tmp_path, rng)
    out = tmp_path / "model"
    train_fragment_core(str(cfg_path), output_dir=str(out),
                        epochs_override=2, use_mesh=False)
    # strip the opt_path entries, simulating a round-2 checkpoint dir
    idx = out / "checkpoints" / "classifier" / "checkpoints.json"
    entries = json.loads(idx.read_text())
    for e in entries:
        e.pop("opt_path", None)
    idx.write_text(json.dumps(entries))
    r = train_fragment_core(str(cfg_path), output_dir=str(out),
                            epochs_override=3, use_mesh=False,
                            from_last_checkpoint=True)
    assert [h["epoch"] for h in r["history"]["classifier"]] == [2]


def test_mismatched_opt_state_degrades_to_weights_only(tmp_path):
    """If the optimizer config changed between save and resume, the saved
    opt_state no longer matches the fresh template — restore must fall
    back to the fresh template (weights-only resume) instead of raising
    mid-resume (ADVICE r3)."""
    import numpy as np

    from jaeger_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ckpt")
    saved_opt = {"mu": {"w": np.ones((3,), np.float32)},
                 "nu": {"w": np.zeros((3,), np.float32)}}
    mgr.save(1, {"params": {"w": np.ones((3,), np.float32)}},
             metrics={"loss": 1.0}, opt_state=saved_opt)
    entry = mgr.latest()
    assert entry.get("opt_path")

    # different tree structure, as a different optimizer would produce
    fresh = {"trace": {"w": np.zeros((5,), np.float32)},
             "count": np.zeros((), np.int32)}
    restored = mgr.restore_opt_state(entry, fresh)
    assert restored is fresh  # degraded to the fresh template


def test_matching_opt_state_still_restores(tmp_path):
    import numpy as np

    from jaeger_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ckpt")
    saved_opt = {"mu": {"w": np.full((3,), 7.0, np.float32)}}
    mgr.save(1, {"params": {"w": np.ones((3,), np.float32)}},
             opt_state=saved_opt)
    fresh = {"mu": {"w": np.zeros((3,), np.float32)}}
    restored = mgr.restore_opt_state(mgr.latest(), fresh)
    np.testing.assert_allclose(restored["mu"]["w"], 7.0)
