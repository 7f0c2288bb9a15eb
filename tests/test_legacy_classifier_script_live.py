"""Legacy classifier-checkpoint conversion pinned LIVE.

The reference ships ``scripts/convert_legacy_classifier_checkpoint.py``
to rescue checkpoints saved when residual stacks were Keras Functional
submodels (weight groups ``layers/functional[_k]/layers/
residual_block[_j]/{conv1,bn1,conv2,bn2,conv3,bn3}/vars``, head under
``functional_8`` — reference script:48-181).  Our structural matcher
(:func:`jaeger_tpu.models.modern_convert.convert_modern_weights`) must
resolve that nested layout *directly*, equal to running the reference
script first and converting its output.

This test builds the reference classifier live, randomizes its weights,
writes a genuine legacy-layout ``.weights.h5`` from them, then pins

1. the reference script round-trips it (its converted file reloads into
   a fresh reference classifier with identical forward outputs), and
2. our direct conversion of the LEGACY file equals both the reference
   forward golden and the leaf-for-leaf tree obtained by converting the
   script's output file.
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import sys
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, str(Path(__file__).parent))

import refstubs  # noqa: E402

refstubs.install()

jaeger_ref = pytest.importorskip("jaeger.nnlib.builder")
from jaeger.nnlib.v2.layers import (  # noqa: E402
    MaskedBatchNorm,
    MaskedConv1D,
    ResidualBlockStack,
)

FRAMES, LEN, VOCAB = 6, 34, 65


def _load_ref_script():
    spec = importlib.util.spec_from_file_location(
        "ref_legacy_script",
        "/root/reference/scripts/convert_legacy_classifier_checkpoint.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _config(tmp_path):
    return {
        "model": {
            "name": "legacy_clf", "seed": 3, "classifier_out_dim": 3,
            "activation": "gelu", "mode": "training",
            "reliability_out_dim": 1,
            "class_label_map": [
                {"class": "a", "label": 0}, {"class": "b", "label": 1},
                {"class": "c", "label": 2},
            ],
            "embedding": {
                "use_embedding_layer": True, "input_type": "translated",
                "strands": 2, "frames": FRAMES, "length": None,
                "input_shape": [FRAMES, None], "embedding_size": 8,
            },
            "string_processor": {
                "crop_size": LEN, "crop_units": "codon",
                "seq_onehot": False, "codon": "CODON",
                "codon_id": "CODON_ID",
            },
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 8, "kernel_size": 3}},
                    {"name": "masked_batchnorm"},
                    {"name": "gelu"},
                    {"name": "residual_block",
                     "config": {"block_size": 2, "filters": 12,
                                "kernel_size": 3, "use_1x1conv": True}},
                    {"name": "residual_block",
                     "config": {"block_size": 2, "filters": 12,
                                "kernel_size": 3}},
                ],
                "pooling": "average",
            },
            # present so the script's drop-before-build path is exercised
            "reliability_model": {
                "mode": "nmd",
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 1}}],
            },
            "classifier": {
                "input_shape": 12,
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 6}},
                    {"name": "relu"},
                    {"name": "dense", "config": {"units": 3}},
                ],
            },
        },
        "training": {
            "classifier_dir": str(tmp_path / "ck" / "classifier"),
            "reliability_dir": str(tmp_path / "ck" / "reliability"),
        },
        "force": True,
    }


def _classifier_config(cfg):
    """The mutations the reference script applies before building."""
    import copy

    out = copy.deepcopy(cfg)
    out["model"]["use_masking"] = False
    out["training"] = {}
    out["model"].pop("reliability_model", None)
    out["model"].pop("projection", None)
    return out


def _build_ref_classifier(cfg):
    b = jaeger_ref.DynamicModelBuilder(_classifier_config(cfg))
    with contextlib.redirect_stdout(io.StringIO()):
        models = b.build_fragment_classifier()
    classifier = models["jaeger_classifier"]
    _ = classifier({"translated": tf.zeros((1, FRAMES, LEN))},
                   training=False)
    return models


def _write_legacy_h5(path, models, rng):
    """Randomize the built classifier's weights and write them in the
    legacy Functional-submodel layout the reference script consumes
    (globally incrementing Keras dedup counters, as real legacy saves
    have)."""
    import h5py

    classifier = models["jaeger_classifier"]
    for w in classifier.weights:
        if "variance" in w.path:
            vals = rng.uniform(0.5, 1.5, size=w.shape)
        else:
            vals = rng.uniform(-0.4, 0.4, size=w.shape)
        w.assign(vals.astype("float32"))

    rep = models["rep_model"]
    head = models["classification_head"]
    emb = next(l for l in rep.layers
               if isinstance(l, tf.keras.layers.Embedding))
    conv = next(l for l in rep.layers if isinstance(l, MaskedConv1D))
    bn = next(l for l in rep.layers if isinstance(l, MaskedBatchNorm))
    stacks = [l for l in rep.layers if isinstance(l, ResidualBlockStack)]
    denses = [l for l in head.layers
              if isinstance(l, tf.keras.layers.Dense)]

    def w(h5, group, arrays):
        g = h5.require_group(group + "/vars")
        for i, a in enumerate(arrays):
            g.create_dataset(str(i), data=np.asarray(a))

    with h5py.File(path, "w") as f:
        w(f, "layers/embedding", emb.get_weights())
        w(f, "layers/masked_conv1d", conv.get_weights())
        w(f, "layers/masked_batch_norm", bn.get_weights())
        blk_counter = 0
        for si, stack in enumerate(stacks):
            fkey = "functional" if si == 0 else f"functional_{si}"
            for block in stack.blocks:
                bkey = ("residual_block" if blk_counter == 0
                        else f"residual_block_{blk_counter}")
                blk_counter += 1
                base = f"layers/{fkey}/layers/{bkey}"
                w(f, f"{base}/conv1", block.conv1.get_weights())
                w(f, f"{base}/bn1", block.bn1.get_weights())
                w(f, f"{base}/conv2", block.conv2.get_weights())
                w(f, f"{base}/bn2", block.bn2.get_weights())
                if block.conv3 is not None:
                    w(f, f"{base}/conv3", block.conv3.get_weights())
                    w(f, f"{base}/bn3", block.bn3.get_weights())
        for di, dense in enumerate(denses):
            dkey = "dense" if di == 0 else f"dense_{di}"
            w(f, f"layers/functional_8/layers/{dkey}", dense.get_weights())


def _leaves(tree, path=()):
    out = {}
    for k, v in tree.items():
        if hasattr(v, "items"):
            out.update(_leaves(v, path + (k,)))
        else:
            out[path + (k,)] = np.asarray(v)
    return out


def test_legacy_classifier_conversion_matches_reference_script(tmp_path):
    import yaml

    cfg = _config(tmp_path)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    rng = np.random.default_rng(11)
    models = _build_ref_classifier(cfg)
    legacy_h5 = tmp_path / "legacy.weights.h5"
    _write_legacy_h5(legacy_h5, models, rng)

    toks = rng.integers(1, VOCAB, size=(3, FRAMES, LEN)).astype("int32")
    golden = np.asarray(
        models["jaeger_classifier"]({"translated": toks}, training=False))

    # 1. the reference script round-trips the legacy file
    script = _load_ref_script()
    converted_h5 = tmp_path / "converted.weights.h5"
    with contextlib.redirect_stdout(io.StringIO()):
        script.convert_legacy_classifier_checkpoint(
            str(cfg_path), str(legacy_h5), str(converted_h5))
    models2 = _build_ref_classifier(cfg)
    models2["jaeger_classifier"].load_weights(str(converted_h5))
    reloaded = np.asarray(
        models2["jaeger_classifier"]({"translated": toks}, training=False))
    np.testing.assert_allclose(reloaded, golden, rtol=0, atol=1e-6)

    # 2. our DIRECT conversion of the legacy layout equals the reference
    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.modern_convert import convert_modern_weights

    our_cfg = _classifier_config(cfg)
    ours_direct = convert_modern_weights(our_cfg, legacy_h5)
    ours_via_script = convert_modern_weights(our_cfg, converted_h5)
    a, b = _leaves(ours_direct), _leaves(ours_via_script)
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(
            a[key], b[key],
            err_msg=f"leaf {key} differs between direct legacy "
                    f"conversion and reference-script remap")

    model = ModelBuilder(our_cfg).build()
    out = model.apply(ours_direct, {"translated": toks}, train=False)
    got = np.asarray(out["prediction"], np.float32)
    scale = max(1e-6, float(np.max(np.abs(golden))))
    np.testing.assert_allclose(got, golden, rtol=0, atol=2e-5 * scale)
