"""Export + quantization tests."""

import numpy as np
import pytest

from jaeger_tpu.models.artifacts import save_model
from jaeger_tpu.models.builder import ModelBuilder

CFG = {
    "model": {
        "name": "conv_tiny",
        "seed": 0,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 16},
        "string_processor": {"crop_size": 40, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 32, "kernel_size": 5}},
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
def bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bundle")
    b = ModelBuilder(CFG)
    model, variables = b.init()
    path = tmp / "model"
    save_model(variables, CFG, path)
    return path, model, variables, b


def test_quantize_roundtrip(bundle, tmp_path):
    from jaeger_tpu.models.conversion import load_quantized, quantize_bundle

    path, model, variables, b = bundle
    stats = quantize_bundle(path, tmp_path / "q")
    assert stats["quantized_kernels"] >= 1
    assert stats["ratio"] > 1.5  # int8 vs f32

    qmodel, qvars, config, classes = load_quantized(tmp_path / "q")
    _, crop_nt = b.crop
    rng = np.random.default_rng(0)
    inputs = {
        "bases": rng.integers(0, 4, size=(4, crop_nt), dtype=np.uint8),
        "lengths": np.full(4, crop_nt, np.int32),
    }
    ref = np.asarray(model.apply(variables, inputs, train=False)["prediction"])
    out = np.asarray(qmodel.apply(qvars, inputs, train=False)["prediction"])
    # int8 weight quantization: small relative error on logits
    assert np.max(np.abs(out - ref)) < 0.15
    assert (np.argmax(out, -1) == np.argmax(ref, -1)).all()


def test_int8_bundle_loads_via_load_model(bundle, tmp_path):
    """predict's loader handles int8 bundles transparently."""
    from jaeger_tpu.models.artifacts import load_model
    from jaeger_tpu.models.conversion import quantize_bundle

    path, model, variables, b = bundle
    quantize_bundle(path, tmp_path / "q8")
    qmodel, qvars, config, classes = load_model(tmp_path / "q8")
    _, crop_nt = b.crop
    rng = np.random.default_rng(1)
    inputs = {
        "bases": rng.integers(0, 4, size=(4, crop_nt), dtype=np.uint8),
        "lengths": np.full(4, crop_nt, np.int32),
    }
    ref = np.asarray(model.apply(variables, inputs, train=False)["prediction"])
    out = np.asarray(qmodel.apply(qvars, inputs, train=False)["prediction"])
    assert np.max(np.abs(out - ref)) < 0.15
    assert config["model"]["name"] == "conv_tiny"


def test_export_stablehlo(bundle, tmp_path):
    from jaeger_tpu.models.conversion import export_stablehlo

    path, *_ = bundle
    out = export_stablehlo(path, tmp_path / "model.stablehlo", batch=4)
    blob = out.read_bytes()
    assert len(blob) > 1000
    # deserializes and runs
    from jax import export as jax_export

    rehydrated = jax_export.deserialize(bytearray(blob))
    rng = np.random.default_rng(0)
    res = rehydrated.call(
        rng.integers(0, 4, size=(4, 125), dtype=np.uint8),
        np.full(4, 125, np.int32),
    )
    assert res["prediction"].shape == (4, 3)
