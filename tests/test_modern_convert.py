"""Modern-builder Keras-3 ``.weights.h5`` conversion.

No modern weights file ships inside the reference checkout (released
models are download-only), so these tests write fixtures in the Keras-3
object-tree layout (``layers/<snake-case class>/vars/<i>``, variables
trainable-first in creation order) and round-trip them through
``convert_modern_weights``.
"""

import numpy as np
import pytest

from jaeger_tpu.models.builder import ModelBuilder

CONFIG = {
    "model": {
        "name": "modern_tiny", "seed": 7, "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 8},
        "string_processor": {"crop_size": 60, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 3}},
                {"name": "masked_batchnorm", "config": {"return_nmd": True}},
                {"name": "gelu"},
            ],
            "pooling": "average",
        },
        "reliability_model": {
            "mode": "nmd",
            "hidden_layers": [{"name": "dense", "config": {"units": 1}}],
        },
        "classifier": {
            "hidden_layers": [
                {"name": "dense", "config": {"units": 6}},
                {"name": "relu"},
                {"name": "dense", "config": {"units": 3}},
            ],
        },
    },
    "training": {},
}


def _leaves(tree, path=()):
    out = {}
    for k, v in tree.items():
        if hasattr(v, "items"):
            out.update(_leaves(v, path + (k,)))
        else:
            out[path + (k,)] = np.asarray(v)
    return out


def _write_keras3_fixture(h5_path, variables):
    """Write *variables* as a Keras-3 style weights file.

    Group names are snake-case class names with dedup counters, in
    creation order; variable order inside each group is trainable-first
    (kernel/bias, gamma/beta then moving stats), exactly how Keras 3's
    ``save_weights`` lays out the reference's combined Jaeger model.
    """
    import h5py

    p = variables["params"]
    s = variables.get("batch_stats", {})
    entries = [
        ("layers/embedding", [p["embedding"]["embedding"]]),
        ("layers/masked_conv1d",
         [p["rep"]["masked_conv1d_0"]["kernel"],
          p["rep"]["masked_conv1d_0"]["bias"]]),
        ("layers/masked_batch_normalization",
         [p["rep"]["masked_batchnorm_1"]["gamma"],
          p["rep"]["masked_batchnorm_1"]["beta"],
          s["rep"]["masked_batchnorm_1"]["moving_mean"],
          s["rep"]["masked_batchnorm_1"]["moving_variance"]]),
        ("layers/dense",
         [p["classifier"]["dense_0"]["kernel"],
          p["classifier"]["dense_0"]["bias"]]),
        ("layers/dense_1",
         [p["classifier"]["dense_2"]["kernel"],
          p["classifier"]["dense_2"]["bias"]]),
        ("layers/dense_2",
         [p["reliability"]["dense_0"]["kernel"],
          p["reliability"]["dense_0"]["bias"]]),
    ]
    with h5py.File(h5_path, "w") as f:
        for path, arrays in entries:
            g = f.create_group(f"{path}/vars")
            for i, a in enumerate(arrays):
                g.create_dataset(str(i), data=np.asarray(a))
        # training state that must be skipped
        og = f.create_group("optimizer/vars")
        og.create_dataset("0", data=np.zeros((4,), np.float32))


@pytest.fixture()
def src_and_h5(tmp_path):
    import jax

    b = ModelBuilder(CONFIG)
    _, src = b.init(rng=jax.random.PRNGKey(123))
    # make every leaf distinctive (init gives zero biases everywhere);
    # positive values keep moving_variance valid for the forward pass
    rng = np.random.default_rng(0)

    def deep(d):
        return {k: deep(v) if hasattr(v, "items") else v for k, v in d.items()}

    def fill(d):
        for k, v in d.items():
            if hasattr(v, "items"):
                fill(v)
            else:
                d[k] = rng.uniform(0.1, 1.0,
                                   size=np.shape(v)).astype(np.float32)

    mut = deep(src)
    fill(mut)
    h5 = tmp_path / "modern_tiny.weights.h5"
    _write_keras3_fixture(h5, mut)
    return mut, h5


def test_convert_roundtrip_tree_equal(src_and_h5):
    from jaeger_tpu.models.modern_convert import convert_modern_weights

    src, h5 = src_and_h5
    got = convert_modern_weights(CONFIG, h5)
    a, b = _leaves(src), _leaves(got)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=str(k))


def test_convert_forward_equal(src_and_h5):
    import jax.numpy as jnp

    from jaeger_tpu.models.modern_convert import convert_modern_weights

    src, h5 = src_and_h5
    got = convert_modern_weights(CONFIG, h5)
    b = ModelBuilder(CONFIG)
    model = b.build()
    inputs = b.example_inputs(batch=2)
    y1 = model.apply(src, inputs, train=False)
    y2 = model.apply(got, inputs, train=False)
    np.testing.assert_allclose(np.asarray(y1["prediction"], np.float32),
                               np.asarray(y2["prediction"], np.float32))


def test_skips_optimizer_and_errors_on_missing(tmp_path, src_and_h5):
    import h5py

    from jaeger_tpu.models.modern_convert import (
        convert_modern_weights, read_keras_weight_groups,
    )

    src, h5 = src_and_h5
    groups = read_keras_weight_groups(h5)
    assert all("optimizer" not in p for p, _ in groups)
    assert len(groups) == 6

    # drop one layer group -> clear error naming the module
    broken = tmp_path / "broken.weights.h5"
    with h5py.File(h5, "r") as fin, h5py.File(broken, "w") as fout:
        for name in fin["layers"]:
            if name == "masked_conv1d":
                continue
            fin.copy(f"layers/{name}", fout, name=f"layers/{name}")
    with pytest.raises(KeyError, match="masked_conv1d"):
        convert_modern_weights(CONFIG, broken)


def test_legacy_layout_also_reads(tmp_path):
    """TF-Keras layout (named datasets w/ :0) parses into ordered groups."""
    import h5py

    from jaeger_tpu.models.modern_convert import read_keras_weight_groups

    p = tmp_path / "legacy.h5"
    with h5py.File(p, "w") as f:
        g = f.create_group("dense/dense")
        g.create_dataset("bias:0", data=np.zeros((3,), np.float32))
        g.create_dataset("kernel:0", data=np.zeros((4, 3), np.float32))
    groups = read_keras_weight_groups(p)
    assert len(groups) == 1
    path, arrays = groups[0]
    # canonical order: kernel before bias regardless of h5 iteration order
    assert [a.shape for a in arrays] == [(4, 3), (3,)]
