"""int8 MXU execution path (opt-in static quantization).

Parity role: the reference's TFLite full-int8 / ONNX static-INT8 engines
(``nnlib/conversion.py:233-306``, ``commands/quantize.py``) — quantized
*execution*, not just int8 weight storage. Here ``utils quantize --mode
full_int8`` calibrates per-conv activation scales on synthetic windows
(the reference's synthetic-calibration strategy) and stores a ``quant``
collection; ``MaskedConv1D`` switches to int8xint8->int32 convolution
when its entry is present (models/layers.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jaeger_tpu.models.artifacts import save_model
from jaeger_tpu.models.builder import ModelBuilder

CFG = {
    "model": {
        "name": "conv_int8",
        "seed": 0,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 16},
        "string_processor": {"crop_size": 62, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 32, "kernel_size": 5,
                            "padding": "same"}},
                {"name": "gelu"},
                {"name": "masked_conv1d",
                 "config": {"filters": 32, "kernel_size": 3,
                            "padding": "same", "dilation_rate": 3}},
                {"name": "gelu"},
                {"name": "masked_conv1d",
                 "config": {"filters": 32, "kernel_size": 3,
                            "padding": "same"}},
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
def int8_bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("int8")
    b = ModelBuilder(CFG)
    model, variables = b.init()
    path = tmp / "model"
    save_model(variables, CFG, path)

    from jaeger_tpu.models.conversion import quantize_bundle

    stats = quantize_bundle(path, tmp / "q", mode="full_int8")
    return path, model, variables, b, tmp / "q", stats


def _windows(b, n=8, seed=0, short=False):
    _, crop_nt = b.crop
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=(n, crop_nt)).astype(np.uint8)
    lengths = np.full((n,), crop_nt, np.int32)
    if short:
        lengths = rng.integers(crop_nt // 2, crop_nt + 1,
                               size=(n,)).astype(np.int32)
        for i, ln in enumerate(lengths):
            bases[i, ln:] = 4  # N-pad past the window end
    return {"bases": bases, "lengths": lengths}


def test_full_int8_calibrates_exec_convs(int8_bundle):
    import yaml

    path, model, variables, b, qpath, stats = int8_bundle
    assert stats["int8_exec_convs"] >= 2  # the non-folded convs
    meta = yaml.safe_load((qpath / "quantization.yaml").read_text())
    assert meta["scheme"] == "int8-exec-static"


def test_dynamic_mode_has_no_exec_quant(int8_bundle, tmp_path):
    from jaeger_tpu.models.conversion import load_quantized, quantize_bundle

    path = int8_bundle[0]
    stats = quantize_bundle(path, tmp_path / "dyn", mode="dynamic")
    assert stats["int8_exec_convs"] == 0
    _, qvars, _, _ = load_quantized(tmp_path / "dyn")
    assert "quant" not in qvars


@pytest.mark.parametrize("short", [False, True])
def test_int8_exec_close_to_float(int8_bundle, short):
    from jaeger_tpu.models.conversion import load_quantized

    path, model, variables, b, qpath, _ = int8_bundle
    qmodel, qvars, _, _ = load_quantized(qpath, dtype=jnp.bfloat16)
    assert "quant" in qvars
    inputs = _windows(b, n=16, seed=1, short=short)
    ref = np.asarray(
        model.apply(variables, inputs, train=False)["prediction"],
        np.float32)
    out = np.asarray(
        qmodel.apply(qvars, inputs, train=False)["prediction"], np.float32)
    # int8 activations+weights: quantization error bounded, calls stable
    assert np.max(np.abs(out - ref)) < 0.35
    assert (np.argmax(out, -1) == np.argmax(ref, -1)).mean() >= 0.9


def test_quant_collection_survives_load_model(int8_bundle):
    """predict's transparent loader returns the exec collection."""
    from jaeger_tpu.models.artifacts import load_model

    qpath = int8_bundle[4]
    _, qvars, _, _ = load_model(qpath, dtype=jnp.bfloat16)
    assert "quant" in qvars


def test_calib_collection_does_not_leak(int8_bundle):
    """Normal init/apply never materialize the calib sow."""
    path, model, variables, b, qpath, _ = int8_bundle
    assert "calib" not in variables
    out = model.apply(variables, _windows(b, n=2), train=False)
    assert np.isfinite(np.asarray(out["prediction"], np.float32)).all()


def test_cli_quantize_full_int8(int8_bundle, tmp_path):
    """utils quantize --mode full_int8 end-to-end through click (forces
    the CPU platform for calibration — a host-side packaging tool)."""
    import yaml
    from click.testing import CliRunner

    from jaeger_tpu import cli as cli_mod

    path = int8_bundle[0]
    res = CliRunner().invoke(
        cli_mod.main,
        ["utils", "quantize", "-m", str(path),
         "-o", str(tmp_path / "cliq"), "--mode", "full_int8"])
    assert res.exit_code == 0, res.output
    meta = yaml.safe_load((tmp_path / "cliq" / "quantization.yaml")
                          .read_text())
    assert meta["scheme"] == "int8-exec-static"


def test_stablehlo_export_of_int8_bundle(int8_bundle, tmp_path):
    """utils convert-graph --int8: the exported program embeds the int8
    convs (export loads the bundle's quant collection transparently)."""
    from jaeger_tpu.models.conversion import export_stablehlo

    qpath = int8_bundle[4]
    out = export_stablehlo(qpath, tmp_path / "g.stablehlo", batch=2)
    assert out.exists() and out.stat().st_size > 0


def test_int8_exec_on_mesh_matches_single(int8_bundle):
    """The quant collection replicates across the data mesh (SPMD int8)."""
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.models.conversion import load_quantized
    from jaeger_tpu.parallel import mesh as meshlib

    path, model, variables, b, qpath, _ = int8_bundle
    qmodel, qvars, _, _ = load_quantized(qpath, dtype=jnp.bfloat16)
    inputs = _windows(b, n=16, seed=3)
    single = InferenceEngine(qmodel, qvars, batch_size=16)
    mesh = meshlib.data_mesh()
    sharded = InferenceEngine(qmodel, qvars, batch_size=16, mesh=mesh)
    a = np.asarray(
        single.predict_windows(inputs["bases"], inputs["lengths"])
        ["prediction"], np.float32)
    bb = np.asarray(
        sharded.predict_windows(inputs["bases"], inputs["lengths"])
        ["prediction"], np.float32)
    np.testing.assert_allclose(a, bb, rtol=0, atol=1e-2)


def test_int8_exec_through_engine(int8_bundle):
    """The inference engine runs a full_int8 bundle end-to-end."""
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.models.conversion import load_quantized

    path, model, variables, b, qpath, _ = int8_bundle
    qmodel, qvars, _, _ = load_quantized(qpath, dtype=jnp.bfloat16)
    eng = InferenceEngine(qmodel, qvars, batch_size=8)
    inputs = _windows(b, n=8, seed=2)
    outs = eng.predict_windows(inputs["bases"], inputs["lengths"])
    pred = np.asarray(outs["prediction"], np.float32)
    assert pred.shape[0] == 8
    assert np.isfinite(pred).all()


def test_int8_split_mixed_matches_unsplit(int8_bundle):
    """Split-mixed execution with a quant collection: the int8 dense
    program + int8 masked bucket equal the plain int8 masked program on
    a mostly-dense batch with scattered N windows."""
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.models.conversion import load_quantized

    _, _, _, b, qpath, _ = int8_bundle
    qmodel, qvars, _, _ = load_quantized(qpath, dtype=jnp.bfloat16)
    inputs = _windows(b, n=32, seed=7)
    bases = np.asarray(inputs["bases"]).copy()
    _, crop_nt = b.crop
    bases[3, crop_nt // 2] = 4
    bases[20, 1] = 4

    eng = InferenceEngine(qmodel, qvars, batch_size=16)
    ref = InferenceEngine(qmodel, qvars, batch_size=16,
                          split_mixed=False)
    out = eng.predict_windows(bases, inputs["lengths"])
    out_ref = ref.predict_windows(bases, inputs["lengths"])
    shapes = [k[0] for k in eng._compiled
              if isinstance(k, tuple) and isinstance(k[0], tuple)]
    assert any(s[0] < 16 for s in shapes)  # the bucket really ran
    np.testing.assert_allclose(
        np.asarray(out["prediction"], np.float32),
        np.asarray(out_ref["prediction"], np.float32),
        rtol=1e-4, atol=1e-4)


def test_int8_branch_skipped_at_train_time(int8_bundle):
    """train=True must run the float path so the conv kernel params keep
    a live gradient (advisor r2: kernel_q is a constant — training through
    the int8 branch silently starves the kernel of gradient)."""
    import jax

    path, model, variables, b, qpath, _ = int8_bundle
    from jaeger_tpu.models.conversion import load_quantized

    qmodel, qvars, _, _ = load_quantized(qpath, dtype=jnp.float32)
    inputs = _windows(b, n=4, seed=5)

    def loss(params):
        out = qmodel.apply(
            {**qvars, "params": params}, inputs, train=True)
        return jnp.sum(out["prediction"].astype(jnp.float32))

    grads = jax.grad(loss)(qvars["params"])
    leaves = [
        np.asarray(g) for p, g in jax.tree_util.tree_leaves_with_path(grads)
        if any(getattr(k, "key", "") == "kernel" for k in p)
    ]
    assert leaves and any(np.abs(g).max() > 0 for g in leaves)

    # inference (train=False) still takes the int8 branch: the same
    # kernels get exactly zero gradient there
    def loss_inf(params):
        out = qmodel.apply(
            {**qvars, "params": params}, inputs, train=False)
        return jnp.sum(out["prediction"].astype(jnp.float32))

    gi = jax.grad(loss_inf)(qvars["params"])
    # at least one non-folded conv kernel is int8 at inference
    zeroed = [
        np.asarray(g) for p, g in jax.tree_util.tree_leaves_with_path(gi)
        if any(getattr(k, "key", "") == "kernel" for k in p)
    ]
    assert any(np.abs(g).max() == 0 for g in zeroed)


def test_full_int8_calibrates_tiny_crop(tmp_path):
    """crop_nt <= 20 must calibrate instead of raising low >= high
    (advisor r2, models/conversion.py _calibration_batches)."""
    import copy

    from jaeger_tpu.models.conversion import quantize_bundle

    cfg = copy.deepcopy(CFG)
    cfg["model"]["string_processor"]["crop_size"] = 4  # crop_nt = 17
    cfg["model"]["name"] = "conv_int8_tiny"
    b = ModelBuilder(cfg)
    model, variables = b.init()
    path = tmp_path / "tiny"
    save_model(variables, cfg, path)
    stats = quantize_bundle(path, tmp_path / "q", mode="full_int8")
    assert stats["int8_exec_convs"] >= 1


def test_int8_auto_engine_routing(int8_bundle):
    """`--int8 auto` (engine int8_variables): dense batches run the int8
    program, batches with short/masked windows run the float program —
    outputs match the corresponding single-mode engines exactly."""
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.models.conversion import load_quantized

    path, model, variables, b, qpath, _ = int8_bundle
    qmodel, qvars, _, _ = load_quantized(qpath, dtype=jnp.bfloat16)

    auto = InferenceEngine(model, variables, batch_size=8,
                           int8_variables=qvars)
    flt = InferenceEngine(model, variables, batch_size=8)
    full8 = InferenceEngine(model, qvars, batch_size=8)

    dense_in = _windows(b, n=8, seed=3)
    out_auto = auto.predict_windows(dense_in["bases"], dense_in["lengths"])
    out_int8 = full8.predict_windows(dense_in["bases"], dense_in["lengths"])
    out_flt = flt.predict_windows(dense_in["bases"], dense_in["lengths"])
    for k in out_auto:
        assert np.array_equal(out_auto[k], out_int8[k]), k
    # the int8 program really differs from float (routing is observable)
    assert not all(np.array_equal(out_int8[k], out_flt[k])
                   for k in out_int8)

    short_in = _windows(b, n=8, seed=4, short=True)
    # ensure at least one genuinely short window (masked path)
    short_in["lengths"][0] = short_in["lengths"][0] // 2
    short_in["bases"][0, short_in["lengths"][0]:] = 4
    out_auto_s = auto.predict_windows(short_in["bases"],
                                      short_in["lengths"])
    out_flt_s = flt.predict_windows(short_in["bases"], short_in["lengths"])
    for k in out_auto_s:
        assert np.array_equal(out_auto_s[k], out_flt_s[k]), k
