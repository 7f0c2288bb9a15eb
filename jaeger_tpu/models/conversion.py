"""Model export and quantization.

Parity targets: reference ``nnlib/conversion.py`` (``utils convert-graph``:
SavedModel -> XLA-wrapped / TFLite / ONNX / TF-TRT) and
``commands/quantize.py`` (TFLite dynamic/float16/int8). On TPU the engine
zoo collapses to one XLA path, so the equivalents are:

* ``export_stablehlo`` — serialize the jitted forward as a portable
  StableHLO artifact via ``jax.export`` (the "graph" export);
* ``quantize_bundle`` — int8 per-channel weight quantization of the
  bundle's matmul/conv kernels (dynamic dequantize at load), the
  size-reduction role of TFLite dynamic quantization;
* precision flags elsewhere map fp16/bf16 requests onto bf16 compute.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from jaeger_tpu.models.artifacts import load_model
from jaeger_tpu.models.builder import ModelBuilder


def export_stablehlo(model_path: str, output_path: str, batch: int = 96,
                     dtype=jnp.bfloat16,
                     platforms: tuple = ("cpu", "tpu")) -> Path:
    """Serialize the model's forward pass as a portable StableHLO
    artifact.

    Lowered for ``platforms`` (CPU + TPU by default), so the artifact is
    the repo's edge/portability story for the reference's ONNX/TFLite
    exports (``nnlib/conversion.py:34-233``): a fresh CPU-only process
    can ``jax.export.deserialize(blob).call(bases, lengths)`` and
    reproduce the bundle's logits with no bundle, config, or TPU —
    round-trip pinned by tests/test_export_roundtrip.py.
    """
    from jax import export as jax_export

    model, variables, config, _ = load_model(model_path, dtype=dtype)
    builder = ModelBuilder(config, dtype=dtype)
    _, crop_nt = builder.crop

    def fwd(bases, lengths):
        out = model.apply(variables, {"bases": bases, "lengths": lengths},
                          train=False)
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    spec_bases = jax.ShapeDtypeStruct((batch, crop_nt), jnp.uint8)
    spec_lengths = jax.ShapeDtypeStruct((batch,), jnp.int32)
    exported = jax_export.export(
        jax.jit(fwd), platforms=list(platforms),
    )(spec_bases, spec_lengths)
    blob = exported.serialize()
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_bytes(blob)
    return output_path


_QUANT_MIN_SIZE = 1024  # don't quantize tiny vectors (biases, norms)


def _quantize_tree(params, prefix=""):
    """Replace large float kernels with {int8 values, scale} dicts."""
    quantized = {}
    meta = {}
    for key, value in params.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            q, m = _quantize_tree(value, path)
            quantized[key] = q
            meta.update(m)
        else:
            arr = np.asarray(value)
            if (
                arr.dtype in (np.float32, np.float64)
                and arr.size >= _QUANT_MIN_SIZE
                and arr.ndim >= 2
            ):
                # per-output-channel symmetric int8
                axes = tuple(range(arr.ndim - 1))
                scale = np.max(np.abs(arr), axis=axes) / 127.0
                scale = np.maximum(scale, 1e-12)
                q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
                quantized[key] = {"_q": q, "_scale": scale.astype(np.float32)}
                meta[path] = arr.shape
            else:
                quantized[key] = arr
    return quantized, meta


def _dequantize_tree(params):
    out = {}
    for key, value in params.items():
        if isinstance(value, dict):
            if "_q" in value:
                out[key] = (
                    value["_q"].astype(np.float32) * value["_scale"]
                )
            else:
                out[key] = _dequantize_tree(value)
        else:
            out[key] = value
    return out


def _calibration_batches(crop_nt: int, n: int = 256, batch: int = 64,
                         seed: int = 0):
    """Synthetic calibration windows (random bases + soft-mask runs), the
    reference's synthetic-one-hot INT8 calibration strategy
    (``nnlib/conversion.py:306`` ``_quantize_onnx_int8``)."""
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=(n, crop_nt)).astype(np.uint8)
    # a quarter of the windows get soft-mask runs so the calibrated range
    # covers masked (zeroed) activations too
    for i in range(0, n, 4):
        lo = int(rng.integers(0, max(1, crop_nt // 2)))
        # clamp the run length so tiny/toy crops (crop_nt <= 20) still
        # calibrate instead of raising low >= high (advisor, round 2)
        run_hi = max(2, crop_nt // 2)
        run_lo = min(10, run_hi - 1)
        hi = lo + int(rng.integers(run_lo, run_hi))
        bases[i, lo:hi] += 5  # soft-masked IDs 5-8
    lengths = np.full((n,), crop_nt, dtype=np.int32)
    for s in range(0, n, batch):
        yield bases[s:s + batch], lengths[s:s + batch]


def _build_quant_tree(params, calib):
    """Mirror the calib tree into {kernel_q, w_scale, act_scale} entries
    keyed by the owning conv module's path."""
    out = {}
    for key, val in calib.items():
        if not isinstance(val, dict):
            continue
        if "absmax" in val and not isinstance(val["absmax"], dict):
            kernel = np.asarray(params[key]["kernel"], dtype=np.float32)
            w_scale = np.max(np.abs(kernel), axis=(0, 1)) / 127.0
            w_scale = np.maximum(w_scale, 1e-12).astype(np.float32)
            kq = np.clip(np.round(kernel / w_scale), -127, 127)
            a_scale = max(float(val["absmax"]) / 127.0, 1e-8)
            out[key] = {
                "kernel_q": kq.astype(np.int8),
                "w_scale": w_scale,
                "act_scale": np.float32(a_scale),
            }
        else:
            sub = _build_quant_tree(params.get(key, {}), val)
            if sub:
                out[key] = sub
    return out


def calibrate_int8(model, variables, crop_nt: int, n: int = 256) -> dict:
    """Run synthetic calibration batches through the float model recording
    each conv input's absmax (``MaskedConv1D``'s ``calib`` sow), then
    quantize those convs' kernels per-channel -> a ``quant`` variables
    collection enabling int8 MXU execution at apply time."""
    calib = None

    def _merge(a, b):
        return jax.tree.map(lambda x, y: np.maximum(np.asarray(x),
                                                    np.asarray(y)), a, b)

    for bases, lengths in _calibration_batches(crop_nt, n=n):
        _, mut = model.apply(
            variables, {"bases": jnp.asarray(bases),
                        "lengths": jnp.asarray(lengths)},
            train=False, mutable=["calib"],
        )
        got = jax.tree.map(np.asarray, mut.get("calib", {}))
        calib = got if calib is None else _merge(calib, got)
    if not calib:
        return {}
    return _build_quant_tree(variables["params"], calib)


def quantize_bundle(model_path: str, output_path: str,
                    mode: str = "dynamic") -> dict:
    """Write a quantized-weight variant of a model bundle.

    ``dynamic`` stores weights int8 + per-channel scales, dequantized at
    load (``load_quantized``); ``full_int8`` additionally calibrates
    activation scales on synthetic windows and stores a ``quant``
    collection that switches the convs to int8 MXU execution at apply
    time (the reference's TFLite/ONNX static-INT8 engines,
    ``nnlib/conversion.py:233-306``); ``float16`` stores bfloat16
    weights (the MXU half-precision format — reference
    ``utils quantize --mode float16``, TFLite zoo replaced).
    Returns size stats.
    """
    import yaml

    model_path = Path(model_path)
    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)

    if mode not in ("dynamic", "full_int8", "float16"):
        raise ValueError(f"unknown quantization mode: {mode}")
    _, variables, config, classes = load_model(model_path)
    if mode == "float16":
        half = jax.tree.map(
            lambda a: (np.asarray(a, dtype=jnp.bfloat16)
                       if np.asarray(a).dtype == np.float32
                       else np.asarray(a)),
            variables["params"])
        payload = {"params": half}
        if "batch_stats" in variables:
            payload["batch_stats"] = jax.tree.map(
                np.asarray, variables["batch_stats"])
        (output_path / "params.msgpack").write_bytes(
            serialization.to_bytes(payload))
        (output_path / "project.yaml").write_text(
            yaml.safe_dump(config, sort_keys=False))
        (output_path / "classes.yaml").write_text(yaml.safe_dump(classes))
        (output_path / "quantization.yaml").write_text(
            yaml.safe_dump({"scheme": "bfloat16-weights"}))
        orig = (model_path / "params.msgpack").stat().st_size
        new = (output_path / "params.msgpack").stat().st_size
        return {"original_bytes": orig, "quantized_bytes": new,
                "ratio": round(orig / max(new, 1), 2), "mode": mode}
    q_params, meta = _quantize_tree(variables["params"])
    payload = {"params": q_params}
    if "batch_stats" in variables:
        payload["batch_stats"] = jax.tree.map(
            np.asarray, variables["batch_stats"]
        )
    scheme = "int8-per-channel-weights"
    quant_convs = 0
    if mode == "full_int8":
        # static quantization: calibrate activation scales at the bf16
        # execution dtype so the stored per-tensor ranges match what the
        # int8 engine will see at predict time
        qbuilder = ModelBuilder(config, dtype=jnp.bfloat16)
        qmodel = qbuilder.build()
        _, crop_nt = qbuilder.crop
        quant = calibrate_int8(qmodel, variables, crop_nt)
        if quant:
            payload["quant"] = quant
            scheme = "int8-exec-static"
            quant_convs = len(jax.tree.leaves(quant)) // 3
    blob = serialization.to_bytes(payload)
    (output_path / "params_int8.msgpack").write_bytes(blob)
    (output_path / "project.yaml").write_text(
        yaml.safe_dump(config, sort_keys=False)
    )
    (output_path / "classes.yaml").write_text(yaml.safe_dump(classes))
    (output_path / "quantization.yaml").write_text(
        yaml.safe_dump({"scheme": scheme,
                        "quantized_kernels": len(meta),
                        "int8_exec_convs": quant_convs})
    )
    orig = (model_path / "params.msgpack").stat().st_size
    new = (output_path / "params_int8.msgpack").stat().st_size
    return {
        "original_bytes": orig, "quantized_bytes": new,
        "ratio": round(orig / max(new, 1), 2),
        "quantized_kernels": len(meta),
        "int8_exec_convs": quant_convs,
    }


def load_quantized(path: str | Path, dtype=jnp.float32):
    """Load an int8 bundle -> (model, dequantized variables, config, classes)."""
    import yaml

    from jaeger_tpu.utils.config import load_model_config

    path = Path(path)
    config = load_model_config(path / "project.yaml")
    builder = ModelBuilder(config, dtype=dtype)
    model = builder.build()
    _, template = builder.init(batch=1)
    raw = serialization.msgpack_restore(
        (path / "params_int8.msgpack").read_bytes()
    )
    params = _dequantize_tree(raw["params"])
    variables = {"params": params}
    if "batch_stats" in raw:
        variables["batch_stats"] = raw["batch_stats"]
    if "quant" in raw:
        # full_int8 bundle: the quant collection flips the convs it covers
        # to int8 MXU execution inside MaskedConv1D (calibrated activation
        # scales; models/layers.py)
        variables["quant"] = raw["quant"]
    classes_file = path / "classes.yaml"
    classes = (
        yaml.safe_load(classes_file.read_text())
        if classes_file.exists() else {}
    )
    return model, variables, config, classes
