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
                     dtype=jnp.bfloat16) -> Path:
    """Serialize the model's forward pass as a StableHLO artifact."""
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
    exported = jax_export.export(jax.jit(fwd))(spec_bases, spec_lengths)
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


def quantize_bundle(model_path: str, output_path: str,
                    mode: str = "dynamic") -> dict:
    """Write a quantized-weight variant of a model bundle.

    ``dynamic``/``full_int8`` store weights int8 + per-channel scales,
    dequantized at load (``load_quantized``); ``float16`` stores
    bfloat16 weights (the MXU half-precision format — reference
    ``utils quantize --mode float16``, TFLite zoo replaced). Activations
    stay bf16/f32. Returns size stats.
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
    blob = serialization.to_bytes(payload)
    (output_path / "params_int8.msgpack").write_bytes(blob)
    (output_path / "project.yaml").write_text(
        yaml.safe_dump(config, sort_keys=False)
    )
    (output_path / "classes.yaml").write_text(yaml.safe_dump(classes))
    (output_path / "quantization.yaml").write_text(
        yaml.safe_dump({"scheme": "int8-per-channel-weights",
                        "quantized_kernels": len(meta)})
    )
    orig = (model_path / "params.msgpack").stat().st_size
    new = (output_path / "params_int8.msgpack").stat().st_size
    return {
        "original_bytes": orig, "quantized_bytes": new,
        "ratio": round(orig / max(new, 1), 2),
        "quantized_kernels": len(meta),
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
    classes_file = path / "classes.yaml"
    classes = (
        yaml.safe_load(classes_file.read_text())
        if classes_file.exists() else {}
    )
    return model, variables, config, classes
