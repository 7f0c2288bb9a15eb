"""Model artifact save/load.

Parity target: the reference's SavedModel export bundle
(``nnlib/builder.py:1495-1579``): graph + ``<name>.weights.h5`` +
``<name>_classes.yaml`` + ``<name>_project.yaml``. The TPU-native bundle is
a directory with:

* ``params.msgpack``   — flax-serialized variables (params + batch_stats)
* ``project.yaml``     — the full training config (reloaded at inference to
  reconstruct the string processor, like reference
  ``nnlib/inference.py:423-483``)
* ``classes.yaml``     — label map
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import yaml
from flax import serialization

from jaeger_tpu.models.builder import ModelBuilder
from jaeger_tpu.utils.config import load_model_config


def save_model(variables, config: dict, path: str | Path,
               classes: dict | None = None) -> Path:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "params.msgpack").write_bytes(serialization.to_bytes(variables))
    # parallel.seq_axis is a RUNTIME knob (sequence-sharded execution
    # needs an ambient mesh), not a model property: strip it so the
    # bundle loads anywhere; predict re-injects it via --seq-shard
    mcfg = config.get("model", config)
    if (mcfg.get("parallel") or {}).get("seq_axis"):
        import copy

        config = copy.deepcopy(config)
        mcfg = config.get("model", config)
        mcfg.get("parallel", {}).pop("seq_axis", None)
        if not mcfg.get("parallel"):
            mcfg.pop("parallel", None)
    (path / "project.yaml").write_text(yaml.safe_dump(config, sort_keys=False))
    if classes is None:
        label_map = config.get("model", {}).get("class_label_map", [])
        classes = {
            int(e["label"]): str(e["class"]) for e in label_map
        } if label_map else {}
    (path / "classes.yaml").write_text(yaml.safe_dump(classes))
    return path


def load_model(path: str | Path, dtype=jnp.float32):
    """Load a model bundle -> (model, variables, config, classes).

    int8 bundles (``utils quantize`` output: ``params_int8.msgpack`` +
    ``quantization.yaml``) load transparently — weights dequantize once
    at load, so ``predict -m`` works on either kind.
    """
    path = Path(path)
    if (path / "params_int8.msgpack").exists() and not (
            path / "params.msgpack").exists():
        from jaeger_tpu.models.conversion import load_quantized

        return load_quantized(path, dtype=dtype)
    config = load_model_config(path / "project.yaml")
    builder = ModelBuilder(config, dtype=dtype)
    model = builder.build()
    _, template = builder.init(batch=1)
    variables = serialization.from_bytes(
        template, (path / "params.msgpack").read_bytes()
    )
    classes_file = path / "classes.yaml"
    classes = (
        yaml.safe_load(classes_file.read_text()) if classes_file.exists() else {}
    )
    return model, variables, config, classes


def class_names_in_order(classes: dict) -> tuple[list[int], list[str]]:
    indices = sorted(int(k) for k in classes)
    return indices, [str(classes[i]) for i in indices]
