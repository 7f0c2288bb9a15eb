"""Convert reference SavedModel checkpoints into jaeger-tpu weights.

SURVEY §7 step 5: TF SavedModel -> JAX pytree, name-mapped per layer.
Covers the legacy WRes family (the architecture of the bundled test graph
``data/models/test/jaeger_fragment_graph`` and the ``default`` model):
``aa`` embedding, ``block1_*``/``block2_*`` shared dilated conv tower with
``bn_*`` batch norms, ``augdense-*``/``outdense`` heads — loaded into
:class:`jaeger_tpu.models.legacy.WResModel` without TensorFlow
(:mod:`jaeger_tpu.models.tf_checkpoint`).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from jaeger_tpu.models.tf_checkpoint import load_checkpoint


def _by_suffix(tensors: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Index tensors by their trailing ``layer/attr`` name."""
    out = {}
    for key, value in tensors.items():
        parts = key.split("/")
        if len(parts) >= 2:
            out["/".join(parts[-2:])] = value
    return out


def convert_wres_h5(h5_path: str | Path, num_res_blocks: int = 5) -> dict:
    """Keras ``.h5`` weight file (e.g. the production ``WRes_1024.h5``
    default model, reference ``data/models/default``) -> WResModel
    variables. The first conv is named ``conv1d`` in the h5."""
    import h5py

    t: dict[str, np.ndarray] = {}
    with h5py.File(h5_path, "r") as f:
        def walk(group, prefix=""):
            for key in group:
                item = group[key]
                if isinstance(item, h5py.Dataset):
                    name = f"{prefix}/{key}".lstrip("/")
                    t[name.removesuffix(":0")] = np.asarray(item)
                else:
                    walk(item, f"{prefix}/{key}")

        walk(f)
    # keys look like 'conv1d/conv1d/kernel'; index by trailing pair
    suffixed = {"/".join(k.split("/")[-2:]): v for k, v in t.items()}
    if "conv1d/kernel" in suffixed and "block1_0/kernel" not in suffixed:
        suffixed["block1_0/kernel"] = suffixed["conv1d/kernel"]
        suffixed["block1_0/bias"] = suffixed["conv1d/bias"]
    return _assemble_wres(suffixed, num_res_blocks)


def convert_wres_checkpoint(saved_model_dir: str | Path,
                            num_res_blocks: int = 5) -> dict:
    """SavedModel variables -> WResModel flax variables dict."""
    t = _by_suffix(load_checkpoint(saved_model_dir))
    return _assemble_wres(t, num_res_blocks)


def _assemble_wres(t: dict[str, np.ndarray], num_res_blocks: int = 5) -> dict:

    def need(name: str) -> jnp.ndarray:
        if name not in t:
            raise KeyError(
                f"tensor {name!r} missing from checkpoint; found "
                f"{sorted(t)[:10]}..."
            )
        return jnp.asarray(t[name])

    params: dict = {
        "aa": {"embedding": need("aa/embeddings")},
        "tower": {
            "block1_0": {"kernel": need("block1_0/kernel"),
                         "bias": need("block1_0/bias")},
            "block1_1": {"kernel": need("block1_1/kernel"),
                         "bias": need("block1_1/bias")},
            "bn1_0": {"scale": need("bn_block1_1/gamma"),
                      "bias": need("bn_block1_1/beta")},
            "bn1_1": {"scale": need("bn_block1_2/gamma"),
                      "bias": need("bn_block1_2/beta")},
        },
        "augdense-1": {"kernel": need("augdense-1/kernel"),
                       "bias": need("augdense-1/bias")},
        "augdense-2": {"kernel": need("augdense-2/kernel"),
                       "bias": need("augdense-2/bias")},
        "outdense": {"kernel": need("outdense/kernel"),
                     "bias": need("outdense/bias")},
    }
    batch_stats: dict = {
        "tower": {
            "bn1_0": {"mean": need("bn_block1_1/moving_mean"),
                      "var": need("bn_block1_1/moving_variance")},
            "bn1_1": {"mean": need("bn_block1_2/moving_mean"),
                      "var": need("bn_block1_2/moving_variance")},
        },
    }
    for n in range(num_res_blocks):
        params["tower"][f"block2_{n}_a"] = {
            "kernel": need(f"block2_{n}1/kernel"),
            "bias": need(f"block2_{n}1/bias"),
        }
        params["tower"][f"block2_{n}_b"] = {
            "kernel": need(f"block2_{n}2/kernel"),
            "bias": need(f"block2_{n}2/bias"),
        }
        params["tower"][f"bn2_{n}_a"] = {
            "scale": need(f"bn_block2_{n}1/gamma"),
            "bias": need(f"bn_block2_{n}1/beta"),
        }
        params["tower"][f"bn2_{n}_b"] = {
            "scale": need(f"bn_block2_{n}2/gamma"),
            "bias": need(f"bn_block2_{n}2/beta"),
        }
        batch_stats["tower"][f"bn2_{n}_a"] = {
            "mean": need(f"bn_block2_{n}1/moving_mean"),
            "var": need(f"bn_block2_{n}1/moving_variance"),
        }
        batch_stats["tower"][f"bn2_{n}_b"] = {
            "mean": need(f"bn_block2_{n}2/moving_mean"),
            "var": need(f"bn_block2_{n}2/moving_variance"),
        }
    return {"params": params, "batch_stats": batch_stats}


def convert_experimental_h5(h5_path: str | Path,
                            num_res_blocks: int = 10,
                            num_classes: int | None = None) -> dict:
    """Keras weights for the legacy v2 ``experimental_*`` architecture ->
    :class:`jaeger_tpu.models.legacy.ExperimentalModel` variables.

    Keras-3 ``save_weights`` names h5 groups by sanitized class
    (``conv1d_3``), not layer name, so this reuses the structural
    matcher that converts modern models
    (:func:`jaeger_tpu.models.modern_convert.map_weights_to_tree`):
    shape signatures disambiguate the tower entry/skip/head layers and
    the Keras creation ordinal orders the repeated ``(3, 256, 256)``
    residual convs, which both layouts emit in the same block order
    (reference ``nnlib/v1/layers.py:686-785``). ``num_classes`` defaults
    to the out-head width found in the file.
    """
    import jax

    from jaeger_tpu.models.legacy import ExperimentalModel
    from jaeger_tpu.models.modern_convert import (
        map_weights_to_tree,
        read_keras_weight_groups,
    )

    groups = read_keras_weight_groups(h5_path)
    if num_classes is None:
        num_classes = 4
        for _path, arrays in groups:
            if (len(arrays) == 2 and arrays[0].ndim == 2
                    and arrays[0].shape[0] == 32
                    and arrays[0].shape[1] != 32):
                num_classes = int(arrays[0].shape[1])
    model = ExperimentalModel(num_classes=num_classes,
                              num_res_blocks=num_res_blocks)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 6, 24, 11), jnp.float32), train=False,
    )

    def to_mutable(d):
        return ({k: to_mutable(v) for k, v in d.items()}
                if isinstance(d, dict) or hasattr(d, "items") else d)

    return map_weights_to_tree(to_mutable(template), groups)
