"""The flagship model configuration.

A 1.2M-parameter 6-class fragment model with NMD-merge reliability — the
scale class of the reference's released ``jaeger_*_1.4M_fragment``
checkpoints. Loads the reference's nmd_merge training YAML when the
reference tree is mounted; otherwise falls back to an equivalent inline
config so `bench.py` and `__graft_entry__.py` are self-contained.
"""

from __future__ import annotations

from pathlib import Path

_REFERENCE_CONFIG = Path(
    "/root/reference/train_config/nn_config_1500bp_nmd_merge_6_class_zeus.yaml"
)

_CLASSES = ["phage", "virus", "archaea", "bacteria", "plasmid", "eukarya"]


def _resblock(filters=128, kernel=5, nmd=True):
    entries = [
        {"name": "residual_block",
         "config": {"block_size": 1, "filters": filters,
                    "kernel_size": kernel, "norm_type": "masked_dyt"}},
        {"name": "masked_dyt", "config": {}},
    ]
    if nmd:
        entries.append({"name": "nmd", "config": {}})
    return entries


def _inline_flagship() -> dict:
    layers = [
        {"name": "masked_conv1d",
         "config": {"filters": 128, "kernel_size": 7}},
        {"name": "masked_dyt", "config": {}},
        {"name": "nmd", "config": {}},
    ]
    for _ in range(3):
        layers += _resblock()
    return {
        "model": {
            "name": "jaeger_tpu_flagship",
            "seed": 42,
            "classifier_out_dim": 6,
            "reliability_out_dim": 1,
            "class_label_map": [
                {"class": c, "label": i} for i, c in enumerate(_CLASSES)
            ],
            "embedding": {
                "use_embedding_layer": True,
                "input_type": "translated",
                "embedding_size": 196,
            },
            "string_processor": {"crop_size": 500, "seq_onehot": False},
            "representation_learner": {
                "hidden_layers": layers,
                "pooling": "max",
            },
            "reliability_model": {
                "mode": "nmd",
                "merge": {"mode": "concat"},
                "hidden_layers": [
                    {"name": "dropout", "config": {"rate": 0.1}},
                    {"name": "dense",
                     "config": {"units": 1, "dtype": "float32"}},
                ],
            },
            "classifier": {
                "hidden_layers": [
                    {"name": "dropout", "config": {"rate": 0.3}},
                    {"name": "dense",
                     "config": {"units": 6, "dtype": "float32"}},
                ],
            },
        },
        "training": {},
    }


def flagship_config() -> dict:
    if _REFERENCE_CONFIG.exists():
        from jaeger_tpu.utils.config import load_model_config

        return load_model_config(_REFERENCE_CONFIG)
    return _inline_flagship()
