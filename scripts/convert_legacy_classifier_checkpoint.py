#!/usr/bin/env python3
"""Convert a legacy Jaeger classifier checkpoint to a jaeger-tpu bundle.

Parity target: reference ``scripts/convert_legacy_classifier_checkpoint.py``
— legacy checkpoints (e.g. ``jaeger_d1754a4e_3.4M_fragment.weights.h5``)
were saved from models whose residual stacks were Keras Functional
submodels, so their weight groups live under ``layers/functional[_k]/
layers/residual_block[_j]/{conv1,conv2,bn1,bn2,conv3,bn3}/vars`` and the
head under ``layers/functional_8``. Our structural weight matcher
(``jaeger_tpu.models.modern_convert``) resolves that nested layout
directly — equivalence with the reference script's remapping is pinned
live in ``tests/test_legacy_classifier_script_live.py`` — so this script
is conversion + bundle export: the output directory is a normal
jaeger-tpu model bundle usable with ``jaeger predict -m``.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser(
        description="Convert a legacy Jaeger classifier .weights.h5 "
                    "(functional-submodel layout) to a jaeger-tpu bundle.")
    p.add_argument("--config", required=True,
                   help="Jaeger YAML config describing the architecture.")
    p.add_argument("--legacy-weights", required=True,
                   help="Path to the legacy .weights.h5 file.")
    p.add_argument("--output", required=True,
                   help="Output bundle directory.")
    args = p.parse_args()

    import yaml

    from jaeger_tpu.models.artifacts import save_model
    from jaeger_tpu.models.modern_convert import convert_modern_weights
    from jaeger_tpu.utils.config import load_model_config

    try:
        config = load_model_config(args.config)
    except Exception:
        config = yaml.safe_load(open(args.config))

    # The legacy classifier checkpoint has no reliability/projection
    # weights (reference script drops them before building).
    config.setdefault("model", {}).pop("reliability_model", None)
    config["model"].pop("projection", None)
    config["training"] = {}

    variables = convert_modern_weights(config, args.legacy_weights)
    out = Path(args.output)
    save_model(variables, config, out)
    print(f"Saved converted classifier bundle to {out}")


if __name__ == "__main__":
    main()
