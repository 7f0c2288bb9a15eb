#!/usr/bin/env python
"""Derive a variable-length training config from a fixed-length one.

Role parity: reference ``scripts/create_variable_length_config.py`` —
rename the experiment with a suffix and switch the string processor to
dynamic lengths. In jaeger-tpu, variable length is expressed as a
``crop_sizes`` list plus a runtime ``training.crop_mode``
(all/sample/range), which keeps jit shapes static per batch: the model
is built at the max crop and shorter samples are zero-masked
(``jaeger_tpu/train/data.py:apply_crop_mode``).

Usage:
    python scripts/create_variable_length_config.py \
        --base-config cfg.yaml --output cfg_variable.yaml \
        --crop-sizes 160 331 498 [--crop-mode sample]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import yaml


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-config", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--experiment-suffix", default="variable")
    ap.add_argument("--crop-sizes", type=int, nargs="+", required=True,
                    help="codon crops to mix (model builds at the max)")
    ap.add_argument("--crop-mode", default="sample",
                    choices=["all", "sample", "range"])
    args = ap.parse_args()

    cfg = yaml.safe_load(args.base_config.read_text())
    model = cfg.setdefault("model", {})
    suffix = args.experiment_suffix
    model["name"] = f"{model.get('name', 'jaeger').rsplit('_', 1)[0]}_{suffix}"
    if "experiment" in model:
        model["experiment"] = f"{model['experiment']}_{suffix}"

    sp = model.setdefault("string_processor", {})
    sp["crop_size"] = None
    sp["crop_sizes"] = sorted(args.crop_sizes)
    cfg.setdefault("training", {})["crop_mode"] = args.crop_mode

    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_text(yaml.safe_dump(cfg, sort_keys=False))
    print(f"wrote variable-length config to {args.output} "
          f"(crops {sorted(args.crop_sizes)}, mode {args.crop_mode})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
