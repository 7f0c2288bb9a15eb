"""Lowering forms for the conv pre-zero multiply (the last 15.3 ms of
the masked program's gap to dense, experiments/masked_breakdown.py).

Candidates, all exact:
  mul     x * mask[..., None].astype(x.dtype)      (current apply_mask)
  where   jnp.where(mask[..., None], x, 0)
  mulpre  x * pre-broadcast bf16 mask (materialized once per level)

Measured in context: full flagship masked forward with apply_mask
patched to each form (same harness discipline as masked_breakdown).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from experiments.masked_breakdown import (_variant_module, build_with,  # noqa: E402
                                          timeit)

_WHERE = [(
    "    return x * mask[..., None].astype(x.dtype)",
    "    return jnp.where(mask[..., None], x, jnp.zeros((), x.dtype))",
)]


def main() -> None:
    from jaeger_tpu.models import layers as real_layers

    variants = [
        ("mul (current)", real_layers),
        ("where", _variant_module("whereform", _WHERE)),
    ]
    for name, mod in variants:
        model, variables, crop_nt, unpatch = build_with(mod)
        try:
            ms = timeit(model, variables, crop_nt, dense=False)
        finally:
            unpatch()
        print(f"{name:14s} {ms:7.2f} ms/2048", flush=True)


if __name__ == "__main__":
    main()
