"""Chip A/B: bounded-mask program vs full masked vs dense (flagship).

The bounded program (builder.mask_cut_plan) swaps the runtime mask for a
constant-true mask after the first residual stack; XLA constant-folds
the downstream mask ops. Expected: most of the masked-vs-dense gap
closes (8 of 12 activation-size mask ops fold away). bench.py
discipline: in-program varied RNG, 16 execs per fetch, best of 3.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BS = 2048


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder, mask_cut_plan
    from jaeger_tpu.models.flagship import flagship_config

    cfg = flagship_config()
    plans = mask_cut_plan(cfg["model"]["representation_learner"])
    print("mask_cut_plan:", plans, flush=True)
    cut = plans[0][0]  # tier A: (cut, interior_bound, edge_bound)
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop

    def timeit(mode: str):
        @jax.jit
        def one(variables, seed):
            k1, k2 = jax.random.split(seed)
            bases = jax.random.randint(
                k1, (BS, crop_nt), 0, 4, dtype=jnp.int32).astype(jnp.uint8)
            if mode != "dense":
                # interior 48-base N run (16 codons <= tier-A interior
                # bound 18; start >= 16 keeps it off the window edge,
                # whose tier-A bound is only 6 codons — same placement
                # contract as bench.py's masked row)
                start = jax.random.randint(k2, (BS, 1), 16,
                                           crop_nt - 64, jnp.int32)
                pos = jnp.arange(crop_nt)[None, :]
                bases = jnp.where((pos >= start) & (pos < start + 48),
                                  jnp.uint8(4), bases).astype(jnp.uint8)
            lengths = jnp.full((BS,), crop_nt, jnp.int32)
            kw = {}
            if mode == "dense":
                kw["assume_dense"] = True
            elif mode == "bounded":
                kw["mask_layers"] = cut
            out = model.apply(variables, {"bases": bases, "lengths": lengths},
                              train=False, **kw)
            return jnp.sum(out["prediction"].astype(jnp.float32))

        @jax.jit
        def combine(accs):
            return jnp.sum(jnp.stack(accs))

        _ = float(combine([one(variables, jax.random.PRNGKey(0))]))
        best = float("inf")
        for it in range(3):
            t0 = time.perf_counter()
            accs = [one(variables, jax.random.PRNGKey(it * 16 + j + 1))
                    for j in range(16)]
            _ = float(combine(accs))
            best = min(best, (time.perf_counter() - t0) / 16)
        return best * 1000

    res = {}
    for mode in ("dense", "masked", "bounded"):
        res[mode] = timeit(mode)
        print(f"{mode:8s} {res[mode]:7.2f} ms/2048  "
              f"{BS / res[mode] * 1000:8.0f} windows/s", flush=True)
    print({k: round(v, 2) for k, v in res.items()},
          "bounded/dense =", round(res["dense"] / res["bounded"], 3))


if __name__ == "__main__":
    main()
