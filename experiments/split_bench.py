"""Chip numbers for split-mixed execution (infer/engine.py).

Real metagenome batches almost always contain a few masked windows, so
the engine now runs dense-on-all + masked-bucket-on-few instead of the
masked program on everything. This measures the masked program at the
bucket shapes and reports the composite per-batch rate:

    t_split(m) = t_dense(BS) + t_masked(bucket(m))
    vs the old  t_masked(BS)

Usage: python experiments/split_bench.py   (runs on the real chip)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BS = 2048
BUCKETS = (128, 256, 512)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config

    cfg = flagship_config()
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop

    def make(batch: int, dense: bool):
        @jax.jit
        def one(variables, seed):
            k1, k2 = jax.random.split(seed)
            bases = jax.random.randint(
                k1, (batch, crop_nt), 0, 4, dtype=jnp.int32
            ).astype(jnp.uint8)
            if not dense:
                # one soft-mask run per window so the masked program's
                # work is representative
                start = jax.random.randint(k2, (batch, 1), 0,
                                           crop_nt - 64, jnp.int32)
                pos = jnp.arange(crop_nt)[None, :]
                bases = jnp.where((pos >= start) & (pos < start + 48),
                                  bases + 5, bases).astype(jnp.uint8)
            lengths = jnp.full((batch,), crop_nt, jnp.int32)
            kw = {"assume_dense": True} if dense else {}
            out = model.apply(variables, {"bases": bases,
                                          "lengths": lengths},
                              train=False, **kw)
            return jnp.sum(out["prediction"].astype(jnp.float32))

        @jax.jit
        def combine(accs):
            return jnp.sum(jnp.stack(accs))

        # bench.py methodology: 16 full-size execs per fetch, best of 3
        # rounds (the relay's run-to-run drift is +-20%; 4-exec rounds
        # measured dense SLOWER than masked, which is nonsense)
        n_execs = max(16, (BS // batch) * 16)
        _ = float(combine([one(variables, jax.random.PRNGKey(0))]))
        best = float("inf")
        for it in range(3):
            t0 = time.perf_counter()
            accs = [one(variables,
                        jax.random.PRNGKey(it * n_execs + j + 1))
                    for j in range(n_execs)]
            _ = float(combine(accs))
            best = min(best, (time.perf_counter() - t0) / n_execs)
        return best * 1000  # ms/exec

    t_dense = make(BS, True)
    t_masked = make(BS, False)
    res = {"dense_ms": round(t_dense, 2), "masked_ms": round(t_masked, 2),
           "masked_windows_per_s": round(BS / t_masked * 1000, 1),
           "buckets": {}}
    for b in BUCKETS:
        tb = make(b, False)
        comp_ms = t_dense + tb
        res["buckets"][b] = {
            "bucket_ms": round(tb, 2),
            "split_ms_per_batch": round(comp_ms, 2),
            "split_windows_per_s": round(BS / comp_ms * 1000, 1),
            "vs_all_masked": round(t_masked / comp_ms, 3),
        }
        print(f"bucket {b}: {tb:.1f} ms -> split "
              f"{BS / comp_ms * 1000:,.0f} w/s "
              f"({t_masked / comp_ms:.2f}x all-masked)", flush=True)

    # int8 split composite (`predict --int8` on real inputs): the fastest
    # real-input path. Calibration on the host CPU backend (bench.py's
    # trick), then the int8 dense program + int8 bs/16 masked bucket.
    if "--int8" in sys.argv:
        from jaeger_tpu.models.conversion import calibrate_int8

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            import numpy as np

            cpu_vars = jax.tree.map(np.asarray, variables)
            quant = calibrate_int8(model, cpu_vars, crop_nt, n=128)
        int8_vars = dict(variables)
        int8_vars["quant"] = jax.device_put(
            jax.tree.map(np.asarray, quant))
        variables = int8_vars
        t8_dense = make(BS, True)
        t8_bucket = make(BS // 16, False)
        comp8 = t8_dense + t8_bucket
        res["int8"] = {
            "dense_ms": round(t8_dense, 2),
            "bucket_ms": round(t8_bucket, 2),
            "split_windows_per_s": round(BS / comp8 * 1000, 1),
        }
        print(f"int8 split: {BS / comp8 * 1000:,.0f} w/s", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
