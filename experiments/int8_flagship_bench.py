"""Chip bench: the FULL flagship model under int8 MXU execution.

The isolated conv-chain probe (`int8_conv_bench.py`) measured 1.18x for
int8 execution; this measures the real thing — the flagship forward with
its calibrated full_int8 quant collection (entry conv stays bf16 because
the embed fold owns it; the 12 dilated convs run int8xint8->int32 with
per-layer requantization) against the shipped bf16 program.

Two phases so calibration never pays remote-compile cost:
  python experiments/int8_flagship_bench.py prep   # CPU: calibrate -> /tmp
  python experiments/int8_flagship_bench.py run    # chip: time int8 vs bf16
"""

from __future__ import annotations

import json
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUANT_PATH = Path("/tmp/jaeger_int8_flagship.pkl")
BATCH = 2048
N_EXECS = 16


def prep() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.conversion import calibrate_int8
    from jaeger_tpu.models.flagship import flagship_config

    cfg = flagship_config()
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop
    quant = calibrate_int8(model, variables, crop_nt, n=128)
    payload = {
        "quant": jax.tree.map(np.asarray, quant),
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(
            np.asarray, variables.get("batch_stats", {})),
        "crop_nt": crop_nt,
    }
    QUANT_PATH.write_bytes(pickle.dumps(payload))
    n_convs = len(jax.tree.leaves(quant)) // 3
    print(f"calibrated {n_convs} convs -> {QUANT_PATH}")


def run() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config

    payload = pickle.loads(QUANT_PATH.read_bytes())
    cfg = flagship_config()
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model = builder.build()
    crop_nt = payload["crop_nt"]
    base_vars = {"params": payload["params"]}
    if payload["batch_stats"]:
        base_vars["batch_stats"] = payload["batch_stats"]
    int8_vars = dict(base_vars)
    int8_vars["quant"] = payload["quant"]

    def make_fn():
        @jax.jit
        def one_batch(variables, seed):
            bases = jax.random.randint(
                seed, (BATCH, crop_nt), 0, 4, dtype=jnp.int32
            ).astype(jnp.uint8)
            lengths = jnp.full((BATCH,), crop_nt, jnp.int32)
            out = model.apply(
                variables, {"bases": bases, "lengths": lengths},
                train=False, assume_dense=True,
            )
            return jnp.sum(out["prediction"].astype(jnp.float32))
        return one_batch

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    results = {}
    for name, variables in (("bf16", base_vars), ("int8", int8_vars)):
        # resident on device before timing: numpy args would otherwise pay
        # a host->device upload per call (asymmetric across the two trees)
        variables = jax.device_put(variables)
        fn = make_fn()
        t0 = time.perf_counter()
        _ = float(combine([fn(variables, jax.random.PRNGKey(0))]))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        iters = 2
        t0 = time.perf_counter()
        for i in range(iters):
            accs = [fn(variables, jax.random.PRNGKey(i * N_EXECS + j + 1))
                    for j in range(N_EXECS)]
            _ = float(combine(accs))
        dt = (time.perf_counter() - t0) / iters
        wps = BATCH * N_EXECS / dt
        results[name] = wps
        print(f"{name}: {wps:,.0f} windows/s "
              f"({dt / N_EXECS * 1000:.1f} ms/{BATCH})")
    print(json.dumps({
        "bf16_windows_per_s": round(results["bf16"], 1),
        "int8_windows_per_s": round(results["int8"], 1),
        "speedup": round(results["int8"] / results["bf16"], 3),
    }))


if __name__ == "__main__":
    {"prep": prep, "run": run}[sys.argv[1]]()
