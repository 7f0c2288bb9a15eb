"""Attribute the dense-path gap: built flagship 112 ms vs 96 ms floor.

Times the BUILT model (assume_dense) against config-ablated variants:
  - full            : flagship as shipped (4 NMD taps + reliability MLP)
  - no_reliability  : NMD taps kept, reliability head stripped
  - no_nmd          : all `nmd` taps + reliability stripped
  - full@4096       : batch scaling check

Each variant is ONE jitted program with varied inputs (the harness relay
memoizes identical executions). Run on the chip:  python experiments/gap_probe.py
"""

from __future__ import annotations

import copy
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, variables, batch, crop_nt, n_iters=2, n_execs=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    jfn = jax.jit(fn)
    _ = float(combine([jfn(variables, 0)]))
    t0 = time.perf_counter()
    for i in range(n_iters):
        _ = float(combine(
            [jfn(variables, i * n_execs + j + 1) for j in range(n_execs)]
        ))
    return (time.perf_counter() - t0) / n_iters / n_execs


def strip(cfg, *, nmd=False, reliability=False):
    cfg = copy.deepcopy(cfg)
    m = cfg["model"]
    if reliability or nmd:
        m.pop("reliability_model", None)
    if nmd:
        hl = m["representation_learner"]["hidden_layers"]
        m["representation_learner"]["hidden_layers"] = [
            e for e in hl if e.get("name") != "nmd"
        ]
    return cfg


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config

    base_cfg = flagship_config()
    variants = [
        ("full", base_cfg, 2048),
        ("no_reliability", strip(base_cfg, reliability=True), 2048),
        ("no_nmd", strip(base_cfg, nmd=True), 2048),
        ("full@4096", base_cfg, 4096),
    ]

    for name, cfg, batch in variants:
        builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
        model, variables = builder.init(batch=1)
        _, crop_nt = builder.crop

        def fwd(variables, seed, _model=model, _b=batch, _nt=crop_nt):
            bases = jax.random.randint(
                jax.random.PRNGKey(seed), (_b, _nt), 0, 4, dtype=jnp.int32
            ).astype(jnp.uint8)
            lengths = jnp.full((_b,), _nt, jnp.int32)
            out = _model.apply(
                variables, {"bases": bases, "lengths": lengths},
                train=False, assume_dense=True,
            )
            acc = jnp.sum(out["prediction"].astype(jnp.float32))
            if "reliability" in out:
                acc += jnp.sum(out["reliability"].astype(jnp.float32))
            return acc

        dt = timeit(fwd, variables, batch, crop_nt)
        print(f"{name:16s} batch={batch}  {dt * 1e3:7.1f} ms/exec  "
              f"{batch / dt:9.0f} windows/s", flush=True)


if __name__ == "__main__":
    main()
