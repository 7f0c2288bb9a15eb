"""Round-2 perf candidates, measured in isolation on the real chip.

Quantifies the two remaining flagship-forward optimizations listed in
STATUS.md WITHOUT touching the shipped model code (the flagship HLO is
frozen this round so the driver's bench compile stays cached):

1. embed-gather vs one-hot-matmul token embedding
2. mask-skip upper bound: forward with masking disabled entirely
   (an all-full-windows batch could dispatch a maskless variant)

Timing discipline follows bench.py: device-resident varied inputs (the
axon relay memoizes identical executions), scalar combine fetch as the
only sync, multiple iters.

Usage: python experiments/perf_candidates.py  (runs on default platform)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, n_iters=2, n_execs=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    _ = float(combine([fn(0)]))  # compile + warm
    t0 = time.perf_counter()
    for i in range(n_iters):
        accs = [fn(i * n_execs + j + 1) for j in range(n_execs)]
        _ = float(combine(accs))
    return (time.perf_counter() - t0) / n_iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config

    cfg = flagship_config()
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    _, crop_nt = builder.crop
    batch = 2048
    n_execs = 8

    def make_forward(masking: bool):
        import copy

        c = copy.deepcopy(cfg)
        c["model"]["string_processor"]["masking"] = masking
        m = ModelBuilder(c, dtype=jnp.bfloat16).build()

        @jax.jit
        def f(seed):
            key = jax.random.PRNGKey(seed)
            bases = jax.random.randint(
                key, (batch, crop_nt), 0, 4, dtype=jnp.int32
            ).astype(jnp.uint8)
            lengths = jnp.full((batch,), crop_nt, jnp.int32)
            out = m.apply(variables, {"bases": bases, "lengths": lengths},
                          train=False)
            return jnp.sum(out["prediction"].astype(jnp.float32))

        return f

    base_dt = timeit(make_forward(True), n_execs=n_execs)
    print(f"forward WITH masking:    {base_dt*1e3:8.1f} ms "
          f"-> {batch*n_execs/base_dt:9.0f} w/s")
    nomask_dt = timeit(make_forward(False), n_execs=n_execs)
    print(f"forward WITHOUT masking: {nomask_dt*1e3:8.1f} ms "
          f"-> {batch*n_execs/nomask_dt:9.0f} w/s "
          f"(mask-skip upper bound: {100*(base_dt-nomask_dt)/base_dt:.1f}%)")

    # --- embedding microbench: gather vs one-hot matmul ----------------
    emb_cfg = cfg["model"].get("embedding", {})
    emb = int(emb_cfg.get("embedding_size", 4))
    vocab = 65
    P = (crop_nt - 5) // 3
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(vocab, emb)), jnp.bfloat16)

    @jax.jit
    def via_gather(seed):
        tok = jax.random.randint(jax.random.PRNGKey(seed),
                                 (batch, 6, P), 0, vocab)
        return jnp.sum(jnp.take(table, tok, axis=0).astype(jnp.float32))

    @jax.jit
    def via_matmul(seed):
        tok = jax.random.randint(jax.random.PRNGKey(seed),
                                 (batch, 6, P), 0, vocab)
        oh = jax.nn.one_hot(tok, vocab, dtype=jnp.bfloat16)
        return jnp.sum((oh @ table).astype(jnp.float32))

    g_dt = timeit(via_gather, n_execs=n_execs)
    m_dt = timeit(via_matmul, n_execs=n_execs)
    print(f"embed gather  (V={vocab}, E={emb}): {g_dt*1e3:8.1f} ms")
    print(f"embed one-hot matmul:              {m_dt*1e3:8.1f} ms "
          f"({'matmul' if m_dt < g_dt else 'gather'} wins, "
          f"{abs(g_dt-m_dt)/max(g_dt,m_dt)*100:.0f}% apart)")


if __name__ == "__main__":
    main()
