"""Ablation timing of the flagship forward: where the remaining gap is.

Stages measured (each its own jitted program, varied device inputs,
scalar-combine fetch — same discipline as bench.py):
  A. encode only          (6-frame codon encoding from bases)
  B. encode + embed       (+ one-hot matmul embedding)
  C. full forward         (+ rep tower, heads)

C-B = rep tower + heads; B-A = embedding; A = encode. Compares against
the ~81 TFLOPs conv-chain ceiling from docs/optimizations.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, n_iters=2, n_execs=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def combine(accs):
        return jnp.sum(jnp.stack(accs))

    _ = float(combine([fn(0)]))
    t0 = time.perf_counter()
    for i in range(n_iters):
        _ = float(combine([fn(i * n_execs + j + 1) for j in range(n_execs)]))
    return (time.perf_counter() - t0) / n_iters / n_execs


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models import layers as L
    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config
    from jaeger_tpu.ops import encode

    cfg = flagship_config()
    b = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = b.init(batch=1)
    _, crop_nt = b.crop
    batch = 2048
    emb = cfg["model"]["embedding"].get("embedding_size", 4)
    sp = cfg["model"]["string_processor"]

    table = variables["params"]["embedding"]["embedding"]

    def inputs(seed):
        key = jax.random.PRNGKey(seed)
        bases = jax.random.randint(
            key, (batch, crop_nt), 0, 4, dtype=jnp.int32).astype(jnp.uint8)
        return bases, jnp.full((batch,), crop_nt, jnp.int32)

    @jax.jit
    def stage_a(seed):
        bases, lengths = inputs(seed)
        tok = encode.encode_frames(bases, lengths, crop_size=crop_nt,
                                   masking=bool(sp.get("masking", False)))
        return jnp.sum(tok.astype(jnp.float32))

    @jax.jit
    def stage_b(seed):
        bases, lengths = inputs(seed)
        tok = encode.encode_frames(bases, lengths, crop_size=crop_nt,
                                   masking=bool(sp.get("masking", False)))
        x = L.OneHotEmbed(65, emb, dtype=jnp.bfloat16).apply(
            {"params": {"embedding": table}}, tok)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def stage_c(seed):
        bases, lengths = inputs(seed)
        out = model.apply(variables, {"bases": bases, "lengths": lengths},
                          train=False)
        return jnp.sum(out["prediction"].astype(jnp.float32))

    a = timeit(stage_a)
    print(f"A encode only:        {a*1e3:7.2f} ms/batch")
    bt = timeit(stage_b)
    print(f"B encode+embed:       {bt*1e3:7.2f} ms/batch  "
          f"(embed ~{(bt-a)*1e3:.2f} ms)")
    c = timeit(stage_c)
    print(f"C full forward:       {c*1e3:7.2f} ms/batch  "
          f"(tower+heads ~{(c-bt)*1e3:.2f} ms) -> {batch/c:.0f} w/s")


if __name__ == "__main__":
    main()
