"""Chip bench: flagship TRAIN step attribution (round-2 verdict item 7).

Inference fwd is attributed to 44% bf16 MXU peak with every alternative
measured (docs/optimizations.md); this gives the training step the same
discipline: per-phase timing of the flagship classifier-branch step at
batch 2048 on the real chip, in train windows/s, with the known
inference levers applied where they transfer:

- dtype-dispatched GELU and the embed-fold both act at train time
  automatically (they're properties of the bf16 forward, and autodiff
  differentiates the folded kernel einsum back to table + kernel);
- the MASKLESS program is the train-time lever to qualify here: NPZ
  training crops are fixed-size windows of unambiguous bases unless the
  record carries Ns, so the loader can select a dense step per batch the
  same way the inference engine does (exactness: an all-true mask is an
  identity through every zoo layer — pinned by tests/test_embed_fold.py
  and the engine's dense-predicate tests).

Programs measured (each its own jit; python loop, donated state):
  step/masked   full train step (fwd + bwd + Keras-Adam update)
  step/dense    same with assume_dense=True
  fwd/masked    loss evaluation only (value, no grad)
  fwd/dense     same with assume_dense=True

Two phases so param init never pays remote-compile cost:
  python experiments/train_breakdown.py prep   # CPU: init -> /tmp
  python experiments/train_breakdown.py run    # chip: time the programs

The relay memoizes identical (computation, args) executions, but the
train step self-varies: params/opt_state change every step, and the
batch is synthesized in-program from a per-step seed.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STATE_PATH = Path("/tmp/jaeger_train_breakdown.pkl")
BATCH = int(os.environ.get("TB_BATCH", 2048))   # smoke: TB_BATCH=8
ITERS = int(os.environ.get("TB_ITERS", 20))
N_CLASSES = 6


def prep() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config

    cfg = flagship_config()
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    _, variables = builder.init(batch=1)
    _, crop_nt = builder.crop
    payload = {
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(
            np.asarray, variables.get("batch_stats", {})),
        "crop_nt": crop_nt,
    }
    STATE_PATH.write_bytes(pickle.dumps(payload))
    n = sum(x.size for x in jax.tree.leaves(payload["params"]))
    print(f"{n / 1e6:.2f}M params -> {STATE_PATH}")


#: variant spec grammar: {fwd|step}-{masked|dense}[-remat][@batch]
DEFAULT_VARIANTS = (
    "fwd-masked", "fwd-dense",            # train-mode forward only
    "step-masked@1024", "step-dense@1024",  # full step (bwd OOMs at 2048)
    "step-dense-remat",                   # remat fits the full 2048 batch
)


def run(variants) -> None:
    from dataclasses import replace

    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config
    from jaeger_tpu.train.loop import StepConfig, TrainState, make_train_step
    from jaeger_tpu.train.optimizers import make_optimizer

    payload = pickle.loads(STATE_PATH.read_bytes())
    crop_nt = payload["crop_nt"]

    def build(remat: bool):
        cfg = flagship_config()
        (cfg.get("model", cfg))["remat"] = remat
        return ModelBuilder(cfg, dtype=jnp.bfloat16).build()

    models = {False: build(False), True: build(True)}
    tx = make_optimizer("adam", {"learning_rate": 1e-3})
    variables = {"params": payload["params"]}
    if payload["batch_stats"]:
        variables["batch_stats"] = payload["batch_stats"]
    state0 = TrainState.create(jax.device_put(variables), tx)
    step_cfg = StepConfig(loss_name="categorical_crossentropy",
                          heads=("prediction",))

    def synth_batch(seed, batch):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 2)
        bases = jax.random.randint(
            k1, (batch, crop_nt), 0, 4, dtype=jnp.int32).astype(jnp.uint8)
        labels = jax.nn.one_hot(
            jax.random.randint(k2, (batch,), 0, N_CLASSES), N_CLASSES)
        return {"bases": bases,
                "lengths": jnp.full((batch,), crop_nt, jnp.int32),
                "labels": labels}

    def make_step(dense: bool, remat: bool, batch: int, accum: int = 1):
        step = make_train_step(models[remat],
                               replace(step_cfg, assume_dense=dense))
        st0 = state0
        if accum > 1:
            # the recommended effective-large-batch path: optax
            # MultiSteps accumulates `accum` micro-batches per update
            # (Keras-equal, tests/test_optimizers_live_parity.py)
            tx_a = make_optimizer("adam", {"learning_rate": 1e-3},
                                  accumulation_steps=accum)
            st0 = TrainState.create(
                jax.device_put({"params": payload["params"],
                                **({"batch_stats": payload["batch_stats"]}
                                   if payload["batch_stats"] else {})}),
                tx_a)

        def one(state, seed):
            new_state, metrics = step(state, synth_batch(seed, batch),
                                      jax.random.PRNGKey(0))
            return new_state, metrics["loss"]

        return one, st0

    def make_fwd(dense: bool, remat: bool, batch: int):
        # the fwd PHASE of the step: train-mode apply incl. batch-stat
        # computation, no grad/update — so (step - fwd) isolates bwd+Adam
        def one(params, batch_stats, seed):
            v = {"params": params, "batch_stats": batch_stats}
            kw = {"assume_dense": True} if dense else {}
            out, _ = models[remat].apply(
                v, synth_batch(seed, batch), train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
                heads=("prediction",), **kw)
            return jnp.sum(out["prediction"].astype(jnp.float32))

        return one

    results = {}

    def time_steps(name, fn, batch, *, stateful, iters=ITERS, st0=None):
        try:
            if stateful:
                fn_c = jax.jit(fn, donate_argnums=(0,))
                # fresh buffers per variant: donation deletes them, and
                # device_put of already-resident arrays is a no-op alias
                state = jax.tree.map(jnp.copy,
                                     state0 if st0 is None else st0)
                t0 = time.perf_counter()
                state, loss = fn_c(state, jnp.int32(0))
                _ = float(loss)
                print(f"{name}: compile+first "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                t0 = time.perf_counter()
                for i in range(1, iters + 1):
                    state, loss = fn_c(state, jnp.int32(i))
                _ = float(loss)  # fetch = true sync point on the relay
            else:
                fn_c = jax.jit(fn)
                t0 = time.perf_counter()
                _ = float(fn_c(state0.params, state0.batch_stats,
                               jnp.int32(0)))
                print(f"{name}: compile+first "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                t0 = time.perf_counter()
                accs = [fn_c(state0.params, state0.batch_stats,
                             jnp.int32(i))
                        for i in range(1, iters + 1)]
                _ = float(accs[-1])
        except Exception as exc:
            import traceback

            traceback.print_exc()
            results[name] = {"error": str(exc).split("\n")[0][:200]}
            print(f"{name}: FAILED {results[name]['error']}", flush=True)
            return
        dt = (time.perf_counter() - t0) / iters
        wps = batch / dt
        results[name] = {"batch": batch,
                         "ms_per_step": round(dt * 1000, 1),
                         "windows_per_s": round(wps, 1)}
        print(f"{name}: {dt * 1000:.1f} ms/step @ {batch}, "
              f"{wps:,.0f} windows/s", flush=True)

    for spec in variants:
        name, _, bs = spec.partition("@")
        batch = int(bs) if bs else BATCH
        parts = name.split("-")
        kind, dense, remat = parts[0], "dense" in parts, "remat" in parts
        accum = next((int(p[5:]) for p in parts
                      if p.startswith("accum")), 1)
        if kind == "fwd":
            time_steps(spec, make_fwd(dense, remat, batch), batch,
                       stateful=False)
        else:
            fn, st0 = make_step(dense, remat, batch, accum)
            time_steps(spec, fn, batch, stateful=True, st0=st0)

    print(json.dumps(results))


if __name__ == "__main__":
    if sys.argv[1] == "prep":
        prep()
    else:
        run(tuple(sys.argv[2:]) or DEFAULT_VARIANTS)
