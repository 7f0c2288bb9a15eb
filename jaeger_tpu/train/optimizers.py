"""Optimizer factory (optax).

Parity target: reference ``nnlib/builder.py:1651-1695`` — Adam / AdamW /
Muon / SGD / RMSprop / Adagrad with optional clipnorm, cosine-decay LR
schedule, and Keras-3-style gradient accumulation (optax.MultiSteps).
"""

from __future__ import annotations

import optax


def make_schedule(params: dict):
    lr = params.get("learning_rate", 1e-3)
    if isinstance(lr, dict) or params.get("lr_schedule") == "cosine":
        sched_cfg = lr if isinstance(lr, dict) else params
        init = float(sched_cfg.get("initial_learning_rate",
                                   sched_cfg.get("learning_rate", 1e-3)))
        decay_steps = int(sched_cfg.get("decay_steps", 10000))
        alpha = float(sched_cfg.get("alpha", 0.0))
        warmup = int(sched_cfg.get("warmup_steps", 0))
        cosine = optax.cosine_decay_schedule(init, decay_steps, alpha)
        if warmup:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, init, warmup), cosine], [warmup]
            )
        return cosine
    return float(lr)


def make_optimizer(name: str = "adam", params: dict | None = None,
                   accumulation_steps: int = 1):
    """Build the optax chain. Constant learning rates are injected as
    mutable hyperparams so ReduceLROnPlateau can rescale them in place
    (see :func:`set_learning_rate`)."""
    params = dict(params or {})
    clipnorm = params.pop("clipnorm", None)
    weight_decay = params.pop("weight_decay", 0.004)
    lr = make_schedule(params)
    name = (name or "adam").lower()

    def inject(ctor, **kw):
        if callable(lr):  # schedule: not runtime-mutable (documented)
            return ctor(lr, **kw)
        return optax.inject_hyperparams(ctor)(learning_rate=lr, **kw)

    if name == "adam":
        tx = inject(optax.adam, b1=params.get("beta_1", 0.9),
                    b2=params.get("beta_2", 0.999),
                    eps=params.get("epsilon", 1e-7))
    elif name == "adamw":
        tx = inject(optax.adamw, b1=params.get("beta_1", 0.9),
                    b2=params.get("beta_2", 0.999),
                    eps=params.get("epsilon", 1e-7),
                    weight_decay=weight_decay)
    elif name == "muon":
        # Muon for matrix params with adam fallback is handled by optax's
        # contrib implementation when present; otherwise approximate with
        # adamw (documented divergence).
        try:
            from optax.contrib import muon

            tx = muon(lr)
        except ImportError:
            tx = optax.adamw(lr, weight_decay=weight_decay)
    elif name == "sgd":
        tx = inject(optax.sgd, momentum=params.get("momentum") or None,
                    nesterov=params.get("nesterov", False))
    elif name == "rmsprop":
        tx = inject(optax.rmsprop, decay=params.get("rho", 0.9),
                    momentum=params.get("momentum", 0.0),
                    eps=params.get("epsilon", 1e-7))
    elif name == "adagrad":
        tx = inject(optax.adagrad, eps=params.get("epsilon", 1e-7))
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    chain = []
    if clipnorm:
        chain.append(optax.clip_by_global_norm(float(clipnorm)))
    chain.append(tx)
    out = optax.chain(*chain)
    if accumulation_steps and accumulation_steps > 1:
        out = optax.MultiSteps(out, every_k_schedule=int(accumulation_steps))
    return out


def _map_hyperparam_states(opt_state, fn):
    """Apply ``fn`` to every hyperparam-injecting state in a (possibly
    nested) optax state tree; returns the new tree. Duck-typed on the
    ``hyperparams`` attribute (optax renamed the state class across
    versions)."""
    if hasattr(opt_state, "hyperparams") and hasattr(opt_state, "_replace"):
        return fn(opt_state)
    if isinstance(opt_state, optax.MultiStepsState):
        return opt_state._replace(
            inner_opt_state=_map_hyperparam_states(
                opt_state.inner_opt_state, fn
            )
        )
    if isinstance(opt_state, tuple):
        return tuple(_map_hyperparam_states(s, fn) for s in opt_state)
    return opt_state


def get_learning_rate(opt_state) -> float | None:
    """Current injected learning rate, or None for schedule-driven LR."""
    found: list[float] = []

    def grab(s):
        if "learning_rate" in s.hyperparams:
            found.append(float(s.hyperparams["learning_rate"]))
        return s

    _map_hyperparam_states(opt_state, grab)
    return found[0] if found else None


def set_learning_rate(opt_state, lr: float):
    """Return a state tree with the injected learning rate replaced
    (ReduceLROnPlateau support; no-op for schedule-driven LR)."""
    import jax.numpy as jnp

    def setter(s):
        if "learning_rate" not in s.hyperparams:
            return s
        hp = dict(s.hyperparams)
        hp["learning_rate"] = jnp.asarray(
            lr, dtype=jnp.asarray(hp["learning_rate"]).dtype
        )
        return s._replace(hyperparams=hp)

    return _map_hyperparam_states(opt_state, setter)
