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
    params = dict(params or {})
    clipnorm = params.pop("clipnorm", None)
    weight_decay = params.pop("weight_decay", 0.004)
    lr = make_schedule(params)
    name = (name or "adam").lower()

    if name == "adam":
        tx = optax.adam(lr, b1=params.get("beta_1", 0.9),
                        b2=params.get("beta_2", 0.999),
                        eps=params.get("epsilon", 1e-7))
    elif name == "adamw":
        tx = optax.adamw(lr, b1=params.get("beta_1", 0.9),
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
        tx = optax.sgd(lr, momentum=params.get("momentum", 0.0),
                       nesterov=params.get("nesterov", False))
    elif name == "rmsprop":
        tx = optax.rmsprop(lr, decay=params.get("rho", 0.9),
                           momentum=params.get("momentum", 0.0),
                           eps=params.get("epsilon", 1e-7))
    elif name == "adagrad":
        tx = optax.adagrad(lr, eps=params.get("epsilon", 1e-7))
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
