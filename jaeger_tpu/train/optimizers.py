"""Optimizer factory (optax).

Parity target: reference ``nnlib/builder.py:1651-1695`` — Adam / AdamW /
Muon / SGD / RMSprop / Adagrad with optional clipnorm, cosine-decay LR
schedule, and Keras-3-style gradient accumulation (optax.MultiSteps).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def clip_by_per_variable_norm(max_norm: float):
    """Keras ``clipnorm`` semantics: clip EACH gradient tensor to
    ``max_norm`` independently (``tf.clip_by_norm`` per variable) —
    unlike ``global_clipnorm``/``optax.clip_by_global_norm`` which
    rescales by the joint norm.  Every reference train config sets
    ``clipnorm: 5``, so this is the semantics real runs get."""
    max_norm = float(max_norm)

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def clip(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g)))
            # tf.clip_by_norm: g * max_norm / max(n, max_norm)
            return g * (max_norm / jnp.maximum(n, max_norm))

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init, update)


class _KerasAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_keras_adam(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-7):
    """Adam in Keras 3's formulation (``keras/src/optimizers/adam.py``):

        alpha_t = sqrt(1 - b2^t) / (1 - b1^t)
        update  = alpha_t * m_t / (sqrt(v_t) + eps)

    i.e. the epsilon is added to the UNCORRECTED ``sqrt(v_t)``.  optax's
    ``scale_by_adam`` computes ``m_hat/(sqrt(v_hat)+eps)``, which is the
    same only at eps=0 — with clipped (small) gradients the difference
    is material, so the live-parity tests pin this form.
    """

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _KerasAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state.nu, updates)
        count = state.count + 1
        t = count.astype(jnp.float32)
        alpha = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        out = jax.tree_util.tree_map(
            lambda m, v: alpha * m / (jnp.sqrt(v) + eps), mu, nu)
        return out, _KerasAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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


class _KerasMuonState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def _newton_schulz5(x, steps: int, a: float, b: float, c: float):
    """Quintic Newton-Schulz orthogonalization
    (``keras/src/optimizers/muon.py:260-287``)."""
    transpose = x.shape[0] > x.shape[1]
    if transpose:
        x = x.T
    x = x / (jnp.linalg.norm(x) + 1e-7)
    for _ in range(steps):
        ta = x @ x.T
        tb = b * ta + c * (ta @ ta)
        x = a * x + tb @ x
    return x.T if transpose else x


def keras_muon_factory(*, momentum=0.95, nesterov=True, ns_steps=5,
                       muon_a=3.4445, muon_b=-4.7750, muon_c=2.0315,
                       rms_rate=0.2, adam_lr_ratio=1.0,
                       adam_beta_1=0.9, adam_beta_2=0.999, epsilon=1e-7,
                       weight_decay=0.004, adam_weight_decay=0.004,
                       exclude_embeddings=True, exclude_layers=()):
    """``keras.optimizers.Muon`` update semantics, pinned live.

    Per-variable routing like Keras (``muon.py:143-153``): 2-D kernels
    take the Muon step (momentum buffer m = momentum*m + g, optional
    nesterov blend, Newton-Schulz orthogonalization, moonlight
    ``sqrt(max(n, m)) * rms_rate`` scaling), everything else — plus any
    param whose path contains "embedding" or matches ``exclude_layers``
    — takes the Keras-form AdamW step at ``lr * adam_lr_ratio``.
    Keras applies weight decay ``p -= p*wd*lr`` with the muon decay for
    muon vars and ``adam_weight_decay`` for adamw vars.
    """
    import re

    def use_adamw(path: str, leaf) -> bool:
        if getattr(leaf, "ndim", 0) != 2:
            return True
        if exclude_embeddings and "embedding" in path.lower():
            return True
        return any(re.search(k, path) for k in exclude_layers)

    def _labels(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {
            tuple(p): use_adamw(
                "/".join(str(getattr(k, "key", k)) for k in p), leaf)
            for p, leaf in flat
        }

    def ctor(learning_rate):
        def init(params):
            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            return _KerasMuonState(
                count=jnp.zeros([], jnp.int32),
                mu=zeros,
                nu=jax.tree_util.tree_map(jnp.zeros_like, params),
            )

        def update(updates, state, params=None):
            labels = _labels(updates)
            count = state.count + 1
            t = count.astype(jnp.float32)
            alpha = (jnp.sqrt(1.0 - adam_beta_2 ** t)
                     / (1.0 - adam_beta_1 ** t))

            def leaf(path, g, m, v, p):
                adamw = labels[tuple(path)]
                if adamw:
                    m_new = m + (g - m) * (1.0 - adam_beta_1)
                    v_new = v + (jnp.square(g) - v) * (1.0 - adam_beta_2)
                    u = (learning_rate * adam_lr_ratio) * alpha * m_new / (
                        jnp.sqrt(v_new) + epsilon)
                    wd = adam_weight_decay
                else:
                    m_new = momentum * m + g
                    v_new = v
                    g_eff = g + momentum * m_new if nesterov else m_new
                    o = _newton_schulz5(g_eff, ns_steps,
                                        muon_a, muon_b, muon_c)
                    if rms_rate is not None:
                        o = o * (jnp.sqrt(float(max(o.shape))) * rms_rate)
                    u = learning_rate * o
                    wd = weight_decay
                if wd and p is not None:
                    u = u + learning_rate * wd * p
                return -u, m_new, v_new

            flat_u = jax.tree_util.tree_flatten_with_path(updates)
            treedef = flat_u[1]
            flat_m = jax.tree_util.tree_leaves(state.mu)
            flat_v = jax.tree_util.tree_leaves(state.nu)
            flat_p = (jax.tree_util.tree_leaves(params)
                      if params is not None else [None] * len(flat_m))
            outs = [leaf(p, g, m, v, pp)
                    for (p, g), m, v, pp in zip(flat_u[0], flat_m,
                                                flat_v, flat_p)]
            new_updates = jax.tree_util.tree_unflatten(
                treedef, [o[0] for o in outs])
            mu = jax.tree_util.tree_unflatten(
                treedef, [o[1] for o in outs])
            nu = jax.tree_util.tree_unflatten(
                treedef, [o[2] for o in outs])
            return new_updates, _KerasMuonState(count=count, mu=mu, nu=nu)

        return optax.GradientTransformation(init, update)

    return ctor


def make_optimizer(name: str = "adam", params: dict | None = None,
                   accumulation_steps: int = 1):
    """Build the optax chain. Constant learning rates are injected as
    mutable hyperparams so ReduceLROnPlateau can rescale them in place
    (see :func:`set_learning_rate`)."""
    params = dict(params or {})
    clipnorm = params.pop("clipnorm", None)
    global_clipnorm = params.pop("global_clipnorm", None)
    weight_decay = params.pop("weight_decay", 0.004)
    lr = make_schedule(params)
    name = (name or "adam").lower()

    def inject(ctor, **kw):
        if callable(lr):  # schedule: not runtime-mutable (documented)
            return ctor(lr, **kw)
        return optax.inject_hyperparams(ctor)(learning_rate=lr, **kw)

    def keras_adam_factory(wd: float):
        # wd is closed over (static), not injected: only the learning
        # rate needs runtime mutation (ReduceLROnPlateau).
        def keras_adam(learning_rate):
            steps = [scale_by_keras_adam(
                b1=params.get("beta_1", 0.9),
                b2=params.get("beta_2", 0.999),
                eps=params.get("epsilon", 1e-7))]
            if wd:
                steps.append(optax.add_decayed_weights(wd))
            steps.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*steps)

        return keras_adam

    if name == "adam":
        tx = inject(keras_adam_factory(0.0))
    elif name == "adamw":
        tx = inject(keras_adam_factory(float(weight_decay)))
    elif name == "muon":
        tx = inject(keras_muon_factory(
            momentum=params.get("momentum", 0.95),
            nesterov=params.get("nesterov", True),
            ns_steps=params.get("ns_steps", 5),
            muon_a=params.get("muon_a", 3.4445),
            muon_b=params.get("muon_b", -4.7750),
            muon_c=params.get("muon_c", 2.0315),
            rms_rate=params.get("rms_rate", 0.2),
            adam_lr_ratio=params.get("adam_lr_ratio", 1.0),
            adam_beta_1=params.get("adam_beta_1", 0.9),
            adam_beta_2=params.get("adam_beta_2", 0.999),
            epsilon=params.get("epsilon", 1e-7),
            weight_decay=weight_decay,
            adam_weight_decay=params.get("adam_weight_decay", 0.004),
            exclude_embeddings=params.get("exclude_embeddings", True),
            exclude_layers=tuple(params.get("exclude_layers", ()) or ()),
        ))
    elif name == "sgd":
        # Keras folds the LR INTO the velocity (v = m*v - lr*g;
        # p += v), so an LR change mid-run (ReduceLROnPlateau) scales
        # only future gradient contributions, not the accumulated
        # momentum.  scale-then-trace reproduces that exactly;
        # optax.sgd's trace-then-scale would rescale the whole buffer.
        tx = optax.chain(
            inject(optax.scale_by_learning_rate),
            optax.trace(decay=params.get("momentum") or 0.0,
                        nesterov=params.get("nesterov", False)),
        )
    elif name == "rmsprop":
        tx = inject(optax.rmsprop, decay=params.get("rho", 0.9),
                    momentum=params.get("momentum") or None,
                    eps=params.get("epsilon", 1e-7),
                    centered=params.get("centered", False),
                    # Keras 3 adds eps INSIDE the sqrt:
                    # increment = lr * g / sqrt(velocity + eps)
                    eps_in_sqrt=True,
                    bias_correction=False)
    elif name == "adagrad":
        tx = inject(optax.adagrad, eps=params.get("epsilon", 1e-7),
                    initial_accumulator_value=params.get(
                        "initial_accumulator_value", 0.1))
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    chain = []
    if clipnorm:
        chain.append(clip_by_per_variable_norm(clipnorm))
    if global_clipnorm:
        chain.append(optax.clip_by_global_norm(float(global_clipnorm)))
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
        mapped = [_map_hyperparam_states(s, fn) for s in opt_state]
        if hasattr(opt_state, "_fields"):  # NamedTuple state: keep type
            return type(opt_state)(*mapped)
        return tuple(mapped)
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
