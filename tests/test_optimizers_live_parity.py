"""Optimizer update rules pinned LIVE against keras.optimizers.

The reference instantiates stock Keras optimizers from YAML
(``nnlib/builder.py:1651-1660``) — every shipped config uses
``adam`` + ``clipnorm: 5``.  These tests run identical multi-step
trajectories (same initial params, same per-step gradients) through the
REAL Keras optimizer (tf.Variables + ``apply_gradients``) and our optax
factory, and compare parameters after every step.  Pinned subtleties:

* ``clipnorm`` clips each gradient tensor INDEPENDENTLY
  (``tf.clip_by_norm`` per variable), not by the global norm;
* Keras RMSprop divides by ``sqrt(nu) + eps`` (eps outside the sqrt);
* Keras SGD folds the LR into the velocity, so a mid-run LR change
  (exactly what ReduceLROnPlateau does) must scale only future gradient
  contributions — pinned with an LR mutation halfway through;
* Adam/AdamW bias correction + decoupled weight decay.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
keras = tf.keras

import jax.numpy as jnp  # noqa: E402

from jaeger_tpu.train.optimizers import (  # noqa: E402
    make_optimizer,
    make_schedule,
    set_learning_rate,
)

STEPS = 12
SHAPES = {"w": (4, 3), "b": (3,)}


def _grads(rng, scale=1.0):
    return {k: (rng.standard_normal(s) * scale).astype("float32")
            for k, s in SHAPES.items()}


def _init_params(rng):
    return {k: rng.standard_normal(s).astype("float32")
            for k, s in SHAPES.items()}


def _keras_trajectory(opt, params, grad_seq, lr_mutations=None):
    tvars = {k: tf.Variable(v) for k, v in params.items()}
    keys = sorted(tvars)
    out = []
    for step, grads in enumerate(grad_seq):
        if lr_mutations and step in lr_mutations:
            opt.learning_rate.assign(lr_mutations[step])
        opt.apply_gradients(
            [(tf.constant(grads[k]), tvars[k]) for k in keys])
        out.append({k: tvars[k].numpy().copy() for k in keys})
    return out


def _our_trajectory(name, opt_params, params, grad_seq, lr_mutations=None):
    tx = make_optimizer(name, dict(opt_params))
    p = {k: jnp.asarray(v) for k, v in params.items()}
    state = tx.init(p)
    out = []
    for step, grads in enumerate(grad_seq):
        if lr_mutations and step in lr_mutations:
            state = set_learning_rate(state, lr_mutations[step])
        updates, state = tx.update(
            {k: jnp.asarray(v) for k, v in grads.items()}, state, p)
        import optax

        p = optax.apply_updates(p, updates)
        out.append({k: np.asarray(v) for k, v in p.items()})
    return out


def _compare(ours, ref, what, atol=2e-6):
    for step, (o, r) in enumerate(zip(ours, ref)):
        for k in r:
            np.testing.assert_allclose(
                o[k], r[k], rtol=0, atol=atol,
                err_msg=f"{what}: param {k!r} diverges from the live "
                        f"Keras optimizer at step {step}",
            )


CASES = [
    ("adam", {"learning_rate": 0.01},
     lambda: keras.optimizers.Adam(learning_rate=0.01)),
    ("adam", {"learning_rate": 0.004, "beta_1": 0.85, "beta_2": 0.98,
              "epsilon": 1e-6},
     lambda: keras.optimizers.Adam(learning_rate=0.004, beta_1=0.85,
                                   beta_2=0.98, epsilon=1e-6)),
    # the reference-config combination: adam + per-variable clipnorm
    ("adam", {"learning_rate": 0.01, "clipnorm": 0.05},
     lambda: keras.optimizers.Adam(learning_rate=0.01, clipnorm=0.05)),
    ("adam", {"learning_rate": 0.01, "global_clipnorm": 0.05},
     lambda: keras.optimizers.Adam(learning_rate=0.01,
                                   global_clipnorm=0.05)),
    ("adamw", {"learning_rate": 0.01, "weight_decay": 0.02},
     lambda: keras.optimizers.AdamW(learning_rate=0.01, weight_decay=0.02)),
    ("sgd", {"learning_rate": 0.05},
     lambda: keras.optimizers.SGD(learning_rate=0.05)),
    ("sgd", {"learning_rate": 0.05, "momentum": 0.9},
     lambda: keras.optimizers.SGD(learning_rate=0.05, momentum=0.9)),
    ("sgd", {"learning_rate": 0.05, "momentum": 0.9, "nesterov": True},
     lambda: keras.optimizers.SGD(learning_rate=0.05, momentum=0.9,
                                  nesterov=True)),
    ("rmsprop", {"learning_rate": 0.01},
     lambda: keras.optimizers.RMSprop(learning_rate=0.01)),
    ("rmsprop", {"learning_rate": 0.01, "rho": 0.8, "epsilon": 1e-6,
                 "centered": True},
     lambda: keras.optimizers.RMSprop(learning_rate=0.01, rho=0.8,
                                      epsilon=1e-6, centered=True)),
    ("adagrad", {"learning_rate": 0.05},
     lambda: keras.optimizers.Adagrad(learning_rate=0.05)),
]


@pytest.mark.parametrize(
    "name,opt_params,keras_ctor", CASES,
    ids=[f"{c[0]}-{i}" for i, c in enumerate(CASES)])
def test_update_rule_matches_keras(name, opt_params, keras_ctor):
    rng = np.random.default_rng(11)
    params = _init_params(rng)
    grad_seq = [_grads(rng) for _ in range(STEPS)]
    ref = _keras_trajectory(keras_ctor(), params, grad_seq)
    ours = _our_trajectory(name, opt_params, params, grad_seq)
    _compare(ours, ref, f"{name} {opt_params}")


@pytest.mark.parametrize(
    "name,opt_params,keras_ctor",
    [
        ("adam", {"learning_rate": 0.01},
         lambda: keras.optimizers.Adam(learning_rate=0.01)),
        ("sgd", {"learning_rate": 0.05, "momentum": 0.9},
         lambda: keras.optimizers.SGD(learning_rate=0.05, momentum=0.9)),
        ("rmsprop", {"learning_rate": 0.01},
         lambda: keras.optimizers.RMSprop(learning_rate=0.01)),
    ],
    ids=["adam", "sgd-momentum", "rmsprop"])
def test_lr_mutation_mid_run_matches_keras(name, opt_params, keras_ctor):
    """ReduceLROnPlateau's in-place LR change, applied to a warm
    optimizer state: the momentum/second-moment buffers must carry over
    exactly as Keras's do."""
    rng = np.random.default_rng(23)
    params = _init_params(rng)
    grad_seq = [_grads(rng) for _ in range(STEPS)]
    mutations = {6: 0.5 * opt_params["learning_rate"]}
    ref = _keras_trajectory(keras_ctor(), params, grad_seq,
                            lr_mutations=mutations)
    ours = _our_trajectory(name, opt_params, params, grad_seq,
                           lr_mutations=mutations)
    _compare(ours, ref, f"{name} lr-mutation")


MUON_SHAPES = {"kernel": (8, 4), "bias": (4,), "embedding_table": (6, 5)}


@pytest.mark.parametrize(
    "opt_params",
    [
        {"learning_rate": 0.01},
        {"learning_rate": 0.01, "momentum": 0.9, "nesterov": False,
         "ns_steps": 3, "rms_rate": 0.3, "weight_decay": 0.01,
         "adam_weight_decay": 0.02},
    ],
    ids=["defaults", "custom"])
def test_muon_matches_keras(opt_params):
    """keras.optimizers.Muon: the 2-D kernel takes the Muon step
    (momentum buffer, Newton-Schulz, moonlight rms scaling), the 1-D
    bias and the embedding-named 2-D table take the Keras-form AdamW
    step; per-branch weight decay."""
    rng = np.random.default_rng(17)
    params = {k: rng.standard_normal(s).astype("float32")
              for k, s in MUON_SHAPES.items()}
    grad_seq = [
        {k: (rng.standard_normal(s) * 0.5).astype("float32")
         for k, s in MUON_SHAPES.items()}
        for _ in range(STEPS)
    ]

    kvars = {k: keras.Variable(v, name=k) for k, v in params.items()}
    assert kvars["embedding_table"].path == "embedding_table"
    opt = keras.optimizers.Muon(**opt_params)
    keys = sorted(kvars)
    ref = []
    for grads in grad_seq:
        opt.apply_gradients([(tf.constant(grads[k]), kvars[k])
                             for k in keys])
        ref.append({k: kvars[k].numpy().copy() for k in keys})

    ours = _our_trajectory("muon", opt_params, params, grad_seq)
    _compare(ours, ref, f"muon {opt_params}", atol=5e-6)


def test_gradient_accumulation_matches_keras():
    """Keras-3 optimizer-native accumulation vs optax.MultiSteps: grads
    averaged over k micro-steps, one real update every k-th apply, and
    the bias-correction step count advancing once per REAL update."""
    rng = np.random.default_rng(31)
    params = _init_params(rng)
    grad_seq = [_grads(rng) for _ in range(9)]
    ref = _keras_trajectory(
        keras.optimizers.Adam(learning_rate=0.01,
                              gradient_accumulation_steps=3),
        params, grad_seq)
    tx = make_optimizer("adam", {"learning_rate": 0.01},
                        accumulation_steps=3)
    import optax

    p = {k: jnp.asarray(v) for k, v in params.items()}
    state = tx.init(p)
    ours = []
    for grads in grad_seq:
        updates, state = tx.update(
            {k: jnp.asarray(v) for k, v in grads.items()}, state, p)
        p = optax.apply_updates(p, updates)
        ours.append({k: np.asarray(v) for k, v in p.items()})
    _compare(ours, ref, "adam accumulation=3")


def test_cosine_schedule_matches_keras():
    """keras CosineDecay(initial, steps, alpha) vs our cosine schedule."""
    initial, decay_steps, min_lr = 3e-4, 200, 1e-5
    ref = keras.optimizers.schedules.CosineDecay(
        initial_learning_rate=initial, decay_steps=decay_steps,
        alpha=min_lr / initial)
    sched = make_schedule({
        "learning_rate": {
            "initial_learning_rate": initial,
            "decay_steps": decay_steps,
            "alpha": min_lr / initial,
        }
    })
    for step in [0, 1, 50, 100, 199, 200, 500]:
        np.testing.assert_allclose(
            float(sched(step)), float(ref(step)), rtol=1e-6,
            err_msg=f"cosine schedule diverges at step {step}")
