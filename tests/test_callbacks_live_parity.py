"""EarlyStopping / ReduceLROnPlateau pinned LIVE against keras.callbacks.

The reference's training callbacks ARE the stock Keras classes
(``nnlib/builder.py:1581-1599`` instantiates ``tf.keras.callbacks.<name>``
from the YAML callbacks list), so our host-side re-implementations must
reproduce them decision-for-decision: the min_delta-strict improvement
test (Keras ReduceLROnPlateau defaults to 1e-4 — a plateau of tiny
improvements must still reduce), wait-before-improvement ordering,
baseline gating, start_from_epoch, the ``epoch > 0`` stop guard, and
cooldown epochs pinning wait to 0.  Each trajectory drives the REAL
Keras callback attached to a real compiled model and compares the
per-epoch learning-rate sequence / stop epoch with ours.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
keras = tf.keras

from jaeger_tpu.train.callbacks import (  # noqa: E402
    EarlyStopping,
    ReduceLROnPlateau,
)


def _keras_model(lr: float, metrics=None):
    m = keras.Sequential([keras.Input(shape=(1,)), keras.layers.Dense(1)])
    m.compile(optimizer=keras.optimizers.SGD(learning_rate=lr), loss="mse",
              metrics=metrics)
    return m


def _drive_keras_early(cb, values, monitor="val_loss", metrics=None):
    m = _keras_model(1e-3, metrics=metrics)
    cb.set_model(m)
    m.stop_training = False
    cb.on_train_begin()
    stop_epoch = None
    for e, v in enumerate(values):
        cb.on_epoch_end(e, {monitor: float(v)})
        if m.stop_training:
            stop_epoch = e
            break
    cb.on_train_end()
    return stop_epoch


def _drive_our_early(cb, values):
    for e, v in enumerate(values):
        if cb.on_epoch_end({cb.monitor: float(v)}, params=None, epoch=e):
            return e
    return None


def _drive_keras_reduce(cb, values, lr0, monitor="val_loss"):
    m = _keras_model(lr0)
    cb.set_model(m)
    cb.on_train_begin()
    lrs = []
    for e, v in enumerate(values):
        cb.on_epoch_end(e, {monitor: float(v)})
        lrs.append(float(m.optimizer.learning_rate.numpy()))
    return lrs


def _drive_our_reduce(cb, values, lr0):
    lr = lr0
    lrs = []
    for e, v in enumerate(values):
        new = cb.on_epoch_end({cb.monitor: float(v)}, lr, epoch=e)
        if new is not None:
            lr = new
        lrs.append(lr)
    return lrs


def _trajectories():
    """Loss trajectories exercising the decision boundaries."""
    rng = np.random.default_rng(3)
    out = {
        # monotone plateau after an initial drop
        "plateau": [1.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5],
        # sub-min_delta improvements (strictly decreasing but all < 1e-4)
        "tiny_gains": [0.5 - 5e-5 * i for i in range(10)],
        # exactly-equal values
        "flat": [0.7] * 8,
        # improvement right at the patience edge
        "sawtooth": [1.0, 0.9, 0.95, 0.97, 0.85, 0.9, 0.95, 0.8, 0.9, 0.95],
        # immediate degradation from epoch 0
        "rising": [0.3, 0.4, 0.5, 0.6, 0.7, 0.8],
    }
    for i in range(4):
        out[f"random_{i}"] = list(
            np.round(rng.uniform(0.2, 1.0, size=12), 3))
    return out


TRAJ = _trajectories()


@pytest.mark.parametrize("name", sorted(TRAJ))
@pytest.mark.parametrize(
    "params",
    [
        {"patience": 0},
        {"patience": 2},
        {"patience": 2, "min_delta": 0.05},
        {"patience": 1, "baseline": 0.6},
        {"patience": 2, "start_from_epoch": 3},
        {"patience": 10},
    ],
    ids=["p0", "p2", "p2-delta", "p1-baseline", "p2-start3", "p10"],
)
def test_early_stopping_matches_keras(name, params):
    values = TRAJ[name]
    ref_stop = _drive_keras_early(
        keras.callbacks.EarlyStopping(monitor="val_loss", **params), values)
    our_stop = _drive_our_early(
        EarlyStopping(monitor="val_loss", **params), values)
    assert our_stop == ref_stop, (name, params, values)


@pytest.mark.parametrize("name", sorted(TRAJ))
@pytest.mark.parametrize(
    "params",
    [
        {"patience": 1, "factor": 0.5},
        {"patience": 2, "factor": 0.95, "min_lr": 1e-6},
        {"patience": 1, "factor": 0.5, "cooldown": 2},
        {"patience": 0, "factor": 0.1, "min_lr": 1e-4},
        {"patience": 3, "factor": 0.5, "min_delta": 0.05},
    ],
    ids=["p1", "ref-config", "cooldown", "p0-minlr", "delta"],
)
def test_reduce_lr_matches_keras(name, params):
    values = TRAJ[name]
    lr0 = 1e-3
    ref_lrs = _drive_keras_reduce(
        keras.callbacks.ReduceLROnPlateau(monitor="val_loss", **params),
        values, lr0)
    our_lrs = _drive_our_reduce(
        ReduceLROnPlateau(monitor="val_loss", **params), values, lr0)
    np.testing.assert_allclose(
        our_lrs, ref_lrs, rtol=1e-6,
        err_msg=f"LR sequence diverges from keras ({name}, {params})",
    )


def test_accuracy_monitor_auto_mode():
    """mode='auto' must maximize accuracy-like monitors.

    Outside a real ``fit`` Keras cannot resolve the direction (its
    compiled metric objects are unbuilt, so ``_set_monitor_op`` raises —
    pinned below); during real training it resolves accuracy-like
    metrics to max via the metric's direction.  Ours resolves from the
    monitor name, matching what a real reference run does — compared
    here against the explicit ``mode='max'`` Keras callback.
    """
    values = [0.5, 0.6, 0.6, 0.6, 0.6]  # rising then flat accuracy
    with pytest.raises(ValueError, match="maximized or minimized"):
        _drive_keras_early(
            keras.callbacks.EarlyStopping(monitor="val_accuracy",
                                          patience=2),
            values, monitor="val_accuracy", metrics=["accuracy"])
    ref_stop = _drive_keras_early(
        keras.callbacks.EarlyStopping(monitor="val_accuracy", patience=2,
                                      mode="max"),
        values, monitor="val_accuracy", metrics=["accuracy"])
    our_stop = _drive_our_early(
        EarlyStopping(monitor="val_accuracy", patience=2), values)
    assert our_stop == ref_stop is not None
