"""Training callbacks: early stopping, LR plateau reduction, NaN guard,
CSV logging.

Parity targets: the Keras callbacks the reference configs name
(``train_config/*.yaml`` callbacks sections) and ``SyncTerminateOnNaN``
(reference ``nnlib/callbacks.py:16-57``). These operate on host-side
epoch metrics; their state is serialized by
:class:`jaeger_tpu.train.checkpoint.TrainingStatePersistence`, matching
the reference's ``TrainingStateCallback`` (``nnlib/builder.py:101-206``).
"""

from __future__ import annotations

import csv
import math
from pathlib import Path

import numpy as np


class EarlyStopping:
    def __init__(self, monitor: str = "val_loss", patience: int = 3,
                 mode: str = "min", restore_best_weights: bool = True,
                 min_delta: float = 0.0):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.restore_best_weights = restore_best_weights
        self.min_delta = min_delta
        self.best = math.inf if mode == "min" else -math.inf
        self.wait = 0
        self.best_params = None
        self.stopped = False

    def _improved(self, value: float) -> bool:
        if self.mode == "min":
            return value < self.best - self.min_delta
        return value > self.best + self.min_delta

    def on_epoch_end(self, metrics: dict, params=None) -> bool:
        """Returns True when training should stop."""
        value = metrics.get(self.monitor)
        if value is None:
            return False
        if self._improved(float(value)):
            self.best = float(value)
            self.wait = 0
            if self.restore_best_weights and params is not None:
                self.best_params = params
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped = True
        return self.stopped

    def state(self) -> dict:
        return {"best": self.best, "wait": self.wait}

    def restore(self, state: dict) -> None:
        self.best = state.get("best", self.best)
        self.wait = state.get("wait", self.wait)


class ReduceLROnPlateau:
    def __init__(self, monitor: str = "val_loss", patience: int = 2,
                 factor: float = 0.5, min_lr: float = 1e-5,
                 mode: str = "min"):
        self.monitor = monitor
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.mode = mode
        self.best = math.inf if mode == "min" else -math.inf
        self.wait = 0

    def on_epoch_end(self, metrics: dict, current_lr: float | None):
        """Returns the new LR (or None to keep)."""
        value = metrics.get(self.monitor)
        if value is None or current_lr is None:
            return None
        value = float(value)
        improved = (
            value < self.best if self.mode == "min" else value > self.best
        )
        if improved:
            self.best = value
            self.wait = 0
            return None
        self.wait += 1
        if self.wait >= self.patience:
            self.wait = 0
            new_lr = max(current_lr * self.factor, self.min_lr)
            if new_lr < current_lr:
                return new_lr
        return None

    def state(self) -> dict:
        return {"best": self.best, "wait": self.wait}

    def restore(self, state: dict) -> None:
        self.best = state.get("best", self.best)
        self.wait = state.get("wait", self.wait)


class TerminateOnNaN:
    """Stop when loss is non-finite. The loss arrives synchronously from
    the jitted step (the reference needed SyncTerminateOnNaN to force a
    synchronous fetch under tf.distribute; under JAX the host read is the
    sync point)."""

    def on_step(self, loss: float) -> bool:
        return not np.isfinite(loss)


class CSVLogger:
    def __init__(self, filename: str | Path, append: bool = True):
        self.path = Path(filename)
        self.append = append
        self._writer = None
        self._fh = None

    def on_epoch_end(self, epoch: int, metrics: dict) -> None:
        row = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()}}
        if self._fh is None:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            exists = self.path.exists() and self.append
            self._fh = self.path.open("a" if self.append else "w", newline="")
            self._writer = csv.DictWriter(self._fh, fieldnames=list(row))
            if not exists or self.path.stat().st_size == 0:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def build_callbacks(cfg_list: list[dict]) -> dict:
    """Instantiate callbacks from a config callbacks list (Keras names)."""
    out: dict = {}
    for entry in cfg_list or []:
        name = entry.get("name")
        params = entry.get("params") or {}
        if name == "EarlyStopping":
            out["early_stopping"] = EarlyStopping(
                monitor=params.get("monitor", "val_loss"),
                patience=params.get("patience", 3),
                mode=params.get("mode", "min"),
                restore_best_weights=params.get("restore_best_weights", True),
            )
        elif name == "ReduceLROnPlateau":
            out["reduce_lr"] = ReduceLROnPlateau(
                monitor=params.get("monitor", "val_loss"),
                patience=params.get("patience", 2),
                factor=params.get("factor", 0.5),
                min_lr=params.get("min_lr", 1e-5),
            )
        elif name == "TerminateOnNaN":
            out["nan_guard"] = TerminateOnNaN()
        elif name == "CSVLogger":
            if params.get("filename"):
                out["csv_logger"] = CSVLogger(
                    params["filename"], append=params.get("append", True)
                )
        # ModelCheckpoint handled by the checkpoint manager
    return out
