"""Checkpointing and resume.

Parity targets: the reference's per-branch epoch-named weight checkpoints
(``epoch:{epoch}-loss:{val_loss}`` files, selected by
``get_latest_h5_with_metadata``, ``nnlib/builder.py:383-441``), the
``TrainingStateCallback`` that persists LR / plateau / early-stop state to
``training_state.json`` (``nnlib/builder.py:101-206``), and the
``converged.json`` branch markers (``commands/train.py:83-112``).

Storage is orbax: one checkpoint per epoch under
``<dir>/epoch_<NNN>``, with metrics recorded in ``checkpoints.json`` so
resume can pick the latest (or best) without parsing filenames.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, keep: int = 3):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = self.directory / "checkpoints.json"

    def _index(self) -> list[dict]:
        if self._index_path.exists():
            return json.loads(self._index_path.read_text())
        return []

    def _write_index(self, index: list[dict]) -> None:
        self._index_path.write_text(json.dumps(index, indent=1))

    def save(self, epoch: int, variables: Any,
             metrics: dict | None = None, opt_state: Any = None) -> Path:
        """``opt_state`` (optimizer moments, MultiSteps accumulator,
        schedule step) persists beside the weights so resume continues
        training bitwise — the reference documents NOT doing this as a
        known caveat (``nnlib/builder.py:166-175``); here it's fixed."""
        path = (self.directory / f"epoch_{epoch:03d}").resolve()
        self._ckptr.save(path, variables, force=True)
        entry = {
            "epoch": epoch,
            "path": str(path),
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
        }
        if opt_state is not None:
            opt_path = (self.directory / f"epoch_{epoch:03d}_opt").resolve()
            self._ckptr.save(opt_path, opt_state, force=True)
            entry["opt_path"] = str(opt_path)
        # StandardCheckpointer saves asynchronously; finalize before the
        # index records it so resume never races a half-written checkpoint
        self._ckptr.wait_until_finished()
        # multi-host training: every process participates in the orbax
        # save/finalize barriers above, but the index json + pruning are
        # the primary's alone (parallel/multihost.py)
        from jaeger_tpu.parallel.multihost import is_primary

        if not is_primary():
            return path
        index = [e for e in self._index() if e["epoch"] != epoch]
        index.append(entry)
        index.sort(key=lambda e: e["epoch"])
        # prune old checkpoints beyond `keep`
        while len(index) > self.keep:
            old = index.pop(0)
            import shutil

            for p in (old.get("path"), old.get("opt_path")):
                if p and Path(p).exists():
                    shutil.rmtree(p, ignore_errors=True)
        self._write_index(index)
        return path

    def latest(self) -> dict | None:
        index = self._index()
        return index[-1] if index else None

    def best(self, monitor: str = "val_loss", mode: str = "min") -> dict | None:
        index = [e for e in self._index() if monitor in e.get("metrics", {})]
        if not index:
            return self.latest()
        key = lambda e: e["metrics"][monitor]  # noqa: E731
        return min(index, key=key) if mode == "min" else max(index, key=key)

    def restore(self, entry: dict, template: Any) -> Any:
        return self._ckptr.restore(Path(entry["path"]).resolve(), template)

    def restore_opt_state(self, entry: dict, template: Any) -> Any:
        """Restore the optimizer state saved with this entry; returns the
        (fresh) template untouched for pre-upgrade checkpoints that carry
        only weights."""
        opt_path = entry.get("opt_path")
        if not opt_path or not Path(opt_path).exists():
            return template
        try:
            return self._ckptr.restore(Path(opt_path).resolve(), template)
        except Exception as exc:  # structure mismatch: optimizer config
            # changed between save and resume (different optimizer,
            # accumulation_steps, schedule) — degrade to weights-only
            # resume like pre-upgrade checkpoints instead of crashing
            import logging

            logging.getLogger("jaeger_tpu").warning(
                "saved optimizer state at %s does not match the current "
                "optimizer configuration (%s); resuming with fresh "
                "optimizer state (weights-only resume)", opt_path, exc)
            return template


class TrainingStatePersistence:
    """training_state.json: epoch counter + callback states + LR."""

    def __init__(self, directory: str | Path):
        self.path = Path(directory) / "training_state.json"

    def save(self, epoch: int, lr: float | None, callbacks: dict) -> None:
        state = {"epoch": epoch, "learning_rate": lr}
        for name in ("early_stopping", "reduce_lr"):
            if name in callbacks:
                state[name] = callbacks[name].state()
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(state, indent=1))

    def load(self) -> dict | None:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return None

    def restore_into(self, callbacks: dict) -> dict | None:
        state = self.load()
        if state is None:
            return None
        for name in ("early_stopping", "reduce_lr"):
            if name in callbacks and name in state:
                callbacks[name].restore(state[name])
        return state


def write_convergence_marker(directory: str | Path, branch: str,
                             info: dict) -> None:
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    (directory / "converged.json").write_text(
        json.dumps({"branch": branch, **info})
    )


def read_convergence_marker(directory: str | Path) -> dict | None:
    marker = Path(directory) / "converged.json"
    if marker.exists():
        return json.loads(marker.read_text())
    return None


def resolve_resume_stage(checkpoint_root: Path) -> tuple[str | None, dict | None]:
    """Most advanced stage with a checkpoint wins:
    reliability > classifier > projection (reference
    ``nnlib/builder.py:460-471``)."""
    for stage in ("reliability", "classifier", "projection"):
        mgr_dir = checkpoint_root / stage
        if (mgr_dir / "checkpoints.json").exists():
            mgr = CheckpointManager(mgr_dir)
            entry = mgr.latest()
            if entry:
                return stage, entry
    return None, None
