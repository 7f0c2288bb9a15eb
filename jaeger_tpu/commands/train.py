"""Training orchestration.

Parity target: reference ``commands/train.py:603-1242``
(``train_fragment_core``): config-driven branch training
(projection-pretrain -> classifier -> reliability), convergence markers,
checkpoint/resume, SavedModel-equivalent export. This first revision
covers the classifier branch end-to-end (data -> jitted step -> metrics ->
export); the projection/reliability branches and threshold tuning land
with the training milestone.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax
import numpy as np

from jaeger_tpu.models.artifacts import save_model
from jaeger_tpu.models.builder import ModelBuilder, load_model_config
from jaeger_tpu.parallel import mesh as meshlib
from jaeger_tpu.train import data as data_lib
from jaeger_tpu.train.loop import StepConfig, TrainState, make_train_step, shard_train_step
from jaeger_tpu.train.optimizers import make_optimizer

logger = logging.getLogger("jaeger_tpu")


def _fragment_paths(train_cfg: dict, key: str = "fragment_classifier_data"):
    """Flatten the config's data section (reference nnlib/builder.py:1726)."""
    out: dict[str, dict] = {}
    for split, entries in (train_cfg.get(key) or {}).items():
        paths, labels, classes = [], [], []
        for entry in entries:
            paths.extend(entry.get("path", []))
            labels.extend(entry.get("label", []))
            classes.extend(entry.get("class", []))
        out[split] = {"paths": paths, "label": labels, "class": classes}
    return out


def write_convergence_marker(directory: Path, branch: str, info: dict) -> None:
    """Parity: reference ``commands/train.py:83-95`` converged.json."""
    directory.mkdir(parents=True, exist_ok=True)
    (directory / "converged.json").write_text(
        json.dumps({"branch": branch, **info})
    )


def read_convergence_marker(directory: Path) -> dict | None:
    marker = directory / "converged.json"
    if marker.exists():
        return json.loads(marker.read_text())
    return None


def train_fragment_core(
    config_path: str,
    output_dir: str | None = None,
    epochs_override: int | None = None,
    steps_override: int | None = None,
    batch_override: int | None = None,
    use_mesh: bool = True,
    save: bool = True,
) -> dict:
    config = load_model_config(config_path)
    model_cfg = config.get("model", {})
    train_cfg = config.get("training", {})

    builder = ModelBuilder(config)
    model, variables = builder.init()
    codons, crop_nt = builder.crop
    num_classes = int(model_cfg.get("classifier_out_dim", 3))

    batch_size = int(batch_override or train_cfg.get("batch_size", 64))
    epochs = int(
        epochs_override
        if epochs_override is not None
        else train_cfg.get("classifier_epochs", 1)
    )
    steps_per_epoch = int(
        steps_override or train_cfg.get("classifier_train_steps", 100)
    )

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = meshlib.data_mesh()
        batch_size = meshlib.pad_to_multiple(batch_size, mesh.devices.size)

    tx = make_optimizer(
        train_cfg.get("optimizer", "adam"),
        train_cfg.get("optimizer_params", {}),
        accumulation_steps=int(train_cfg.get("accumulation_steps", 1) or 1),
    )
    state = TrainState.create(variables, tx)

    class_weights = None
    cw = train_cfg.get("classifier_class_weights")
    if cw:
        class_weights = np.ones(num_classes, np.float32)
        for k, v in cw.items():
            class_weights[int(k)] = float(v)
        import jax.numpy as jnp

        class_weights = jnp.asarray(class_weights)

    step_fn = make_train_step(
        model,
        StepConfig(
            loss_name=train_cfg.get("loss_classifier",
                                    "categorical_crossentropy"),
            loss_params=train_cfg.get("loss_params_classifier", {}),
            class_weights=class_weights,
            reg_specs=tuple(builder.regularizer_specs()),
        ),
    )
    if mesh is not None:
        step_fn = shard_train_step(step_fn, mesh)
    else:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))

    paths = _fragment_paths(train_cfg)
    train_paths = paths.get("train", {}).get("paths", [])
    if not train_paths:
        raise ValueError("no fragment_classifier_data.train paths configured")

    sp = model_cfg.get("string_processor", {})
    labels_src = sp.get("classifier_labels", [])
    labels_dst = sp.get("classifier_labels_map", [])
    label_map = (
        {int(a): int(b) for a, b in zip(labels_src, labels_dst)}
        if labels_src and labels_dst else None
    )

    rng = jax.random.PRNGKey(int(model_cfg.get("seed", 42)))
    history = []
    t0 = time.time()
    for epoch in range(epochs):
        batches = data_lib.batches_from_csv(
            train_paths, batch_size=batch_size, crop_nt=crop_nt,
            num_classes=num_classes,
            shuffle_buffer=int(sp.get("buffer_size", 50000)),
            seed=int(model_cfg.get("seed", 42)) + epoch,
            label_map=label_map,
        )
        metrics = None
        for i, batch in enumerate(batches):
            if i >= steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            import jax.numpy as jnp

            dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, dev_batch, step_rng)
        if metrics is not None:
            metrics = {k: float(v) for k, v in metrics.items()}
            history.append({"epoch": epoch, **metrics})
            logger.info(f"epoch {epoch}: {metrics}")

    elapsed = time.time() - t0
    result = {
        "history": history,
        "elapsed_s": elapsed,
        "steps": int(state.step),
        "params": int(
            sum(x.size for x in jax.tree.leaves(state.params))
        ),
    }

    if save:
        out = Path(
            output_dir
            or train_cfg.get("model_saving", {}).get("path", "model_out")
        )
        save_model(state.variables, config, out)
        write_convergence_marker(out, "classifier", {
            "steps": int(state.step), "history": history[-1:] if history else [],
        })
        result["model_path"] = str(out)
        logger.info(f"model saved to {out}")
    return result
