"""Training orchestration: projection -> classifier -> reliability.

Parity target: reference ``commands/train.py:603-1242``
(``train_fragment_core``) — config-driven branch training with
convergence markers, per-epoch checkpointing + resume, callback state
persistence, reliability data generation, threshold tuning, refinement
fitting, and model export. The inner loop is the jitted data-parallel
step from :mod:`jaeger_tpu.train.loop`.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from jaeger_tpu.models.artifacts import save_model
from jaeger_tpu.models.builder import ModelBuilder, load_model_config
from jaeger_tpu.parallel import mesh as meshlib
from jaeger_tpu.parallel import multihost as mh
from jaeger_tpu.train import data as data_lib
from jaeger_tpu.train import losses as losses_lib
from jaeger_tpu.train.callbacks import build_callbacks
from jaeger_tpu.train.checkpoint import (
    CheckpointManager,
    TrainingStatePersistence,
    read_convergence_marker,
    resolve_resume_stage,
    write_convergence_marker,
)
from jaeger_tpu.train.loop import (
    StepConfig,
    TrainState,
    make_dispatching_train_step,
)
from jaeger_tpu.train.optimizers import (
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)

logger = logging.getLogger("jaeger_tpu")


def _fragment_paths(train_cfg: dict, key: str = "fragment_classifier_data"):
    """Flatten a data section (reference ``nnlib/builder.py:1726-1744``)."""
    out: dict[str, dict] = {}
    for split, entries in (train_cfg.get(key) or {}).items():
        paths, labels, classes = [], [], []
        for entry in entries:
            paths.extend(entry.get("path", []))
            labels.extend(entry.get("label", []))
            classes.extend(entry.get("class", []))
        out[split] = {"paths": paths, "label": labels, "class": classes}
    return out


def _label_map(sp: dict, kind: str = "classifier") -> dict[int, int] | None:
    src = sp.get(f"{kind}_labels", [])
    dst = sp.get(f"{kind}_labels_map", [])
    if src and dst:
        return {int(a): int(b) for a, b in zip(src, dst)}
    return None


def _class_weights(train_cfg: dict, key: str, num_classes: int):
    cw = train_cfg.get(key)
    if not cw:
        return None
    weights = np.ones(num_classes, np.float32)
    for k, v in cw.items():
        weights[int(k)] = float(v)
    return jnp.asarray(weights)


def _make_eval_fn(model, loss_name: str, output_key: str = "prediction",
                  seq_mesh=None, global_batcher=None):
    loss_fn = losses_lib.LOSSES[loss_name]

    @jax.jit
    def eval_step(variables, batch):
        inputs = {k: v for k, v in batch.items() if k != "labels"}
        out = model.apply(variables, inputs, train=False,
                          heads=(output_key,))
        logits = out[output_key]
        loss = loss_fn(batch["labels"], logits)
        if logits.shape[-1] == 1:
            acc = jnp.mean(
                (logits[:, 0] > 0).astype(jnp.float32)
                == batch["labels"].reshape(-1)
            )
        else:
            acc = jnp.mean(
                jnp.argmax(logits, -1) == jnp.argmax(batch["labels"], -1)
            )
        return loss, acc

    def evaluate(variables, batches, max_steps: int) -> dict:
        losses, accs = [], []
        for i, batch in enumerate(batches):
            if i >= max_steps:
                break
            if global_batcher is not None:
                # multi-host: variables are already global (state round
                # trip); the identical full host batch becomes a global
                # row-sharded array and the scalar outputs come back
                # fully replicated — every process sees the same metrics.
                # A short FINAL validation batch (rows not divisible by
                # the device count) is replicated instead: every device
                # computes it redundantly, metrics identical.
                n_dev = global_batcher.mesh.devices.size
                rows = len(next(iter(batch.values())))
                dev = (global_batcher.shard(dict(batch))
                       if rows % n_dev == 0
                       else global_batcher.replicate(dict(batch)))
                variables = global_batcher.replicate(variables)
            else:
                dev = {k: jnp.asarray(v) for k, v in batch.items()}
            if seq_mesh is not None:
                # seq_axis models need the ambient mesh (Hyena ring)
                with jax.set_mesh(seq_mesh):
                    loss, acc = eval_step(variables, dev)
            else:
                loss, acc = eval_step(variables, dev)
            losses.append(float(loss))
            accs.append(float(acc))
        if not losses:
            return {}
        return {
            "val_loss": float(np.mean(losses)),
            "val_accuracy": float(np.mean(accs)),
        }

    return evaluate


def _run_branch(
    branch: str,
    model,
    state: TrainState,
    step_fn,
    make_train_batches,
    make_val_batches,
    epochs: int,
    steps_per_epoch: int,
    val_steps: int,
    ckpt_dir: Path,
    callbacks: dict,
    evaluate,
    rng,
    start_epoch: int = 0,
) -> tuple[TrainState, list[dict]]:
    """One branch's epoch loop with callbacks + checkpoints.

    Multi-host: every process runs this loop in lockstep on identical
    batch streams and metrics (parallel/multihost.py), so callback
    decisions (early stop, LR reduction) are consistent; only the
    primary process touches the filesystem (checkpoints, training
    state, CSV logs).
    """
    from jaeger_tpu.parallel import multihost as mh

    primary = mh.is_primary()
    mgr = CheckpointManager(ckpt_dir)
    persist = TrainingStatePersistence(ckpt_dir)
    history: list[dict] = []
    nan_guard = callbacks.get("nan_guard")
    early = callbacks.get("early_stopping")
    reduce_lr = callbacks.get("reduce_lr")
    csv_logger = callbacks.get("csv_logger")

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        metrics = None
        for i, batch in enumerate(make_train_batches(epoch)):
            if i >= steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            # host batch passes straight through: the dispatching step
            # reads it on host for program selection, then jit uploads
            state, metrics = step_fn(state, batch, step_rng)
            if nan_guard is not None and i % 50 == 0:
                if nan_guard.on_step(float(metrics["loss"])):
                    logger.error(f"{branch}: non-finite loss, stopping")
                    return state, history
        if metrics is None:
            break
        epoch_metrics = {k: float(v) for k, v in metrics.items()}
        if make_val_batches is not None and val_steps > 0:
            epoch_metrics.update(
                evaluate(state.variables, make_val_batches(), val_steps)
            )
        epoch_metrics["epoch_time_s"] = time.time() - t0
        history.append({"epoch": epoch, **epoch_metrics})
        logger.info(f"{branch} epoch {epoch}: {epoch_metrics}")
        if csv_logger is not None and primary:
            csv_logger.on_epoch_end(epoch, epoch_metrics)

        # ALL processes call save (orbax's save/wait are global sync
        # points — skipping them on non-primary deadlocks the barrier);
        # the trees are host numpy (fully replicated), orbax writes them
        # once, and CheckpointManager gates its index bookkeeping to the
        # primary internally
        mgr.save(epoch, mh.tree_to_host(state.variables),
                 epoch_metrics,
                 opt_state=mh.tree_to_host(state.opt_state))
        lr = get_learning_rate(state.opt_state)
        if reduce_lr is not None:
            new_lr = reduce_lr.on_epoch_end(epoch_metrics, lr, epoch=epoch)
            if new_lr is not None:
                logger.info(f"{branch}: reducing lr {lr} -> {new_lr}")
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, new_lr)
                )
                lr = new_lr
        if primary:
            persist.save(epoch, lr, callbacks)
        if early is not None and early.on_epoch_end(
            epoch_metrics, state.params, epoch=epoch
        ):
            logger.info(f"{branch}: early stopping at epoch {epoch}")
            if early.restore_best_weights and early.best_params is not None:
                state = state.replace(params=early.best_params)
            break
    if csv_logger is not None:
        csv_logger.close()
    return state, history


#: file/dir names our own training layout writes into the output dir —
#: re-runs over these are governed by convergence markers and resume,
#: not the clobber guard
_OWN_ARTIFACTS = frozenset({
    "checkpoints", "params.msgpack", "project.yaml", "classes.yaml",
    "reliability_data", "reliability_threshold.tsv", "history.csv",
    "refine.yaml", "int8",
})


def ensure_save_path_available(path, force: bool = False,
                               resuming: bool = False) -> None:
    """Refuse to train into a directory holding foreign content.

    Role parity: reference ``nnlib/builder.py:1431-1447``
    (``ensure_save_path_available`` + ``--force``). Divergence: a
    directory containing only our own training layout is allowed
    through — convergence markers and checkpoint resume already make
    re-runs safe and incremental — so the guard fires only for content
    we did not write (and ``--force`` bypasses it entirely).
    """
    path = Path(path)
    if force or resuming or not path.exists():
        return
    foreign = [c.name for c in path.iterdir()
               if c.name not in _OWN_ARTIFACTS
               and not c.name.endswith((".log", ".csv"))]
    if foreign:
        logger.warning(
            "output directory %s already contains %s. "
            "Use --force to overwrite.", path, sorted(foreign)[:5],
        )
        raise SystemExit(1)


def _apply_frequency_biases(config, variables, train_paths, train_cfg, sp,
                            reliability_paths=None, branches=None):
    """Initialize configured dense biases from training label counts.

    Parity: reference ``nnlib/builder.py:1040-1072`` — a layer config
    with ``bias_initializer: calculate_from_data`` gets its bias set to
    the class-frequency log-prior of the last training file (softmax
    kind, or sigmoid when the branch loss is binary).
    """
    import jax

    from jaeger_tpu.train.data import class_frequency_bias

    model_cfg = config.get("model", {})
    targets = []  # (branch params key, lname, kind, label_map, paths)
    for branch, loss_key, map_kind in (
        ("classifier", "loss_classifier", "classifier"),
        ("reliability_model", "loss_reliability", "reliability"),
    ):
        if branches is not None and branch not in branches:
            continue
        # reliability biases come from the reliability dataset's label
        # frequencies (reference _set_reliability_bias), not the
        # fragment data
        branch_paths = (
            reliability_paths if branch == "reliability_model"
            else train_paths
        ) or []
        bcfg = model_cfg.get(branch) or {}
        for i, entry in enumerate(bcfg.get("hidden_layers", [])):
            init = str((entry.get("config") or {}).get(
                "bias_initializer", ""))
            if "calculate_from" not in init:
                continue
            loss_name = str(train_cfg.get(loss_key, "") or "")
            kind = "sigmoid" if "binary" in loss_name else "softmax"
            key = "classifier" if branch == "classifier" else "reliability"
            lmap = sp.get(f"{map_kind}_labels_map") or []
            if not branch_paths:
                continue
            targets.append((key, f"{entry.get('name')}_{i}", kind, lmap,
                            branch_paths))
    if not targets:
        return variables

    variables = jax.tree_util.tree_map(lambda x: x, variables)

    def to_mutable(d):
        return {k: to_mutable(v) for k, v in d.items()} if hasattr(
            d, "items") else d

    variables = to_mutable(variables)
    for key, lname, kind, lmap, branch_paths in targets:
        node = variables["params"].get(key, {}).get(lname)
        if node is None or "bias" not in node:
            logger.warning(f"bias_initializer target {key}/{lname} "
                           f"not found; skipping")
            continue
        bias = class_frequency_bias(branch_paths[-1], kind=kind,
                                    label_map=list(lmap))
        want = np.asarray(node["bias"]).shape[0]
        if bias.shape[0] != want:
            bias = np.resize(bias, want) if want % bias.shape[0] == 0 \
                else None
        if bias is None:
            logger.warning(
                f"class-frequency bias length mismatch for {key}/{lname}")
            continue
        node["bias"] = jnp.asarray(bias, jnp.float32)
        logger.info(f"initialized {key}/{lname} bias from label "
                    f"frequencies of {branch_paths[-1]}")
    return variables


def _decide_seq_mesh(config: dict, use_mesh: bool):
    """Sequence-parallel mesh for a ``model.parallel.seq_axis`` config
    (the devices length-shard the Hyena long convolutions instead of the
    batch — parallel/hyena_sp ring, differentiable; mirrors
    ``predict --seq-shard``). ``training.seq_shard`` caps the width.
    Returns None when no mesh can materialize (one device, width 1,
    ``use_mesh=False``) — callers then run the unsharded twin."""
    model_cfg = config.get("model", config)
    seq_axis = (model_cfg.get("parallel") or {}).get("seq_axis")
    if not (use_mesh and seq_axis and len(jax.devices()) > 1):
        return None
    train_cfg = config.get("training", {})
    width = max(1, min(int(train_cfg.get("seq_shard", 0) or 0)
                       or len(jax.devices()), len(jax.devices())))
    if width <= 1:
        return None
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:width]), (str(seq_axis),))
    logger.info(f"sequence-sharded Hyena training over {width} "
                f"devices (axis {seq_axis!r})")
    return mesh


def train_fragment_core(*args, **kwargs) -> dict:
    """Public entry: decides the sequence-parallel mesh up front and runs
    the whole orchestration under ``jax.set_mesh`` when one exists, so
    EVERY model forward — projection pretraining, train steps, eval,
    reliability generation, threshold tuning — traces with the ambient
    mesh the seq_axis shard_map islands require."""
    import inspect

    # bind against the impl signature so use_mesh is read by NAME —
    # a positional index would silently break if a parameter is ever
    # inserted before it
    sig = inspect.signature(_train_fragment_core_impl)
    bound = sig.bind_partial(*args, **kwargs)
    config_path = bound.arguments["config_path"]
    use_mesh = bound.arguments.get(
        "use_mesh", sig.parameters["use_mesh"].default)
    seq_mesh = _decide_seq_mesh(load_model_config(config_path), use_mesh)
    if seq_mesh is None:
        return _train_fragment_core_impl(*args, _seq_mesh=None, **kwargs)
    with jax.set_mesh(seq_mesh):
        return _train_fragment_core_impl(*args, _seq_mesh=seq_mesh,
                                         **kwargs)


def _train_fragment_core_impl(
    config_path: str,
    output_dir: str | None = None,
    epochs_override: int | None = None,
    steps_override: int | None = None,
    batch_override: int | None = None,
    use_mesh: bool = True,
    save: bool = True,
    self_supervised_pretraining: bool = False,
    generate_reliability: bool | None = None,
    from_last_checkpoint: bool = False,
    force: bool = False,
    ignore_convergence: bool = False,
    only_classification_head: bool = False,
    only_reliability_head: bool = False,
    only_save: bool = False,
    id_threshold: float | None = None,
    synthetic_ood_threshold: float | None = None,
    synthetic_ood_multiplier: float | None = None,
    masking: bool | None = None,
    precision: str | None = None,
    meta: str | None = None,
    _seq_mesh=None,
) -> dict:
    config = load_model_config(config_path)
    model_cfg = config.get("model", {})
    train_cfg = config.get("training", {})
    sp = model_cfg.get("string_processor", {})

    # CLI masking override (reference cli.py --masking/--no-masking:
    # takes precedence over model.use_masking)
    if masking is not None:
        model_cfg["use_masking"] = bool(masking)

    # mixed-precision policy (reference commands/train.py:61-63,635-647:
    # mixed_bfloat16 global policy): compute in bf16, params stay f32
    # (our layers force f32 islands for norm statistics internally).
    # --precision overrides the config (fp16 maps to bf16 on the MXU).
    policy = str(
        precision if precision is not None
        else train_cfg.get("mixed_precision", "") or "").lower()
    compute_dtype = (
        jnp.bfloat16
        if policy in ("bfloat16", "mixed_bfloat16", "bf16", "fp16",
                      "mixed_float16", "float16")
        else jnp.float32
    )
    # sequence-parallel mesh: decided by the train_fragment_core wrapper
    # (which also enters jax.set_mesh around this whole function, so
    # every forward traces under the ambient mesh)
    seq_mesh = _seq_mesh
    seq_axis = (model_cfg.get("parallel") or {}).get("seq_axis")

    builder = ModelBuilder(config, dtype=compute_dtype)
    if seq_axis:
        # the shard_map island needs the ambient seq mesh: initialize
        # (and, when no mesh materialized — one device, seq_shard 1,
        # --no-mesh — also RUN) a twin without the knob; the param tree
        # is identical either way
        import copy

        init_cfg = copy.deepcopy(config)
        (init_cfg.get("model", init_cfg)).get("parallel", {}).pop(
            "seq_axis", None)
        init_builder = ModelBuilder(init_cfg, dtype=compute_dtype)
        _, variables = init_builder.init()
        model = (builder.build() if seq_mesh is not None
                 else init_builder.build())
    else:
        model, variables = builder.init()
    codons, crop_nt = builder.crop
    num_classes = int(model_cfg.get("classifier_out_dim", 3))
    seed = int(model_cfg.get("seed", 42))
    rng = jax.random.PRNGKey(seed)

    out_root = Path(
        output_dir
        or train_cfg.get("model_saving", {}).get("path", "model_out")
    )
    ckpt_root = out_root / "checkpoints"
    ensure_save_path_available(out_root, force=force,
                               resuming=from_last_checkpoint)
    data_format = sp.get("data_format", "csv")

    batch_size = int(batch_override or train_cfg.get("batch_size", 64))
    mesh = None
    global_batcher = None
    if use_mesh and seq_mesh is None and len(jax.devices()) > 1:
        mesh = meshlib.data_mesh()
        batch_size = meshlib.pad_to_multiple(batch_size, mesh.devices.size)
        if mh.is_multiprocess():
            # multi-host training: the mesh above is GLOBAL (jax.devices()
            # spans processes after initialize_distributed); every process
            # loads the identical deterministic batch stream and the
            # batcher turns it into row-sharded global arrays — see
            # parallel/multihost.py. batch_size is the GLOBAL batch.
            global_batcher = mh.GlobalBatcher(mesh)
            logger.info(
                f"multi-host training: process "
                f"{jax.process_index()}/{jax.process_count()}, "
                f"{mesh.devices.size} global devices, "
                f"global batch {batch_size}")

    # --- resume (reliability > classifier > projection) ---
    # --only_save = export the last-checkpoint weights without training
    # (reference commands/train.py:529,734)
    if only_save:
        from_last_checkpoint = True
    start_epochs = {"projection": 0, "classifier": 0, "reliability": 0}
    resume_entry: dict | None = None
    resume_stage: str | None = None
    if from_last_checkpoint:
        stage, entry = resolve_resume_stage(ckpt_root)
        if stage is not None:
            mgr = CheckpointManager(ckpt_root / stage)
            variables = mgr.restore(entry, variables)
            start_epochs[stage] = entry["epoch"] + 1
            resume_entry, resume_stage = entry, stage
            logger.info(
                f"resumed from {stage} checkpoint epoch {entry['epoch']}"
            )

    def _resume_opt_state(stage: str, state):
        """Continue the interrupted stage's Adam moments / accumulator /
        schedule step instead of re-zeroing them (beats the reference's
        documented caveat, nnlib/builder.py:166-175)."""
        if resume_stage != stage or resume_entry is None:
            return state
        mgr = CheckpointManager(ckpt_root / stage)
        restored = mgr.restore_opt_state(resume_entry, state.opt_state)
        if restored is not state.opt_state:
            logger.info(f"restored {stage} optimizer state "
                        f"(epoch {resume_entry['epoch']})")
        return state.replace(opt_state=restored)

    paths = _fragment_paths(train_cfg)
    train_paths = paths.get("train", {}).get("paths", [])
    val_paths = paths.get("validation", {}).get("paths", [])
    label_map = _label_map(sp)

    # frequency-bias init applies to FRESH weights only — re-applying it
    # after a checkpoint restore would clobber the trained bias
    # (reference parity: _get_bias runs at build time, not on resume)
    if not any(start_epochs.values()):
        variables = _apply_frequency_biases(
            config, variables, train_paths, train_cfg, sp,
            branches=("classifier",),
        )

    def csv_batches(paths_, epoch_seed, repeat=True):
        return data_lib.batches_from_csv(
            paths_, batch_size=batch_size, crop_nt=crop_nt,
            num_classes=num_classes,
            shuffle_buffer=int(sp.get("buffer_size", 50000)),
            seed=seed + epoch_seed, label_map=label_map, repeat=repeat,
        )

    def npz_batches(paths_, epoch_seed, repeat=True):
        # runtime-crop path (reference loaders.py:505-530): engaged when
        # the config requests crops over full-length stored records;
        # validation uses its own crop settings (train.py:199-226 parity)
        val = not repeat
        crop_sizes = sp.get(
            "validation_crop_sizes" if val else "crop_sizes"
        ) or sp.get("crop_sizes")
        if crop_sizes:
            return data_lib.cropped_batches_from_npz(
                paths_[0], batch_size=batch_size, num_classes=num_classes,
                crop_sizes=crop_sizes,
                strides=sp.get("validation_strides" if val else "strides"),
                overlap=sp.get("validation_overlap" if val else "overlap"),
                crop_mode=sp.get("crop_mode", "all"),
                seed=seed + epoch_seed, repeat=repeat,
            )
        return data_lib.batches_from_npz(
            paths_[0], batch_size=batch_size, num_classes=num_classes,
            seed=seed + epoch_seed, repeat=repeat,
        )

    _make_raw = npz_batches if data_format == "numpy" else csv_batches
    shuffle_frames = bool(sp.get("shuffle_frames", False))

    def make_batches(paths_, epoch_seed, repeat=True):
        batches = _make_raw(paths_, epoch_seed, repeat=repeat)
        # frame-order augmentation on training data only
        if shuffle_frames and repeat:
            batches = data_lib.with_frame_shuffle(
                batches, seed=seed + 7919 * (epoch_seed + 1))
        return batches

    reg_specs = tuple(builder.regularizer_specs())
    history: dict = {}
    results: dict = {"model": model_cfg.get("name", "jaeger_model")}

    def read_convergence_marker(branch_dir):
        # --ignore_convergence retrains finished branches (reference
        # commands/train.py flag of the same name)
        if ignore_convergence:
            return None
        from jaeger_tpu.train.checkpoint import (
            read_convergence_marker as _read,
        )
        return _read(branch_dir)

    # === 1. PROJECTION (self-supervised ArcFace pretraining) ===
    proj_cfg = model_cfg.get("projection")
    proj_epochs = int(train_cfg.get("projection_epochs", 0) or 0)
    proj_dir = ckpt_root / "projection"
    if (
        proj_cfg and proj_epochs > 0 and self_supervised_pretraining
        and train_paths and read_convergence_marker(proj_dir) is None
        and not (only_reliability_head or only_save)
    ):
        logger.info("training projection branch (ArcFace)")
        proj_dim = None
        for entry in reversed(proj_cfg.get("hidden_layers", [])):
            units = (entry.get("config") or {}).get("units")
            if units:
                proj_dim = int(units)
                break
        arcface = losses_lib.ArcFaceLoss(
            num_classes=num_classes, embedding_dim=proj_dim,
            margin=float(proj_cfg.get("margin", 0.5)),
            scale=float(proj_cfg.get("scale", 30.0)),
        )
        af_vars = arcface.init(
            rng, jnp.zeros((2, num_classes)), jnp.zeros((2, proj_dim))
        )
        tx = make_optimizer(
            train_cfg.get("optimizer", "adam"),
            train_cfg.get("optimizer_params", {}),
        )
        combined = {"model": variables["params"],
                    "arcface": af_vars["params"]}
        opt_state = tx.init(combined)
        batch_stats = variables.get("batch_stats", {})

        def proj_loss(params, stats, batch, step_rng):
            v = {"params": params["model"]}
            if stats:
                v["batch_stats"] = stats
            out, updates = model.apply(
                v, {k: x for k, x in batch.items() if k != "labels"},
                train=True, with_projection=True,
                heads=("projection",),
                rngs={"dropout": step_rng},
                mutable=["batch_stats"] if stats else [],
            )
            loss = arcface.apply(
                {"params": params["arcface"]},
                batch["labels"], out["projection"],
            )
            reg = losses_lib.regularization_loss(params["model"],
                                                 list(reg_specs))
            return loss + reg, (loss, updates.get("batch_stats", stats))

        @jax.jit
        def proj_step(params, stats, opt_state, batch, step_rng):
            (total, (loss, new_stats)), grads = jax.value_and_grad(
                proj_loss, has_aux=True
            )(params, stats, batch, step_rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        steps = int(
            steps_override or train_cfg.get("classifier_train_steps", 100)
        )
        proj_hist = []
        for epoch in range(proj_epochs):
            loss_val = None
            for i, batch in enumerate(make_batches(train_paths, epoch)):
                if i >= steps:
                    break
                rng, step_rng = jax.random.split(rng)
                dev = {k: jnp.asarray(v) for k, v in batch.items()}
                combined, batch_stats, opt_state, loss_val = proj_step(
                    combined, batch_stats, opt_state, dev, step_rng
                )
            if loss_val is not None:
                proj_hist.append(
                    {"epoch": epoch, "loss": float(loss_val)}
                )
                logger.info(f"projection epoch {epoch}: "
                            f"loss={float(loss_val):.4f}")
        variables = {"params": combined["model"]}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if mh.is_primary():
            write_convergence_marker(proj_dir, "projection",
                                     {"epochs": proj_epochs})
        history["projection"] = proj_hist

    # === 2. CLASSIFIER ===
    cls_epochs = int(
        epochs_override
        if epochs_override is not None
        else train_cfg.get("classifier_epochs", 1)
    )
    cls_dir = ckpt_root / "classifier"
    if cls_epochs > 0 and train_paths and (
        read_convergence_marker(cls_dir) is None or epochs_override
    ) and not (only_reliability_head or only_save):
        tx = make_optimizer(
            train_cfg.get("optimizer", "adam"),
            train_cfg.get("optimizer_params", {}),
            accumulation_steps=int(
                train_cfg.get("accumulation_steps", 1) or 1
            ),
        )
        state = _resume_opt_state("classifier",
                                  TrainState.create(variables, tx))
        # per-batch dense/masked program selection + SPMD over the data
        # mesh when one is configured (batch sharded, params replicated,
        # gradient/BN collectives inserted by XLA)
        step_fn = make_dispatching_train_step(
            model,
            StepConfig(
                loss_name=train_cfg.get(
                    "loss_classifier", "categorical_crossentropy"
                ),
                loss_params=train_cfg.get("loss_params_classifier", {}),
                class_weights=_class_weights(
                    train_cfg, "classifier_class_weights", num_classes
                ),
                reg_specs=reg_specs,
                # head-only fine-tuning freezes the representation
                # learner (reference commands/train.py:846-856,
                # --only_classification_head / --only_heads)
                frozen_prefixes=(
                    ("embedding", "translated_embedding", "rep",
                     "rep_branch", "projection")
                    if only_classification_head else ()
                ),
                heads=("prediction",),
            ),
            mesh=mesh, seq_mesh=seq_mesh, global_batcher=global_batcher,
        )
        callbacks = build_callbacks(
            train_cfg.get("callbacks", {}).get("classifier", [])
        )
        TrainingStatePersistence(cls_dir).restore_into(callbacks)
        evaluate = _make_eval_fn(
            model, train_cfg.get("loss_classifier",
                                 "categorical_crossentropy"),
            seq_mesh=seq_mesh, global_batcher=global_batcher,
        )
        steps = int(
            steps_override or train_cfg.get("classifier_train_steps", 100)
        )
        val_steps = int(train_cfg.get("classifier_validation_steps", 10))
        state, cls_hist = _run_branch(
            "classifier", model, state, step_fn,
            lambda e: make_batches(train_paths, e),
            (lambda: make_batches(val_paths, 999, repeat=False))
            if val_paths else None,
            cls_epochs, steps, val_steps, cls_dir, callbacks, evaluate,
            rng, start_epoch=start_epochs["classifier"],
        )
        # multi-host: replicated global leaves return to host numpy at
        # the branch boundary so downstream single-process code (bias
        # application, generation, export) runs unchanged on every process
        variables = mh.tree_to_host(state.variables)
        if mh.is_primary():
            write_convergence_marker(cls_dir, "classifier", {
                "epochs": cls_epochs,
                "final": cls_hist[-1] if cls_hist else {},
            })
        history["classifier"] = cls_hist

    # === 3. RELIABILITY ===
    rel_cfg = model_cfg.get("reliability_model")
    rel_epochs = int(train_cfg.get("reliability_epochs", 0) or 0)
    rel_dir = ckpt_root / "reliability"
    if generate_reliability is None:
        generate_reliability = bool(
            train_cfg.get("generate_reliability_data", False)
        )
    rel_paths = _fragment_paths(train_cfg, "fragment_reliability_data")
    if rel_cfg and rel_epochs > 0 and not only_save:
        if generate_reliability:
            from jaeger_tpu.dataops.reliability_generator import (
                generate_reliability_data,
            )

            # knobs from training.reliability_data_generation (reference
            # YAML schema: raw_csv_paths, output_dir,
            # synthetic_ood_multiplier, inference_batch_size,
            # perturbations — reference commands/train.py:895-940)
            gen_cfg = train_cfg.get("reliability_data_generation", {}) or {}
            raw_csvs = gen_cfg.get("raw_csv_paths") or {}
            raw_train = (
                raw_csvs.get("train")
                or (train_paths[0] if train_paths else None)
                or gen_cfg.get("raw_csv_path")
            )
            if not raw_train:
                raise ValueError(
                    "--generate_reliability_data requires raw CSV "
                    "sequences. Set reliability_data_generation."
                    "raw_csv_paths.train in the config or provide CSV "
                    "classifier training data."
                )
            if rel_paths.get("train", {}).get("paths"):
                logger.warning(
                    "--generate_reliability_data is active; ignoring "
                    "fragment_reliability_data paths provided in the "
                    "config"
                )
            gen_out = (gen_cfg.get("output_dir")
                       or str(out_root / "reliability_data"))
            if mh.is_multiprocess() and not mh.is_primary():
                # generation is deterministic (seeded); every process
                # produces identical data, but only the primary may
                # write the canonical dir — others use a scratch copy
                gen_out = str(Path(gen_out).with_name(
                    Path(gen_out).name
                    + f".proc{jax.process_index()}"))
            rel_paths = generate_reliability_data(
                model, variables, raw_train,
                gen_out, crop_nt,
                id_threshold=float(
                    id_threshold if id_threshold is not None
                    else gen_cfg.get("id_threshold", 0.8)),
                synthetic_ood_threshold=float(
                    synthetic_ood_threshold
                    if synthetic_ood_threshold is not None
                    else gen_cfg.get("synthetic_ood_threshold", 0.8)),
                synthetic_ood_multiplier=float(
                    synthetic_ood_multiplier
                    if synthetic_ood_multiplier is not None
                    else gen_cfg.get("synthetic_ood_multiplier", 1.0)),
                batch_size=int(
                    gen_cfg.get("inference_batch_size", 512)),
                perturbations=gen_cfg.get("perturbations"),
                val_fraction=float(gen_cfg.get("val_fraction", 0.1)),
                raw_val_csv_path=(
                    gen_cfg.get("raw_csv_paths") or {}).get("val"),
                synthetic_source_sample_size=gen_cfg.get(
                    "synthetic_source_sample_size"),
            )
        rel_train = rel_paths.get("train", {}).get("paths", [])
        rel_val = rel_paths.get("validation", {}).get("paths", [])
        # (re)apply the reliability head's frequency bias now that its
        # data exists — covers --generate_reliability_data runs
        # (reference _set_reliability_bias, nnlib/builder.py:952-990)
        if start_epochs["reliability"] == 0:
            variables = _apply_frequency_biases(
                config, variables, train_paths, train_cfg, sp,
                reliability_paths=rel_train,
                branches=("reliability_model",),
            )
        if rel_train:
            logger.info("training reliability branch (rep+classifier frozen)")
            tx = make_optimizer(
                train_cfg.get("optimizer", "adam"),
                train_cfg.get("optimizer_params", {}),
            )
            state = _resume_opt_state("reliability",
                                      TrainState.create(variables, tx))
            step_fn = make_dispatching_train_step(
                model,
                StepConfig(
                    loss_name=train_cfg.get(
                        "loss_reliability", "binary_crossentropy"
                    ),
                    loss_params=train_cfg.get(
                        "loss_params_reliability", {}
                    ),
                    output_key="reliability",
                    frozen_prefixes=(
                        "embedding", "rep", "classifier", "projection",
                    ),
                    heads=("reliability",),
                ),
                mesh=mesh, seq_mesh=seq_mesh,
                global_batcher=global_batcher,
            )

            def rel_batches(paths_, epoch_seed, repeat=True):
                return data_lib.batches_from_csv(
                    paths_, batch_size=batch_size, crop_nt=crop_nt,
                    num_classes=1, seed=seed + epoch_seed, repeat=repeat,
                    label_map=_label_map(sp, "reliability"),
                )

            callbacks = build_callbacks(
                train_cfg.get("callbacks", {}).get("reliability", [])
            )
            evaluate = _make_eval_fn(
                model, train_cfg.get("loss_reliability",
                                     "binary_crossentropy"),
                output_key="reliability", seq_mesh=seq_mesh,
                global_batcher=global_batcher,
            )
            steps = int(
                steps_override
                or train_cfg.get("reliability_train_steps", 100)
            )
            val_steps = int(
                train_cfg.get("reliability_validation_steps", 10)
            )
            state, rel_hist = _run_branch(
                "reliability", model, state, step_fn,
                lambda e: rel_batches(rel_train, e),
                (lambda: rel_batches(rel_val, 999, repeat=False))
                if rel_val else None,
                rel_epochs, steps, val_steps, rel_dir, callbacks, evaluate,
                rng, start_epoch=start_epochs["reliability"],
            )
            variables = mh.tree_to_host(state.variables)
            if mh.is_primary():
                write_convergence_marker(rel_dir, "reliability",
                                         {"epochs": rel_epochs})
            history["reliability"] = rel_hist

            # --- threshold tuning + calibration (reference
            # commands/train.py:1144-1195) ---
            if rel_val:
                scores, labels = _collect_reliability_scores(
                    model, variables, rel_val[0], crop_nt, batch_size
                )
                if np.unique(labels).size >= 2:
                    from jaeger_tpu.postprocess.threshold import (
                        calibration_summary,
                        tune_reliability_threshold,
                        write_calibration_outputs,
                        write_threshold_outputs,
                    )

                    best, rows, summary = tune_reliability_threshold(
                        scores, labels
                    )
                    if mh.is_primary():
                        write_threshold_outputs(rel_dir, best, rows)
                    ece, brier, cal_rows = calibration_summary(
                        scores, labels
                    )
                    if mh.is_primary():
                        write_calibration_outputs(rel_dir, cal_rows)
                    results["reliability_threshold"] = best
                    results["reliability_auroc"] = summary["auroc"]
                    logger.info(
                        f"reliability threshold={best} "
                        f"auroc={summary['auroc']:.3f} ece={ece:.3f}"
                    )

    results["history"] = history
    results["params"] = int(
        sum(x.size for x in jax.tree.leaves(variables["params"]))
    )

    trained_this_run = bool(history) or any(
        start_epochs.values()  # a resume restored trained weights
    )
    if save and mh.is_multiprocess() and not mh.is_primary():
        # non-primary processes computed identical results; the export,
        # int8 calibration and metadata are the primary's to write
        results["model_path"] = str(out_root)
        return results
    if save:
        if not trained_this_run and (out_root / "params.msgpack").exists():
            # every branch was convergence-skipped: `variables` still
            # holds fresh init — re-saving would clobber the trained
            # bundle with random weights
            results["model_path"] = str(out_root)
            logger.info(
                "all branches already converged; existing model at "
                f"{out_root} left untouched"
            )
        else:
            save_model(variables, config, out_root)
            results["model_path"] = str(out_root)
            logger.info(f"model saved to {out_root}")
            # auto-calibrate the opt-in int8 MXU bundle beside the model
            # (model_saving.save_int8, default on): `predict --int8`
            # picks it up; accuracy qualification in
            # docs/int8_qualification.md + scripts/qualify_int8.py.
            # A bundle from a PREVIOUS run into this dir is removed
            # first either way — `predict --int8` must never silently
            # serve a stale quantization of old weights.
            import shutil

            shutil.rmtree(out_root / "int8", ignore_errors=True)
            if train_cfg.get("model_saving", {}).get("save_int8", True):
                try:
                    from jaeger_tpu.models.conversion import quantize_bundle

                    stats = quantize_bundle(
                        out_root, out_root / "int8", mode="full_int8")
                    results["int8_path"] = str(out_root / "int8")
                    logger.info(
                        f"calibrated full_int8 bundle saved to "
                        f"{out_root / 'int8'} "
                        f"({stats.get('int8_exec_convs', 0)} int8 convs)")
                except Exception as exc:  # quantization must never
                    # invalidate a finished train; remove any partial
                    # bundle so --int8 errors instead of running it
                    shutil.rmtree(out_root / "int8", ignore_errors=True)
                    logger.warning(
                        f"int8 auto-calibration skipped: {exc}")
        if meta:
            # container-orchestration metadata file (reference
            # nnlib/builder.py:1463-1470)
            import json as _json

            Path(meta).write_text(_json.dumps(
                {"model_path": str(out_root),
                 "experiment_path": str(Path(out_root).parent)}, indent=2))
    return results


def _collect_reliability_scores(model, variables, csv_path, crop_nt,
                                batch_size):
    """Sigmoid reliability scores + ID/OOD labels over a CSV."""
    from jaeger_tpu.seqops.windows import BASE_N, encode_ascii

    rows = []
    with open(csv_path) as fh:
        for line in fh:
            parts = line.strip().split(",")
            if len(parts) >= 2:
                try:
                    rows.append((int(parts[0]), parts[1]))
                except ValueError:
                    continue
    scores, labels = [], []
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        n = len(chunk)
        bases = np.full((batch_size, crop_nt), BASE_N, dtype=np.uint8)
        lengths = np.zeros(batch_size, dtype=np.int32)
        for j, (_, seq) in enumerate(chunk):
            ids = encode_ascii(seq[:crop_nt])
            bases[j, : ids.shape[0]] = ids
            lengths[j] = ids.shape[0]
        out = model.apply(
            variables,
            {"bases": jnp.asarray(bases), "lengths": jnp.asarray(lengths)},
            train=False,
        )
        rel = np.asarray(out["reliability"], dtype=np.float64)[:n].reshape(-1)
        scores.extend(1 / (1 + np.exp(-rel)))
        labels.extend(lbl for lbl, _ in chunk)
    return np.asarray(scores), np.asarray(labels)


def write_convergence_marker_compat(directory: Path, branch: str,
                                    info: dict) -> None:
    write_convergence_marker(directory, branch, info)
