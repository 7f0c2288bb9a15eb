"""Jitted training step + state.

Parity target: the reference's ``MetricModel.train_step``
(``nnlib/v2/layers.py:2038-2093``) and Keras ``fit`` inner loop, rebuilt as
a pure jitted step over a data-parallel mesh: batch sharded on the
``data`` axis, parameters replicated; gradient means and batch-norm
statistics become global XLA collectives under SPMD.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from jaeger_tpu.parallel import mesh as meshlib
from jaeger_tpu.train import losses as losses_lib


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


@dataclass
class StepConfig:
    loss_name: str = "categorical_crossentropy"
    loss_params: dict | None = None
    output_key: str = "prediction"
    class_weights: jnp.ndarray | None = None
    reg_specs: tuple = ()
    frozen_prefixes: tuple = ()   # param subtrees excluded from updates
    # Output heads this branch computes (None = all).  Mirrors the
    # reference's per-branch functional graphs, where Keras prunes
    # unconsumed nodes: classifier-branch training must not execute the
    # NMD taps / reliability head, or their moving stats would update
    # (nnlib/builder.py:595-640).
    heads: tuple | None = None
    # Maskless train program: valid ONLY when every window in the batch
    # fills the crop with unambiguously-encoding bases (the mask would be
    # all-true — an identity). Selected per batch by
    # make_dispatching_train_step; chip-measured +28% on the flagship
    # train-mode forward (experiments/train_breakdown.py).
    assume_dense: bool = False
    # bounded-mask cut spec (builder.mask_cut_plan): mask machinery only
    # up to the cut — exact when the batch's invalid runs are short
    # enough that the mask is provably all-true there (the dispatching
    # step checks per batch, mirroring the inference engine). The
    # forward is bitwise the full masked program's on qualifying inputs,
    # so the gradients are the same function's gradients.
    mask_layers: object = None


def make_train_step(model, cfg: StepConfig) -> Callable:
    """Build a jittable (state, batch, rng) -> (state, metrics) step.

    ``batch`` is a dict with model inputs (``bases``/``lengths`` or
    pre-encoded features) plus ``labels``.
    """
    loss_params = dict(cfg.loss_params or {})
    loss_params.pop("from_logits", None)
    if cfg.loss_name in ("hierachical_loss", "hierarchical_loss"):
        # fine+coarse CE (reference nnlib/builder.py:1722, losses.py:127)
        parent_of = tuple(loss_params.pop("parent_of"))
        groups = tuple(tuple(g) for g in loss_params.pop("groups"))

        def loss_fn_base(labels, logits, class_weights=None, **kw):
            return losses_lib.hierarchical_loss(
                labels, logits, parent_of, groups, **kw
            )
    else:
        loss_fn_base = losses_lib.LOSSES[cfg.loss_name]

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        inputs = {k: v for k, v in batch.items() if k != "labels"}
        mutable = ["batch_stats"] if batch_stats else []
        extra = {}
        if cfg.assume_dense:
            extra["assume_dense"] = True
        elif cfg.mask_layers is not None:
            extra["mask_layers"] = cfg.mask_layers
        out, updates = model.apply(
            variables, inputs, train=True,
            rngs={"dropout": rng}, mutable=mutable,
            heads=cfg.heads, **extra,
        )
        logits = out[cfg.output_key]
        loss = loss_fn_base(
            batch["labels"], logits,
            class_weights=cfg.class_weights, **loss_params,
        )
        reg = losses_lib.regularization_loss(params, list(cfg.reg_specs))
        new_stats = updates.get("batch_stats", batch_stats)
        return loss + reg, (loss, reg, new_stats, logits)

    def train_step(state: TrainState, batch, rng):
        (total, (loss, reg, new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        if cfg.frozen_prefixes:
            grads = _mask_frozen(grads, cfg.frozen_prefixes)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {
            "loss": loss, "reg_loss": reg, "total_loss": total,
            "grad_norm": gnorm,
        }
        if batch["labels"].ndim == 2 and logits.shape == batch["labels"].shape:
            acc = jnp.mean(
                jnp.argmax(logits, -1) == jnp.argmax(batch["labels"], -1)
            )
            metrics["accuracy"] = acc
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        return new_state, metrics

    return train_step


def _mask_frozen(grads, prefixes: tuple):
    def zero_if_frozen(path, leaf):
        path_str = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        if any(path_str.startswith(p) for p in prefixes):
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(zero_if_frozen, grads)


def shard_train_step(train_step, mesh):
    """jit the step with batch sharded over the mesh's data axis."""
    data = meshlib.shard_along(mesh)
    rep = meshlib.replicate(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dispatching_train_step(model, cfg: StepConfig, mesh=None,
                                seq_mesh=None, global_batcher=None):
    """(state, host_batch, rng) -> (state, metrics) with per-batch
    program selection, mirroring the inference engine: when every window
    in the batch fills the crop with unambiguously-encoding bases, run
    the MASKLESS train program (the mask would be all-true — exact;
    chip-measured +28% on the flagship train-mode forward). Ambiguous
    batches fall back to the masked program.

    The predicate runs on the HOST batch (numpy), before upload; each
    variant compiles lazily on first use, so clean datasets never pay
    the masked compile and dirty ones never pay the dense compile.
    Batches without raw ``bases`` (pre-encoded features) always use the
    masked program.

    ``seq_mesh`` (mutually exclusive with ``mesh``): run the step under
    ``jax.set_mesh`` so a model built with ``parallel.seq_axis``
    length-shards its Hyena long convolutions over the mesh's ``seq``
    axis (parallel/hyena_sp ppermute ring — differentiable; grads pinned
    vs the unsharded oracle in tests/test_hyena_seq_train.py).

    ``global_batcher`` (multi-host training, parallel/multihost.py): the
    mesh spans multiple processes, so host arrays must become global
    jax.Arrays before the sharded jit sees them — the batch is
    row-sharded (each process contributes its addressable slice of the
    identical full batch it loaded), state/rng replicated. State stays
    global across steps (the donated round trip returns global arrays);
    the host dense-program predicate is consistent across processes
    because every process inspects the same full host batch.
    """
    import numpy as np

    from jaeger_tpu.ops.encode import dense_window_batch

    if mesh is not None and seq_mesh is not None:
        raise ValueError("mesh and seq_mesh are mutually exclusive")
    crop_nt = getattr(model, "crop_nt", None)
    masking = getattr(model, "masking_enabled", True)
    # bounded-mask tier (mirrors infer/engine._plan_batch): batches
    # whose invalid runs are short enough run mask machinery only up to
    # the provably-sufficient cut — bitwise the masked program's
    # forward on qualifying inputs, so the same function's gradients
    # (pinned by tests/test_train_dispatch.py)
    try:
        from jaeger_tpu.models.builder import mask_cut_plan

        mcfg = getattr(model, "config", None) or {}
        mask_plans = mask_cut_plan(
            mcfg.get("representation_learner", {})) or []
    except Exception:
        mask_plans = []
    compiled: dict = {}

    def _get(dense: bool, mask_cut=None):
        key = (dense, None if dense else mask_cut)
        fn = compiled.get(key)
        if fn is None:
            from dataclasses import replace

            step = make_train_step(model, replace(
                cfg, assume_dense=dense,
                mask_layers=None if dense else mask_cut))
            fn = (shard_train_step(step, mesh) if mesh is not None
                  else jax.jit(step, donate_argnums=(0,)))
            compiled[key] = fn
        return fn

    def step_fn(state, batch, rng):
        dense = False
        mask_cut = None
        if crop_nt is not None and "bases" in batch and "lengths" in batch:
            b = np.asarray(batch["bases"])
            ln = np.asarray(batch["lengths"])
            dense = dense_window_batch(b, ln, crop_nt, masking)
            if not dense and mask_plans:
                from jaeger_tpu.ops.encode import bounded_mask_levels

                levels = bounded_mask_levels(b, ln, crop_nt, masking,
                                             mask_plans)
                if (levels >= 0).all() and levels.size:
                    mask_cut = mask_plans[int(levels.max())][0]
        if global_batcher is not None:
            batch = global_batcher.shard(batch)
            state = global_batcher.replicate(state)
            rng = global_batcher.replicate(rng)
        if seq_mesh is not None:
            with jax.set_mesh(seq_mesh):
                return _get(dense, mask_cut)(state, batch, rng)
        return _get(dense, mask_cut)(state, batch, rng)

    return step_fn
