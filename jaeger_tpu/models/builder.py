"""YAML-driven model construction.

Parity target: the reference's ``DynamicModelBuilder``
(``nnlib/builder.py:209-1761``) — same config schema (``model.embedding``,
``representation_learner.hidden_layers``, ``classifier``, ``projection``,
``reliability_model``), same layer registry names — but the product is a
single Flax module whose forward pass covers the whole reference model
*dict* (rep learner + heads), including the on-device codon encoding when
raw bases are supplied. One jitted XLA program replaces the reference's
five stitched Keras models.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from jaeger_tpu.models import layers as L
from jaeger_tpu.ops import encode
from jaeger_tpu.seqops import crop as crop_contract
from jaeger_tpu.seqops import maps
from jaeger_tpu.utils.config import load_model_config  # noqa: F401  (re-export)

_CONV_KEYS = (
    "filters", "kernel_size", "strides", "padding", "dilation_rate",
    "activation", "use_bias", "use_masking", "mask_mode",
)
_RES_KEYS = _CONV_KEYS + ("use_1x1conv", "norm_type", "alpha_init", "return_nmd")


def _sub(cfg: dict, keys: Sequence[str]) -> dict:
    return {k: cfg[k] for k in keys if k in cfg}


# --- deferred re-mask analysis ---------------------------------------------
# A DYT norm's trailing re-zero of masked positions may be skipped exactly
# when everything between it and the next self-masking barrier treats
# masked positions correctly on its own. Three classes of layer:
#
#   ERASES   — re-zeroes masked positions itself, so any upstream deferred
#              garbage dies here: masked convs pre-zero their input with
#              the current mask (layers.MaskedConv1D), masked layernorm
#              pre-masks before its stats, and residual blocks pre-zero
#              both paths (conv1 pre-zeroes; the identity shortcut applies
#              the input mask whenever deferral is active — masks GROW
#              under mask_mode="any", so positions invalid at the block
#              input can be valid at its output and the shortcut must
#              contribute zeros there, see ResidualBlock).
#
#              A residual block only erases when the UN-deferred program
#              would deliver zeros at mask-invalid positions of its input
#              (``_zeroed_after`` tracks that state): only then is the
#              shared input pre-zero a no-op vs the reference program.
#              When the un-deferred input carries NON-zero values at
#              masked positions (e.g. batchnorm-normed stacks — the
#              reference never re-zeroes after an affine norm), the raw-x
#              identity shortcut consumes those values into outputs that
#              mask growth can validate, so the block is UNSAFE to defer
#              across and must keep the reference's raw shortcut
#              (tests/test_e2e_live_reference.py caught exactly this on a
#              masked_batchnorm residual model).
#   PASSES   — either purely per-position (activations, dropout, dense,
#              crop, plain layernorm: garbage in, garbage out, confined to
#              masked positions) or mask-weighted in its statistics with an
#              un-re-zeroed output (nmd: 0-weighted sums; masked batchnorm:
#              where(mask)-ed stats). Scanning continues past these. None
#              of them changes the mask, so garbage positions stay invalid
#              under the mask the eventual barrier consumes.
#   UNSAFE   — consumes masked-position *values* into valid outputs
#              (unmasked convs/batchnorm stats, recurrent scans, FFT/global
#              mixing, gated pooling's unmasked max). Deferring across
#              these would change results, so the re-mask stays.
#
# Values at deferred positions are bounded (tanh·gamma+beta then
# elementwise), so 0-weighting/selecting them is bit-exact. Measured
# effect: the 16 flagship DYT re-masks were the entire masked-vs-dense
# gap, 24.8 ms/2048 (experiments/masked_breakdown.py;
# docs/optimizations.md).

_REMASK_SAFE_POOLERS = frozenset((
    "max", "average", "max1d", "average1d", "masked_max", "masked_average",
    "last", "masked_last",
))


def _remask_erased_by(name: str, cfg: dict) -> bool:
    if name in ("masked_conv1d", "multi_scale_conv"):
        return bool(cfg.get("use_masking", True))
    if name == "masked_layernorm":
        return True
    return False


_act_zero_at_zero = L.act_zero_at_zero


def _block_rezeroes(cfg: dict) -> bool:
    """Whether a residual block's un-deferred output is zero at
    mask-invalid positions given a zeroed input: its trailing norm must
    re-zero (DYT/masked layernorm) and its activation must fix 0."""
    return (
        bool(cfg.get("use_masking", True))
        and str(cfg.get("norm_type", "masked_batchnorm")).lower()
        in ("masked_dyt", "masked_layernorm")
        and _act_zero_at_zero(cfg.get("activation", "gelu"))
    )


def _zeroed_after(name: str, cfg: dict, zeroed: bool) -> bool:
    """Propagate the ``zeroed`` state (the UN-deferred program holds exact
    zeros at mask-invalid positions) across one layer."""
    if name in ("masked_dyt", "masked_layernorm"):
        return True                       # trailing re-zero w.r.t. the mask
    if name in ("activation", "relu", "gelu", "sigmoid", "softmax", "tanh"):
        act = cfg.get("activation", name if name != "activation" else None)
        return zeroed and _act_zero_at_zero(act)
    if name in ("dropout", "crop", "nmd"):
        return zeroed                     # value-preserving at zeros
    if name == "residual_block":
        return zeroed and _block_rezeroes(cfg)
    # convs (bias / padding garbage at invalid positions), batchnorm
    # (affine bias), dense, attention/recurrent mixers: conservative False
    return False


def _remask_passes(name: str, cfg: dict) -> bool:
    if name in ("activation", "relu", "gelu", "sigmoid", "softmax", "tanh",
                "dropout", "nmd", "masked_dyt", "dense", "crop", "layernorm"):
        return True
    if name in ("masked_batchnorm", "batchnorm"):
        # plain batchnorm folds every position into its statistics and
        # relies on masked positions being zero — unsafe to defer across
        return bool(cfg.get("use_masking", name == "masked_batchnorm"))
    return False


# --- mask-bounded program analysis -----------------------------------------
# Under mask_mode="any" (the default), every masked conv GROWS the valid
# set: an invalid run shrinks by the conv's one-sided span
# ``d*(k-1)/2`` per side (interior runs) or per valid side (edge runs).
# For typical soft-masked inputs (short N/lowercase runs) the mask is
# therefore PROVABLY all-true after the first residual stack — at which
# point dropping the mask entirely is bit-exact (apply_mask with an
# all-true mask is the identity; masked statistics with an all-ones
# weight equal their dense forms — pinned by tests/test_mask_bounded.py).
# The engine exploits this with a "bounded" program that runs mask
# machinery only through the cut layer: each activation-size mask op
# costs ~0.65 ms/2048 of irreducible VPU work (chip-measured,
# experiments/mask_fusion_probe.py — fusion cannot remove it), so
# halving the masked layer count closes most of the masked-vs-dense gap.

#: layers after the cut must treat an all-true mask identically to None
#: (bitwise); anything else (attention/hyena/bilstm/branches) is out
_MASK_CUT_SAFE_AFTER = frozenset((
    "masked_conv1d", "conv1d", "residual_block", "masked_dyt", "nmd",
    "activation", "relu", "gelu", "sigmoid", "softmax", "tanh", "dropout",
    "dense", "masked_batchnorm", "batchnorm", "crop",
))
_MASK_CUT_SAFE_POOLERS = frozenset((
    "max", "average", "max1d", "average1d", "masked_max", "masked_average",
    "last", "masked_last", "gatedframe",
))


def _conv_shrinks(cfg: dict, default_padding: str) -> tuple[int, int] | None:
    """(interior_shrink, edge_shrink) of one any-mode masked conv, or
    None when unsupported.

    Interior runs erode by the full dilated span-1 (both sides for SAME,
    right side for VALID); a run pinned to a window edge erodes only
    from its valid side — span/2 for SAME, and 0 worst-case for VALID
    (a right-edge run keeps its edge).
    """
    if not cfg.get("use_masking", True):
        return 0, 0
    if cfg.get("mask_mode", "any") != "any":
        return None
    if cfg.get("strides", 1) != 1:
        return None
    pad = str(cfg.get("padding", default_padding)).lower()
    if pad not in ("same", "valid"):
        return None
    k = int(cfg.get("kernel_size", 3))
    d = int(cfg.get("dilation_rate", 1))
    span1 = d * (k - 1)
    if pad == "same":
        return span1, span1 // 2
    return span1, 0


def mask_cut_plan(rep_cfg: dict) -> list[tuple[object, int, int]] | None:
    """Candidate cuts for the bounded-mask program, or None when the
    architecture doesn't support it.

    Returns ``[(cut_spec, interior_bound, edge_bound), ...]`` ordered
    earliest-cut first. A window qualifies for a cut when every invalid
    run not touching a window edge is <= ``interior_bound`` codons and
    every edge-touching run is <= ``edge_bound`` — then any-mode growth
    provably clears the mask by the cut (every output position is its
    own center tap, so invalid runs only ever shrink; they can never
    merge or grow). ``cut_spec`` is either a rep-learner layer index
    (mask dropped from that layer on) or ``(index, "conv1")`` — the cut
    sits inside the first residual block, right after its first conv
    (only ONE activation-size mask op remains in that program: the
    block's shared input pre-zero).
    """
    layers = _freeze_layers(rep_cfg.get("hidden_layers", []))
    pooling = rep_cfg.get("pooling")
    if "branch" in rep_cfg or not layers:
        return None
    if pooling is not None and pooling.lower() not in _MASK_CUT_SAFE_POOLERS:
        return None
    interior = 0
    edge = 0
    plans: list[tuple[object, int, int]] = []
    done = False
    for i, (name, cfg) in enumerate(layers):
        if not done:
            if name in ("masked_conv1d", "conv1d"):
                use_mask = cfg.get("use_masking", name == "masked_conv1d")
                s = _conv_shrinks(dict(cfg, use_masking=use_mask),
                                  default_padding="valid")
                if s is None:
                    return None
                interior += s[0]
                edge += s[1]
            elif name == "residual_block":
                s = _conv_shrinks(cfg, default_padding="same")
                if s is None or not cfg.get("use_masking", True) or \
                        cfg.get("return_nmd", False):
                    return None
                # cut A: inside the block, after conv1 of its first
                # sub-block — one mask site total
                if interior + s[0] > 0:
                    plans.append(((i, "conv1"),
                                  interior + s[0], edge + s[1]))
                n_convs = 2 * int(cfg.get("block_size", 1))
                interior += n_convs * s[0]
                edge += n_convs * s[1]
                # cut B: after the whole first stack
                plans.append((i + 1, interior, edge))
                done = True
            elif name in ("nmd", "masked_dyt", "activation", "relu", "gelu",
                          "sigmoid", "softmax", "tanh", "dropout",
                          "masked_batchnorm", "batchnorm"):
                pass  # mask-preserving
            else:
                return None
        else:
            if name not in _MASK_CUT_SAFE_AFTER:
                return None
            if cfg.get("return_nmd", False):
                # norm-embedded NMD taps use the eps-carrying masked
                # statistics; only standalone `nmd` layers get the
                # masked-parity-dense treatment post-cut (LayerStack)
                return None
    if not done or not plans:
        return None
    return [p for p in plans if p[1] > 0]


def _defer_scan(layer_configs: tuple, start: int, pooling: str | None,
                zeroed: bool = True) -> bool:
    """True when a trailing re-mask emitted just before ``start`` is
    provably redundant given the layers that follow (and the pooler).

    ``zeroed`` is the un-deferred program's zero-at-masked-positions state
    entering ``layer_configs[start]`` (True right after the re-mask being
    deferred); it decides whether a downstream residual block erases
    (shared input pre-zero) or consumes masked values (raw shortcut)."""
    for name, cfg in layer_configs[start:]:
        if name == "residual_block":
            # erases iff its shared pre-zero activates (input_remasked);
            # otherwise its raw identity shortcut consumes masked values
            return bool(cfg.get("use_masking", True)) and zeroed
        if _remask_erased_by(name, cfg):
            return True
        if not _remask_passes(name, cfg):
            return False
        zeroed = _zeroed_after(name, cfg, zeroed)
    return (pooling is not None
            and pooling.lower() in _REMASK_SAFE_POOLERS)


class LayerStack(nn.Module):
    """A configured stack of zoo layers with NMD collection and pooling.

    Mirrors ``DynamicModelBuilder._build_block`` (``nnlib/builder.py:982-1193``):
    walks ``hidden_layers``, collects NMD side outputs, applies the
    configured pooler, merges NMDs (concat by default, or the
    ``reliability_model.merge`` config).
    """

    layer_configs: tuple                 # tuple of (name, cfg) pairs
    pooling: str | None = None
    nmd_merge: dict | None = None
    seq_axis: str | None = None          # length-shard Hyena over this axis
    # rematerialize residual blocks under grad (jax.checkpoint): the bwd
    # pass recomputes each block's internals from its input instead of
    # keeping every conv/norm activation live — the flagship's train step
    # at batch 2048 otherwise overflows HBM (16.09G > 15.75G, measured;
    # experiments/train_breakdown.py). Inference programs are unaffected
    # (nothing is saved without grad). config key: model.remat
    remat: bool = False
    # allow skipping provably-redundant DYT re-masks (_defer_scan above);
    # config key model.defer_remask — kept as an escape hatch / for the
    # exactness A/B tests
    defer_remask: bool = True
    # drop the mask from this layer index on (the engine's bounded-mask
    # program; see mask_cut_plan). Either an int layer index, or
    # ``(index, "conv1")`` for the cut inside layer `index`'s first
    # residual sub-block right after conv1. Exact ONLY when the caller
    # proves the mask is all-true at the cut — the engine's run-length
    # detector does (infer/engine.py), pinned by
    # tests/test_mask_bounded.py.
    mask_until: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False, fold_table=None,
                 taps: bool = True):
        nmds: list = []
        gate = None
        # un-deferred zero-at-masked-positions state entering each layer
        # (the stack input is an embedding/one-hot — token 0's row is not
        # zero, so start False; see _zeroed_after)
        zeroed = False
        post_cut = False
        mu = self.mask_until
        inner_at = None
        cut_at = None
        if mu is not None:
            if isinstance(mu, (tuple, list)):
                inner_at = int(mu[0])
                cut_at = inner_at + 1
            else:
                cut_at = int(mu)
        for i, (name, raw_cfg) in enumerate(self.layer_configs):
            if cut_at is not None and i == cut_at:
                # bounded program: the mask is provably all-true here, so
                # drop it structurally — each remaining activation-size
                # mask op costs ~0.65-1.2 ms/2048 of irreducible VPU
                # work (experiments/mask_fusion_probe.py; a constant-
                # true tensor is NOT folded by XLA, chip-measured in
                # experiments/bounded_bench.py). Every mask op is
                # bitwise an identity under an all-true mask — except
                # the NMD taps' eps-carrying statistics, which therefore
                # switch to the masked-parity dense form below.
                # Exactness pinned by tests/test_mask_bounded.py.
                mask = None
                post_cut = True
            cfg = dict(raw_cfg)
            lname = f"{name}_{i}"
            fold_kw = (
                {"fold_table": fold_table}
                if i == 0 and fold_table is not None
                else {}
            )
            if name == "masked_conv1d":
                x, mask = L.MaskedConv1D(
                    name=lname, dtype=self.dtype, **_sub(cfg, _CONV_KEYS)
                )(x, mask, train, **fold_kw)
            elif name == "conv1d":
                cfg.setdefault("use_masking", False)
                x, mask = L.MaskedConv1D(
                    name=lname, dtype=self.dtype, **_sub(cfg, _CONV_KEYS)
                )(x, mask, train, **fold_kw)
            elif name == "multi_scale_conv":
                x, mask = L.MultiScaleConv1D(
                    name=lname, dtype=self.dtype,
                    branches=tuple(cfg.get("branches", [])),
                    merge=cfg.get("merge", "concat"),
                    use_bias=cfg.get("use_bias", True),
                    use_masking=cfg.get("use_masking", True),
                )(x, mask, train)
            elif name in ("masked_batchnorm", "batchnorm"):
                bn_masking = cfg.get("use_masking", name == "masked_batchnorm")
                bn = L.MaskedBatchNorm(
                    name=lname, dtype=self.dtype,
                    return_nmd=cfg.get("return_nmd", False),
                    use_masking=bn_masking,
                    momentum=cfg.get("momentum", 0.9),
                    epsilon=cfg.get("epsilon", 1e-5),
                )
                bn_mask = mask
                if (post_cut and mask is None and bn_masking
                        and (train or cfg.get("return_nmd", False))):
                    # bounded program: BN batch statistics (and NMD
                    # per-example means) keep the eps-carrying
                    # masked-stats graph under a barrier'd all-true
                    # mask — bitwise the masked program's at a cleared
                    # mask (same mechanism as the NMD taps below)
                    bn_mask = jax.lax.optimization_barrier(
                        jnp.ones(x.shape[:-1], bool))
                out = bn(x, bn_mask, train)
                if cfg.get("return_nmd", False):
                    x, bn_mask_out, nmd = out
                    if taps:
                        nmds.append(nmd)
                else:
                    x, bn_mask_out = out
                if bn_mask is mask:
                    mask = bn_mask_out  # stats mask must not leak
            elif name in ("masked_layernorm", "layernorm"):
                norm_cls = (
                    L.MaskedLayerNorm if name == "masked_layernorm" else L.LayerNorm
                )
                x, mask = norm_cls(name=lname, dtype=self.dtype)(x, mask, train)
            elif name == "masked_dyt":
                x, mask = L.MaskedDYT(
                    name=lname, alpha_init=cfg.get("alpha_init", 0.5),
                    defer_mask=(
                        self.defer_remask
                        and _defer_scan(self.layer_configs, i + 1,
                                        self.pooling, zeroed=True)
                    ),
                    dtype=self.dtype,
                )(x, mask, train)
            elif name == "residual_block":
                block_size = cfg.get("block_size", 1)
                rb_cls = (
                    nn.remat(L.ResidualBlockStack, static_argnums=(3,))
                    if self.remat else L.ResidualBlockStack
                )
                rb = rb_cls(
                    name=lname, dtype=self.dtype, block_size=block_size,
                    defer_output_mask=(
                        self.defer_remask
                        and _defer_scan(
                            self.layer_configs, i + 1, self.pooling,
                            zeroed=_zeroed_after(name, cfg, zeroed))
                    ),
                    defer_internal_mask=self.defer_remask,
                    input_remasked=zeroed,
                    drop_mask_after_first_conv1=(i == inner_at),
                    # bounded program: stacks at/after the cut run with
                    # mask None, but their masked_batchnorm norms must
                    # keep the masked TRAIN-statistics graph (barrier'd
                    # all-true mask) to stay bitwise the masked program
                    bn_stats_all_true=post_cut,
                    **_sub(cfg, _RES_KEYS),
                )
                out = rb(x, mask, train)
                if cfg.get("return_nmd", False):
                    x, mask, nmd = out
                    if taps:
                        nmds.append(nmd)
                else:
                    x, mask = out
            elif name == "masked_bilstm":
                x, mask = L.MaskedBiLSTM(
                    name=lname, units=cfg.get("units", 64),
                    return_sequences=cfg.get("return_sequences", True),
                    ignore_mask=cfg.get("ignore_mask", False),
                    dtype=self.dtype,
                )(x, mask, train)
            elif name == "transformer_encoder":
                x, mask = L.TransformerEncoder(
                    name=lname, dtype=self.dtype,
                    embed_dim=cfg["embed_dim"], num_heads=cfg["num_heads"],
                    feed_forward_dim=cfg["feed_forward_dim"],
                    dropout_rate=cfg.get("dropout_rate", 0.1),
                )(x, mask, train)
            elif name == "cross_frame_attention":
                x, mask = L.CrossFrameAttention(
                    name=lname, dtype=self.dtype,
                    embed_dim=cfg["embed_dim"], num_heads=cfg["num_heads"],
                    feed_forward_dim=cfg["feed_forward_dim"],
                    dropout_rate=cfg.get("dropout_rate", 0.1),
                    use_ffn=cfg.get("use_ffn", True),
                )(x, mask, train)
            elif name == "axial_attention":
                x, mask = L.AxialAttention(
                    name=lname, dtype=self.dtype,
                    embed_dim=cfg["embed_dim"], num_heads=cfg["num_heads"],
                    feed_forward_dim=cfg["feed_forward_dim"],
                    dropout_rate=cfg.get("dropout_rate", 0.1),
                    num_blocks=cfg.get("num_blocks", 1),
                    norm_type=cfg.get("norm_type", "layernorm"),
                    alpha_init=cfg.get("alpha_init", 0.5),
                )(x, mask, train)
            elif name == "local_attention":
                x, mask = L.LocalAttention(
                    name=lname, dtype=self.dtype,
                    embed_dim=cfg["embed_dim"], num_heads=cfg["num_heads"],
                    feed_forward_dim=cfg["feed_forward_dim"],
                    window_size=cfg["window_size"],
                    dropout_rate=cfg.get("dropout_rate", 0.1),
                    num_blocks=cfg.get("num_blocks", 1),
                )(x, mask, train)
            elif name == "hyena_block":
                # remat matters most HERE: the long-context regime's
                # (order+1) full-length projection streams are the
                # memory wall (docs/parallelism.md)
                hb_cls = (
                    nn.remat(L.HyenaBlock, static_argnums=(3,))
                    if self.remat else L.HyenaBlock
                )
                x, mask = hb_cls(
                    name=lname, dtype=self.dtype, dim=cfg["dim"],
                    order=cfg.get("order", 2),
                    filter_hidden=cfg.get("filter_hidden", 32),
                    filter_layers=cfg.get("filter_layers", 2),
                    filter_activation=cfg.get("filter_activation", "gelu"),
                    dropout=cfg.get("dropout", 0.0),
                    output_projection=cfg.get("output_projection", False),
                    filter_normalize=cfg.get("filter_normalize", False),
                    seq_axis=self.seq_axis,
                )(x, mask, train)
            elif name == "nmd":
                # Standalone NMD taps feed only the reliability head.  When
                # the caller's requested heads don't include it (taps=False),
                # the layer is skipped entirely — matching the reference,
                # where Keras prunes the unconsumed NMDLayer node from the
                # classifier/projection branch graphs so its moving mean
                # never updates during those branches (nnlib/v2/nmd.py:70-72
                # only runs when the node executes).
                if taps:
                    nmd_mask = mask
                    if post_cut and mask is None:
                        # post-cut NMD taps keep the exact masked-stats
                        # graph (the eps-carrying denominators AND the
                        # reduce-with-multiply fusion shape — a plain
                        # sum is NOT bitwise the same reduce) under an
                        # all-true mask. The optimization barrier stops
                        # XLA from folding x*1 away, which would change
                        # the fused-reduce rounding (1-ulp nmd drift,
                        # caught on CPU). The mask work rides the
                        # reductions, chip-measured free
                        # (experiments/bounded_bench.py).
                        nmd_mask = jax.lax.optimization_barrier(
                            jnp.ones(x.shape[:-1], bool))
                    nmds.append(
                        L.NMDLayer(
                            name=lname, momentum=cfg.get("momentum", 0.9),
                            dtype=self.dtype,
                        )(x, nmd_mask, train)
                    )
            elif name == "dense":
                dt = (
                    jnp.float32
                    if str(cfg.get("dtype", "")) == "float32"
                    else self.dtype
                )
                x = nn.Dense(
                    cfg["units"], use_bias=cfg.get("use_bias", True),
                    dtype=dt, param_dtype=jnp.float32, name=lname,
                )(x)
                x = L.get_activation(cfg.get("activation"))(x)
            elif name in ("activation", "relu", "gelu", "sigmoid", "softmax",
                          "tanh"):
                act = cfg.get("activation", name if name != "activation" else None)
                x = L.get_activation(act)(x)
            elif name == "dropout":
                x = nn.Dropout(
                    cfg.get("rate", 0.5), deterministic=not train, name=lname
                )(x)
            elif name == "crop":
                (t, b_), (l_, r_) = cfg.get("cropping", ((0, 0), (0, 0)))
                x = x[:, t: x.shape[1] - b_ or None, l_: x.shape[2] - r_ or None, :]
                if mask is not None:
                    mask = mask[:, t: mask.shape[1] - b_ or None,
                                l_: mask.shape[2] - r_ or None]
            elif name == "parallel_branches":
                merge = cfg.get("merge", "concat").lower()
                outs = []
                for b_idx, bcfg in enumerate(cfg.get("branches", [])):
                    sub = LayerStack(
                        name=f"{lname}_branch_{b_idx}",
                        layer_configs=_freeze_layers(bcfg.get("hidden_layers", [])),
                        pooling=bcfg.get("pooling"),
                        defer_remask=self.defer_remask,
                        dtype=self.dtype,
                    )
                    bx, _, _ = sub(x, mask, train)
                    outs.append(bx)
                if merge == "concat":
                    x = jnp.concatenate(outs, axis=-1)
                elif merge == "sum":
                    x = sum(outs)
                elif merge == "average":
                    x = sum(outs) / len(outs)
                elif merge == "max":
                    x = jnp.max(jnp.stack(outs, 0), axis=0)
                else:
                    raise ValueError(f"unknown branch merge {merge!r}")
                mask = None
            else:
                raise ValueError(f"unknown layer type: {name}")
            zeroed = _zeroed_after(name, cfg, zeroed)

        merged_nmd = None
        if nmds:
            if len(nmds) == 1:
                merged_nmd = nmds[0]
            elif self.nmd_merge:
                mm = dict(self.nmd_merge)
                merged_nmd = L.NMDMerge(
                    name="nmd_merge", mode=mm.get("mode", "concat"),
                    target_dim=mm.get("target_dim"), dtype=self.dtype,
                )(nmds, train)
            else:
                merged_nmd = jnp.concatenate(nmds, axis=-1)

        if self.pooling is not None:
            pooler_cls = L.POOLERS[self.pooling.lower()]
            if "gated" in self.pooling.lower():
                x, gate = pooler_cls(
                    name=f"global_{self.pooling}pool", return_gate=True,
                    dtype=self.dtype,
                )(x, mask, train)
            else:
                x, _ = pooler_cls(
                    name=f"global_{self.pooling}pool", dtype=self.dtype
                )(x, mask, train)
            mask = None
        return x, mask, {"nmd": merged_nmd, "gate": gate}


def _resolve_crop_nt(sp: dict, input_type: str = "translated") -> int:
    """Nucleotide crop for a string-processor config.

    Multi-crop configs (``crop_sizes`` lists, reference
    ``data/loaders.py:505-530``) use their largest crop as the static
    encode shape; shorter crops arrive as masked prefixes. Nucleotide
    models consume ``crop_size`` directly in nt (reference
    ``nnlib/inference.py:470-483``).
    """
    if sp.get("crop_size") is None and sp.get("crop_sizes"):
        # variable-length configs set crop_size: null + a crop_sizes list
        # (scripts/create_variable_length_config.py)
        sp = dict(sp, crop_size=max(sp["crop_sizes"]))
    if input_type == "nucleotide":
        return int(sp["crop_size"])
    _, nt = crop_contract.resolve_crop(sp)
    return nt


def _freeze_layers(hidden_layers: list) -> tuple:
    out = []
    for entry in hidden_layers:
        out.append((entry.get("name", "").lower(), dict(entry.get("config") or {})))
    return tuple(out)


class JaegerModel(nn.Module):
    """The full fragment model: encode -> embed -> rep learner -> heads.

    Output dict mirrors the reference's combined ``jaeger_model``
    (``nnlib/builder.py:442-838``): ``prediction`` (classifier logits),
    ``embedding`` (pooled representation), ``nmd``, ``gate``,
    ``reliability`` (when configured), ``projection`` (when configured).
    """

    config: dict
    dtype: Any = jnp.float32

    def _string_processor(self) -> dict:
        return self.config.get("string_processor", {})

    @property
    def crop_nt(self) -> int:
        input_type = self.config.get("embedding", {}).get(
            "input_type", "translated"
        )
        return _resolve_crop_nt(self._string_processor(), input_type)

    @property
    def masking_enabled(self) -> bool:
        """Whether soft-masked (lowercase) bases encode as masked tokens
        (string_processor ``masking``); False means they encode as their
        uppercase base, so the engine's dense predicate may admit them."""
        return bool(self._string_processor().get("masking", False))

    @nn.compact
    def __call__(self, inputs: dict, train: bool = False,
                 with_projection: bool = False,
                 assume_dense: bool = False,
                 mask_layers: int | None = None,
                 heads: tuple | None = None):
        """``heads`` selects which output heads to compute (None = all).

        Branch training passes the subset the reference branch graph
        would execute — Keras prunes unconsumed nodes from the
        per-branch functional models (``nnlib/builder.py:595-640``), so
        e.g. classifier-branch training never runs the standalone NMD
        taps or the reliability head and their statistics don't update.
        ``heads=("prediction",)`` reproduces that here.

        ``assume_dense=True`` skips mask construction entirely (mask
        is None through every layer) — valid ONLY when the caller
        guarantees every window fills the full crop with unambiguous
        bases (no padding, no Ns, no soft-masked bases), in which case
        the mask would be all-true and masking is an identity. The
        inference engine checks that predicate per device batch; the
        maskless program saves the mask-propagation elementwise work
        (~30% of the flagship forward, experiments/floor_probe.py).

        ``mask_layers`` (static int) builds the BOUNDED-mask program:
        mask machinery runs through rep-learner layer index
        ``mask_layers - 1`` and the mask is dropped from there on —
        exact when the mask is provably all-true at the cut, which the
        engine's run-length detector establishes per batch from
        ``mask_cut_plan`` (any-mode convs only shrink invalid runs).
        """
        cfg = self.config
        emb_cfg = cfg.get("embedding", {})
        sp = self._string_processor()
        input_type = emb_cfg.get("input_type", "translated")

        # --- 1. inputs: raw bases (device-side encode) or pre-encoded ---
        feats: dict[str, jnp.ndarray] = {}
        if "bases" in inputs:
            bases, lengths = inputs["bases"], inputs["lengths"]
            masking = bool(sp.get("masking", False))
            alphabet = str(sp.get("codon", "CODON"))
            if input_type in ("translated", "both"):
                crop_nt = _resolve_crop_nt(sp)
                feats["translated"] = encode.encode_frames(
                    bases, lengths, crop_size=crop_nt, masking=masking,
                    alphabet=alphabet,
                )
            if input_type in ("nucleotide", "both"):
                nt_crop = (
                    _resolve_crop_nt(sp, "nucleotide")
                    if input_type == "nucleotide"
                    else int(sp.get("nucleotide_crop", bases.shape[1]))
                )
                nt_crop = min(nt_crop, bases.shape[1])
                feats["nucleotide"] = encode.encode_nucleotide(
                    bases, lengths, crop_size=nt_crop, masking=masking
                )
        else:
            feats = {k: v for k, v in inputs.items() if k != "frame_perm"}

        # train-time frame-order augmentation (reference
        # ``seqops/encode.py:175-177`` shuffle_frames): a per-example
        # permutation of the 6 reading frames, supplied by the data
        # pipeline as a (B, 6) int array. Absent at inference.
        perm = inputs.get("frame_perm")
        if perm is not None and "translated" in feats:
            feats["translated"] = jnp.take_along_axis(
                feats["translated"], perm[:, :, None], axis=1
            )

        # --- 2. embedding section (nnlib/builder.py:844-894) ---
        rep_cfg = cfg.get("representation_learner", {})
        # The embedding is linear, so when the rep stack opens with a conv
        # (nothing nonlinear between them) the two compose into ONE conv
        # whose kernel is einsum(table, kernel): the MXU then contracts
        # over vocab (65 -> one 128-lane pass) instead of embedding_size
        # (196 -> two), and the (B, F, L, 196) embedded activation never
        # hits HBM. bf16 only: the f32 path keeps the literal two-op form
        # so converted-weight golden logits stay bit-stable.
        _rep_layers = rep_cfg.get("hidden_layers", [])
        can_fold = (
            input_type == "translated"
            and emb_cfg.get("use_embedding_layer", False)
            and emb_cfg.get("embedding_size", 4) > 0
            and not emb_cfg.get("use_positional_embeddings", False)
            and "branch" not in rep_cfg
            and bool(_rep_layers)
            and _rep_layers[0].get("name") in ("masked_conv1d", "conv1d")
            and self.dtype == jnp.bfloat16
        )
        fold_table = None
        if input_type in ("translated", "both"):
            tokens = feats["translated"]
            mask = None if assume_dense else (tokens != 0)
            emb_size = emb_cfg.get("embedding_size", 4)
            _, ids = maps.resolve_alphabet(sp.get("codon", "CODON"))
            depth = maps.alphabet_depth(ids)
            vocab = emb_cfg.get("vocab_size", depth + 1)
            if emb_size > 0:
                if emb_cfg.get("use_embedding_layer", False):
                    # one-hot matmul, not nn.Embed: the gather is ~4.6x
                    # slower on TPU (see layers.OneHotEmbed); identical
                    # param tree and values
                    emb_mod = L.OneHotEmbed(
                        vocab, emb_size, dtype=self.dtype, name="embedding",
                    )
                    if can_fold:
                        fold_table = emb_mod.table()
                        x = tokens
                    else:
                        x = emb_mod(tokens)
                else:
                    onehot = jax.nn.one_hot(tokens - 1, depth, dtype=self.dtype)
                    x = nn.Dense(
                        emb_size, use_bias=False,
                        kernel_init=nn.initializers.orthogonal(),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="translated_embedding",
                    )(onehot)
            else:
                x = jax.nn.one_hot(tokens - 1, depth, dtype=self.dtype)
        elif input_type == "nucleotide":
            x = feats["nucleotide"].astype(self.dtype)
            mask = None if assume_dense else jnp.any(x != 0, axis=-1)
        else:
            raise ValueError(f"invalid input_type {input_type!r}")

        if emb_cfg.get("use_positional_embeddings", False):
            x = x + L.SinusoidalPositionEmbedding(
                max_wavelength=emb_cfg.get("positional_embedding_length", 10000)
            )(x)

        outputs: dict[str, jnp.ndarray] = {}

        # --- 3. representation learner ---
        def _want(h):
            return heads is None or h in heads

        _rel_cfg = cfg.get("reliability_model")
        _need_rel = bool(_rel_cfg) and _want("reliability")
        _need_pred = bool(cfg.get("classifier")) and (
            _want("prediction")
            or (_need_rel
                and _rel_cfg.get("mode", "nmd") == "nmd_plus_signals")
        )

        merge_cfg = cfg.get("reliability_model", {}).get("merge")
        # runtime knob (predict --seq-shard / train seq sharding): length-
        # shard Hyena long convolutions over this mesh axis (hyena_sp ring)
        seq_axis = cfg.get("parallel", {}).get("seq_axis")
        if "branch" in rep_cfg:
            # shared-weight per-frame branches (nnlib/builder.py:1195-1266)
            bcfg = rep_cfg["branch"]
            shared = LayerStack(
                name="rep_branch",
                layer_configs=_freeze_layers(bcfg.get("hidden_layers", [])),
                pooling=bcfg.get("pooling"), seq_axis=seq_axis,
                remat=bool(cfg.get("remat", False)),
                defer_remask=bool(cfg.get("defer_remask", True)),
                dtype=self.dtype,
            )
            branch_outs = []
            for i in range(x.shape[1]):
                bx, _, _ = shared(
                    x[:, i: i + 1], None if mask is None else mask[:, i: i + 1],
                    train,
                )
                branch_outs.append(bx)
            rep_branches = branch_outs
            rep = jnp.concatenate(branch_outs, axis=-1)
            aux = {"nmd": None, "gate": None}
        else:
            rep_branches = None
            rep, _, aux = LayerStack(
                name="rep",
                layer_configs=_freeze_layers(rep_cfg.get("hidden_layers", [])),
                pooling=rep_cfg.get("pooling"),
                nmd_merge=merge_cfg, seq_axis=seq_axis,
                remat=bool(cfg.get("remat", False)),
                defer_remask=bool(cfg.get("defer_remask", True)),
                mask_until=mask_layers,
                dtype=self.dtype,
            )(x, mask, train, fold_table=fold_table, taps=_need_rel)

        outputs["embedding"] = rep
        if aux.get("nmd") is not None:
            outputs["nmd"] = aux["nmd"]
        if aux.get("gate") is not None:
            outputs["gate"] = aux["gate"]

        # --- 4. classifier head ---
        class_cfg = cfg.get("classifier")
        logits = None
        if not _need_pred:
            class_cfg = None
        if class_cfg and "branch" in class_cfg:
            # shared-weight per-branch head ending in a merge
            # (nnlib/builder.py:562-588)
            bcfg = class_cfg["branch"]
            hidden = list(bcfg.get("hidden_layers", []))
            if not hidden or hidden[-1].get("name") != "merge":
                raise ValueError("branched classifier must end with 'merge'")
            merge_method = (hidden[-1].get("config") or {}).get(
                "method", "average"
            ).lower()
            shared_head = LayerStack(
                name="classifier_branch",
                layer_configs=_freeze_layers(hidden[:-1]),
                dtype=self.dtype,
            )
            branches = rep_branches if rep_branches is not None else [rep]
            outs = [shared_head(b_, None, train)[0] for b_ in branches]
            if merge_method == "average":
                logits = sum(outs) / len(outs)
            elif merge_method == "sum":
                logits = sum(outs)
            elif merge_method == "max":
                logits = jnp.max(jnp.stack(outs, 0), axis=0)
            elif merge_method == "concat":
                logits = jnp.concatenate(outs, axis=-1)
            else:
                raise ValueError(f"unknown merge method {merge_method!r}")
            outputs["prediction"] = logits
        elif class_cfg:
            logits, _, _ = LayerStack(
                name="classifier",
                layer_configs=_freeze_layers(class_cfg.get("hidden_layers", [])),
                dtype=self.dtype,
            )(rep, None, train)
            outputs["prediction"] = logits

        # --- 5. projection head (self-supervised pretraining) ---
        proj_cfg = cfg.get("projection")
        if proj_cfg and (
            with_projection
            or (heads is not None and "projection" in heads)
        ):
            proj, _, _ = LayerStack(
                name="projection",
                layer_configs=_freeze_layers(proj_cfg.get("hidden_layers", [])),
                dtype=self.dtype,
            )(rep, None, train)
            outputs["projection"] = proj

        # --- 6. reliability head (nnlib/builder.py:624-838) ---
        rel_cfg = _rel_cfg if _need_rel else None
        if rel_cfg and aux.get("nmd") is None:
            # reference parity: clear build-time error instead of a
            # missing-output crash later (nnlib/builder.py:636-640)
            raise ValueError(
                "reliability_model is configured but the representation "
                "learner produced no NMD tensor. Add an `nmd` layer or "
                "set return_nmd: true on a layer that supports it."
            )
        if rel_cfg and aux.get("nmd") is not None:
            mode = rel_cfg.get("mode", "nmd")
            rel_in = aux["nmd"]
            if mode == "nmd_plus_signals":
                default_signals = (
                    "max_prob", "entropy", "energy", "margin", "nmd_norm"
                )
                signals = tuple(rel_cfg.get("signals", default_signals))
                sig = L.OODSignalLayer(signals=signals, name="ood_signals")(
                    logits, aux["nmd"], train
                )
                rel_in = jnp.concatenate(
                    [aux["nmd"].astype(jnp.float32), sig], axis=-1
                ).astype(self.dtype)
            expected_dim = rel_cfg.get("input_shape")
            if (expected_dim is not None
                    and int(expected_dim) != int(rel_in.shape[-1])):
                # reference parity: nnlib/builder.py:658-667
                raise ValueError(
                    f"reliability_model.input_shape ({expected_dim}) does "
                    "not match computed reliability input dimension "
                    f"({int(rel_in.shape[-1])}). Set input_shape to None "
                    f"or omit it when using mode={mode!r}."
                )
            rel, _, _ = LayerStack(
                name="reliability",
                layer_configs=_freeze_layers(rel_cfg.get("hidden_layers", [])),
                dtype=self.dtype,
            )(rel_in, None, train)
            outputs["reliability"] = rel

        return outputs


class ModelBuilder:
    """Build a :class:`JaegerModel` + initial variables from a config.

    The reference's checkpoint/resume responsibilities
    (``nnlib/builder.py:322-441``) live in :mod:`jaeger_tpu.train.checkpoint`.
    """

    def __init__(self, config: dict, dtype: Any = jnp.float32):
        self.full_config = config
        self.model_cfg = config.get("model", config)
        self.train_cfg = config.get("training", {})
        self.dtype = dtype
        # model-level masking gate (reference nnlib/builder.py:259,1020:
        # every layer config inherits model.use_masking as its default)
        if "use_masking" in self.model_cfg:
            gate = bool(self.model_cfg["use_masking"])
            for section in ("representation_learner", "classifier",
                            "projection", "reliability_model"):
                sec = self.model_cfg.get(section) or {}
                for group in (sec.get("hidden_layers") or [],
                              (sec.get("branch") or {}).get(
                                  "hidden_layers") or []):
                    for layer in group:
                        layer.setdefault("config", {})
                        layer["config"].setdefault("use_masking", gate)

    @property
    def string_processor(self) -> dict:
        return self.model_cfg.get("string_processor", {})

    @property
    def crop(self) -> tuple[int, int]:
        input_type = self.model_cfg.get("embedding", {}).get(
            "input_type", "translated"
        )
        nt = _resolve_crop_nt(self.string_processor, input_type)
        return crop_contract.nucleotides_to_codons(nt), nt

    def build(self) -> JaegerModel:
        return JaegerModel(config=self.model_cfg, dtype=self.dtype)

    def example_inputs(self, batch: int = 2) -> dict:
        codons, nt = self.crop
        emb_cfg = self.model_cfg.get("embedding", {})
        fragsize = int(self.model_cfg.get("fragsize", nt))
        bases = jnp.zeros((batch, max(nt, fragsize)), jnp.uint8)
        lengths = jnp.full((batch,), nt, jnp.int32)
        return {"bases": bases, "lengths": lengths}

    def init(self, rng=None, batch: int = 2):
        model = self.build()
        rng = rng if rng is not None else jax.random.PRNGKey(
            int(self.model_cfg.get("seed", 42))
        )
        variables = model.init(
            {"params": rng, "dropout": rng},
            self.example_inputs(batch), train=False,
            with_projection="projection" in self.model_cfg,
        )
        return model, variables

    # -- regularizer collection (applied by the training loss) -------------

    def regularizer_specs(self) -> list[tuple[str, str, float]]:
        """(param-path regex, kind, weight) triples from the config.

        Mirrors which weights the reference regularizes: conv/dense kernels
        with ``kernel_regularizer`` and the embedding table
        (``nnlib/builder.py:309-321,858-876``).
        """
        specs: list[tuple[str, str, float]] = []
        emb = self.model_cfg.get("embedding", {})
        if emb.get("embedding_regularizer"):
            specs.append(
                (r"embedding", str(emb["embedding_regularizer"]),
                 float(emb.get("embedding_regularizer_w", 0.0)))
            )

        def walk(section: str, cfg: dict):
            for i, entry in enumerate(cfg.get("hidden_layers", [])):
                c = entry.get("config") or {}
                if c.get("kernel_regularizer"):
                    name = entry.get("name", "").lower()
                    specs.append(
                        (rf"{section}/.*{re.escape(name)}_{i}.*/kernel",
                         str(c["kernel_regularizer"]),
                         float(c.get("kernel_regularizer_w", 0.0)))
                    )

        for section in ("representation_learner", "classifier", "projection",
                        "reliability_model"):
            sec_cfg = self.model_cfg.get(section) or {}
            name = {
                "representation_learner": "rep",
                "classifier": "classifier",
                "projection": "projection",
                "reliability_model": "reliability",
            }[section]
            walk(name, sec_cfg)
            if "branch" in sec_cfg:
                walk(f"{name}_branch", sec_cfg["branch"])
        return specs
