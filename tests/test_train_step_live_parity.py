"""Train-step parity pinned LIVE against the reference Keras stack.

The reference trains its classifier branch with the stock Keras train
step: ``loss = CategoricalCrossentropy(from_logits=True)(y, model(x,
training=True)) + sum(model.losses)`` and a ``GradientTape`` over the
trainable variables (``nnlib/v2/layers.py:2038-2070`` for the custom
MetricModel variant; ``nnlib/builder.py:1398-1405`` compiles the plain
classifier branch the same way).  These tests pin OUR whole training
semantics — masked forward in ``train=True`` mode, batch-norm batch
statistics + moving-stat update, loss, regularization, and every
trainable gradient — against that live TF computation.

Gradient mapping trick: ``convert_modern_weights`` is a pure index
re-arrangement (transposes / reshapes / concats), so the gradient of
the loss w.r.t. a reference variable maps to our parameter tree through
the SAME conversion.  We therefore assign each reference variable its
own gradient, save a genuine ``.weights.h5``, convert it, and compare
leaf-for-leaf with ``jax.grad`` of our jitted loss.  Variables the loss
does not touch (the reliability head under classifier-branch training)
are pinned to exact zeros on both sides.

This removes the last circularity in the training story: losses and
metrics were already pinned live individually; here the composition —
one full forward+backward — is pinned end to end.
"""

from __future__ import annotations

import contextlib
import io
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

jaeger_ref = pytest.importorskip("jaeger.nnlib.builder")

import test_modern_convert_real as mcr  # noqa: E402

FRAMES, LEN, VOCAB = mcr.FRAMES, mcr.LEN, mcr.VOCAB

# Families whose masked-forward semantics are pinned elsewhere with a
# documented divergence (the reference's Keras attention row-masks only
# the query, bleeding pad into valid rows on short windows); gradient
# parity on padded tokens is only asserted for the rest.
PAD_SENSITIVE = {"transformer", "crossframe", "axial"}


def _build_reference(cfg, seed=0):
    b = jaeger_ref.DynamicModelBuilder(cfg)
    with contextlib.redirect_stdout(io.StringIO()):
        models = b.build_fragment_classifier()
    jm = models["jaeger_model"]
    rng = np.random.default_rng(seed)
    for w in jm.weights:
        if "variance" in w.path:
            vals = rng.uniform(0.5, 1.5, size=w.shape)
        else:
            vals = rng.uniform(-0.4, 0.4, size=w.shape)
        w.assign(vals.astype("float32"))
    return models, rng


def _reference_grads(models, toks, labels, h5, h5g):
    """Save weights, run one live train-step tape, save gradients-as-weights.

    Returns (total_loss, reg_loss).  After this call the reference
    model's variables hold GRADIENTS, its BN moving stats hold the
    post-step updated statistics — exactly what ``h5g`` captures.
    """
    jm = models["jaeger_model"]
    clf = models["jaeger_classifier"]
    jm.save_weights(str(h5))

    loss_obj = tf.keras.losses.CategoricalCrossentropy(
        from_logits=True, label_smoothing=0.1)
    tv = clf.trainable_variables

    # Compiled graph mode, like the reference's real `model.fit` train
    # step (jit_compile is the reference's own `--jit` path).  Plain
    # eager/graph CPU execution picks between oneDNN (dilation-capable)
    # and Eigen (dilation rejected) `Conv2DBackprop*` kernels by a
    # runtime heuristic, so dilated families failed depending on which
    # tests ran first; XLA:CPU supports dilated conv gradients
    # unconditionally.
    @tf.function(jit_compile=True)
    def _step(toks_t, labels_t):
        with tf.GradientTape() as tape:
            logits = clf(toks_t, training=True)
            base = loss_obj(labels_t, logits)
            reg = tf.add_n(clf.losses) if clf.losses else tf.constant(0.0)
            total = base + reg
        return total, reg, tape.gradient(total, tv)

    total, reg, grads = _step(tf.constant(toks), tf.constant(labels))
    grad_by_id = {id(v): g for v, g in zip(tv, grads)}
    for v in jm.trainable_variables:
        g = grad_by_id.get(id(v))
        v.assign(tf.zeros_like(v) if g is None else g)
    jm.save_weights(str(h5g))
    return float(total), float(reg)


def _our_grads(cfg, h5, toks, labels, reg_specs):
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.modern_convert import convert_modern_weights
    from jaeger_tpu.train import losses as losses_lib

    variables = convert_modern_weights(cfg, h5)
    model = ModelBuilder(cfg).build()

    def loss_fn(params):
        # heads=("prediction",) = classifier-branch graph: like the
        # reference's pruned functional model, the standalone NMD taps
        # and reliability head must not execute (or update stats).
        out, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            {"translated": jnp.asarray(toks)}, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
            heads=("prediction",),
        )
        base = losses_lib.categorical_crossentropy(
            jnp.asarray(labels), out["prediction"],
            from_logits=True, label_smoothing=0.1,
        )
        reg = losses_lib.regularization_loss(params, list(reg_specs))
        return base + reg, (reg, upd)

    (total, (reg, upd)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    return float(total), float(reg), grads, upd["batch_stats"]


def _assert_tree_close(ours, ref, *, rtol, floor_frac=0.05, what="grad"):
    """Leaf-wise compare with a tolerance floor tied to the GLOBAL scale.

    Near-zero leaves (e.g. a conv bias feeding batch-norm, whose
    gradient is exactly cancelled by the normalizer) otherwise amplify
    f32 round-off into huge relative errors.
    """
    import jax

    flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat_ours = dict(jax.tree_util.tree_flatten_with_path(ours)[0])
    assert flat_ref, "empty reference tree"
    assert len(flat_ref) == len(flat_ours)
    gmax = max(float(np.max(np.abs(np.asarray(l)))) for _, l in flat_ref)
    for path, ref_leaf in flat_ref:
        pstr = "/".join(str(getattr(p, "key", p)) for p in path)
        ref_leaf = np.asarray(ref_leaf)
        ours_leaf = np.asarray(flat_ours[path], np.float32)
        scale = max(float(np.max(np.abs(ref_leaf))), floor_frac * gmax, 1e-6)
        np.testing.assert_allclose(
            ours_leaf, ref_leaf, rtol=0, atol=rtol * scale,
            err_msg=f"{what} {pstr!r} diverges from the live reference",
        )


def _run_family(family, tmp_path, *, masked=False, batch=4, seed=0,
                rtol=5e-5):
    merge = {"mode": "concat"} if family == "resblock_dyt_nmd" else None
    cfg = mcr._config(mcr.FAMILIES[family], tmp_path, merge=merge)
    models, rng = _build_reference(cfg, seed=seed)
    toks = rng.integers(1, VOCAB, size=(batch, FRAMES, LEN)).astype("int32")
    if masked:
        toks = mcr._masked_tokens(toks)
    labels = np.eye(3, dtype=np.float32)[rng.integers(0, 3, size=batch)]
    h5 = tmp_path / "w.weights.h5"
    h5g = tmp_path / "g.weights.h5"
    ref_total, ref_reg = _reference_grads(models, toks, labels, h5, h5g)
    our_total, our_reg, grads, new_stats = _our_grads(
        cfg, h5, toks, labels, reg_specs=())

    assert our_total == pytest.approx(ref_total, rel=2e-6, abs=2e-6)
    assert our_reg == pytest.approx(ref_reg, rel=1e-6, abs=1e-7)

    from jaeger_tpu.models.modern_convert import convert_modern_weights
    gtree = convert_modern_weights(cfg, h5g)
    _assert_tree_close(grads, gtree["params"], rtol=rtol)
    if gtree.get("batch_stats"):
        _assert_tree_close(new_stats, gtree["batch_stats"], rtol=rtol,
                           what="moving stat")


@pytest.mark.parametrize("family", sorted(mcr.FAMILIES))
def test_train_step_gradients_match_live(family, tmp_path):
    _run_family(family, tmp_path)


@pytest.mark.parametrize(
    "family", sorted(set(mcr.FAMILIES) - PAD_SENSITIVE))
def test_train_step_gradients_match_live_masked(family, tmp_path):
    _run_family(family, tmp_path, masked=True)


def test_reliability_branch_gradients_match_live(tmp_path):
    """Branch 3: rep+classifier frozen, BCE on the reliability head.

    Keras's ``trainable=False`` inference-mode switch is special-cased
    INSIDE ``keras.layers.BatchNormalization`` — the reference's custom
    ``MaskedBatchNorm`` has no such branch (``nnlib/v2/layers.py:904-916``
    keys on ``training`` only), so the frozen rep's BN still normalizes
    with batch statistics and still updates its moving stats during
    reliability training, and the standalone NMD taps update too.  This
    pins that exact semantic live: loss, head gradients, frozen-var
    zeros, and the post-step moving stats.
    """
    family = "resblock_dyt_nmd"
    cfg = mcr._config(mcr.FAMILIES[family], tmp_path,
                      merge={"mode": "concat"})
    models, rng = _build_reference(cfg)
    toks = rng.integers(1, VOCAB, size=(4, FRAMES, LEN)).astype("int32")
    labels = rng.integers(0, 2, size=(4, 1)).astype(np.float32)
    h5 = tmp_path / "w.weights.h5"
    h5g = tmp_path / "g.weights.h5"

    jm = models["jaeger_model"]
    rel = models["jaeger_reliability"]
    jm.save_weights(str(h5))
    models["rep_model"].trainable = False
    if models.get("classification_head") is not None:
        models["classification_head"].trainable = False
    loss_obj = tf.keras.losses.BinaryCrossentropy(from_logits=True)
    tv = rel.trainable_variables

    @tf.function(jit_compile=True)  # see _reference_grads
    def _step(toks_t, labels_t):
        with tf.GradientTape() as tape:
            out = rel(toks_t, training=True)
            total = loss_obj(labels_t, out)
        return total, tape.gradient(total, tv)

    total, grads = _step(tf.constant(toks), tf.constant(labels))
    assert len(tv) > 0
    grad_by_id = {id(v): g for v, g in zip(tv, grads)}
    # Frozen vars are no longer in any trainable_variables list; their
    # gradient is zero by definition.  Moving stats keep their (updated)
    # values for the stats assertion below.
    for v in jm.weights:
        g = grad_by_id.get(id(v))
        if g is not None:
            v.assign(g)
        elif "moving" not in v.path:
            v.assign(tf.zeros_like(v))
    jm.save_weights(str(h5g))
    ref_total = float(total)

    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.modern_convert import convert_modern_weights
    from jaeger_tpu.train import losses as losses_lib
    from jaeger_tpu.train.loop import _mask_frozen

    variables = convert_modern_weights(cfg, h5)
    model = ModelBuilder(cfg).build()

    def loss_fn(params):
        out, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            {"translated": jnp.asarray(toks)}, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
            heads=("reliability",),
        )
        base = losses_lib.binary_crossentropy(
            jnp.asarray(labels), out["reliability"], from_logits=True)
        return base, upd

    (our_total, upd), our_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    our_grads = _mask_frozen(
        our_grads, ("embedding", "rep", "classifier", "projection"))

    assert float(our_total) == pytest.approx(ref_total, rel=2e-6, abs=2e-6)
    gtree = convert_modern_weights(cfg, h5g)
    _assert_tree_close(our_grads, gtree["params"], rtol=5e-5)
    # frozen-rep BN + NMD moving stats DID update, identically
    _assert_tree_close(upd["batch_stats"], gtree["batch_stats"], rtol=5e-5,
                       what="moving stat")


def test_train_step_regularization_matches_live(tmp_path):
    """kernel + embedding L2 terms: sum(model.losses) vs regularization_loss."""
    layers = [
        {"name": "masked_conv1d",
         "config": {"filters": 8, "kernel_size": 3,
                    "kernel_regularizer": "l2",
                    "kernel_regularizer_w": 0.01}},
        {"name": "masked_batchnorm", "config": {"return_nmd": True}},
        {"name": "activation", "config": {"activation": "gelu"}},
    ]
    cfg = mcr._config(layers, tmp_path)
    cfg["model"]["embedding"]["embedding_regularizer"] = "l2"
    cfg["model"]["embedding"]["embedding_regularizer_w"] = 0.005

    from jaeger_tpu.models.builder import ModelBuilder

    reg_specs = tuple(ModelBuilder(cfg).regularizer_specs())
    assert len(reg_specs) == 2, reg_specs

    models, rng = _build_reference(cfg)
    toks = rng.integers(1, VOCAB, size=(4, FRAMES, LEN)).astype("int32")
    labels = np.eye(3, dtype=np.float32)[rng.integers(0, 3, size=4)]
    h5 = tmp_path / "w.weights.h5"
    h5g = tmp_path / "g.weights.h5"
    ref_total, ref_reg = _reference_grads(models, toks, labels, h5, h5g)
    assert ref_reg > 0.0  # the live model really did add penalty terms
    our_total, our_reg, grads, _ = _our_grads(
        cfg, h5, toks, labels, reg_specs=reg_specs)

    assert our_reg == pytest.approx(ref_reg, rel=1e-5)
    assert our_total == pytest.approx(ref_total, rel=2e-6, abs=2e-6)

    from jaeger_tpu.models.modern_convert import convert_modern_weights
    gtree = convert_modern_weights(cfg, h5g)
    _assert_tree_close(grads, gtree["params"], rtol=5e-5)
