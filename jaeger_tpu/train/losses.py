"""Losses for the three training branches.

Parity targets: reference ``nnlib/v2/losses.py`` (supervised contrastive /
npairs, ArcFace with trainable class centroids, hierarchical fine+coarse
CE) plus the Keras stock losses the configs name
(``nnlib/builder.py:1716-1724``). All reductions are mean-over-batch like
Keras' ``SUM_OVER_BATCH_SIZE``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def categorical_crossentropy(labels_onehot, logits, from_logits=True,
                             class_weights=None, label_smoothing=0.0):
    if label_smoothing:
        # Keras CategoricalCrossentropy(label_smoothing=s) semantics:
        # y <- y*(1-s) + s/k
        k = labels_onehot.shape[-1]
        labels_onehot = (
            labels_onehot * (1.0 - label_smoothing) + label_smoothing / k
        )
    if from_logits:
        logp = jax.nn.log_softmax(logits, axis=-1)
    else:
        logp = jnp.log(jnp.clip(logits, 1e-7, 1.0))
    per_ex = -jnp.sum(labels_onehot * logp, axis=-1)
    if class_weights is not None:
        w = jnp.sum(labels_onehot * class_weights[None, :], axis=-1)
        per_ex = per_ex * w
    return jnp.mean(per_ex)


def sparse_categorical_crossentropy(labels, logits, from_logits=True,
                                    class_weights=None):
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return categorical_crossentropy(onehot, logits, from_logits, class_weights)


def binary_crossentropy(labels, logits, from_logits=True, class_weights=None):
    labels = labels.astype(jnp.float32).reshape(logits.shape)
    if from_logits:
        per_ex = (
            jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
    else:
        p = jnp.clip(logits, 1e-7, 1 - 1e-7)
        per_ex = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    per_ex = jnp.mean(per_ex, axis=-1)
    if class_weights is not None:
        w = jnp.where(
            labels.reshape(per_ex.shape) > 0.5,
            class_weights[1], class_weights[0],
        )
        per_ex = per_ex * w
    return jnp.mean(per_ex)


def mse(labels, preds, **_):
    return jnp.mean(jnp.square(labels - preds))


def npairs_loss(y_true, y_pred):
    """Parity: reference ``losses.py:24-37``."""
    y_true = y_true.astype(y_pred.dtype)[:, None]
    same = (y_true == y_true.T).astype(y_pred.dtype)
    same = same / jnp.sum(same, axis=1, keepdims=True)
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    return jnp.mean(-jnp.sum(same * logp, axis=-1))


def supervised_contrastive_loss(labels, features, temperature: float = 1.0):
    """Parity: reference ``losses.py:4-22``."""
    if labels.ndim > 1:
        labels = jnp.argmax(labels, axis=-1)
    feats = features / jnp.maximum(
        jnp.linalg.norm(features, axis=1, keepdims=True), 1e-12
    )
    logits = (feats @ feats.T) / temperature
    return npairs_loss(labels, logits)


class ArcFaceLoss(nn.Module):
    """ArcFace with trainable class centroids, float32-forced.

    Parity: reference ``losses.py:39-127`` — l2-normalize with eps 1e-4,
    additive angular margin on the target class, scaled softmax CE.
    """

    num_classes: int
    embedding_dim: int
    margin: float = 0.5
    scale: float = 30.0
    onehot: bool = True

    @nn.compact
    def __call__(self, labels, embeddings):
        w = self.param(
            "class_weights", nn.initializers.glorot_uniform(),
            (self.num_classes, self.embedding_dim), jnp.float32,
        )
        emb = embeddings.astype(jnp.float32)

        def l2n(x, eps=1e-4):
            return x / jnp.sqrt(
                jnp.maximum(jnp.sum(jnp.square(x), axis=1, keepdims=True), eps)
            )

        emb = l2n(emb)
        wn = l2n(w)
        cosine = emb @ wn.T
        if self.onehot:
            onehot = labels.astype(jnp.float32)
        else:
            onehot = jax.nn.one_hot(
                labels.reshape(-1).astype(jnp.int32), self.num_classes
            )
        eps = 1e-9
        theta = jnp.arccos(jnp.clip(cosine, -1.0 + eps, 1.0 - eps))
        target = jnp.cos(theta + self.margin)
        logits = (cosine * (1 - onehot) + target * onehot) * self.scale
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.mean(-jnp.sum(onehot * logp, axis=-1))


def hierarchical_loss(y_true, fine_logits, parent_of, groups,
                      l_fine: float = 1.0, l_coarse: float = 1.5):
    """Fine CE + coarse CE over logsumexp-grouped logits.

    Parity: reference ``losses.py:127-164``.
    """
    if y_true.ndim == 2:
        y_true = jnp.argmax(y_true, axis=-1)
    y_true = y_true.reshape(-1).astype(jnp.int32)
    logp_fine = jax.nn.log_softmax(fine_logits, axis=-1)
    loss_fine = -jnp.take_along_axis(
        logp_fine, y_true[:, None], axis=1
    )[:, 0]
    coarse_logits = jnp.stack(
        [
            jax.scipy.special.logsumexp(fine_logits[:, jnp.asarray(g)], axis=1)
            for g in groups
        ],
        axis=1,
    )
    y_coarse = jnp.take(jnp.asarray(parent_of), y_true)
    logp_coarse = jax.nn.log_softmax(coarse_logits, axis=-1)
    loss_coarse = -jnp.take_along_axis(
        logp_coarse, y_coarse[:, None], axis=1
    )[:, 0]
    return jnp.mean(l_fine * loss_fine + l_coarse * loss_coarse)


def regularization_loss(params, specs: list[tuple[str, str, float]]):
    """Apply (path-regex, l1|l2, weight) penalties collected by the builder."""
    import re

    if not specs:
        return 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in flat:
        path_str = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        for pattern, kind, weight in specs:
            if re.search(pattern, path_str):
                if kind == "l2":
                    total = total + weight * jnp.sum(jnp.square(leaf))
                elif kind == "l1":
                    total = total + weight * jnp.sum(jnp.abs(leaf))
    return total


LOSSES = {
    "categorical_crossentropy": categorical_crossentropy,
    "sparse_categorical_crossentropy": sparse_categorical_crossentropy,
    "binary_crossentropy": binary_crossentropy,
    "mse": mse,
}
