"""Live parity of the training losses against the reference's real TF
implementations (``nnlib/v2/losses.py``) on identical inputs — supcon /
npairs, ArcFace (weights copied into our module), and the hierarchical
fine+coarse CE.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

tf = pytest.importorskip("tensorflow")
ref_losses = pytest.importorskip("jaeger.nnlib.v2.losses")

import jax.numpy as jnp  # noqa: E402

from jaeger_tpu.train import losses as our_losses  # noqa: E402


def test_npairs_matches_live_reference(rng):
    logits = rng.standard_normal((12, 12)).astype(np.float32)
    labels = rng.integers(0, 3, size=12).astype(np.int32)
    ref = float(ref_losses.npairs_loss(labels, logits))
    ours = float(our_losses.npairs_loss(jnp.asarray(labels),
                                        jnp.asarray(logits)))
    assert ours == pytest.approx(ref, rel=1e-5)


@pytest.mark.parametrize("temperature", [1.0, 0.1])
def test_supcon_matches_live_reference(rng, temperature):
    feats = rng.standard_normal((10, 16)).astype(np.float32)
    labels = rng.integers(0, 3, size=10).astype(np.int32)
    ref = float(ref_losses.SupervisedContrastiveLoss(
        temperature=temperature)(labels, feats))
    ours = float(our_losses.supervised_contrastive_loss(
        jnp.asarray(labels), jnp.asarray(feats), temperature=temperature))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_supcon_onehot_labels_match_live_reference(rng):
    feats = rng.standard_normal((8, 12)).astype(np.float32)
    labels = rng.integers(0, 3, size=8).astype(np.int32)
    onehot = np.eye(3, dtype=np.float32)[labels]
    ref = float(ref_losses.SupervisedContrastiveLoss()(onehot, feats))
    ours = float(our_losses.supervised_contrastive_loss(
        jnp.asarray(labels), jnp.asarray(feats)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_arcface_matches_live_reference(rng):
    n, d, c = 9, 16, 4
    emb = rng.standard_normal((n, d)).astype(np.float32)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    onehot = np.eye(c, dtype=np.float32)[labels]
    weights = rng.standard_normal((c, d)).astype(np.float32)

    ref_layer = ref_losses.ArcFaceLoss(num_classes=c, embedding_dim=d,
                                       margin=0.5, scale=30.0, onehot=True)
    ref_layer.build(None)
    ref_layer.class_weights.assign(weights)
    ref = float(ref_layer(onehot, emb))

    ours_mod = our_losses.ArcFaceLoss(num_classes=c, embedding_dim=d,
                                      margin=0.5, scale=30.0)
    variables = {"params": {"class_weights": jnp.asarray(weights)}}
    ours = float(ours_mod.apply(variables, jnp.asarray(onehot),
                                jnp.asarray(emb)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_hierarchical_matches_live_reference(rng):
    parent_of = [0, 0, 1, 1, 2, 2]
    groups = [[0, 1], [2, 3], [4, 5]]
    logits = rng.standard_normal((14, 6)).astype(np.float32)
    labels = rng.integers(0, 6, size=14).astype(np.int32)
    ref = float(ref_losses.HierarchicalLoss(
        parent_of, groups, l_fine=1.0, l_coarse=1.5)(labels, logits))
    ours = float(our_losses.hierarchical_loss(
        jnp.asarray(labels), jnp.asarray(logits),
        parent_of=parent_of, groups=groups, l_fine=1.0, l_coarse=1.5))
    assert ours == pytest.approx(ref, rel=1e-5)
