"""TF SavedModel -> jaeger-tpu weight conversion (no TensorFlow).

Uses the reference's bundled test SavedModel
(``data/models/test/jaeger_fragment_graph``, read-only) as the conversion
fixture: the checkpoint parser must recover every tensor with full names,
the converted tree must match the WResModel structure exactly, and the
forward pass is pinned to golden logits captured from the LIVE
reference model (see GOLDEN_LOGITS below).
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GRAPH = Path(
    "/root/reference/src/jaeger/data/models/test/jaeger_fragment_graph"
)
pytestmark = pytest.mark.skipif(
    not GRAPH.exists(), reason="reference bundled SavedModel unavailable"
)


def test_checkpoint_parser_tensors():
    from jaeger_tpu.models.tf_checkpoint import load_checkpoint

    t = load_checkpoint(GRAPH)
    assert len(t) == 79
    by_suffix = {"/".join(k.split("/")[-2:]): v for k, v in t.items()}
    assert by_suffix["aa/embeddings"].shape == (22, 4)
    assert by_suffix["block1_0/kernel"].shape == (9, 4, 128)
    assert by_suffix["outdense/kernel"].shape == (128, 4)
    assert by_suffix["bn_block1_1/moving_variance"].shape == (128,)


def test_converted_tree_matches_model():
    import jax.tree_util as jtu

    from jaeger_tpu.models.legacy import WResModel
    from jaeger_tpu.models.legacy_convert import convert_wres_checkpoint

    variables = convert_wres_checkpoint(GRAPH)
    model = WResModel(dropout_active=False)
    toks = jnp.ones((1, 6, 50), jnp.int32)
    tmpl = model.init({"params": jax.random.PRNGKey(0)}, toks, train=False)
    for coll in ("params", "batch_stats"):
        t1 = {
            jtu.keystr(k): v.shape
            for k, v in jtu.tree_flatten_with_path(tmpl[coll])[0]
        }
        t2 = {
            jtu.keystr(k): v.shape
            for k, v in jtu.tree_flatten_with_path(variables[coll])[0]
        }
        assert t1 == t2


#: Captured from the LIVE reference model (WRes_model_embeddings +
#: load_weights on this SavedModel's weights, TF CPU) on the first four
#: test_contigs windows — NOT from this implementation, so the pin is
#: non-circular.  The original self-captured goldens hid a real bug:
#: the tower was missing rc_resnet_block's trailing gelu
#: (v1/layers.py:141-147) and produced wrong (but confident) logits.
GOLDEN_LOGITS = np.array(
    [[1.5382838, 2.9926429, -8.1851845, -1.7888622],
     [0.432796, 5.409757, -8.499824, -4.1124396],
     [1.4189093, 2.1239934, -7.0766964, -0.8428301],
     [0.08749372, 3.6451898, -5.12516, -2.6344242]], dtype=np.float32,
)


def test_converted_forward_golden():
    from jaeger_tpu.models.legacy import WResModel, encode_amino_windows
    from jaeger_tpu.models.legacy_convert import convert_wres_checkpoint
    from jaeger_tpu.seqops.windows import window_batches

    variables = convert_wres_checkpoint(GRAPH)
    model = WResModel(dropout_active=False)
    batch = next(window_batches(
        str(GRAPH.parents[2] / "test" / "test_contigs.fasta"),
        fragsize=2048, stride=2048,
    ))
    toks = encode_amino_windows(
        jnp.asarray(batch.bases[:4]), jnp.asarray(batch.length[:4]), 2048
    )
    out = model.apply(variables, toks, train=False)
    np.testing.assert_allclose(
        np.asarray(out["output"], np.float32), GOLDEN_LOGITS,
        rtol=2e-4, atol=2e-3,
    )
    # trained model picks a clear winner on every window (the live
    # reference's own max-prob over these windows bottoms out at ~0.65)
    probs = jax.nn.softmax(np.asarray(out["output"], np.float64), axis=-1)
    assert probs.max(axis=1).min() > 0.6


def test_end_to_end_golden_tsv(tmp_path):
    """The converted bundled reference SavedModel driven through the
    predict command on test_contigs.fasta must reproduce the committed
    TSV byte-for-byte — pins stats, float formatting, window_summary
    run-length strings and column order in one shot (reference writer:
    postprocess/collect.py:561-640)."""
    from jaeger_tpu.commands.predict_legacy import run_core

    table = run_core(
        str(GRAPH.parents[2] / "test" / "test_contigs.fasta"),
        str(tmp_path), model_dir=GRAPH,
    )
    golden = (
        Path(__file__).parent / "fixtures"
        / "golden_wres_graph_test_contigs.tsv"
    )
    assert table.read_bytes() == golden.read_bytes()


H5 = Path("/root/reference/src/jaeger/data/models/default/WRes_1024.h5")


@pytest.mark.skipif(not H5.exists(), reason="default h5 unavailable")
def test_h5_conversion_matches_model():
    import jax.tree_util as jtu

    from jaeger_tpu.models.legacy import WResModel
    from jaeger_tpu.models.legacy_convert import convert_wres_h5

    variables = convert_wres_h5(H5)
    model = WResModel(dropout_active=False)
    toks = jnp.ones((1, 6, 50), jnp.int32)
    tmpl = model.init({"params": jax.random.PRNGKey(0)}, toks, train=False)
    t1 = {jtu.keystr(k): v.shape
          for k, v in jtu.tree_flatten_with_path(tmpl["params"])[0]}
    t2 = {jtu.keystr(k): v.shape
          for k, v in jtu.tree_flatten_with_path(variables["params"])[0]}
    assert t1 == t2
    out = model.apply(variables, toks, train=False)
    assert np.isfinite(np.asarray(out["output"])).all()
