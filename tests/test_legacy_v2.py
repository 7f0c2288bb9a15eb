"""Legacy v2 (``experimental_*``) family parity.

Three pins against the live reference package (importable in this image):

* the Murphy-10 v2 codon numbering equals ``preprocess/v2/maps.MURPHY10_INT``;
* :func:`encode_murphy_windows` reproduces the TF string pipeline
  ``preprocess/v2/convert.process_string`` value-for-value;
* :func:`convert_experimental_h5` + :class:`ExperimentalModel` reproduce a
  Keras forward of the reference architecture (``nnlib/v1/layers.py:735``).

Upstream note: the reference's own ``create_jaeger_model`` cannot build
under its pinned Keras 3 (Conv1D rejects the rank-4 ``(B, 6, L, 11)``
input written against TF2 batch-dim semantics), so the golden model here
is a rank-3 restatement with identical layer names and weights — the
TF2-era semantics the architecture was trained with.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

BASE_ID = {"A": 0, "T": 1, "G": 2, "C": 3, "N": 4}


def _random_seq(rng, n, alphabet="ATGC"):
    return "".join(rng.choice(list(alphabet), size=n))


def test_murphy_v2_map_matches_reference():
    ref_maps = pytest.importorskip("jaeger.preprocess.v2.maps")
    from jaeger_tpu.seqops.maps import CODONS, MURPHY10_V2_ID

    assert list(ref_maps.CODONS) == list(CODONS)
    assert list(ref_maps.MURPHY10_INT) == list(MURPHY10_V2_ID)


@pytest.mark.parametrize("crop", [500, 2048])
def test_encode_murphy_matches_reference_tf(rng, crop):
    tf = pytest.importorskip("tensorflow")
    ref_convert = pytest.importorskip("jaeger.preprocess.v2.convert")
    import jax.numpy as jnp

    from jaeger_tpu.models.legacy import encode_murphy_windows

    seq = _random_seq(rng, crop, alphabet="ATGCATGCATGCN")
    # the reference fn consumes the fragment_generator CSV row (11 fields)
    row = tf.constant(seq + "," + ",".join(["0"] * 10))
    feats, *_ = ref_convert.process_string(crop_size=crop)(row)
    ref_onehot = np.asarray(feats["translated"])  # (6, K, 11)

    bases = np.array([[BASE_ID[c] for c in seq]], dtype=np.uint8)
    toks = encode_murphy_windows(
        jnp.asarray(bases), jnp.asarray([crop], dtype=np.int32), crop
    )
    ours = np.eye(11, dtype=ref_onehot.dtype)[np.asarray(toks)[0]]
    assert ours.shape == ref_onehot.shape
    np.testing.assert_array_equal(ours, ref_onehot)


def _tf_experimental(L, num_classes=4, num_res_blocks=2, seed=0):
    """Rank-3 Keras restatement of ``create_jaeger_model`` with the
    reference's layer names (shared per-frame weights)."""
    tf = pytest.importorskip("tensorflow")
    lay = tf.keras.layers
    tf.keras.utils.set_random_seed(seed)

    inp = tf.keras.Input(shape=(6, L, 11), name="translated")
    conv1 = lay.Conv1D(128, 9, padding="same", name="conv1")
    pool = lay.MaxPooling1D(2)
    bn11 = lay.BatchNormalization(axis=-1, name="block1_1")
    conv2 = lay.Conv1D(128, 3, dilation_rate=2, padding="same", name="conv2")
    bn12 = lay.BatchNormalization(axis=-1, name="block1_2")
    blocks = []
    for i in range(num_res_blocks):
        blocks.append((
            lay.Conv1D(256, 3, dilation_rate=3, padding="same",
                       name=f"block2_{i}_1"),
            lay.BatchNormalization(axis=-1, name=f"block2_{i}_1_norm"),
            lay.Conv1D(256, 3, dilation_rate=3, padding="same",
                       name=f"block2_{i}_3"),
            lay.BatchNormalization(axis=-1, name=f"block2_{i}_3_norm"),
            lay.Conv1D(256, 1, name=f"block2_{i}_skip"),
            lay.BatchNormalization(axis=-1, name=f"block2_{i}_skip_norm"),
        ))
    leaky = lay.LeakyReLU(negative_slope=0.1)
    relu = lay.ReLU()

    frame_outs = []
    for f in range(6):
        h = leaky(bn11(pool(conv1(inp[:, f]))))
        h = leaky(bn12(conv2(h)))
        for c1, b1, c3, b3, cs, bs in blocks:
            xx = relu(b1(c1(h)))
            xx = leaky(b3(c3(xx)))
            skip = h if h.shape[-1] == 256 else leaky(bs(cs(h)))
            h = lay.Add()([skip, xx])
        frame_outs.append(h)
    x = lay.Add()(frame_outs)
    x = lay.BatchNormalization(axis=-1, name="sum_reduce_norm")(x)
    x = lay.GlobalAveragePooling1D()(x)
    x = lay.BatchNormalization(axis=-1, name="dense1")(
        lay.Dense(32, activation="relu", name="augdense-1")(x))
    x1 = lay.BatchNormalization(axis=-1, name="dense2")(
        lay.Dense(32, activation="relu", name="augdense-2")(x))
    out = lay.Dense(num_classes, dtype="float32", name="outdense")(x1)
    model = tf.keras.Model(inp, {"output": out, "embedding": x1})

    # randomize BN affine + moving statistics so the pin is not identity
    rng = np.random.RandomState(seed)
    for layer in model.layers:
        if isinstance(layer, lay.BatchNormalization):
            c = layer.get_weights()[0].shape[0]
            layer.set_weights([
                rng.uniform(0.5, 1.5, c).astype("float32"),
                rng.uniform(-0.5, 0.5, c).astype("float32"),
                rng.uniform(-0.5, 0.5, c).astype("float32"),
                rng.uniform(0.5, 1.5, c).astype("float32"),
            ])
    return model


def test_experimental_conversion_golden(tmp_path, rng):
    tf = pytest.importorskip("tensorflow")
    import jax.numpy as jnp

    from jaeger_tpu.models.legacy import ExperimentalModel
    from jaeger_tpu.models.legacy_convert import convert_experimental_h5

    L, n_blocks = 60, 2
    tf_model = _tf_experimental(L, num_classes=4, num_res_blocks=n_blocks)
    x = rng.random((3, 6, L, 11)).astype("float32")
    ref = tf_model(x, training=False)
    ref_out = np.asarray(ref["output"])
    ref_emb = np.asarray(ref["embedding"])

    h5 = tmp_path / "experimental.weights.h5"
    tf_model.save_weights(str(h5))
    variables = convert_experimental_h5(h5, num_res_blocks=n_blocks)
    model = ExperimentalModel(num_classes=4, num_res_blocks=n_blocks)
    out = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(out["embedding"]), ref_emb,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["output"]), ref_out,
                               rtol=2e-4, atol=2e-5)


def test_predict_legacy_experimental_e2e(tmp_path, rng):
    """experimental model end-to-end through predict-legacy run_core."""
    pytest.importorskip("tensorflow")
    from jaeger_tpu.commands.predict_legacy import run_core

    fsize = 200
    k = (fsize - 5 + [-2, -1, 0][fsize % 3]) // 3 + (
        1 if (fsize - 5 + [-2, -1, 0][fsize % 3]) % 3 else 0
    )
    tf_model = _tf_experimental(k, num_classes=4, num_res_blocks=1)
    mdir = tmp_path / "model"
    mdir.mkdir()
    tf_model.save_weights(str(mdir / "experimental_1.weights.h5"))

    fasta = tmp_path / "in.fasta"
    fasta.write_text(
        ">c1\n" + _random_seq(rng, 450) + "\n>c2\n" + _random_seq(rng, 230)
        + "\n"
    )
    table = run_core(
        str(fasta), str(tmp_path / "out"), model_dir=mdir, fsize=fsize,
        stride=fsize, min_len=fsize, model_name="experimental_1",
        num_res_blocks=1,
    )
    lines = table.read_text().splitlines()
    assert lines[0].startswith("contig_id\t")
    assert len(lines) == 3  # header + 2 contigs
    preds = {ln.split("\t")[2] for ln in lines[1:]}
    assert preds <= {"bacteria", "phage", "eukarya", "archaea"}
