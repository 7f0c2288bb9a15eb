"""Cross-parse the pure-python TFRecord writer/reader against the real
TensorFlow TFRecord stack: records we write must parse through the
reference's ``data/tfrecord`` feature pipeline, and records TF writes
must parse through our reader.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")
for _name in ("pyfastx", "pydustmasker"):  # transitive package imports
    sys.modules.setdefault(_name, types.ModuleType(_name))

tf = pytest.importorskip("tensorflow")
ref_tfrecord = pytest.importorskip("jaeger.data.tfrecord")

from jaeger_tpu.train import tfrecord as our_tfrecord  # noqa: E402


def _example(rng, crop=104, num_classes=3):
    k = crop // 3 - 1
    toks = rng.integers(0, 65, size=(6, k)).astype(np.int64)
    label = np.eye(num_classes, dtype=np.float32)[int(rng.integers(3))]
    return toks, label


def test_our_records_parse_through_reference_pipeline(tmp_path, rng):
    crop, num_classes = 104, 3
    toks, label = _example(rng, crop, num_classes)
    payload = our_tfrecord.build_example({
        "translated": toks.reshape(-1),
        "label": label,
    })
    path = tmp_path / "ours.tfrecord"
    our_tfrecord.write_tfrecord(path, [payload])

    parse = ref_tfrecord._make_parse_tfrecord_fn(
        input_type="translated", use_embedding_layer=True,
        codon_depth=65, crop_size=crop, num_classes=num_classes,
    )
    ds = tf.data.TFRecordDataset(str(path)).map(parse)
    feats, lab = next(iter(ds))
    got = np.asarray(feats["translated"]
                     if isinstance(feats, dict) else feats)
    np.testing.assert_array_equal(got.reshape(6, -1), toks)
    np.testing.assert_array_equal(np.asarray(lab), label)


def test_tf_written_records_parse_through_our_reader(tmp_path, rng):
    crop, num_classes = 104, 3
    toks, label = _example(rng, crop, num_classes)
    ex = tf.train.Example(features=tf.train.Features(feature={
        "translated": tf.train.Feature(int64_list=tf.train.Int64List(
            value=toks.reshape(-1).tolist())),
        "label": tf.train.Feature(float_list=tf.train.FloatList(
            value=label.tolist())),
    }))
    path = tmp_path / "tf.tfrecord"
    with tf.io.TFRecordWriter(str(path)) as w:
        w.write(ex.SerializeToString())

    payloads = list(our_tfrecord.iter_tfrecords(path))
    assert len(payloads) == 1
    feats = our_tfrecord.parse_example(payloads[0])
    np.testing.assert_array_equal(
        np.asarray(feats["translated"]).reshape(6, -1), toks)
    np.testing.assert_allclose(np.asarray(feats["label"]), label, rtol=1e-6)
