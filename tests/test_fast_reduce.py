"""Device-reduced fast path vs full-logit path equivalence."""

import numpy as np
import pandas as pd

from jaeger_tpu.infer.engine import InferenceEngine
from jaeger_tpu.models.builder import ModelBuilder
from jaeger_tpu.postprocess import collect
from jaeger_tpu.seqops.windows import window_batches

CONFIG = {
    "model": {
        "name": "fast_tiny",
        "seed": 0,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 8},
        "string_processor": {"crop_size": 100, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 3}},
                {"name": "masked_batchnorm", "config": {"return_nmd": True}},
                {"name": "gelu"},
            ],
            "pooling": "average",
        },
        "reliability_model": {
            "mode": "nmd",
            "hidden_layers": [{"name": "dense", "config": {"units": 1}}],
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    },
    "training": {},
}


def _fasta(tmp_path, rng):
    p = tmp_path / "in.fasta"
    with open(p, "w") as fh:
        for i, length in enumerate([900, 1500, 420, 2000]):
            seq = "".join(rng.choice(list("ATGC"), size=length))
            fh.write(f">ctg{i}\n{seq}\n")
    return str(p)


def test_fast_path_matches_full(tmp_path, rng):
    fasta = _fasta(tmp_path, rng)
    b = ModelBuilder(CONFIG)
    model, variables = b.init()
    engine = InferenceEngine(model, variables, batch_size=8)

    full_out, kept_full = engine.predict_batches(
        window_batches(fasta, fragsize=400, stride=400, min_len=300)
    )
    meta_full = collect.PredictionMeta.from_batches(kept_full)
    data_full, _ = collect.reduce_windows(
        full_out["prediction"], meta_full, fsize=400, num_classes=3,
        reliability=full_out.get("reliability"),
        class_names=["chromosome", "phage", "plasmid"],
    )

    stats, kept_fast = engine.predict_batches_reduced(
        window_batches(fasta, fragsize=400, stride=400, min_len=300),
        num_classes=3, with_reliability=True,
    )
    meta_fast = collect.PredictionMeta.from_batches(kept_fast)
    data_fast = collect.data_from_device_stats(
        stats, meta_fast, fsize=400, num_classes=3, with_reliability=True,
    )

    np.testing.assert_array_equal(data_fast["headers"], data_full["headers"])
    np.testing.assert_array_equal(data_fast["consensus"],
                                  data_full["consensus"])
    np.testing.assert_allclose(
        np.asarray(data_fast["pred_sum"], np.float32),
        np.asarray(data_full["pred_sum"], np.float32), rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(data_fast["pred_var"], np.float32),
        np.asarray(data_full["pred_var"], np.float32), rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(data_fast["entropy"], np.float32),
        np.asarray(data_full["entropy"], np.float32), rtol=1e-2, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(data_fast["energy"], np.float32),
        np.asarray(data_full["energy"], np.float32), rtol=1e-2, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(data_fast["ood"], np.float32),
        np.asarray(data_full["ood"], np.float32), atol=1e-3,
    )
    for fp_fast, fp_full in zip(data_fast["frag_pred"],
                                data_full["frag_pred"]):
        np.testing.assert_array_equal(fp_fast, fp_full)
    assert data_fast["per_class_counts"] == data_full["per_class_counts"]

    # TSVs from both paths agree
    t1, t2 = tmp_path / "full.tsv", tmp_path / "fast.tsv"
    collect.write_output(data_full, t1, tmp_path / "p1.tsv",
                         labels=["chromosome", "phage", "plasmid"],
                         indices=[0, 1, 2])
    collect.write_output(data_fast, t2, tmp_path / "p2.tsv",
                         labels=["chromosome", "phage", "plasmid"],
                         indices=[0, 1, 2])
    df1, df2 = pd.read_table(t1), pd.read_table(t2)
    assert list(df1["prediction"]) == list(df2["prediction"])
    assert list(df1["window_summary"]) == list(df2["window_summary"])


def test_fast_path_contig_id_gaps_exceeding_batch(tmp_path, rng):
    """Regression: global contig indices with gaps wider than batch_size.

    Sub-min_len contigs still consume header slots (windows.py), so the
    contig-id span inside one device batch can exceed num_segments when
    many short contigs sit between two windowed ones. The old
    ``contig - contig[0]`` segment ids silently dropped those windows.
    """
    p = tmp_path / "gappy.fasta"
    with open(p, "w") as fh:
        seq = "".join(rng.choice(list("ATGC"), size=900))
        fh.write(f">first\n{seq}\n")
        for i in range(20):  # 20 skipped contigs > batch_size=8
            fh.write(f">tiny{i}\n{'ATGC' * 10}\n")
        seq = "".join(rng.choice(list("ATGC"), size=1300))
        fh.write(f">last\n{seq}\n")
    fasta = str(p)

    b = ModelBuilder(CONFIG)
    model, variables = b.init()
    engine = InferenceEngine(model, variables, batch_size=8)

    full_out, kept_full = engine.predict_batches(
        window_batches(fasta, fragsize=400, stride=400, min_len=300)
    )
    meta_full = collect.PredictionMeta.from_batches(kept_full)
    data_full, _ = collect.reduce_windows(
        full_out["prediction"], meta_full, fsize=400, num_classes=3,
        reliability=full_out.get("reliability"),
        class_names=["chromosome", "phage", "plasmid"],
    )

    stats, kept_fast = engine.predict_batches_reduced(
        window_batches(fasta, fragsize=400, stride=400, min_len=300),
        num_classes=3, with_reliability=True,
    )
    meta_fast = collect.PredictionMeta.from_batches(kept_fast)
    data_fast = collect.data_from_device_stats(
        stats, meta_fast, fsize=400, num_classes=3, with_reliability=True,
    )

    np.testing.assert_array_equal(data_fast["headers"],
                                  data_full["headers"])
    assert list(data_fast["headers"]) == ["first", "last"]
    np.testing.assert_array_equal(data_fast["consensus"],
                                  data_full["consensus"])
    assert data_fast["per_class_counts"] == data_full["per_class_counts"]
    for fp_fast, fp_full in zip(data_fast["frag_pred"],
                                data_full["frag_pred"]):
        np.testing.assert_array_equal(fp_fast, fp_full)
