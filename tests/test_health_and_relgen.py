"""Direct coverage for the health self-test and the reliability data
generator (previously exercised only via the CLI harness)."""

import numpy as np


def test_health_core_passes():
    from jaeger_tpu.commands.health import health_core

    assert health_core() == 0


def test_reliability_generator_outputs(tmp_path, rng):
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "tmc", Path(__file__).with_name("test_modern_convert.py"))
    tmc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tmc)

    from jaeger_tpu.dataops.reliability_generator import (
        generate_reliability_data,
    )
    from jaeger_tpu.models.builder import ModelBuilder

    b = ModelBuilder(tmc.CONFIG)
    model, variables = b.init()
    _, crop_nt = b.crop

    csv = tmp_path / "raw.csv"
    pools = {0: "ATGCATGC", 1: "GGGGCCCCATGC", 2: "AAAATTTTATGC"}
    with open(csv, "w") as fh:
        for i in range(90):
            seq = "".join(rng.choice(list(pools[i % 3]), size=200))
            fh.write(f"{i % 3},{seq}\n")

    paths = generate_reliability_data(
        model, variables, str(csv), str(tmp_path / "rel"), crop_nt,
        id_threshold=0.2, synthetic_ood_threshold=0.99,
        batch_size=32, seed=0,
    )
    train_path = paths["train"]["paths"][0]
    rows = [ln.split(",", 1) for ln in open(train_path)]
    labels = {r[0] for r in rows}
    assert labels <= {"0", "1"}
    assert len(rows) > 10
    # val split exists and is smaller
    val_path = paths["validation"]["paths"][0]
    n_val = sum(1 for _ in open(val_path))
    assert 0 < n_val < len(rows)

    # idempotent: second call reuses the files
    again = generate_reliability_data(
        model, variables, str(csv), str(tmp_path / "rel"), crop_nt)
    assert again["train"]["paths"] == paths["train"]["paths"]


def test_normalize_perturbations_reference_schema():
    """The flagship YAML's perturbation config normalizes into specs
    (reference synthetic_perturbations.py:37-140 schema)."""
    from jaeger_tpu.dataops.reliability_generator import (
        normalize_perturbations,
    )

    cfg = {  # the shipped flagship config's block
        "shuffle": {"enabled": True, "mode": "dinuc"},
        "subseq_repeat": {"enabled": True, "window_fraction": 0.25},
        "tandem_repeat": {"enabled": True,
                          "motif_length_range": [3, 10],
                          "window_fraction": 0.25, "num_repeats": 20},
        "mix": True,
    }
    specs = normalize_perturbations(cfg)
    names = [s["name"] for s in specs]
    assert names == ["shuffle", "subseq_repeat", "tandem_repeat", "mix"]
    assert specs[2]["kwargs"]["num_repeats"] == 20

    # mode lists, kmer kwargs, opt-in n_stretch, disabling
    specs = normalize_perturbations({
        "shuffle": {"mode": ["random", "kmer"], "k": 4},
        "subseq_repeat": False, "tandem_repeat": False,
        "n_stretch": {"n_fraction_range": [0.2, 0.4]},
    })
    assert [s["name"] for s in specs] == ["shuffle", "shuffle", "n_stretch"]
    assert specs[1]["kwargs"] == {"k": 4}

    import pytest

    with pytest.raises(ValueError, match="no perturbations"):
        normalize_perturbations({"shuffle": False, "subseq_repeat": False,
                                 "tandem_repeat": False})
    with pytest.raises(ValueError, match="shuffle mode"):
        normalize_perturbations({"shuffle": {"mode": "bogus"}})


def test_generate_synthetic_with_config(random_dna):
    from jaeger_tpu.dataops.reliability_generator import (
        generate_synthetic_sequences,
    )

    rows = [(i % 3, random_dna(300)) for i in range(12)]
    out = generate_synthetic_sequences(
        rows, 2.0, seed=1,
        perturbations={"shuffle": {"mode": "dinuc"},
                       "subseq_repeat": False, "tandem_repeat": False,
                       "mix": {"n_segments": 3}},
        crop_size=150,
    )
    # reference budgeting: 12 rows * 2.0 = 24 split over 2 implicit specs
    assert len(out) == 24
    assert all(set(s) <= set("ACGTN") for s in out)
    # mix chimeras honor crop_size
    assert sum(len(s) == 150 for s in out) >= 12


def test_reliability_generator_chunked_streaming(tmp_path, rng):
    """chunk_size smaller than the CSV exercises the streaming path;
    output counts match the single-chunk run's ID/OOD labeling."""
    import numpy as np

    from jaeger_tpu.dataops.reliability_generator import (
        generate_reliability_data,
    )
    from jaeger_tpu.models.builder import ModelBuilder

    cfg = {
        "model": {
            "name": "rg", "seed": 0, "classifier_out_dim": 3,
            "class_label_map": [
                {"class": "a", "label": 0}, {"class": "b", "label": 1},
                {"class": "c", "label": 2}],
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 4},
            "string_processor": {"crop_size": 40, "seq_onehot": False},
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 4, "kernel_size": 3}}],
                "pooling": "average"},
            "classifier": {"hidden_layers": [
                {"name": "dense", "config": {"units": 3}}]},
        },
        "training": {},
    }
    b = ModelBuilder(cfg)
    model, variables = b.init()
    _, crop_nt = b.crop
    csv = tmp_path / "raw.csv"
    with open(csv, "w") as fh:
        for i in range(60):
            seq = "".join(rng.choice(list("ACGT"), size=150))
            fh.write(f"{i % 3},{seq}\n")

    paths = generate_reliability_data(
        model, variables, str(csv), str(tmp_path / "out"), crop_nt,
        id_threshold=0.0, synthetic_ood_threshold=0.0,
        chunk_size=16, seed=3, batch_size=8,
    )
    train = open(paths["train"]["paths"][0]).read().splitlines()
    val = open(paths["validation"]["paths"][0]).read().splitlines()
    # threshold 0 keeps every real row + every synthetic row
    assert len(train) + len(val) == 120
    labels = {int(r.split(",")[0]) for r in train + val}
    assert labels <= {0, 1}

    # self-describing predictions CSV (reference _preds.csv artifact)
    preds = (tmp_path / "out" / "raw_preds.csv").read_text().splitlines()
    assert preds[0] == ("seq_id,label,logit_0,logit_1,logit_2,"
                        "prob_0,prob_1,prob_2")
    assert len(preds) == 61
    assert preds[1].split(",")[0] == "0"  # row-index seq id

    # rerun with the reliability CSVs removed reuses the predictions file
    # (reference resume semantics) and reproduces identical outputs
    import os

    t0 = open(paths["train"]["paths"][0]).read()
    os.unlink(paths["train"]["paths"][0])
    os.unlink(paths["validation"]["paths"][0])
    mtime = os.path.getmtime(tmp_path / "out" / "raw_preds.csv")
    again = generate_reliability_data(
        model, variables, str(csv), str(tmp_path / "out"), crop_nt,
        id_threshold=0.0, synthetic_ood_threshold=0.0,
        chunk_size=16, seed=3, batch_size=8,
    )
    assert open(again["train"]["paths"][0]).read() == t0
    assert os.path.getmtime(tmp_path / "out" / "raw_preds.csv") == mtime


def test_reliability_generator_balancing_and_val_csv(tmp_path, rng):
    """Real records are stratified-downsampled to the synthetic count
    (reference _downsample_to_match) and a dedicated raw val CSV flows
    into reliability_val.csv (reference raw_csv_paths.val)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "tmc", Path(__file__).with_name("test_modern_convert.py"))
    tmc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tmc)

    from jaeger_tpu.dataops.reliability_generator import (
        generate_reliability_data,
    )
    from jaeger_tpu.models.builder import ModelBuilder

    b = ModelBuilder(tmc.CONFIG)
    model, variables = b.init()
    _, crop_nt = b.crop

    train_csv = tmp_path / "raw.csv"
    val_csv = tmp_path / "rawval.csv"
    for path, n in ((train_csv, 60), (val_csv, 20)):
        with open(path, "w") as fh:
            for i in range(n):
                seq = "".join(rng.choice(list("ACGT"), size=180))
                fh.write(f"{i % 3},{seq}\n")

    paths = generate_reliability_data(
        model, variables, str(train_csv), str(tmp_path / "rel"), crop_nt,
        id_threshold=0.0, synthetic_ood_threshold=0.0,
        synthetic_ood_multiplier=0.5, seed=5, batch_size=16,
        raw_val_csv_path=str(val_csv),
    )
    train = open(paths["train"]["paths"][0]).read().splitlines()
    val = open(paths["validation"]["paths"][0]).read().splitlines()
    # 60 real downsampled to 30 synthetic + the 30 synthetic
    assert len(train) == 60
    # val: 20 real downsampled to 10 synthetic + 10 synthetic
    assert len(val) == 20
    # dedicated-val mode: no rows leak between the two sources
    train_seqs = {r.split(",", 1)[1] for r in train}
    val_seqs = {r.split(",", 1)[1] for r in val}
    assert not (train_seqs & val_seqs)
    # both preds artifacts exist
    assert (tmp_path / "rel" / "raw_preds.csv").exists()
    assert (tmp_path / "rel" / "rawval_preds.csv").exists()
