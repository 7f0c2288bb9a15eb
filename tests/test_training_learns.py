"""End-to-end learning proof: train → the model separates classes →
the saved bundle predicts fresh contigs correctly through the CLI core.

The reference's whole product story is "train a fragment classifier,
then predict with it" (``commands/train.py:603`` →
``commands/predict.py:488``); the other e2e tests pin mechanics
(resume, markers, artifacts) but none asserts the optimization
actually LEARNS.  Three compositionally distinct sequence classes are
trivially separable by the conv tower — if val_accuracy doesn't reach
~1 or the predict TSV mislabels held-out contigs, the train step /
optimizer / data-path wiring broke even though every unit test passes.
"""

from __future__ import annotations

import csv

import numpy as np
import yaml


#: base probabilities (A, T, G, C) — compositionally separable classes
#: that stay high-entropy so the dust masker doesn't soft-mask them away
POOLS = {
    0: (0.25, 0.25, 0.25, 0.25),   # balanced
    1: (0.10, 0.10, 0.40, 0.40),   # GC-rich
    2: (0.40, 0.40, 0.10, 0.10),   # AT-rich
}
CLASSES = ["chromosome", "phage", "plasmid"]


def _seq(rng, label: int, n: int) -> str:
    return "".join(rng.choice(list("ATGC"), size=n, p=POOLS[label]))


def _write_csv(path, rng, rows: int, n: int = 120) -> None:
    with open(path, "w") as fh:
        for i in range(rows):
            label = i % 3
            fh.write(f"{label},{_seq(rng, label, n)}\n")


def _config(tmp_path, train_csv, val_csv) -> dict:
    return {
        "model": {
            "name": "learns_tiny", "seed": 7, "classifier_out_dim": 3,
            "class_label_map": [
                {"class": c, "label": i} for i, c in enumerate(CLASSES)
            ],
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 8},
            "string_processor": {"crop_size": 30, "seq_onehot": False,
                                 "buffer_size": 200,
                                 "classifier_labels": [0, 1, 2],
                                 "classifier_labels_map": [0, 1, 2]},
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 16, "kernel_size": 5}},
                    {"name": "activation", "config": {"activation": "gelu"}},
                ],
                "pooling": "average",
            },
            "classifier": {
                "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
            },
        },
        "training": {
            "batch_size": 32, "classifier_epochs": 4,
            "classifier_train_steps": 12,
            "classifier_validation_steps": 4,
            "optimizer": "adam",
            "optimizer_params": {"learning_rate": 0.02, "clipnorm": 5},
            "loss_classifier": "categorical_crossentropy",
            "loss_params_classifier": {"from_logits": True},
            "fragment_classifier_data": {
                "train": [{"class": CLASSES,
                           "path": [str(train_csv)], "label": [0, 1, 2]}],
                "validation": [{"class": CLASSES,
                                "path": [str(val_csv)], "label": [0, 1, 2]}],
            },
        },
    }


def test_training_learns_and_predicts(tmp_path, rng):
    from jaeger_tpu.commands.predict import run_core
    from jaeger_tpu.commands.train import train_fragment_core

    train_csv = tmp_path / "train.csv"
    val_csv = tmp_path / "val.csv"
    _write_csv(train_csv, rng, rows=384)
    _write_csv(val_csv, rng, rows=96)
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(_config(tmp_path, train_csv, val_csv),
                                       sort_keys=False))

    out = tmp_path / "model"
    result = train_fragment_core(str(cfg_path), output_dir=str(out),
                                 use_mesh=False)
    history = result["history"]["classifier"]
    assert history, "no classifier epochs ran"
    first, last = history[0], history[-1]
    assert last["loss"] < first["loss"] * 0.5, (first, last)
    assert last["val_accuracy"] >= 0.95, history

    # the saved bundle classifies fresh contigs from each pool
    fasta = tmp_path / "query.fasta"
    with open(fasta, "w") as fh:
        for label in range(3):
            for k in range(2):
                fh.write(f">c{label}_{k} expect={CLASSES[label]}\n"
                         f"{_seq(rng, label, 1000)}\n")
    pred_dir = tmp_path / "pred"
    run_core(input_path=str(fasta), output_dir=str(pred_dir),
             model_path=str(out), fsize=120, stride=120, min_len=120,
             batch=32)
    tsvs = [p for p in pred_dir.glob("*_jaeger.tsv")
            if "phage" not in p.name]
    assert len(tsvs) == 1
    with open(tsvs[0]) as fh:
        rows = list(csv.DictReader(fh, delimiter="\t"))
    assert len(rows) == 6
    for row in rows:
        expect = row["contig_id"].split("_")[0].removeprefix("c")
        assert row["prediction"] == CLASSES[int(expect)], row
