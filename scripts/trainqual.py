"""From-scratch training parity artifact (round-5 verdict item 5).

Trains the 500bp 3-class baseline recipe on BOTH stacks from the same
CSVs — the reference's live TF ``train_fragment_core`` (CPU) and
``jaeger_tpu``'s — then evaluates both final models on the identical
validation windows with the SAME evaluator (our engine + macro-F1):
the reference's trained ``.weights.h5`` converts losslessly through
``modern_convert``, so both parameter sets run the same inference code
and the comparison isolates TRAINING quality, not inference drift.

Writes TRAINQUAL_r05.json:
  - per-epoch val-accuracy curves from each stack's own training log
  - final val macro-F1 / accuracy for both, same data, same evaluator
  - the data recipe (composition-separable 3-class synthetic fragments,
    mirroring scripts/qualify_int8_hard.py's generator family)

Usage: python scripts/trainqual.py [--out TRAINQUAL_r05.json]
       (forces CPU for both stacks; ~10 min)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

from jaeger_tpu.utils.devices import honour_platform_env  # noqa: E402

honour_platform_env()

import numpy as np  # noqa: E402
import yaml  # noqa: E402

CLASSES = ["chromosome", "virus", "plasmid"]
#: composition signatures close enough that training has to work for
#: macro-F1 to move off chance (same family as qualify_int8_hard.py)
WEIGHTS = {
    0: (0.26, 0.24, 0.24, 0.26),   # chromosome (mild GC)
    1: (0.32, 0.18, 0.18, 0.32),   # virus      (AT-lean)
    2: (0.21, 0.29, 0.29, 0.21),   # plasmid    (GC-lean)
}
LEN = 500
TRAIN_ROWS = 1200   # per class
VAL_ROWS = 300      # per class
EPOCHS = 5
BATCH = 64


def _seq(rng, weights, n):
    p = np.asarray(weights, np.float64)
    noise = float(rng.uniform(0.0, 0.10))
    p = (1 - noise) * p + noise * 0.25
    return "".join(rng.choice(list("ACGT"), size=n, p=p / p.sum()))


def make_csv(path: Path, rng, rows_per_class: int):
    rows = []
    for i in range(rows_per_class * len(CLASSES)):
        label = i % len(CLASSES)
        rows.append(f"{label},{_seq(rng, WEIGHTS[label], LEN)}")
    rng.shuffle(rows)
    path.write_text("\n".join(rows) + "\n")


def make_config(work: Path, train_csv: Path, val_csv: Path) -> dict:
    steps = TRAIN_ROWS * len(CLASSES) // BATCH
    vsteps = VAL_ROWS * len(CLASSES) // BATCH
    return {
        "model": {
            "name": "trainqual_500bp",
            "experiment": "trainqual",
            "seed": 42,
            "classifier_out_dim": 3,
            "reliability_out_dim": 0,
            "base_dir": str(work),
            "class_label_map": [
                {"class": c, "label": i} for i, c in enumerate(CLASSES)
            ],
            "activation": "gelu",
            "mode": "training",
            "embedding": {
                "use_embedding_layer": True, "input_type": "translated",
                "strands": 2, "frames": 6, "length": None,
                "input_shape": [6, None], "embedding_size": 32,
            },
            "string_processor": {
                "data_format": "csv", "seq_onehot": False,
                "codon": "CODON", "codon_id": "CODON_ID",
                "crop_size": LEN, "buffer_size": 4000,
                "shuffle": False, "reshuffle_each_iteration": False,
                "masking": False, "mutate": False,
                "classifier_labels": [0, 1, 2],
                "classifier_labels_map": [0, 1, 2],
            },
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 32, "kernel_size": 7,
                                "strides": 1, "dilation_rate": 1,
                                "use_bias": True, "activation": None}},
                    {"name": "masked_dyt", "config": {}},
                    {"name": "activation",
                     "config": {"activation": "gelu"}},
                    {"name": "residual_block",
                     "config": {"use_1x1conv": False, "block_size": 1,
                                "filters": 32, "kernel_size": 5,
                                "dilation_rate": 3, "use_bias": True,
                                "norm_type": "masked_dyt"}},
                ],
                "pooling": "max",
            },
            "classifier": {
                "input_shape": 32,
                "hidden_layers": [
                    {"name": "dense",
                     "config": {"units": 3, "activation": None,
                                "dtype": "float32", "use_bias": True}},
                ],
            },
        },
        "training": {
            "data_dir": str(work),
            "classifier_dir": str(work / "ckpt" / "classifier"),
            "classifier_epochs": EPOCHS,
            "reliability_epochs": 0,
            "projection_epochs": 0,
            "classifier_train_steps": steps,
            "classifier_validation_steps": vsteps,
            "batch_size": BATCH,
            "optimizer": "adam",
            "optimizer_params": {"learning_rate": 0.001},
            "loss_classifier": "categorical_crossentropy",
            "loss_params_classifier": {"from_logits": True},
            "metrics_classifier": [
                {"name": "categorical_accuracy", "params": None}],
            "callbacks": {
                "clean_old": False,
                "classifier": [
                    {"name": "TerminateOnNaN"},
                    {"name": "CSVLogger",
                     "params": {"filename": str(work / "ref_history.csv")}},
                ],
            },
            "model_saving": {"path": str(work / "ref_model"),
                             "save_weights": True,
                             "save_exec_graph": False},
            "fragment_classifier_data": {
                "train": [{"class": CLASSES, "path": [str(train_csv)],
                           "label": [0, 1, 2]}],
                "validation": [{"class": CLASSES, "path": [str(val_csv)],
                                "label": [0, 1, 2]}],
            },
        },
    }


def val_arrays(val_csv: Path):
    labels, seqs = [], []
    for line in val_csv.read_text().splitlines():
        lab, seq = line.split(",", 1)
        labels.append(int(lab))
        seqs.append(seq)
    from jaeger_tpu.seqops.windows import encode_ascii

    bases = np.stack([encode_ascii(s) for s in seqs])
    lengths = np.full(len(seqs), LEN, np.int32)
    return np.asarray(labels, np.int32), bases.astype(np.uint8), lengths


def evaluate(model, variables, bases, lengths, labels):
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.train import metrics as M

    eng = InferenceEngine(model, variables, batch_size=128,
                          output_keys=("prediction",))
    out = eng.predict_windows(bases, lengths)
    logits = out["prediction"]
    acc = float(np.mean(np.argmax(logits, -1) == labels))
    f1 = float(M.macro_f1_score(labels, logits, len(CLASSES)))
    return acc, f1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "TRAINQUAL_r05.json"))
    ap.add_argument("--work", default="/tmp/jt_trainqual")
    args = ap.parse_args()

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    train_csv = work / "train_shuffled.csv"
    val_csv = work / "val_shuffled.csv"
    make_csv(train_csv, rng, TRAIN_ROWS)
    make_csv(val_csv, rng, VAL_ROWS)
    cfg = make_config(work, train_csv, val_csv)
    cfg_path = work / "trainqual.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    labels, bases, lengths = val_arrays(val_csv)

    # ---------------- reference stack (live TF, CPU) ----------------
    sys.path.insert(0, "/root/reference/src")
    sys.path.insert(0, str(REPO / "tests"))
    import refstubs

    refstubs.install()  # pyfastx/pydustmasker/parasail/polars shims
    import tensorflow as tf  # noqa: F401

    from jaeger.commands.train import train_fragment_core as ref_train

    print("== reference TF training ==", flush=True)
    ref_train(config=str(cfg_path), precision="fp32", save_model=True,
              force=True)
    ref_hist = []
    hist_file = work / "ref_history.csv"
    if hist_file.exists():
        import csv as _csv

        with hist_file.open() as fh:
            for row in _csv.DictReader(fh):
                ref_hist.append({k: float(v) if k != "epoch" else int(v)
                                 for k, v in row.items()})

    # locate the saved Keras weights
    h5s = sorted((work / "ref_model").rglob("*.weights.h5"))
    assert h5s, f"no reference weights under {work/'ref_model'}"
    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.modern_convert import convert_modern_weights
    from jaeger_tpu.utils.config import load_model_config

    rcfg = load_model_config(cfg_path)
    ref_vars = convert_modern_weights(rcfg, h5s[-1])
    ref_model = ModelBuilder(rcfg).build()
    ref_acc, ref_f1 = evaluate(ref_model, ref_vars, bases, lengths, labels)
    print(f"reference: val acc {ref_acc:.4f}  macro-F1 {ref_f1:.4f}",
          flush=True)

    # ---------------- jaeger-tpu stack ----------------
    print("== jaeger-tpu training ==", flush=True)
    from jaeger_tpu.commands.train import train_fragment_core as our_train
    from jaeger_tpu.models.artifacts import load_model

    ours_out = work / "ours_model"
    res = our_train(str(cfg_path), output_dir=str(ours_out),
                    use_mesh=False, force=True)
    our_hist = res.get("history", {}).get("classifier", [])
    model, variables, _, _ = load_model(ours_out)
    our_acc, our_f1 = evaluate(model, variables, bases, lengths, labels)
    print(f"jaeger-tpu: val acc {our_acc:.4f}  macro-F1 {our_f1:.4f}",
          flush=True)

    out = {
        "recipe": {
            "classes": CLASSES, "len_nt": LEN,
            "train_rows": TRAIN_ROWS * len(CLASSES),
            "val_rows": VAL_ROWS * len(CLASSES),
            "epochs": EPOCHS, "batch": BATCH, "seed": 42,
            "architecture": "500bp 3-class baseline family (conv+DYT+"
                            "residual, max pool)",
        },
        "reference": {
            "history": ref_hist,
            "final_val_accuracy": round(ref_acc, 4),
            "final_val_macro_f1": round(ref_f1, 4),
        },
        "jaeger_tpu": {
            "history": our_hist,
            "final_val_accuracy": round(our_acc, 4),
            "final_val_macro_f1": round(our_f1, 4),
        },
        "evaluator": "identical: jaeger_tpu engine + train.metrics."
                     "macro_f1_score on the same validation windows; "
                     "reference weights enter through modern_convert "
                     "(lossless, live-parity-pinned)",
        "macro_f1_gap": round(our_f1 - ref_f1, 4),
    }
    print(json.dumps(out)[:600])
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
