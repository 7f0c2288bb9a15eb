"""int8 qualification on a corpus that CAN fail (round-4 verdict item 3).

The round-3 qualification (scripts/qualify_int8.py, INT8_QUAL.json) used
a trivially separable corpus: every accuracy/agreement metric saturated
at exactly 1.0 and softmax drift was 1e-6 while LOGIT drift p99 was
0.575 — i.e. it never tested the regime where int8 error bites. This
round qualifies against the FULL output contract on near-boundary
material, the way the reference qualifies its ONNX-INT8 path
(`/root/reference/docs/_source/optimizations.md:253-256`):

* 6 trained classes named like the product's refinement schema
  (phage/virus/archaea/bacteria/plasmid/eukarya) with CONFUSABLE pairs
  (bacteria~plasmid, phage~virus composition signatures a few percent
  apart) plus a mutation ramp toward uniform — bf16 baseline accuracy
  lands well below 1.0 by construction;
* chimeric contigs (halves from a confusable pair), short padded
  windows, soft-masked + N-run stretches (split-mixed x int8), and an
  UNSEEN 7th composition as OOD material for the reliability head;
* a trained reliability head (NMD mode, data from the product's own
  --generate_reliability_data path), because reliability is half the
  output contract: per-contig reliability_score = fraction of windows
  with sigmoid(rel) > 0.5 (`postprocess/collect.py`, reference
  collect.py:247-435) — drift near the 0.5 cutoff flips calls;
* threshold-transfer checks: the reliability threshold and the
  refinement logit/margin thresholds are FIT ON BF16 outputs and
  applied to int8 outputs (exactly how a user would run a tuned bundle),
  reporting call flips — the logit-scale drift risk VERDICT r3 called
  out against `postprocess/refinement.py` margins.

Writes INT8_QUAL_r04.json. The round-3 artifact is kept for history.

Usage: python scripts/qualify_int8_hard.py [--out INT8_QUAL_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# CPU: quantization error (int8 binning + per-channel scales) is
# platform-independent; chip throughput lives in experiments/.
# FORCE cpu (not setdefault): this harness presets JAX_PLATFORMS=axon in
# the shell, which silently routed the whole qualification over the chip
# relay; the quantization error under test is platform-independent.
# Explicitly export JAX_PLATFORMS yourself to override.
if os.environ.get("JAX_PLATFORMS", "axon") in ("", "axon", "axon,cpu"):
    os.environ["JAX_PLATFORMS"] = "cpu"

from jaeger_tpu.utils.devices import honour_platform_env  # noqa: E402

honour_platform_env()

CLASSES = ["phage", "virus", "archaea", "bacteria", "plasmid", "eukarya"]

#: base-composition signatures (A, C, G, T). bacteria/plasmid and
#: phage/virus differ by a few percent only — confusable by design.
_WEIGHTS = {
    0: (0.32, 0.18, 0.18, 0.32),   # phage      (AT-lean)
    1: (0.29, 0.21, 0.21, 0.29),   # virus      (phage + 3%)
    2: (0.15, 0.35, 0.35, 0.15),   # archaea    (GC-rich)
    3: (0.22, 0.28, 0.28, 0.22),   # bacteria   (mild GC)
    4: (0.24, 0.26, 0.26, 0.24),   # plasmid    (bacteria + 2%)
    5: (0.40, 0.22, 0.10, 0.28),   # eukarya    (skewed)
}
#: OOD material: uniform-random DNA — the same perturbation family the
#: reliability generator trains the head against (compositional OOD like
#: GC-extreme sequences lands between trained classes instead and the
#: head scores it in-distribution; measured AUROC 0.15 on that variant)
_OOD_W = (0.25, 0.25, 0.25, 0.25)


def _seq(rng, weights, n: int, noise: float = 0.0) -> str:
    p = np.asarray(weights, np.float64)
    if noise > 0:  # mutate toward uniform: the near-boundary ramp
        p = (1 - noise) * p + noise * 0.25
    return "".join(rng.choice(list("ACGT"), size=n, p=p / p.sum()))


def make_training_csv(path: Path, rng, rows_per_class: int = 400,
                      length: int = 600) -> None:
    with path.open("w") as fh:
        for i in range(rows_per_class * len(CLASSES)):
            label = i % len(CLASSES)
            noise = float(rng.uniform(0.0, 0.15))  # mildly noisy training
            fh.write(f"{label},{_seq(rng, _WEIGHTS[label], length, noise)}\n")


def make_corpus(path: Path, rng):
    """Hard corpus; returns per-contig metadata rows."""
    meta = []
    with path.open("w") as fh:
        def emit(name, seq, **info):
            fh.write(f">{name}\n{seq}\n")
            meta.append({"name": name, **info})

        cid = 0
        # 1) pure contigs with a noise ramp 0..0.35 (near-boundary mass)
        for k in range(240):
            label = k % len(CLASSES)
            noise = float(rng.uniform(0.0, 0.35))
            ln = int(rng.integers(1500, 9000))
            seq = _seq(rng, _WEIGHTS[label], ln, noise)
            # sprinkle split-mixed material on some contigs
            if k % 7 == 0 and ln > 2500:
                at = int(rng.integers(500, ln - 700))
                w = int(rng.integers(30, 120))
                seq = seq[:at] + "N" * w + seq[at + w:]
            if k % 11 == 0 and ln > 2500:
                at = int(rng.integers(500, ln - 700))
                w = int(rng.integers(100, 400))
                seq = seq[:at] + seq[at:at + w].lower() + seq[at + w:]
            emit(f"c{cid}_pure{label}_n{noise:.2f}", seq,
                 kind="pure", label=label, noise=noise)
            cid += 1
        # 2) chimeras across confusable pairs (boundary windows mix)
        for k in range(60):
            a, b = [(3, 4), (0, 1), (4, 3), (1, 0)][k % 4]
            ln = int(rng.integers(2000, 8000))
            half = ln // 2
            seq = (_seq(rng, _WEIGHTS[a], half, 0.1)
                   + _seq(rng, _WEIGHTS[b], ln - half, 0.1))
            emit(f"c{cid}_chimera{a}{b}", seq, kind="chimera",
                 label=a, noise=0.1)
            cid += 1
        # 3) short contigs -> single padded windows
        for k in range(40):
            label = k % len(CLASSES)
            ln = int(rng.integers(320, 499))
            emit(f"c{cid}_short{label}", _seq(rng, _WEIGHTS[label], ln, 0.1),
                 kind="short", label=label, noise=0.1)
            cid += 1
        # 4) OOD: unseen composition — reliability stress
        for k in range(40):
            ln = int(rng.integers(1500, 6000))
            emit(f"c{cid}_ood", _seq(rng, _OOD_W, ln, 0.0),
                 kind="ood", label=-1, noise=0.0)
            cid += 1
    return meta


def train_model(work: Path, csv: Path) -> Path:
    import yaml

    cfg = {
        "model": {
            "name": "int8qual_hard", "seed": 5, "classifier_out_dim": 6,
            "class_label_map": [
                {"class": c, "label": i} for i, c in enumerate(CLASSES)
            ],
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 32},
            "string_processor": {
                "crop_size": 165, "seq_onehot": False,
                "buffer_size": 3000,
                "classifier_labels": list(range(6)),
                "classifier_labels_map": list(range(6)),
            },
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 48, "kernel_size": 7,
                                "padding": "same"}},
                    {"name": "masked_batchnorm",
                     "config": {"return_nmd": True}},
                    {"name": "gelu"},
                    {"name": "masked_conv1d",
                     "config": {"filters": 48, "kernel_size": 5,
                                "padding": "same", "dilation_rate": 2}},
                    {"name": "gelu"},
                    {"name": "masked_conv1d",
                     "config": {"filters": 48, "kernel_size": 3,
                                "padding": "same", "dilation_rate": 4}},
                    {"name": "gelu"},
                ],
                "pooling": "average",
            },
            "reliability_model": {
                "mode": "nmd",
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 8}},
                    {"name": "gelu"},
                    {"name": "dense", "config": {"units": 1}},
                ],
            },
            "classifier": {
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 6}}],
            },
        },
        "training": {
            "batch_size": 96, "classifier_epochs": 3,
            "classifier_train_steps": 80,
            "reliability_epochs": 2, "reliability_train_steps": 60,
            "optimizer": "adam",
            "optimizer_params": {"learning_rate": 0.003},
            "loss_classifier": "categorical_crossentropy",
            "loss_params_classifier": {"from_logits": True},
            "loss_reliability": "binary_crossentropy",
            "loss_params_reliability": {"from_logits": True},
            "generate_reliability_data": True,
            "reliability_data_generation": {
                "raw_csv_paths": {"train": None},  # filled below
                "synthetic_ood_multiplier": 1.0,
                "inference_batch_size": 256,
            },
            "fragment_classifier_data": {
                "train": [{"class": CLASSES, "path": [str(csv)],
                           "label": list(range(6))}],
            },
        },
    }
    cfg["training"]["reliability_data_generation"]["raw_csv_paths"][
        "train"] = str(csv)
    cfg_path = work / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    from jaeger_tpu.commands.train import train_fragment_core

    res = train_fragment_core(str(cfg_path), output_dir=str(work / "model"),
                              use_mesh=False, generate_reliability=True)
    assert "int8_path" in res, "auto-calibration did not run"
    return work / "model"


def predict_tsv(bundle: Path, fasta: Path, out: Path) -> Path:
    from jaeger_tpu.commands.predict import run_core

    return run_core(
        input_path=str(fasta), output_dir=str(out),
        model_path=str(bundle), fsize=500, stride=500, min_len=300,
        batch=256, precision="bfloat16", scan_termini=False,
        save_window_scores=True, overwrite=True,
    )


def window_pass(bundle: Path, fasta: Path):
    """Per-window class logits + reliability logits through the engine
    (same device programs predict uses), window-order aligned with the
    contig stream."""
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.models.artifacts import load_model
    from jaeger_tpu.seqops.windows import window_batches

    import jax.numpy as jnp

    model, variables, config, classes = load_model(bundle,
                                                   dtype=jnp.bfloat16)
    engine = InferenceEngine(model, variables, batch_size=256,
                             output_keys=("prediction", "reliability"))
    batches = window_batches(str(fasta), fragsize=500, stride=500,
                             min_len=300, workers=2)
    outputs, kept = engine.predict_batches(batches)
    contig_idx = np.concatenate([b.contig for b in kept])
    headers: list[str] = kept[-1].headers  # shared, growing list
    return (np.asarray(outputs["prediction"], np.float64),
            np.asarray(outputs["reliability"], np.float64).reshape(-1),
            np.asarray(contig_idx), list(headers))


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x):
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "INT8_QUAL_r04.json"))
    ap.add_argument("--work", default="/tmp/int8_qual_hard")
    args = ap.parse_args()
    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(17)

    csv = work / "train.csv"
    if not csv.exists():
        make_training_csv(csv, rng)
    fasta = work / "corpus.fasta"
    meta_path = work / "corpus_meta.json"
    if not fasta.exists():
        meta = make_corpus(fasta, np.random.default_rng(23))
        meta_path.write_text(json.dumps(meta))
    meta = json.loads(meta_path.read_text())
    by_name = {m["name"]: m for m in meta}

    model_dir = work / "model"
    if not (model_dir / "params.msgpack").exists():
        model_dir = train_model(work, csv)

    # --- product-surface pass: full predict pipelines, both bundles ---
    bf16_tsv = predict_tsv(model_dir, fasta, work / "pred_bf16")
    int8_tsv = predict_tsv(model_dir / "int8", fasta, work / "pred_int8")

    import pandas as pd

    dfb = pd.read_table(bf16_tsv).set_index("contig_id")
    dfi = pd.read_table(int8_tsv).set_index("contig_id")
    assert list(dfb.index) == list(dfi.index)
    names = list(dfb.index)
    kinds = np.array([by_name[n]["kind"] for n in names])
    true_lbl = np.array([by_name[n]["label"] for n in names])
    callable_mask = (kinds != "ood")  # pure+chimera+short have a label

    bcalls = dfb["prediction"].to_numpy()
    icalls = dfi["prediction"].to_numpy()
    true_cls = np.array([CLASSES[t] if t >= 0 else "ood"
                         for t in true_lbl])
    res = {
        "metric": "int8 qualification, HARD corpus (near-boundary ramp, "
                  "confusable pairs, chimeras, shorts, OOD; trained "
                  "reliability head)",
        "corpus": {
            "contigs": len(names),
            "pure": int((kinds == "pure").sum()),
            "chimera": int((kinds == "chimera").sum()),
            "short": int((kinds == "short").sum()),
            "ood": int((kinds == "ood").sum()),
        },
        "bf16_accuracy_pure": round(float(
            (bcalls[kinds == "pure"] == true_cls[kinds == "pure"]).mean()),
            4),
        "int8_accuracy_pure": round(float(
            (icalls[kinds == "pure"] == true_cls[kinds == "pure"]).mean()),
            4),
        "contig_call_agreement": round(float((bcalls == icalls).mean()), 4),
        "contig_call_agreement_by_kind": {
            k: round(float((bcalls[kinds == k] == icalls[kinds == k])
                           .mean()), 4)
            for k in ("pure", "chimera", "short", "ood")
        },
    }

    # --- contig reliability_score (the TSV column, fraction > 0.5) ---
    rb = pd.to_numeric(dfb["reliability_score"], errors="coerce")
    ri = pd.to_numeric(dfi["reliability_score"], errors="coerce")
    ok = ~(rb.isna() | ri.isna())
    drift = (rb[ok] - ri[ok]).abs()
    res["reliability_contig"] = {
        "n": int(ok.sum()),
        "mae": round(float(drift.mean()), 4),
        "p99": round(float(drift.quantile(0.99)), 4),
        "max": round(float(drift.max()), 4),
        "call_agreement_at_0.5": round(float(
            ((rb[ok] > 0.5) == (ri[ok] > 0.5)).mean()), 4),
    }

    # --- window-level pass (library engine, both bundles) ---
    pb, relb, cib, headers = window_pass(model_dir, fasta)
    pi, reli, cii, _ = window_pass(model_dir / "int8", fasta)
    assert pb.shape == pi.shape and np.array_equal(cib, cii)

    d = np.abs(pb - pi)
    dp = np.abs(_softmax(pb) - _softmax(pi))
    res["n_windows"] = int(pb.shape[0])
    res["window_argmax_agreement"] = round(
        float((pb.argmax(1) == pi.argmax(1)).mean()), 4)
    # near-boundary subset: bottom decile of bf16 margin
    srt = np.sort(pb, axis=1)
    margin = srt[:, -1] - srt[:, -2]
    nb = margin <= np.quantile(margin, 0.10)
    res["near_boundary_windows"] = {
        "n": int(nb.sum()),
        "bf16_margin_p10": round(float(np.quantile(margin, 0.10)), 4),
        "argmax_agreement": round(
            float((pb.argmax(1)[nb] == pi.argmax(1)[nb]).mean()), 4),
    }
    res["window_logit_drift"] = {
        "mean": round(float(d.mean()), 5),
        "p99": round(float(np.quantile(d, 0.99)), 5),
        "max": round(float(d.max()), 5),
        "logit_scale_rms": round(float(np.sqrt((pb ** 2).mean())), 2),
    }
    res["window_prob_drift"] = {
        "mean": round(float(dp.mean()), 6),
        "p99": round(float(np.quantile(dp, 0.99)), 6),
        "max": round(float(dp.max()), 6),
    }

    # --- per-window reliability: sigmoid calls at 0.5 + tuned cutoff ---
    sb, si = _sigmoid(relb), _sigmoid(reli)
    win_kind = np.array([by_name[headers[c]]["kind"] for c in cib])
    res["reliability_window"] = {
        "call_agreement_at_0.5": round(float(
            ((sb > 0.5) == (si > 0.5)).mean()), 4),
        "near_cutoff_n": int((np.abs(sb - 0.5) < 0.05).sum()),
        "near_cutoff_flip_rate": round(float(
            ((sb > 0.5) != (si > 0.5))[np.abs(sb - 0.5) < 0.05].mean())
            if (np.abs(sb - 0.5) < 0.05).any() else 0.0, 4),
        "score_drift_p99": round(float(np.quantile(np.abs(sb - si), 0.99)),
                                 5),
    }
    # tuned threshold fit on BF16 (ID = pure windows, OOD = ood windows),
    # applied to int8 — the product's threshold-transfer path
    from jaeger_tpu.postprocess.threshold import tune_reliability_threshold

    fit_mask = (win_kind == "pure") | (win_kind == "ood")
    fit_labels = (win_kind[fit_mask] == "pure").astype(int)
    if np.unique(fit_labels).size == 2:
        best, _rows, summary = tune_reliability_threshold(
            sb[fit_mask], fit_labels)
        res["reliability_window"]["tuned_threshold_bf16"] = float(best)
        res["reliability_window"]["bf16_auroc"] = round(
            float(summary["auroc"]), 4)
        res["reliability_window"]["call_agreement_at_tuned"] = round(
            float(((sb > best) == (si > best)).mean()), 4)

    # --- refinement threshold transfer (fit bf16 -> apply to int8) ---
    from jaeger_tpu.postprocess import refinement as R

    def win_df(p):
        df = pd.DataFrame(p, columns=R.SCORE_COLS)
        return R.add_score_features(df)

    wdb, wdi = win_df(pb), win_df(pi)
    pure_w = win_kind == "pure"
    fit_df = wdb[pure_w].copy()
    fit_df["prediction"] = fit_df["top_class"]
    fit_df["true"] = [CLASSES[by_name[headers[c]]["label"]]
                      for c in cib[pure_w]]
    taus = R.fit_thresholds(fit_df, quantile=0.05)
    refb = R.refine(wdb, taus)["refined_prediction"].to_numpy()
    refi = R.refine(wdi, taus)["refined_prediction"].to_numpy()
    res["refinement_transfer"] = {
        "taus_fit_on": "bf16 pure windows (q=0.05)",
        "refined_call_agreement": round(float((refb == refi).mean()), 4),
        "unknown_rate_bf16": round(float((refb == "unknown").mean()), 4),
        "unknown_rate_int8": round(float((refi == "unknown").mean()), 4),
        "merged_rate_bf16": round(float(
            np.isin(refb, list(R.MERGE_MAP)).mean()), 4),
        "merged_rate_int8": round(float(
            np.isin(refi, list(R.MERGE_MAP)).mean()), 4),
    }

    Path(args.out).write_text(json.dumps(res, indent=2) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
