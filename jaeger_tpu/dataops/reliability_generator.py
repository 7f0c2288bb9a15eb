"""Reliability (ID/OOD) training-data generation.

Parity target: reference ``dataops/reliability_generator.py:588-...`` —
run the trained classifier over the raw training CSV; high-confidence
correct predictions become ID (label 1), high-confidence wrong ones OOD
(label 0); synthetic corrupted sequences (shuffles, repeats, N-stretches,
chimeras) that the classifier still scores confidently are added as OOD.
Writes ``reliability_train.csv`` / ``reliability_val.csv`` (the
``label,sequence`` format both CSV loaders consume).
"""

from __future__ import annotations

import logging
import random
from pathlib import Path

import numpy as np

from jaeger_tpu.seqops import synthetic as syn
from jaeger_tpu.seqops.windows import BASE_N, encode_ascii

logger = logging.getLogger("jaeger_tpu")


def _predict_csv_rows(model, variables, rows: list[tuple[int, str]],
                      crop_nt: int, batch_size: int = 512):
    """Run the classifier over (label, seq) rows -> (pred, conf) arrays."""
    import jax.numpy as jnp

    preds, confs = [], []
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        n = len(chunk)
        bases = np.full((batch_size, crop_nt), BASE_N, dtype=np.uint8)
        lengths = np.zeros(batch_size, dtype=np.int32)
        for j, (_, seq) in enumerate(chunk):
            ids = encode_ascii(seq[:crop_nt])
            bases[j, : ids.shape[0]] = ids
            lengths[j] = ids.shape[0]
        out = model.apply(
            variables,
            {"bases": jnp.asarray(bases), "lengths": jnp.asarray(lengths)},
            train=False,
        )
        logits = np.asarray(out["prediction"], dtype=np.float64)[:n]
        p = np.exp(logits - logits.max(axis=1, keepdims=True))
        p = p / p.sum(axis=1, keepdims=True)
        preds.append(np.argmax(p, axis=1))
        confs.append(p.max(axis=1))
    return np.concatenate(preds), np.concatenate(confs)


_PERTURBATIONS = (
    syn.apply_shuffle,
    syn.apply_dinuc_shuffle,
    lambda s: syn.apply_kmer_shuffle(s, k=3),
    syn.apply_subseq_repeat_window,
    syn.apply_tandem_repeat_window,
    lambda s: syn.apply_n_stretch(s, (0.1, 0.25)),
)


def generate_synthetic_sequences(rows: list[tuple[int, str]],
                                 count: int, seed: int = 42) -> list[str]:
    """Corrupted variants of real sequences (one random perturbation each).

    Parity role: reference ``dataops/synthetic_perturbations.py:319``.
    """
    random.seed(seed)
    out = []
    for _ in range(count):
        _, seq = random.choice(rows)
        fn = random.choice(_PERTURBATIONS)
        out.append(fn(seq))
    return out


def generate_reliability_data(
    model,
    variables,
    raw_csv_path: str,
    output_dir: str,
    crop_nt: int,
    id_threshold: float = 0.8,
    synthetic_ood_threshold: float = 0.8,
    synthetic_ood_multiplier: float = 1.0,
    val_fraction: float = 0.1,
    seed: int = 42,
    batch_size: int = 512,
) -> dict:
    """Build reliability CSVs; returns the builder-shaped paths dict."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    train_csv = output_dir / "reliability_train.csv"
    val_csv = output_dir / "reliability_val.csv"
    if train_csv.exists() and val_csv.exists():
        logger.info(f"reliability data already exists in {output_dir}")
        return {
            "train": {"paths": [str(train_csv)], "class": [], "label": []},
            "validation": {"paths": [str(val_csv)], "class": [], "label": []},
        }

    rows: list[tuple[int, str]] = []
    with open(raw_csv_path) as fh:
        for line in fh:
            parts = line.strip().split(",")
            if len(parts) >= 2:
                try:
                    rows.append((int(parts[0]), parts[1]))
                except ValueError:
                    continue
    if not rows:
        raise ValueError(f"no records in {raw_csv_path}")

    preds, confs = _predict_csv_rows(model, variables, rows, crop_nt,
                                     batch_size)
    records: list[tuple[int, str]] = []
    n_id = n_real_ood = 0
    for (label, seq), pred, conf in zip(rows, preds, confs):
        if conf < id_threshold:
            continue
        if pred == label:
            records.append((1, seq))
            n_id += 1
        else:
            records.append((0, seq))
            n_real_ood += 1

    n_synth = int(len(rows) * synthetic_ood_multiplier)
    synth = generate_synthetic_sequences(rows, n_synth, seed)
    synth_rows = [(0, s) for s in synth]
    s_preds, s_confs = _predict_csv_rows(model, variables, synth_rows,
                                         crop_nt, batch_size)
    n_synth_kept = 0
    for (_, seq), conf in zip(synth_rows, s_confs):
        # kept only when the classifier is (wrongly) confident on garbage
        if conf >= synthetic_ood_threshold:
            records.append((0, seq))
            n_synth_kept += 1

    rng = random.Random(seed)
    rng.shuffle(records)
    n_val = max(1, int(len(records) * val_fraction))
    val, train = records[:n_val], records[n_val:]
    for path, recs in ((train_csv, train), (val_csv, val)):
        with open(path, "w") as fh:
            for label, seq in recs:
                fh.write(f"{label},{seq}\n")
    logger.info(
        f"reliability data: {n_id} ID, {n_real_ood} real OOD, "
        f"{n_synth_kept}/{n_synth} synthetic OOD kept"
    )
    return {
        "train": {"paths": [str(train_csv)], "class": [], "label": []},
        "validation": {"paths": [str(val_csv)], "class": [], "label": []},
    }
