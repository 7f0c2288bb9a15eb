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


def normalize_perturbations(cfg: dict | None) -> list[dict]:
    """Normalize the flexible perturbation config into specs.

    Schema parity: reference ``synthetic_perturbations.py:37-140`` —
    each key may be a bool or a dict with ``enabled`` + kwargs; shuffle
    supports mode lists (random/dinuc/kmer); n_stretch is opt-in; mix
    builds chimeras from multiple records.
    """
    cfg = cfg or {}

    def enabled(key, default):
        v = cfg.get(key, default)
        if isinstance(v, bool):
            return v, {}
        if isinstance(v, dict):
            return v.get("enabled", True), v
        return bool(v), {}

    specs: list[dict] = []
    on, d = enabled("shuffle", True)
    if on:
        modes = d.get("mode", "random")
        modes = [modes] if isinstance(modes, str) else modes
        for mode in modes:
            if mode == "random":
                specs.append({"name": "shuffle", "fn": syn.apply_shuffle,
                              "kwargs": {}})
            elif mode == "dinuc":
                specs.append({"name": "shuffle",
                              "fn": syn.apply_dinuc_shuffle, "kwargs": {}})
            elif mode == "kmer":
                specs.append({"name": "shuffle",
                              "fn": syn.apply_kmer_shuffle,
                              "kwargs": {"k": d.get("k", 2)}})
            else:
                raise ValueError(f"unsupported shuffle mode {mode!r}")
    on, d = enabled("subseq_repeat", True)
    if on:
        specs.append({
            "name": "subseq_repeat", "fn": syn.apply_subseq_repeat_window,
            "kwargs": {"window_fraction": d.get("window_fraction", 0.25)},
        })
    on, d = enabled("tandem_repeat", True)
    if on:
        specs.append({
            "name": "tandem_repeat", "fn": syn.apply_tandem_repeat_window,
            "kwargs": {
                "motif_length_range": tuple(
                    d.get("motif_length_range", (3, 10))),
                "window_fraction": d.get("window_fraction", 0.25),
                "num_repeats": d.get("num_repeats"),
            },
        })
    on, d = enabled("n_stretch", False)   # opt-in, reference parity
    if on:
        specs.append({
            "name": "n_stretch", "fn": syn.apply_n_stretch,
            "kwargs": {
                "n_fraction_range": tuple(
                    d.get("n_fraction_range", (0.3, 1.0))),
                "max_stretches": d.get("max_stretches", 3),
                "point_n_share": d.get("point_n_share", 0.2),
            },
        })
    on, d = enabled("mix", False)
    if on:
        specs.append({
            "name": "mix", "fn": None,
            "n_segments": d.get("n_segments", 2), "kwargs": {},
        })
    if not specs:
        raise ValueError("no perturbations enabled")
    return specs


_PERTURBATIONS = (
    syn.apply_shuffle,
    syn.apply_dinuc_shuffle,
    lambda s: syn.apply_kmer_shuffle(s, k=3),
    syn.apply_subseq_repeat_window,
    syn.apply_tandem_repeat_window,
    lambda s: syn.apply_n_stretch(s, (0.1, 0.25)),
)


def generate_synthetic_sequences(rows: list[tuple[int, str]],
                                 count: int, seed: int = 42,
                                 perturbations: dict | None = None,
                                 ) -> list[str]:
    """Corrupted variants of real sequences (one random perturbation each).

    Parity role: reference ``dataops/synthetic_perturbations.py:319``;
    ``perturbations`` follows the training-YAML schema
    (``reliability_data_generation.perturbations``). Without a config
    the round-1 default mix applies.
    """
    random.seed(seed)
    out = []
    if perturbations is None:
        for _ in range(count):
            _, seq = random.choice(rows)
            fn = random.choice(_PERTURBATIONS)
            out.append(fn(seq))
        return out
    specs = normalize_perturbations(perturbations)
    for _ in range(count):
        spec = random.choice(specs)
        if spec["name"] == "mix":
            n_seg = max(2, int(spec.get("n_segments", 2)))
            seqs = [random.choice(rows)[1] for _ in range(n_seg)]
            out.append(syn.apply_mix(seqs))
        else:
            _, seq = random.choice(rows)
            out.append(spec["fn"](seq, **spec["kwargs"]))
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
    perturbations: dict | None = None,
    chunk_size: int = 100_000,
) -> dict:
    """Build reliability CSVs; returns the builder-shaped paths dict.

    Streams the raw CSV in ``chunk_size``-row chunks — each chunk is
    classified, its confident rows written out immediately (ID=1 when
    correct, OOD=0 when wrong), and synthetic perturbed OOD rows are
    generated FROM that chunk and kept only when the classifier is
    still confident on them. Memory stays bounded at one chunk
    regardless of CSV size (production-scale parity: the reference's
    907-LoC generator streams through subprocess-isolated chunks).
    The train/val split is a deterministic per-record draw.
    """
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

    def read_chunks():
        chunk: list[tuple[int, str]] = []
        with open(raw_csv_path) as fh:
            for line in fh:
                parts = line.strip().split(",")
                if len(parts) >= 2:
                    try:
                        chunk.append((int(parts[0]), parts[1]))
                    except ValueError:
                        continue
                if len(chunk) >= chunk_size:
                    yield chunk
                    chunk = []
        if chunk:
            yield chunk

    rng = random.Random(seed)
    n_id = n_real_ood = n_synth = n_synth_kept = n_rows = 0
    with open(train_csv, "w") as tfh, open(val_csv, "w") as vfh:

        def emit(label: int, seq: str) -> None:
            fh = vfh if rng.random() < val_fraction else tfh
            fh.write(f"{label},{seq}\n")

        for ci, rows in enumerate(read_chunks()):
            n_rows += len(rows)
            preds, confs = _predict_csv_rows(
                model, variables, rows, crop_nt, batch_size)
            for (label, seq), pred, conf in zip(rows, preds, confs):
                if conf < id_threshold:
                    continue
                if pred == label:
                    emit(1, seq)
                    n_id += 1
                else:
                    emit(0, seq)
                    n_real_ood += 1

            count = int(len(rows) * synthetic_ood_multiplier)
            n_synth += count
            synth = generate_synthetic_sequences(
                rows, count, seed + ci, perturbations)
            synth_rows = [(0, s) for s in synth]
            _, s_confs = _predict_csv_rows(
                model, variables, synth_rows, crop_nt, batch_size)
            for (_, seq), conf in zip(synth_rows, s_confs):
                # kept only when the classifier is (wrongly) confident
                if conf >= synthetic_ood_threshold:
                    emit(0, seq)
                    n_synth_kept += 1

    if n_rows == 0:
        train_csv.unlink(missing_ok=True)
        val_csv.unlink(missing_ok=True)
        raise ValueError(f"no records in {raw_csv_path}")
    logger.info(
        f"reliability data: {n_id} ID, {n_real_ood} real OOD, "
        f"{n_synth_kept}/{n_synth} synthetic OOD kept"
    )
    return {
        "train": {"paths": [str(train_csv)], "class": [], "label": []},
        "validation": {"paths": [str(val_csv)], "class": [], "label": []},
    }
