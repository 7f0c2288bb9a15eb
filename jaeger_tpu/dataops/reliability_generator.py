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


def compute_perturbation_counts(records, multiplier: float,
                                specs: list[dict], cfg: dict) -> list[int]:
    """Per-spec sample counts (reference
    ``synthetic_perturbations.py:139-180``): specs whose config carries
    an explicit ``count`` or per-spec ``multiplier`` take it; the
    remaining global budget ``len(records) * multiplier`` splits evenly
    over the implicit specs with the leftover dealt round-robin."""
    n = len(records)
    global_count = max(0, int(n * multiplier))
    if not specs:
        return []
    counts = [0] * len(specs)
    explicit: list[int] = []
    for i, spec in enumerate(specs):
        c = cfg.get(spec["name"], {})
        if isinstance(c, dict):
            if "count" in c:
                counts[i] = max(0, int(c["count"]))
                explicit.append(i)
            elif "multiplier" in c:
                counts[i] = max(0, int(n * c["multiplier"]))
                explicit.append(i)
    implicit = [i for i in range(len(specs)) if i not in explicit]
    if not implicit:
        return counts
    remaining = max(0, global_count - sum(counts[i] for i in explicit))
    per = remaining // len(implicit)
    for i in implicit:
        counts[i] = per
    leftover = remaining - per * len(implicit)
    for i in range(leftover):
        counts[implicit[i % len(implicit)]] += 1
    return counts


def _generate_chunk(records, spec: dict, count: int,
                    crop_size: int | None, seed: int) -> list[str]:
    """One seeded chunk for one spec (reference
    ``synthetic_perturbations.py:212-239``, RNG stream-identical):
    non-mix specs walk ``records[i % n]`` in order; mix samples
    ``n_segments`` distinct class labels per chimera."""
    random.seed(seed)
    np.random.seed(seed)
    out: list[str] = []
    if spec["name"] == "mix":
        label_to_seqs: dict[int, list[str]] = {}
        for label, seq in records:
            label_to_seqs.setdefault(label, []).append(seq)
        labels = list(label_to_seqs)
        n_segments = spec["n_segments"]
        if len(labels) < n_segments:
            raise ValueError(
                f"mix perturbation requires at least {n_segments} "
                f"distinct classes, found {len(labels)}"
            )
        for _ in range(count):
            chosen = random.sample(labels, k=n_segments)
            seqs = [random.choice(label_to_seqs[la]) for la in chosen]
            out.append(syn.apply_mix(seqs, output_length=crop_size))
    else:
        fn, kwargs, n = spec["fn"], spec["kwargs"], len(records)
        for i in range(count):
            _, seq = records[i % n]
            out.append(fn(seq, **kwargs))
    return out


def generate_synthetic_sequences(records: list[tuple[int, str]],
                                 multiplier: float,
                                 perturbations: dict | None = None,
                                 crop_size: int | None = None,
                                 seed: int = 42,
                                 generation_chunk_size: int = 10_000,
                                 ) -> list[str]:
    """Corrupted variants of real sequences.

    Reference-identical (``dataops/synthetic_perturbations.py:319-415``,
    pinned live seed-for-seed in ``tests/test_synthetic_live_parity.py``):
    the per-spec budget comes from :func:`compute_perturbation_counts`,
    each spec generates in ``generation_chunk_size`` chunks seeded
    ``seed + chunk_offset`` — so datasets regenerate identically at any
    chunking, without the reference's subprocess machinery (generation
    here is pure host work off the JAX path; chunk seeding keeps the
    memory-bounded restartability its workers provided).
    """
    cfg = perturbations or {}
    specs = normalize_perturbations(cfg)
    counts = compute_perturbation_counts(records, multiplier, specs, cfg)
    out: list[str] = []
    offset = 0
    for spec, count in zip(specs, counts):
        if count <= 0:
            continue
        for start in range(0, count, generation_chunk_size):
            sub = min(generation_chunk_size, count - start)
            out.extend(
                _generate_chunk(records, spec, sub, crop_size,
                                seed + offset)
            )
            offset += 1
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

            synth = generate_synthetic_sequences(
                rows, synthetic_ood_multiplier, perturbations,
                crop_size=crop_nt, seed=seed + ci)
            n_synth += len(synth)
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
