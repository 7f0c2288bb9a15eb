"""Legacy predict workflow (the bundled ``default`` 4-class model).

Parity target: reference ``commands/predict_legacy.py:34-357`` — load the
``WRes_1024.h5`` weights into the WRes architecture, run windows through
the model, compute the sklearn logistic-regression OOD score over the
128-d embeddings (batch-stat + L2 normalization, reference
``postprocess/helpers.py:530-564``), and reduce to the legacy 4-class
summary TSV (bacteria / phage / eukarya / archaea).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import numpy as np

from jaeger_tpu.postprocess import collect
from jaeger_tpu.seqops.fasta import validate_fasta_entries
from jaeger_tpu.seqops.windows import window_batches

logger = logging.getLogger("jaeger_tpu")

LEGACY_LABELS = ["bacteria", "phage", "eukarya", "archaea"]
#: bundled package copy of the reference's default model data files
DEFAULT_MODEL_DIR = (
    Path(__file__).resolve().parent.parent / "data" / "models" / "default"
)


def _load_ood(model_dir: Path):
    """(sklearn classifier or None, batch_mean, batch_std)."""
    import warnings

    clf = None
    pkl = model_dir / "LR_ood_4_class_default.pkl"
    if pkl.exists():
        try:
            import joblib

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                clf = joblib.load(pkl)
        except Exception as e:
            logger.warning(f"could not load OOD model: {e}")
    mean = std = None
    if (model_dir / "batch_means.npy").exists():
        mean = np.load(model_dir / "batch_means.npy")
        std = np.load(model_dir / "batch_std.npy")
    return clf, mean, std


def run_core(
    input_path: str,
    output_dir: str,
    model_dir: str | Path | None = None,
    fsize: int = 2048,
    stride: int = 2048,
    batch: int = 128,
    min_len: int | None = None,
    reliability_cutoff: float = 0.5,
    phage_score: float = 3,
    model_name: str = "default",
    num_res_blocks: int = 10,
    getalllabels: bool = False,
    workers: int = 4,
) -> Path:
    """``model_name`` routes the legacy family like the reference's
    ``LEGACY_PREDICT_MODELS`` (``cli.py:100``): ``default`` is the bundled
    WRes amino model; ``experimental``/``experimental_*`` is the v2
    Murphy-10 architecture (``create_jaeger_model``), loaded from a Keras
    ``.h5`` weights file in ``model_dir``."""
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.legacy import (
        ExperimentalModel,
        WResModel,
        encode_amino_windows,
        encode_murphy_windows,
    )
    from jaeger_tpu.models.legacy_convert import (
        convert_experimental_h5,
        convert_wres_h5,
    )

    t0 = time.time()
    input_path = Path(input_path)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    # the reference clamps: --min-len < --fsize is unsupported in legacy
    # mode (predict_legacy.py:58-63)
    if min_len is not None and min_len < fsize:
        logger.warning(
            "--min-len < --fsize is not supported in legacy prediction "
            f"mode; using --min-len={fsize}."
        )
    min_len = max(min_len, fsize) if min_len is not None else fsize
    model_dir = Path(model_dir) if model_dir else DEFAULT_MODEL_DIR

    validate_fasta_entries(str(input_path), min_len=min_len)
    if model_name.startswith("experimental"):
        if model_dir == DEFAULT_MODEL_DIR:
            raise FileNotFoundError(
                "experimental models are not bundled; pass --model-dir "
                "pointing at the Keras .h5 weights"
            )
        h5s = sorted(model_dir.glob("*.h5"))
        if not h5s:
            raise FileNotFoundError(
                f"no Keras .h5 weights for {model_name!r} under {model_dir}"
            )
        variables = convert_experimental_h5(
            h5s[0], num_res_blocks=num_res_blocks
        )
        n_out = int(variables["params"]["outdense"]["bias"].shape[0])
        model = ExperimentalModel(
            num_classes=n_out, num_res_blocks=num_res_blocks
        )
        encode = encode_murphy_windows
    elif (model_dir / "WRes_1024.h5").exists():
        variables = convert_wres_h5(model_dir / "WRes_1024.h5")
        model = WResModel(dropout_active=False)
        encode = encode_amino_windows
    elif (model_dir / "saved_model.pb").exists() or (
        model_dir / "variables"
    ).exists():
        # a reference TF SavedModel dir (e.g. the bundled test
        # jaeger_fragment_graph) — converted in-memory, no TensorFlow
        from jaeger_tpu.models.legacy_convert import convert_wres_checkpoint

        variables = convert_wres_checkpoint(model_dir)
        model = WResModel(dropout_active=False)
        encode = encode_amino_windows
    else:
        raise FileNotFoundError(
            f"no WRes_1024.h5 or TF SavedModel under {model_dir}"
        )
    clf, batch_mean, batch_std = _load_ood(model_dir)

    @jax.jit
    def fwd(variables, toks):
        out = model.apply(variables, toks, train=False)
        return (out["output"].astype(jnp.float32),
                out["embedding"].astype(jnp.float32))

    logits_chunks, emb_chunks, kept = [], [], []
    for wb in window_batches(str(input_path), fragsize=fsize, stride=stride,
                             min_len=min_len):
        kept.append(wb)
        for i in range(0, len(wb), batch):
            b = wb.bases[i : i + batch]
            ln = wb.length[i : i + batch]
            n_valid = b.shape[0]
            pad = batch - n_valid
            if pad:
                b = np.pad(b, ((0, pad), (0, 0)), constant_values=4)
                ln = np.pad(ln, (0, pad))
            toks = encode(jnp.asarray(b), jnp.asarray(ln), fsize)
            lg, em = fwd(variables, toks)
            logits_chunks.append(np.asarray(lg)[:n_valid])
            emb_chunks.append(np.asarray(em)[:n_valid])
    if not logits_chunks:
        raise ValueError(f"no windows produced from {input_path}")
    logits = np.concatenate(logits_chunks)
    embeddings = np.concatenate(emb_chunks)

    # legacy reduction + writer, pinned live byte-for-byte against the
    # reference predict_legacy pipeline (tests/test_legacy_e2e_live.py)
    from jaeger_tpu.postprocess import legacy_collect as lc
    from jaeger_tpu.postprocess.termini import scan_for_terminal_repeats

    n_classes = logits.shape[1]
    canonical = lc.LEGACY_CONFIGS.get(model_name)
    if canonical is not None and canonical["num_classes"] != n_classes:
        canonical = None  # user weights with a different head size
    config = dict(
        canonical
        or {
            "model": model_name,
            "num_classes": n_classes,
            "all_labels": dict(enumerate(
                LEGACY_LABELS if n_classes == len(LEGACY_LABELS)
                else [f"class_{i}" for i in range(n_classes)])),
            "default_labels": dict(enumerate(
                LEGACY_LABELS if n_classes == len(LEGACY_LABELS)
                else [f"class_{i}" for i in range(n_classes)])),
            "second": None,
            "vindex": 1,
        }
    )
    key = "all_labels" if getalllabels else "default_labels"
    config["labels"] = [v for _, v in config[key].items()]

    ood_params = None
    if model_name == "default" and clf is not None and batch_mean is not None:
        ood_params = {"type": "sklearn", "model": clf,
                      "batch_mean": batch_mean, "batch_std": batch_std}

    term_repeats = scan_for_terminal_repeats(
        str(input_path), fsize=fsize, workers=workers)
    meta = collect.PredictionMeta.from_batches(kept)
    data = lc.reduce_windows_legacy(
        config, logits,
        embeddings if ood_params is not None else None,
        meta, fsize=fsize, ood_params=ood_params,
        term_repeats=term_repeats,
    )
    from jaeger_tpu.seqops.fasta import fasta_stem
    stem = fasta_stem(input_path)
    table = output_dir / f"{stem}_{model_name}_jaeger.tsv"
    phage_table = output_dir / f"{stem}_{model_name}_phages_jaeger.tsv"
    n = lc.write_output_legacy(
        config, data, output_table_path=table,
        output_phage_table_path=phage_table,
        reliability_cutoff=reliability_cutoff, phage_score=phage_score,
    )
    dt = time.time() - t0
    logger.info(
        f"predict-legacy: {n} contigs, {logits.shape[0]} windows in "
        f"{dt:.2f}s"
    )
    return table
