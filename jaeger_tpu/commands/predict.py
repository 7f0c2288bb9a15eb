"""End-to-end prediction.

Parity target: reference ``commands/predict.py:488-861`` (``run_core``):
validate FASTA -> load model bundle -> window the contigs -> batched
device inference -> per-contig reduction -> summary TSVs (+ optional
window-score NPZ). The TPU redesign folds the reference's engine zoo
(SavedModel/XLA/TFLite/ONNX/TensorRT) into the single XLA:TPU path and its
two-pass long/short-contig flow into one masked bucketed stream.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from jaeger_tpu.infer.engine import InferenceEngine
from jaeger_tpu.models.artifacts import class_names_in_order, load_model
from jaeger_tpu.postprocess import collect
from jaeger_tpu.postprocess.termini import scan_for_terminal_repeats
from jaeger_tpu.seqops.fasta import validate_fasta_entries
from jaeger_tpu.seqops.windows import window_batches

logger = logging.getLogger("jaeger_tpu")


def crop_length_warning(config: dict, fsize: int) -> str | None:
    """Warn when ``--fsize`` disagrees with the model's trained crop.

    Role parity: reference ``commands/predict.py:36-63``
    (``_crop_length_warning``) — codon models compare frame counts via
    the crop contract, nucleotide models compare lengths directly;
    fixed-length architectures (e.g. hyena) can collapse to one class at
    an unseen length.
    """
    from jaeger_tpu.models.builder import _resolve_crop_nt
    from jaeger_tpu.seqops.crop import nucleotides_to_codons

    model_cfg = config.get("model", {})
    sp = model_cfg.get("string_processor", {})
    input_type = model_cfg.get("embedding", {}).get(
        "input_type", "translated")
    try:
        trained_nt = _resolve_crop_nt(sp, input_type)
    except Exception:
        return None
    if input_type == "nucleotide":
        if int(fsize) != int(trained_nt):
            return (
                f"runtime --fsize {fsize} differs from the model's "
                f"trained fragment length ({trained_nt} nt); "
                f"fixed-length architectures may degrade at a "
                f"different length — prefer --fsize {trained_nt}"
            )
        return None
    trained_codons = nucleotides_to_codons(trained_nt)
    runtime_codons = nucleotides_to_codons(int(fsize))
    if runtime_codons == trained_codons:
        return None
    effect = (
        f"windows will be zero-masked past {fsize} nt"
        if runtime_codons < trained_codons
        else f"bases past {trained_nt} nt of each window are ignored"
    )
    return (
        f"runtime --fsize {fsize} yields {runtime_codons} codon frames "
        f"but the model was trained on {trained_codons} ({trained_nt} "
        f"nt); {effect} — prefer --fsize {trained_nt}"
    )

#: bundled framework-trained demo model (synthetic codon-usage classes)
BUNDLED_DEMO_MODEL = (
    Path(__file__).resolve().parent.parent / "data" / "models" / "demo"
)


def resolve_model_path(model: str | None,
                       registry_path: str | None = None) -> str:
    """Resolve a model argument: path, registered name, or the bundled
    demo model when omitted (model discovery parity: reference
    ``utils/misc.py:334-400``; ``registry_path`` is the reference's
    ``--config`` registry override, ``cli.py:208-212``)."""
    if model is None:
        logger.info(
            "no model given; using the bundled demo model "
            "(train or register a real model for production use)"
        )
        return str(BUNDLED_DEMO_MODEL)
    if Path(model).exists():
        return model
    from jaeger_tpu.utils.registry import AvailableModels

    return AvailableModels(registry_path=registry_path).resolve(model)


def _build_refined_contig_df(data_full: dict, taus: dict, mode: str = "gated",
                             min_windows: int = 3,
                             merge_split: str = "half",
                             allow_merged_contig_call: bool = False,
                             contig_hedge_margin: float = 1.0):
    """Per-contig refined calls from raw window logits.

    Parity: reference ``commands/predict.py:115-157`` — requires the
    6-class model whose logits align with the refinement SCORE_COLS.
    """
    import pandas as pd

    from jaeger_tpu.postprocess import refinement as R

    predictions = data_full.get("predictions")
    headers = data_full.get("headers")
    if predictions is None or headers is None:
        return None
    rows = []
    for contig_id, logits in zip(headers, predictions):
        if logits.ndim != 2 or logits.shape[1] != len(R.SCORE_COLS):
            continue
        for window_idx, wl in enumerate(logits):
            row = {"contig_id": contig_id, "window_idx": window_idx}
            row.update(dict(zip(R.SCORE_COLS, wl)))
            rows.append(row)
    if not rows:
        return None
    window_df = R.add_score_features(pd.DataFrame(rows))
    window_df = R.refine(window_df, taus)
    agg = R.aggregate_contig(
        window_df, mode=mode, min_windows=min_windows,
        merge_split=merge_split,
        allow_merged_contig_call=allow_merged_contig_call,
        contig_hedge_margin=contig_hedge_margin,
    )
    if agg.empty:
        # every contig abstained below min_windows (e.g. taus fit on a
        # different distribution): the empty frame carries no call
        # columns — fall back to unrefined output instead of crashing
        # downstream (the reference's merge would KeyError here)
        logger.warning(
            "refinement left no contig with >= %d confident windows; "
            "summary keeps the unrefined calls", min_windows)
        return None
    return agg


def _maybe_merge_shards(output_dir: Path, stem: str,
                        num_hosts: int) -> Path | None:
    """Merge per-host TSV shards when every host's shard exists.

    Whichever host finishes last performs the merge (concurrent merges
    are tolerated and produce identical output). Returns the merged
    table path, or None if shards are still outstanding."""
    from jaeger_tpu.parallel import multihost as mh

    base = output_dir / f"{stem}_default_jaeger.tsv"
    if not all(
        mh.shard_path(base, h).exists() for h in range(num_hosts)
    ):
        return None
    merged = mh.merge_output_shards(base, num_hosts)
    phage_base = output_dir / f"{stem}_default_phages_jaeger.tsv"
    if any(
        mh.shard_path(phage_base, h).exists() for h in range(num_hosts)
    ):
        mh.merge_output_shards(phage_base, num_hosts)
    logger.info(f"all {num_hosts} shards present; merged to {merged}")
    return merged


def run_core(
    input_path: str,
    output_dir: str,
    model_path: str,
    fsize: int = 2000,
    stride: int = 2000,
    batch: int = 96,
    min_len: int | None = None,
    dustmask: bool = True,
    dynamic_stride: bool = False,
    dynamic_stride_threshold: float = 10.0,
    precision: str = "bfloat16",
    mesh=None,
    devices: int | str = "auto",
    seq_shard: int = 1,
    num_hosts: int = 1,
    host_id: int | None = None,
    workers: int = 4,
    crf_switch_cost: float | None = None,
    crf_prior: str = "biological",
    crf_transition_matrix: dict | None = None,
    reliability_cutoff: float = 0.5,
    phage_score: float = 1.0,
    scan_termini: bool = True,
    save_window_scores: bool = False,
    int8_auto_path: str | None = None,
    prophage: bool = False,
    sensitivity: float = 1.5,
    lc: int = 500_000,
    plot_type: str = "circular",
    refine: bool = False,
    refine_mode: str = "gated",
    refine_min_windows: int = 3,
    refine_merge_split: str = "half",
    refine_allow_merged_contig_call: bool = False,
    refine_contig_hedge_margin: float = 1.0,
    getsequences: bool = False,
    save_embedding: bool = False,
    save_nmd: bool = False,
    mask_tandem: bool = False,
    profile: bool = False,
    overwrite: bool = False,
) -> Path:
    t0 = time.time()
    input_path = Path(input_path)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    from jaeger_tpu.seqops.fasta import fasta_stem

    # --- multi-host contig sharding (the framework's scale-out product
    # path; the reference has none — SURVEY §2.6). Each host keeps the
    # contigs a deterministic hash assigns it, writes a TSV shard, and
    # whichever host finishes last merges (slurm-array friendly). ---
    contig_filter = None
    if num_hosts > 1:
        from jaeger_tpu.parallel import multihost as mh

        if host_id is None:
            import jax

            host_id = jax.process_index()
        if not (0 <= host_id < num_hosts):
            raise ValueError(
                f"host_id {host_id} out of range for {num_hosts} hosts")
        contig_filter = (
            lambda h: mh.contig_owner(h, num_hosts) == host_id
        )
        logger.info(
            f"multi-host predict: host {host_id}/{num_hosts} "
            f"(deterministic contig sharding)"
        )

    existing = output_dir / f"{fasta_stem(input_path)}_default_jaeger.tsv"
    if existing.exists() and not overwrite:
        # reference commands/predict.py:574-577: refuse to overwrite a
        # previous run's summary unless -f/--overwrite is passed
        logger.error(
            f"output file {existing} exists; pass -f/--overwrite to "
            f"replace it"
        )
        raise SystemExit(1)
    min_len = min_len if min_len is not None else fsize

    validate_fasta_entries(str(input_path), min_len=min_len)

    # --- optional tandem-repeat pre-masking. The reference ships this
    # TRF split/run/merge pipeline wired but commented out of predict
    # (reference commands/predict.py:665-677); here the in-process
    # masker (seqops/tandem.py) makes it a working opt-in. Output
    # naming stays keyed to the ORIGINAL file stem. ---
    windowing_input = input_path
    if mask_tandem:
        from jaeger_tpu.seqops.tandem import mask_fasta

        masked_path = output_dir / f"{fasta_stem(input_path)}_tandem_masked.fasta"
        n_masked = mask_fasta(
            str(input_path), str(masked_path), workers=workers)
        logger.info(
            f"tandem-repeat pre-mask: {n_masked} bases masked "
            f"-> {masked_path.name}"
        )
        windowing_input = masked_path

    dtype = {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16, "fp32": jnp.float32,
        # the reference's fp16 choice: bf16 is the MXU half-precision
        "fp16": jnp.bfloat16, "float16": jnp.bfloat16,
    }[precision]
    from jaeger_tpu.models.ensemble import is_ensemble, load_ensemble

    if is_ensemble(model_path):
        model, variables, config, classes = load_ensemble(
            model_path, dtype=dtype
        )
    else:
        model, variables, config, classes = load_model(model_path, dtype=dtype)
    indices, labels = class_names_in_order(classes)

    # --- sequence sharding (--seq-shard N): length-shard Hyena long
    # convolutions over N devices (parallel/hyena_sp ppermute ring) for
    # full-contig models whose per-window activations exceed one chip.
    # The model is rebuilt with parallel.seq_axis so its Hyena blocks
    # dispatch through the shard_map island; outputs are pinned byte-
    # identical to width 1 (tests/test_hyena_seq_cli.py). ---
    seq_mesh = None
    if int(seq_shard) > 1:
        import jax
        from jax.sharding import Mesh

        from jaeger_tpu.models.builder import ModelBuilder

        n_avail = len(jax.devices())
        width = max(1, min(int(seq_shard), n_avail))
        if width > 1:
            mcfg = config["model"] if "model" in config else config
            # defend against `parallel:` present with a null value
            if not isinstance(mcfg.get("parallel"), dict):
                mcfg["parallel"] = {}
            mcfg["parallel"]["seq_axis"] = "seq"
            model = ModelBuilder(config, dtype=dtype).build()
            seq_mesh = Mesh(
                np.asarray(jax.devices()[:width]), ("seq",))
            mesh = None  # devices are spent on the sequence axis
            devices = 1
            logger.info(
                f"sequence-sharded Hyena over {width} devices (seq axis)")

    warning = crop_length_warning(config, fsize)
    if warning:
        logger.warning(warning)

    term_future = None
    term_pool = None
    if scan_termini:
        # reference predict.py:679-685 scans every contig >= the runtime
        # --fsize (not a fixed floor) with the command's worker count.
        # The scan is independent of inference (it re-reads the FASTA),
        # so it runs CONCURRENTLY with windowing + the device forward —
        # on TPU hosts the per-contig Smith-Waterman is the largest
        # host-side cost (~12 ms/contig) and would otherwise serialize
        # ahead of a ~0.1 s device pass. Joined before collect.
        from concurrent.futures import ThreadPoolExecutor

        term_pool = ThreadPoolExecutor(max_workers=1)
        term_future = term_pool.submit(
            scan_for_terminal_repeats, str(windowing_input),
            fsize=fsize, workers=workers)

    # --- device strategy (parity: reference predict.py:656-664 picks
    # MirroredStrategy when >1 GPU) — auto-construct a 1-D data mesh over
    # all local devices; batch is padded to a device multiple by the
    # engine and results are identical to single-device (pinned by
    # tests/test_e2e_commands.py on the 8-device CPU mesh) ---
    if mesh is None and devices != 1 and devices != "1":
        import jax

        n_avail = len(jax.devices())
        want = (
            n_avail if devices in ("auto", None)
            else max(1, min(int(devices), n_avail))
        )
        if want > 1:
            from jaeger_tpu.parallel import mesh as meshlib

            mesh = meshlib.data_mesh(want)
            logger.info(f"data-parallel inference over {want} devices")

    wanted = ["prediction", "reliability"]
    if save_embedding:
        wanted.append("embedding")
    if save_nmd:
        wanted.append("nmd")
    int8_variables = None
    if int8_auto_path is not None:
        # `--int8 auto`: the int8 bundle's variables drive the DENSE
        # program only (full-length unambiguous windows); masked/short
        # windows keep the float path (engine._vars_for). The bundle
        # must be a full_int8 quantization of THIS model.
        m8, int8_variables, _cfg8, _cls8 = load_model(
            int8_auto_path, dtype=dtype)
        if "quant" not in int8_variables:
            raise ValueError(
                f"--int8 auto needs a full_int8 bundle; {int8_auto_path} "
                "has no calibrated activation scales (re-run `jaeger "
                "utils quantize --mode full_int8`)")
    engine = InferenceEngine(
        model, variables, batch_size=batch, mesh=mesh, seq_mesh=seq_mesh,
        output_keys=tuple(wanted), int8_variables=int8_variables,
    )

    batches = window_batches(
        str(windowing_input), fragsize=fsize, stride=stride, min_len=min_len,
        dustmask=dustmask, dynamic_stride=dynamic_stride,
        dynamic_stride_threshold=dynamic_stride_threshold,
        contig_filter=contig_filter, workers=workers,
    )
    # The device-reduced fast path fetches per-contig partials + one int8
    # class per window instead of full logits — used whenever no consumer
    # needs the full per-window logit matrices.
    needs_full = bool(
        crf_switch_cost is not None or prophage or save_window_scores
        or refine or save_embedding or save_nmd or len(labels or []) <= 2
    )

    def run_engine():
        if needs_full:
            return engine.predict_batches(batches)
        stats, kept = engine.predict_batches_reduced(
            batches, num_classes=len(labels),
            with_reliability=True,
        )
        return stats, kept

    # the pool must be released even when inference (or the scan itself)
    # raises, or the non-daemon Smith-Waterman worker keeps the
    # interpreter alive past the traceback
    term_repeats = None
    try:
        if profile:
            # first-class profiler trace (SURVEY aux #1: the reference
            # had only rich ms/step progress); view with
            # xprof/tensorboard
            import jax

            trace_dir = output_dir / "profile"
            with jax.profiler.trace(str(trace_dir)):
                result, kept = run_engine()
            logger.info(f"profiler trace written to {trace_dir}")
        else:
            result, kept = run_engine()
        # join the overlapped terminal-repeat scan before collect
        # needs it
        if term_future is not None:
            term_repeats = term_future.result()
    finally:
        if term_pool is not None:
            term_pool.shutdown(wait=False, cancel_futures=True)
    if not result:
        if num_hosts > 1:
            # this host owned no windowable contigs: write an empty
            # shard so shard accounting completes, merge if last
            from jaeger_tpu.parallel import multihost as mh

            stem0 = fasta_stem(input_path)
            base = output_dir / f"{stem0}_default_jaeger.tsv"
            mh.shard_path(base, host_id).touch()
            _maybe_merge_shards(output_dir, stem0, num_hosts)
            logger.info(
                f"host {host_id} owned no contigs; empty shard written")
            return base
        raise ValueError(f"no windows produced from {input_path}")
    meta = collect.PredictionMeta.from_batches(kept)

    if needs_full:
        outputs = result
        n_windows = outputs["prediction"].shape[0]
        data, data_full = collect.reduce_windows(
            prediction=outputs["prediction"],
            meta=meta,
            fsize=fsize,
            num_classes=(
                len(labels) if labels else outputs["prediction"].shape[-1]
            ),
            reliability=outputs.get("reliability"),
            class_names=labels,
            crf_switch_cost=crf_switch_cost,
            crf_prior=crf_prior,
            crf_transition_matrix=crf_transition_matrix,
            term_repeats=term_repeats,
        )
    else:
        stats = result
        n_windows = int(sum(s["n_windows"] for s in stats.values()))
        rel_present = any("reliability" in s for s in stats.values())
        data = collect.data_from_device_stats(
            stats, meta, fsize=fsize, num_classes=len(labels),
            with_reliability=rel_present, term_repeats=term_repeats,
        )
        outputs, data_full = {}, None

    # --- optional post-hoc refinement (reference predict.py:311-335) ---
    refined_contig = None
    if refine:
        refine_path = Path(model_path) / (
            f"{config.get('model', {}).get('name', 'model')}_refine.yaml"
        )
        if not refine_path.exists():
            candidates = list(Path(model_path).glob("*_refine.yaml"))
            refine_path = candidates[0] if candidates else refine_path
        if refine_path.exists():
            from jaeger_tpu.postprocess import refinement as R

            try:
                refine_cfg = R.load_refinement(refine_path)
                refined_contig = _build_refined_contig_df(
                    data_full, refine_cfg["taus"], mode=refine_mode,
                    min_windows=refine_min_windows,
                    merge_split=refine_merge_split,
                    allow_merged_contig_call=refine_allow_merged_contig_call,
                    contig_hedge_margin=refine_contig_hedge_margin,
                )
                logger.info(f"applied refinement from {refine_path}")
            except Exception as e:
                logger.warning(f"refinement failed: {e}; using defaults")
        else:
            logger.warning(f"no refinement calibration at {refine_path}")

    stem = fasta_stem(input_path)
    table = output_dir / f"{stem}_default_jaeger.tsv"
    phage_table = output_dir / f"{stem}_default_phages_jaeger.tsv"
    if num_hosts > 1:
        from jaeger_tpu.parallel import multihost as mh

        table = mh.shard_path(table, host_id)
        phage_table = mh.shard_path(phage_table, host_id)
    n = collect.write_output(
        data,
        output_table_path=table,
        output_phage_table_path=phage_table,
        labels=labels or [str(i) for i in range(outputs["prediction"].shape[-1])],
        indices=indices or list(range(outputs["prediction"].shape[-1])),
        reliability_cutoff=reliability_cutoff,
        phage_score=phage_score,
        refined_contig=refined_contig,
    )

    if getsequences and phage_table.exists():
        # phage FASTA extraction (reference collect.py:613-640)
        from jaeger_tpu.postprocess.collect import write_fasta_from_results

        out_fasta = output_dir / f"{stem}_phages_jaeger.fasta"
        write_fasta_from_results(str(input_path), str(phage_table),
                                 str(out_fasta))
        logger.info(f"phage sequences written to {out_fasta}")
    if prophage:
        # prophage segmentation + boundary refinement + att report + plots
        # (parity: reference commands/predict.py:353-442)
        from jaeger_tpu.postprocess import prophages as pro
        from jaeger_tpu.postprocess.genes import refine_prophage_boundaries

        class_map = {"index": indices, "class": labels}
        logits_df = pro.logits_to_df_v2(
            class_map=class_map,
            cmdline_kwargs={"lc": lc, "fsize": fsize, "stride": stride},
            headers=data_full["headers"],
            predictions=data_full["predictions"],
            lengths=data_full["lengths"],
            gc_skews=data_full["gc_skews"],
            gcs=data_full["gcs"],
        )
        if logits_df:
            logger.info("identifying prophages")
            pro_dir = output_dir / f"{stem}_prophages"
            plots_dir = pro_dir / "plots"
            for d in (pro_dir, plots_dir):
                d.mkdir(parents=True, exist_ok=True)
            phage_cord = pro.segment(
                logits_df, outdir=plots_dir, cutoff_length=lc,
                sensitivity=sensitivity, identifier="phage",
            )
            refined = refine_prophage_boundaries(
                prophage_cordinates=phage_cord,
                fasta_path=input_path, fsize=fsize, stride=stride,
            )
            if plot_type in ("circular", "both"):
                pro.plot_scores(
                    logits_df, fsize=fsize, infile_base=stem,
                    outdir=plots_dir, phage_cordinates=phage_cord,
                    stride=stride,
                )
            if plot_type in ("linear", "both"):
                pro.plot_scores_linear(
                    logits_df, fsize=fsize, infile_base=stem,
                    outdir=plots_dir, phage_cordinates=phage_cord,
                    stride=stride,
                )
            pro.prophage_report(
                fsize=fsize, filehandle=input_path,
                prophage_cordinates=phage_cord, outdir=pro_dir,
                refined_boundaries=refined, stride=stride,
                cutoff_length=lc,
            )
        else:
            logger.info("no prophage regions found")

    # per-host suffix keeps aux outputs from clobbering across hosts
    aux_suffix = f".host{host_id:03d}" if num_hosts > 1 else ""
    if save_window_scores:
        preds_obj = np.empty(len(data_full["predictions"]), dtype=object)
        preds_obj[:] = data_full["predictions"]
        gcs_obj = np.empty(len(data_full["gcs"]), dtype=object)
        gcs_obj[:] = data_full["gcs"]
        skews_obj = np.empty(len(data_full["gc_skews"]), dtype=object)
        skews_obj[:] = data_full["gc_skews"]
        np.savez(
            output_dir / f"{stem}_window_scores{aux_suffix}.npz",
            headers=data_full["headers"],
            lengths=data_full["lengths"],
            predictions=preds_obj,
            gc_skews=skews_obj,
            gcs=gcs_obj,
        )
    # per-window aux rows in the reference's concat order (full-window
    # pass first, then the short-window pass — predict.py:771-816)
    win_order = np.argsort(
        np.asarray(meta.seqlen, np.int64) < fsize, kind="stable")
    if save_embedding and "embedding" in outputs:
        np.savez_compressed(
            output_dir / f"{stem}_embeddings{aux_suffix}.npz",
            embedding=np.asarray(outputs["embedding"])[win_order],
            headers=np.asarray(meta.headers, dtype=str)[win_order],
        )
    if save_nmd and "nmd" in outputs:
        np.savez_compressed(
            output_dir / f"{stem}_nmd{aux_suffix}.npz",
            nmd=np.asarray(outputs["nmd"])[win_order],
            headers=np.asarray(meta.headers, dtype=str)[win_order],
        )
    dt = time.time() - t0
    logger.info(
        f"predict: {n} contigs, {n_windows} windows in {dt:.2f}s "
        f"({n_windows / dt:.0f} windows/s)"
    )
    # resource summary (parity: reference predict.py:472-477 psutil logs)
    try:
        import psutil

        proc = psutil.Process()
        logger.info(
            f"CPU time(s): {proc.cpu_times().user:.2f}  "
            f"RSS: {proc.memory_info().rss / 2**30:.2f} GB"
        )
    except ImportError:
        pass
    if num_hosts > 1:
        merged = _maybe_merge_shards(output_dir, stem, num_hosts)
        if merged is not None:
            return merged
    return table
