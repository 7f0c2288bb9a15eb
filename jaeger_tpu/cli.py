"""jaeger-tpu command-line interface.

Parity target: reference ``src/jaeger/cli.py`` (click group with
``predict``, ``train``, ``health``, ``utils ...``, ``taxonomy ...``).
Subcommands fill in over the build rounds; each cites its reference
counterpart in its command module.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import click

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
)
logger = logging.getLogger("jaeger_tpu")


def _honour_platform_env() -> None:
    """Respect JAX_PLATFORMS even under the axon sitecustomize, which
    force-sets jax.config to the TPU platform at interpreter start."""
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if env and "axon" not in env:
        try:
            import jax

            jax.config.update("jax_platforms", env)
        except Exception:
            pass


def _apply_verbosity(verbose: int) -> None:
    """Per-command -v/-vv (reference spelling: every command takes it)."""
    if verbose and verbose >= 2:
        logging.getLogger().setLevel(logging.DEBUG)


def _apply_device_flags(cpu: bool, physicalid: int = 0, mem: int | None = None,
                        xla: bool = False) -> None:
    """Reference runtime knobs mapped to this backend: --cpu forces the
    CPU platform, --physicalid picks the default device on multi-device
    hosts; --mem (GPU memory cap) and --xla (JIT toggle) are accepted
    for compatibility — memory is managed by XLA:TPU and JIT is always
    on (reference cli.py:268-283, 346-352)."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
        return
    if xla:
        logger.info("--xla: XLA JIT is always enabled on this backend")
    if mem not in (None, 4):
        logger.info("--mem: accelerator memory is managed by XLA; ignored")
    if physicalid:
        devs = jax.devices()
        if physicalid >= len(devs):
            raise click.UsageError(
                f"--physicalid {physicalid}: only {len(devs)} device(s)")
        jax.config.update("jax_default_device", devs[physicalid])


def _resolve_int8_bundle(model_path: str) -> str:
    """Find the int8 bundle for a model: the bundle itself, the 'int8/'
    subdirectory auto-calibrated at train --save_model, or a sibling
    '<name>_int8' directory written by `jaeger utils quantize`."""
    from pathlib import Path as _P

    cands = [_P(model_path), _P(model_path) / "int8",
             _P(str(model_path).rstrip("/") + "_int8")]
    for c in cands:
        # load_model only takes the int8 path when params.msgpack is
        # absent — a dir holding both would silently run float weights
        if (c / "params_int8.msgpack").exists() and not (
                c / "params.msgpack").exists():
            return str(c)
    raise click.UsageError(
        f"no int8 bundle found for '{model_path}'; create one with "
        f"'jaeger utils quantize -m {model_path} -o {model_path}_int8'"
    )


def _package_version() -> str:
    from importlib.metadata import PackageNotFoundError, version

    try:
        return version("jaeger-tpu")
    except PackageNotFoundError:
        return "0.1.0"


@click.group()
@click.version_option(_package_version(), prog_name="jaeger-tpu")
@click.option("-v", "--verbose", count=True)
def main(verbose: int) -> None:
    """jaeger-tpu: TPU-native phage and prophage detection."""
    if verbose >= 2:
        logging.getLogger().setLevel(logging.DEBUG)
    _honour_platform_env()
    from jaeger_tpu.utils.devices import enable_persistent_compile_cache

    cache = enable_persistent_compile_cache()
    if cache:
        logger.debug("persistent XLA compilation cache: %s", cache)


@main.command()
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_dir", required=True, type=click.Path())
@click.option("-m", "--model", "model_path", default=None,
              help="Model bundle path or registered model name "
                   "(default: the bundled demo model; 'default'/"
                   "'experimental_N' route to the legacy workflow like "
                   "the reference).")
@click.option("--model_path", "model_path_override", default=None,
              help="Path to a model bundle; overrides --model.")
@click.option("--config", "registry_config", default=None,
              type=click.Path(exists=True),
              help="Model-registry config file (e.g. inside containers).")
@click.option("--fsize", default=2000, show_default=True)
@click.option("--stride", default=1500, show_default=True)
@click.option("--batch", default=96, show_default=True)
@click.option("--min-len", "min_len", default=None, type=int)
@click.option("--dustmask/--no-dustmask", default=True, show_default=True)
@click.option("--dynamic-stride", is_flag=True, default=False)
@click.option("--dynamic-stride-threshold", default=10.0, show_default=True,
              help="Contigs shorter than threshold*fsize get evenly "
                   "spread windows under --dynamic-stride.")
@click.option("--precision", default="bfloat16", show_default=True,
              type=click.Choice(["bfloat16", "float32", "bf16", "fp32",
                                 "fp16", "float16"]),
              help="Inference precision (fp16 maps to bf16: the MXU's "
                   "half-precision format; reference default is fp32 — "
                   "bf16 is this backend's documented default).")
@click.option("--devices", default="auto", show_default=True,
              help="Data-parallel device count: 'auto' uses every local "
                   "device, an integer caps it (1 disables the mesh).")
@click.option("--seq-shard", default=1, show_default=True, type=int,
              help="Shard the sequence length of Hyena long convolutions "
                   "over N devices (full-contig models whose per-window "
                   "activations exceed one chip). Mutually exclusive "
                   "with data parallelism; outputs are identical to "
                   "--seq-shard 1.")
@click.option("--workers", default=4, show_default=True,
              help="Host threads for the windowing pipeline (FASTA read "
                   "+ DUST + encode), like the reference's worker knob.")
@click.option("--num-hosts", default=1, show_default=True,
              help="Shard contigs deterministically across N independent "
                   "host processes; each writes a TSV shard and the last "
                   "to finish merges (slurm-array friendly).")
@click.option("--host-id", default=None, type=int,
              help="This process's shard index in [0, num-hosts); "
                   "defaults to jax.process_index().")
@click.option("--crf", "crf", is_flag=True, default=False,
              help="(experimental) Decode per-window predictions jointly "
                   "with a linear-chain CRF (Viterbi).")
@click.option("--crf-switch-cost", default=2.0, show_default=True,
              type=float,
              help="(experimental) Global CRF transition cost lambda; "
                   "used when --crf is set.")
@click.option("--crf-prior", default="biological", show_default=True,
              type=click.Choice(["biological", "uniform"]))
@click.option("--crf-transition-matrix", default=None,
              type=click.Path(exists=True),
              help="JSON file of per-class-pair transition costs.")
@click.option("--rc", "--reliability-cutoff", "reliability_cutoff",
              default=0.1, show_default=True, type=float,
              help="Minimum reliability score required to accept "
                   "predictions.")
@click.option("--pc", "--phage-score", "phage_score", default=3.0,
              show_default=True, type=float,
              help="Minimum phage score required to accept predictions.")
@click.option("--no-termini", is_flag=True, default=False,
              help="Skip the terminal-repeat scan.")
@click.option("--window-scores", is_flag=True, default=False,
              help="Save per-window score NPZ.")
@click.option("-p", "--prophage", is_flag=True, default=False,
              help="Extract and report prophage-like regions.")
@click.option("-s", "--sensitivity", default=1.5, show_default=True,
              help="Sensitivity of the prophage extraction (0-4).")
@click.option("--lc", default=500_000, show_default=True,
              help="Minimum contig length for prophage extraction.")
@click.option("--plot-type", default="circular", show_default=True,
              type=click.Choice(["circular", "linear", "both", "none"]))
@click.option("--refine", is_flag=True, default=False,
              help="Apply post-hoc refinement calibration if present.")
@click.option("--refine-mode", default="gated", show_default=True,
              type=click.Choice(["gated", "weighted", "unweighted"]))
@click.option("--refine-min-windows", default=3, show_default=True,
              help="Minimum accepted windows for a refined contig call.")
@click.option("--refine-merge-split", default="half", show_default=True,
              type=click.Choice(["half", "full"]),
              help="Share of a merged-class window's weight given to "
                   "each member class.")
@click.option("--refine-allow-merged-contig-call", is_flag=True,
              default=False,
              help="Allow hedged merged-class contig calls when the "
                   "top-two margin is small.")
@click.option("--refine-contig-hedge-margin", default=1.0,
              show_default=True,
              help="Margin below which a contig call is hedged to the "
                   "merged class.")
@click.option("--getsequences", is_flag=True, default=False,
              help="Extract phage contigs to FASTA.")
@click.option("--save-embedding", is_flag=True, default=False)
@click.option("--save-nmd", is_flag=True, default=False)
@click.option("--mask-tandem", is_flag=True, default=False,
              help="Hard-mask tandem repeats before windowing (the "
                   "reference ships this TRF stage disabled).")
@click.option("--profile", is_flag=True, default=False,
              help="Write a jax.profiler trace of the inference loop.")
@click.option("--cpu", is_flag=True, default=False,
              help="Ignore accelerators and explicitly run on CPU.")
@click.option("--physicalid", default=0, show_default=True, type=int,
              help="Default device index on multi-device hosts.")
@click.option("--mem", default=4, show_default=True, type=int,
              help="Accelerator memory limit in GB (GPU knob; not "
                   "applicable on TPU, accepted and ignored).")
@click.option("--getalllabels", is_flag=True, default=False,
              help="Get predicted labels for non-viral contigs (legacy "
                   "workflow; a no-op for modern models, as in the "
                   "reference).")
@click.option("--quantized", default=None,
              type=click.Choice(["dynamic", "float16", "full_int8"]),
              help="Use a quantized model: dynamic/full_int8 load the "
                   "int8 bundle made by 'jaeger utils quantize' (a "
                   "full_int8 bundle runs its convs on the int8 MXU "
                   "path); float16 selects bf16 compute.")
@click.option("--xla", is_flag=True, default=False,
              help="Enable XLA JIT (always on here; accepted for "
                   "compatibility).")
@click.option("--onnx", is_flag=True, default=False,
              help="ONNX Runtime engine (not available: single XLA "
                   "path).")
@click.option("--int8", "int8", is_flag=False, flag_value="full",
              default=None, type=click.Choice(["full", "auto"]),
              help="Use the INT8-quantized bundle: bare --int8 (= "
                   "'full', same as --quantized full_int8) runs "
                   "everything int8; '--int8 auto' routes only "
                   "full-length unambiguous windows through the int8 "
                   "MXU program and keeps short/masked windows on the "
                   "float path (the only class where int8 calls ever "
                   "moved in qualification — "
                   "docs/int8_qualification.md).")
@click.option("-v", "--verbose", count=True,
              help="Verbosity level: -vv debug, -v info.")
@click.option("-f", "--overwrite", is_flag=True, default=False,
              help="Overwrite an existing output summary.")
def predict(input_path, output_dir, model_path, model_path_override,
            registry_config, fsize, stride, batch,
            min_len, dustmask, dynamic_stride, dynamic_stride_threshold,
            precision, devices, seq_shard,
            workers, num_hosts, host_id,
            crf, crf_switch_cost,
            crf_prior, crf_transition_matrix, reliability_cutoff,
            phage_score, no_termini,
            window_scores, prophage, sensitivity, lc, plot_type, refine,
            refine_mode, refine_min_windows, refine_merge_split,
            refine_allow_merged_contig_call, refine_contig_hedge_margin,
            getsequences, save_embedding, save_nmd,
            mask_tandem, profile, cpu, physicalid, mem, getalllabels,
            quantized, xla, onnx, int8, verbose, overwrite):
    """Identify phage/prophage sequences in a FASTA of contigs."""
    _apply_verbosity(verbose)
    _apply_device_flags(cpu, physicalid, mem, xla)
    if onnx:
        raise click.UsageError(
            "--onnx: the engine zoo is replaced by a single XLA path "
            "here (see docs/optimizations.md); use --quantized full_int8 "
            "for the int8 bundle."
        )

    # legacy-model routing (reference cli.py:390-409: 'default' and the
    # experimental names use the deprecated legacy workflow)
    if (model_path_override is None
            and model_path in ("default", "experimental",
                               "experimental_1", "experimental_2")):
        click.secho(
            f"Warning: model '{model_path}' uses the legacy prediction "
            "workflow and is deprecated.", fg="yellow", err=True)
        from jaeger_tpu.commands.predict_legacy import (
            run_core as legacy_run_core,
        )

        table = legacy_run_core(
            input_path=input_path, output_dir=output_dir,
            fsize=fsize, stride=stride, batch=batch, min_len=min_len,
            reliability_cutoff=reliability_cutoff,
            phage_score=phage_score,
            model_name=model_path, getalllabels=getalllabels,
            workers=workers,
        )
        click.echo(f"summary written to {table}")
        return

    from jaeger_tpu.commands.predict import resolve_model_path, run_core

    model_path = (model_path_override
                  or resolve_model_path(model_path,
                                        registry_path=registry_config))
    int8_auto_path = None
    if int8 == "auto":
        int8_auto_path = _resolve_int8_bundle(model_path)
    elif int8 == "full" and quantized is None:
        quantized = "full_int8"
    if quantized in ("dynamic", "full_int8"):
        model_path = _resolve_int8_bundle(model_path)
    elif quantized == "float16":
        logger.info("--quantized float16: TPU compute uses bfloat16")
        precision = "bfloat16"

    table = run_core(
        input_path=input_path, output_dir=output_dir, model_path=model_path,
        fsize=fsize, stride=stride, batch=batch, min_len=min_len,
        dustmask=dustmask, dynamic_stride=dynamic_stride,
        dynamic_stride_threshold=dynamic_stride_threshold,
        precision=precision,
        devices=("auto" if devices == "auto" else int(devices)),
        seq_shard=seq_shard,
        num_hosts=num_hosts, host_id=host_id, workers=workers,
        crf_switch_cost=(crf_switch_cost if crf else None),
        crf_prior=crf_prior,
        crf_transition_matrix=(
            __import__("json").load(open(crf_transition_matrix))
            if crf_transition_matrix else None
        ),
        reliability_cutoff=reliability_cutoff, phage_score=phage_score,
        scan_termini=not no_termini, save_window_scores=window_scores,
        prophage=prophage, sensitivity=sensitivity, lc=lc,
        plot_type=plot_type, refine=refine, refine_mode=refine_mode,
        refine_min_windows=refine_min_windows,
        refine_merge_split=refine_merge_split,
        refine_allow_merged_contig_call=refine_allow_merged_contig_call,
        refine_contig_hedge_margin=refine_contig_hedge_margin,
        getsequences=getsequences, save_embedding=save_embedding,
        save_nmd=save_nmd, mask_tandem=mask_tandem, profile=profile,
        int8_auto_path=int8_auto_path,
        overwrite=overwrite,
    )
    click.echo(f"summary written to {table}")


@main.command("predict-legacy")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_dir", required=True,
              type=click.Path())
@click.option("-m", "--model-dir", default=None, type=click.Path(),
              help="Directory with WRes_1024.h5 (+ OOD pickle).")
@click.option("--fsize", default=2048, show_default=True)
@click.option("--stride", default=2048, show_default=True)
@click.option("--batch", default=128, show_default=True)
@click.option("--min-len", default=None, type=int)
@click.option("--model", "model_name", default="default", show_default=True,
              help="Legacy family: 'default' (bundled WRes) or "
                   "'experimental[_N]' (v2 Murphy-10 model; needs a Keras "
                   ".h5 in --model-dir).")
@click.option("--num-res-blocks", default=10, show_default=True,
              help="Residual blocks in the experimental tower.")
@click.option("--rc", "--reliability-cutoff", "reliability_cutoff",
              default=0.5, show_default=True, type=float)
@click.option("--pc", "--phage-score", "phage_score", default=3.0,
              show_default=True, type=float)
@click.option("--getalllabels", is_flag=True, default=False,
              help="Report per-class labels for non-phage contigs.")
@click.option("--workers", default=4, show_default=True)
@click.option("-v", "--verbose", count=True)
def predict_legacy(input_path, output_dir, model_dir, fsize, stride, batch,
                   min_len, model_name, num_res_blocks, reliability_cutoff,
                   phage_score, getalllabels, workers, verbose):
    """Legacy predict: bundled default WRes or v2 experimental models."""
    _apply_verbosity(verbose)
    from jaeger_tpu.commands.predict_legacy import run_core

    table = run_core(input_path=input_path, output_dir=output_dir,
                     model_dir=model_dir, fsize=fsize, stride=stride,
                     batch=batch, min_len=min_len, model_name=model_name,
                     num_res_blocks=num_res_blocks,
                     reliability_cutoff=reliability_cutoff,
                     phage_score=phage_score, getalllabels=getalllabels,
                     workers=workers)
    click.echo(f"summary written to {table}")


@main.command()
@click.option("-v", "--verbose", count=True)
def health(verbose) -> None:
    """Install self-test: devices, encode path, tiny model round trip."""
    _apply_verbosity(verbose)
    from jaeger_tpu.commands.health import health_core

    sys.exit(health_core())


@main.command()
@click.option("-c", "--config", "config_path", required=True,
              type=click.Path(exists=True))
@click.option("-o", "--output", "output_dir", default=None, type=click.Path())
@click.option("--epochs", default=None, type=int,
              help="Override classifier epochs.")
@click.option("--steps-per-epoch", "--steps_per_epoch", default=None, type=int)
@click.option("--self-supervised-pretraining", "--self_supervised_pretraining", is_flag=True, default=False,
              help="Run the ArcFace projection pretraining branch first.")
@click.option("--generate-reliability-data", "--generate_reliability_data", is_flag=True, default=None,
              help="Generate ID/OOD reliability data with the classifier.")
@click.option("--from-last-checkpoint", "--from_last_checkpoint", is_flag=True, default=False,
              help="Resume from the most advanced branch checkpoint.")
@click.option("-f", "--force", is_flag=True, default=False,
              help="Train into a non-empty output directory anyway.")
@click.option("--ignore-convergence", "--ignore_convergence", is_flag=True, default=False,
              help="Retrain branches even if convergence markers exist.")
@click.option("--only-classification-head", "--only-heads", "--only_classification_head", "--only_heads",
              "only_classification_head", is_flag=True, default=False,
              help="Freeze the representation learner; fine-tune heads "
                   "only.")
@click.option("--only-reliability-head", "--only_reliability_head", is_flag=True, default=False,
              help="Skip projection/classifier; train the reliability "
                   "branch only.")
@click.option("--only-save", "--only_save", is_flag=True, default=False,
              help="Save the model with last-checkpoint weights without "
                   "training.")
@click.option("--id-threshold", "--id_threshold", default=None, type=float,
              help="Reliability data: confidence above which a correct "
                   "prediction counts as in-distribution.")
@click.option("--synthetic-ood-threshold", "--synthetic_ood_threshold", default=None, type=float,
              help="Reliability data: confidence above which a synthetic "
                   "corrupted sequence is kept as OOD.")
@click.option("--synthetic-ood-multiplier", "--synthetic_ood_multiplier", default=None, type=float,
              help="Reliability data: synthetic sequences generated per "
                   "real record (overrides the config).")
@click.option("--masking/--no-masking", "masking", default=None,
              help="Enable/disable sequence masking in conv/normalization "
                   "layers; defaults to model.use_masking in the config.")
@click.option("--precision", default=None,
              type=click.Choice(["fp32", "fp16", "bf16"],
                                case_sensitive=False),
              help="Numeric precision (overrides training.mixed_precision; "
                   "fp16 maps to bf16 on the MXU).")
@click.option("--mixed_precision", "mixed_precision", is_flag=True,
              default=False, hidden=True,
              help="Deprecated: use --precision fp16 instead.")
@click.option("--save_model", "save_model_flag", is_flag=True,
              default=False,
              help="Save the final model bundle (always on here; accepted "
                   "for compatibility).")
@click.option("--meta", default=None, type=click.Path(),
              help="Path to write container metadata JSON "
                   "(model/experiment paths).")
@click.option("--workers", default=8, show_default=True, type=int,
              help="Host CPU threads (input pipeline; accepted for "
                   "compatibility).")
@click.option("--xla", is_flag=True, default=False,
              help="Enable XLA JIT (always on here; accepted for "
                   "compatibility).")
@click.option("--coordinator", default=None,
              help="Multi-host training: coordinator HOST:PORT for "
                   "jax.distributed (run one process per host with "
                   "--num-processes/--process-id; batch rows shard over "
                   "the global data mesh, process 0 writes artifacts).")
@click.option("--num-processes", "--num_processes", "num_processes",
              default=None, type=int,
              help="Multi-host training: total process count.")
@click.option("--process-id", "--process_id", "process_id", default=None,
              type=int, help="Multi-host training: this process's index.")
@click.option("-v", "--verbose", count=True)
def train(config_path, output_dir, epochs, steps_per_epoch,
          self_supervised_pretraining, generate_reliability_data,
          from_last_checkpoint, force, ignore_convergence,
          only_classification_head, only_reliability_head, only_save,
          id_threshold, synthetic_ood_threshold, synthetic_ood_multiplier,
          masking, precision, mixed_precision, save_model_flag, meta,
          workers, xla, coordinator, num_processes, process_id, verbose):
    """Train a fragment classifier from a YAML config."""
    _apply_verbosity(verbose)
    if coordinator:
        # must run before any jax device use so the global (multi-host)
        # backend initializes first — parallel/multihost.py
        from jaeger_tpu.parallel.multihost import initialize_distributed

        pid, nproc = initialize_distributed(
            coordinator, num_processes, process_id)
        click.echo(f"jax.distributed: process {pid}/{nproc}", err=True)
    if mixed_precision:
        click.secho("--mixed_precision is deprecated; use --precision "
                    "fp16 instead.", fg="yellow", err=True)
        if precision is None:
            precision = "fp16"
    from jaeger_tpu.commands.train import train_fragment_core

    train_fragment_core(
        config_path=config_path, output_dir=output_dir,
        epochs_override=epochs, steps_override=steps_per_epoch,
        self_supervised_pretraining=self_supervised_pretraining,
        generate_reliability=generate_reliability_data,
        from_last_checkpoint=from_last_checkpoint, force=force,
        ignore_convergence=ignore_convergence,
        only_classification_head=only_classification_head,
        only_reliability_head=only_reliability_head, only_save=only_save,
        id_threshold=id_threshold,
        synthetic_ood_threshold=synthetic_ood_threshold,
        synthetic_ood_multiplier=synthetic_ood_multiplier,
        masking=masking, precision=precision, meta=meta,
    )


@main.group()
def taxonomy() -> None:
    """Experimental embedding-based taxonomy assignment."""


@taxonomy.command("build")
@click.option("-m", "--model", "model_path", required=True,
              type=click.Path(exists=True))
@click.option("--model_path", "model_path_override", default=None,
              type=click.Path(exists=True),
              help="Path to a model bundle; overrides --model.")
@click.option("--config", "registry_config", default=None,
              type=click.Path(exists=True),
              help="Model-registry config file (accepted for "
                   "compatibility).")
@click.option("-i", "--input", "fasta", required=True,
              type=click.Path(exists=True))
@click.option("-a", "--acc2tax", "--acc2taxid", "acc2taxid", required=True,
              type=click.Path(exists=True),
              help="2-column TSV: accession -> taxid.")
@click.option("-t", "--tax", "--taxdump", "taxdump_dir", required=True,
              type=click.Path(exists=True),
              help="NCBI taxdump directory (nodes.dmp/names.dmp).")
@click.option("-o", "--output", "out_dir", required=True)
@click.option("--fsize", default=2000, show_default=True)
@click.option("--stride", default=None, type=int,
              help="Window stride [default: fsize].")
@click.option("--batch", default=256, show_default=True)
@click.option("--precision", default="bfloat16", show_default=True,
              type=click.Choice(["bfloat16", "float32", "bf16", "fp32",
                                 "fp16", "float16"]))
@click.option("--rc", "reliability_cutoff", default=0.1,
              show_default=True, type=float,
              help="Accepted for compatibility (unused by the taxonomy "
                   "pipeline, as in the reference).")
@click.option("--workers", default=4, show_default=True)
@click.option("--cpu", is_flag=True, default=False)
@click.option("--physicalid", default=0, show_default=True, type=int)
@click.option("--mem", default=4, show_default=True, type=int)
@click.option("--xla", is_flag=True, default=False)
@click.option("-f", "--overwrite", is_flag=True, default=False,
              help="Overwrite an existing database.")
@click.option("-v", "--verbose", count=True)
def taxonomy_build(model_path, model_path_override, registry_config, fasta,
                   acc2taxid, taxdump_dir, out_dir, fsize, stride, batch,
                   precision, reliability_cutoff, workers, cpu, physicalid,
                   mem, xla, overwrite, verbose):
    """Build a cosine taxonomy index from reference genomes."""
    _apply_verbosity(verbose)
    from jaeger_tpu.commands.taxonomy import build_taxdb

    _honour_platform_env()
    _apply_device_flags(cpu, physicalid, mem, xla)
    out = build_taxdb(model_path_override or model_path, fasta, acc2taxid,
                      taxdump_dir, out_dir, fsize=fsize, stride=stride,
                      batch=batch, precision=precision, workers=workers,
                      overwrite=overwrite)
    click.echo(f"taxonomy db written to {out}")


@taxonomy.command("predict")
@click.option("-m", "--model", "model_path", required=True,
              type=click.Path(exists=True))
@click.option("--model_path", "model_path_override", default=None,
              type=click.Path(exists=True),
              help="Path to a model bundle; overrides --model.")
@click.option("--config", "registry_config", default=None,
              type=click.Path(exists=True),
              help="Model-registry config file (accepted for "
                   "compatibility).")
@click.option("-d", "--db", "db_dir", required=True,
              type=click.Path(exists=True))
@click.option("-i", "--input", "fasta", required=True,
              type=click.Path(exists=True))
@click.option("-o", "--output", required=True)
@click.option("-k", default=5, show_default=True)
@click.option("--fraction", default=0.6, show_default=True)
@click.option("--fsize", default=2000, show_default=True)
@click.option("--stride", default=None, type=int,
              help="Window stride [default: fsize].")
@click.option("--batch", default=256, show_default=True)
@click.option("--precision", default="bfloat16", show_default=True,
              type=click.Choice(["bfloat16", "float32", "bf16", "fp32",
                                 "fp16", "float16"]))
@click.option("--rc", "reliability_cutoff", default=0.1,
              show_default=True, type=float,
              help="Accepted for compatibility (unused by the taxonomy "
                   "pipeline, as in the reference).")
@click.option("--workers", default=4, show_default=True)
@click.option("--cpu", is_flag=True, default=False)
@click.option("--physicalid", default=0, show_default=True, type=int)
@click.option("--mem", default=4, show_default=True, type=int)
@click.option("--xla", is_flag=True, default=False)
@click.option("-f", "--overwrite", is_flag=True, default=False)
@click.option("-v", "--verbose", count=True)
def taxonomy_predict(model_path, model_path_override, registry_config,
                     db_dir, fasta, output, k, fraction, fsize, stride,
                     batch, precision, reliability_cutoff, workers, cpu,
                     physicalid, mem, xla, overwrite, verbose):
    """Assign lineages to contigs via embedding k-NN + majority LCA."""
    _apply_verbosity(verbose)
    from jaeger_tpu.commands.taxonomy import predict_taxonomy

    _honour_platform_env()
    _apply_device_flags(cpu, physicalid, mem, xla)
    out = predict_taxonomy(model_path_override or model_path, db_dir, fasta,
                           output, k=k, fraction=fraction, fsize=fsize,
                           stride=stride, batch=batch, precision=precision,
                           workers=workers, overwrite=overwrite)
    click.echo(f"taxonomy predictions written to {out}")


@main.group()
def utils() -> None:
    """Training-data tooling (fragment, mask, convert, optimize-data...)."""


@utils.command("optimize-data")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_path", required=True,
              type=click.Path())
@click.option("--format", "fmt", default="translated", show_default=True,
              type=click.Choice(["translated", "nucleotide", "both"]))
@click.option("--crop-size", "crop_size", multiple=True, type=int,
              default=(500,), show_default=True)
@click.option("--units", default="nuc", show_default=True,
              type=click.Choice(["nuc", "codon"], case_sensitive=False),
              help="Units for --crop-size and --stride.")
@click.option("--stride", default=0, show_default=True)
@click.option("--overlap", default=None,
              type=click.FloatRange(0.0, 1.0),
              help="Overlap between crops as a fraction of each crop "
                   "size; overrides --stride.")
@click.option("--one-hot", is_flag=True, default=False)
@click.option("--codon-map", default="codon_id", show_default=True)
@click.option("--nucleotide-map", default=None,
              help='JSON mapping for A, C, G, T, N (default: '
                   '{"A":1,"G":2,"T":3,"C":4,"N":0}).')
@click.option("--num-classes", default=3, show_default=True)
@click.option("--pad-int", default=0, show_default=True,
              help="Padding value for integer outputs.")
@click.option("--dtype", default="auto", show_default=True,
              type=click.Choice(["auto", "int8", "uint8", "int16",
                                 "int32"]),
              help="Integer dtype for encoded features (auto picks the "
                   "smallest fitting dtype).")
@click.option("--max-length", default=5000, show_default=True,
              help="Deprecated and ignored.")
@click.option("--max-memory-mb", default=None, type=int,
              help="Memory budget; larger datasets stream as shards.")
@click.option("--compress", default="fast", show_default=True,
              type=click.Choice(["default", "none", "fast"]))
@click.option("--pad", is_flag=True, default=False,
              help="Pad all crops to the maximum length (dense arrays) "
                   "instead of ragged per-crop arrays (reference "
                   "cli.py:1193 parity — ragged is the default).")
@click.option("--balance-classes", is_flag=True, default=False)
@click.option("--shuffle-seed", default=42, show_default=True,
              help="Seed for the within-class shuffle used with "
                   "--balance-classes.")
@click.option("--shard-size", default=None, type=int,
              help="Stream output as class-balanced shards of this size.")
@click.option("--workers", "--num-workers", "workers", default=4,
              show_default=True,
              help="Thread workers for shard/chunk materialization.")
def optimize_data(input_path, output_path, fmt, crop_size, units, stride,
                  overlap, one_hot, codon_map, nucleotide_map, num_classes,
                  pad_int, dtype, max_length, max_memory_mb, compress, pad,
                  balance_classes, shuffle_seed, shard_size, workers):
    """Convert a label,sequence CSV to a preprocessed NPZ dataset."""
    from jaeger_tpu.commands.utils import optimize_data_core

    summary = optimize_data_core(
        input_path, output_path, format=fmt,
        crop_size=list(crop_size), units=units.lower(), stride=stride,
        overlap=overlap, one_hot=one_hot,
        codon_map=codon_map, nucleotide_map=nucleotide_map,
        num_classes=num_classes, pad_int=pad_int, dtype=dtype,
        max_length=max_length, max_memory_mb=max_memory_mb,
        compress=compress, pad=pad,
        balance_classes=balance_classes, shuffle_seed=shuffle_seed,
        shard_size=shard_size, workers=workers,
    )
    click.echo(summary)


@utils.command()
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--fsize", default=2000, show_default=True)
@click.option("--stride", default=None, type=int)
@click.option("--min-len", default=None, type=int)
@click.option("--label", default=None, type=int)
@click.option("--minlen", default=None, type=int,
              help="Min fragment size (reference mode: random-length "
                   "fragments via the splitter).")
@click.option("--maxlen", default=None, type=int,
              help="Max fragment size (reference mode).")
@click.option("--overlap", default=0, show_default=True, type=int,
              help="Overlap between fragments (reference mode).")
@click.option("--shuffle", is_flag=True, default=False,
              help="Shuffle the emitted fragments (reference mode).")
def fragment(input_path, output_path, fsize, stride, min_len, label,
             minlen, maxlen, overlap, shuffle):
    """Fragment a FASTA into windows.

    With --minlen/--maxlen this is the reference's metagenome-assembly
    simulator (random fragment lengths, = `utils split`); otherwise
    fixed fsize/stride windows (CSV or FASTA output)."""
    if minlen is not None or maxlen is not None:
        if minlen is None or maxlen is None:
            raise click.UsageError(
                "--minlen and --maxlen must be given together")
        from jaeger_tpu.dataops.split import split_core

        n = split_core(input_path, output_path, minlen=minlen,
                       maxlen=maxlen, overlap=overlap, shuffle=shuffle)
        click.echo(f"{n} fragments written to {output_path}")
        return
    from jaeger_tpu.commands.utils import fragment_core

    n = fragment_core(input_path, output_path, fsize=fsize, stride=stride,
                      min_len=min_len, label=label)
    click.echo(f"{n} fragments written to {output_path}")


@utils.command("mask-tandem")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--minscore", default=None, type=int,
              help="Minimum repeat alignment score (TRF default 50).")
@click.option("--maxperiod", default=None, type=int,
              help="Maximum repeat period (TRF default 500).")
@click.option("--workers", default=None, type=int,
              help="Parallel records (default: thread-pool default).")
def mask_tandem(input_path, output_path, minscore, maxperiod, workers):
    """Hard-mask tandem repeats to N (in-process TRF replacement)."""
    from jaeger_tpu.seqops.tandem import mask_fasta

    kwargs = {}
    if minscore is not None:
        kwargs["minscore"] = minscore
    if maxperiod is not None:
        kwargs["maxperiod"] = maxperiod
    n = mask_fasta(input_path, output_path, workers=workers, **kwargs)
    click.echo(f"{n} bases masked -> {output_path}")


@utils.command()
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--minperc", default=0.0, show_default=True)
@click.option("--maxperc", default=1.0, show_default=True)
@click.option("--step", default=0.01, show_default=True)
@click.option("--mutate", is_flag=True, default=False,
              help="Replace with random bases instead of N-masking.")
@click.option("--seed", default=None, type=int,
              help="Seed for reproducible position/base draws.")
def mask(input_path, output_path, minperc, maxperc, step, mutate, seed):
    """Progressive masking/mutation series for robustness testing."""
    from jaeger_tpu.commands.utils import mask_core

    n = mask_core(input_path, output_path, minperc=minperc, maxperc=maxperc,
                  step=step, mutate=mutate, seed=seed)
    click.echo(f"{n} entries written to {output_path}")


@utils.command()
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--itype", required=True,
              type=click.Choice(["CSV", "FASTA"], case_sensitive=False))
def convert(input_path, output_path, itype):
    """Convert between CSV (class,sequence,id) and FASTA."""
    from jaeger_tpu.commands.utils import convert_core

    n = convert_core(input_path, output_path, itype)
    click.echo(f"{n} records converted")


@utils.command()
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_dir", default=None,
              type=click.Path(),
              help="Directory for the reference artifact set: class/"
                   "reliability/entropy/energy plots + "
                   "jaeger_output_with_pvals.tsv (Welch top1-vs-top2 "
                   "p-values).")
def stats(input_path, output_dir):
    """Summary statistics (and plots) for a prediction TSV."""
    import json

    from jaeger_tpu.commands.utils import stats_core

    summary = stats_core(input_path, output=output_dir)
    click.echo(json.dumps(summary, indent=2, default=str))


@utils.command("split")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--minlen", default=2000, show_default=True)
@click.option("--maxlen", default=5000, show_default=True)
@click.option("--overlap", default=0, show_default=True)
@click.option("--coverage", default=None, type=float)
@click.option("--circular", is_flag=True, default=False)
@click.option("--max-n-prop", default=0.3, show_default=True)
@click.option("--seed", default=None, type=int)
@click.option("--shuffle", is_flag=True, default=False)
def split_cmd(input_path, output_path, minlen, maxlen, overlap, coverage,
              circular, max_n_prop, seed, shuffle):
    """Simulate metagenome assemblies by fragment sampling."""
    from jaeger_tpu.dataops.split import split_core

    n = split_core(input_path, output_path, minlen=minlen, maxlen=maxlen,
                   overlap=overlap, coverage=coverage, circular=circular,
                   max_n_prop=max_n_prop, seed=seed, shuffle=shuffle)
    click.echo(f"{n} fragments written to {output_path}")


@utils.command("ood-data")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-ip", "--input_predictions", "input_predictions",
              default=None, type=click.Path(exists=True),
              help="Jaeger predictions TSV for the input; only "
                   "correctly-predicted contigs keep label 1.")
@click.option("-o", "--output", "output_path", required=True)
@click.option("--method", default="dinuc", show_default=True,
              type=click.Choice(["dinuc", "kmer", "random"]))
@click.option("--dinuc", "dinuc_flag", is_flag=True, default=False,
              help="Dinucleotide shuffle (same as --method dinuc).")
@click.option("-k", "--kmer", "kmer", default=2, show_default=True,
              help="k-mer size for --method kmer.")
@click.option("--n-shuffles", default=1, show_default=True)
@click.option("--num_tandem_repeats", "--tandem-repeats",
              "tandem_repeats", default=0, show_default=True,
              help="Generate n random tandem repeats.")
@click.option("--seed", default=42, show_default=True)
@click.option("--itype", default=None,
              type=click.Choice(["FASTA", "CSV"], case_sensitive=False),
              help="Input file type [default: inferred from extension].")
@click.option("--otype", "--output-format", "output_format",
              default="csv", show_default=True,
              type=click.Choice(["csv", "fasta"], case_sensitive=False))
@click.option("--seq_col", "--seq-col", "seq_col", default=None,
              type=int, help="CSV column holding the sequence.")
@click.option("--class_col", "--class-col", "class_col", default=None,
              type=int, help="CSV column holding the class id.")
def ood_data(input_path, input_predictions, output_path, method,
             dinuc_flag, kmer, n_shuffles, tandem_repeats, seed, itype,
             output_format, seq_col, class_col):
    """Build a shuffled-negative OOD dataset."""
    from jaeger_tpu.dataops.ood import shuffle_core

    if (itype or "").upper() == "CSV" and seq_col is None:
        raise click.UsageError(
            "when --itype CSV is used, --seq_col must be provided")
    if dinuc_flag:
        method = "dinuc"
    summary = shuffle_core(input_path, output_path, method=method, kmer=kmer,
                           n_shuffles=n_shuffles,
                           tandem_repeats=tandem_repeats, seed=seed,
                           output_format=output_format.lower(),
                           seq_col=(1 if seq_col is None else seq_col),
                           class_col=class_col,
                           input_predictions=input_predictions)
    click.echo(summary)


@utils.command("convert-weights")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True),
              help="TF SavedModel dir (wres) or Keras-3 .weights.h5 "
                   "(modern).")
@click.option("-o", "--output", "output_path", required=True)
@click.option("--family", default="wres", show_default=True,
              type=click.Choice(["wres", "modern"]))
@click.option("-c", "--config", "config_path", default=None,
              type=click.Path(exists=True),
              help="project.yaml / train config for --family modern.")
@click.option("--num-res-blocks", default=5, show_default=True)
def convert_weights(input_path, output_path, family, config_path,
                    num_res_blocks):
    """Convert reference checkpoints to jaeger-tpu weights (no
    TensorFlow needed): legacy WRes SavedModels, or modern-builder
    Keras-3 ``.weights.h5`` files plus their project.yaml."""
    from pathlib import Path

    from flax import serialization

    out = Path(output_path)
    if family == "modern":
        if config_path is None:
            raise click.UsageError(
                "--family modern needs -c/--config (the project.yaml "
                "saved next to the weights)")
        from jaeger_tpu.models.artifacts import save_model
        from jaeger_tpu.models.modern_convert import convert_modern_weights
        from jaeger_tpu.utils.config import load_model_config

        config = load_model_config(config_path)
        variables = convert_modern_weights(config, input_path)
        save_model(variables, config, out)
        click.echo(f"converted modern bundle written to {out}")
        return

    from jaeger_tpu.models.legacy_convert import (
        convert_wres_checkpoint, convert_wres_h5,
    )

    if Path(input_path).is_file():
        if not str(input_path).endswith(".h5"):
            raise click.UsageError(
                f"{input_path}: expected a SavedModel directory or a "
                f".h5 weights file")
        variables = convert_wres_h5(input_path,
                                    num_res_blocks=num_res_blocks)
    else:
        variables = convert_wres_checkpoint(input_path,
                                            num_res_blocks=num_res_blocks)
    out.mkdir(parents=True, exist_ok=True)
    (out / "params.msgpack").write_bytes(serialization.to_bytes(variables))
    (out / "legacy.yaml").write_text(
        "family: wres\nnum_res_blocks: %d\nsource: %s\n"
        % (num_res_blocks, input_path)
    )
    click.echo(f"converted weights written to {out}")


@utils.command("quantize")
@click.option("-m", "--model", "model_path", required=True,
              type=click.Path(exists=True))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--mode", default="dynamic", show_default=True,
              type=click.Choice(["dynamic", "float16", "full_int8"]),
              help="dynamic: int8 per-channel weight bundle (dequantized "
                   "at load); full_int8: weights int8 + calibrated "
                   "activation scales -> int8 MXU execution at predict "
                   "time; float16: bfloat16-weight bundle.")
@click.option("-v", "--verbose", count=True)
def quantize(model_path, output_path, mode, verbose):
    """Write a quantized variant of a model bundle."""
    _apply_verbosity(verbose)
    # host-side artifact tool (like the reference's TFLite/ONNX
    # converters): calibration runs on CPU — deterministic, and no
    # accelerator compile wait for a packaging step
    _apply_device_flags(cpu=True)
    from jaeger_tpu.models.conversion import quantize_bundle

    stats = quantize_bundle(model_path, output_path, mode=mode)
    click.echo(stats)


@utils.command("convert-graph")
@click.option("-m", "--model", "model_path", required=True,
              type=click.Path(exists=True))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--mode", default="xla", show_default=True,
              type=click.Choice(["xla", "tflite", "onnx", "tensorrt"]),
              help="Conversion mode; only the XLA (StableHLO) path "
                   "exists here — the engine zoo is a documented "
                   "divergence.")
@click.option("--int8", "int8", is_flag=True, default=False,
              help="Export from the int8-quantized weights (make the "
                   "bundle with 'utils quantize' first).")
@click.option("--batch", default=96, show_default=True)
@click.option("--precision", default="bfloat16", show_default=True,
              type=click.Choice(["bfloat16", "float32"]))
@click.option("-v", "--verbose", count=True)
def convert_graph(model_path, output_path, mode, int8, batch, precision,
                  verbose):
    """Export the jitted forward pass as a portable StableHLO artifact."""
    _apply_verbosity(verbose)
    if mode != "xla":
        raise click.UsageError(
            f"--mode {mode}: the TFLite/ONNX/TensorRT engine zoo is "
            "replaced by the single XLA path (see docs/optimizations.md); "
            "use --mode xla.")
    import jax.numpy as jnp

    from jaeger_tpu.models.conversion import export_stablehlo

    _honour_platform_env()
    if int8:
        model_path = _resolve_int8_bundle(model_path)
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    out = export_stablehlo(model_path, output_path, batch=batch, dtype=dtype)
    click.echo(f"StableHLO artifact written to {out}")


@utils.command("combine-models")
@click.argument("model_paths", nargs=-1, required=False,
                type=click.Path(exists=True))
@click.option("-i", "--input", "input_paths", multiple=True,
              type=click.Path(exists=True),
              help="Path to a saved model (repeatable).")
@click.option("-o", "--output", "output_path", required=True)
@click.option("-c", "--comb", "--method", "method", default="mean",
              show_default=True,
              type=click.Choice(["mv", "sum", "mean", "none"],
                                case_sensitive=False))
def combine_models(model_paths, input_paths, output_path, method):
    """Combine N trained model bundles into an ensemble bundle."""
    from jaeger_tpu.models.ensemble import combine_models_core

    paths = list(input_paths) + list(model_paths)
    if not paths:
        raise click.UsageError("provide model paths (-i, repeatable)")
    out = combine_models_core(paths, output_path, method.lower())
    click.echo(f"ensemble bundle written to {out}")


@utils.command("receptive-field")
@click.option("-c", "--config", "config_path", required=True,
              type=click.Path(exists=True))
def receptive_field(config_path):
    """Static receptive field of a config's representation learner."""
    from jaeger_tpu.utils.config import load_model_config
    from jaeger_tpu.utils.receptive_field import receptive_field_summary

    cfg = load_model_config(config_path)
    model_cfg = cfg.get("model", cfg)
    rep = model_cfg.get("representation_learner", {})
    layers = rep.get("hidden_layers", [])
    if "branch" in rep:
        layers = rep["branch"].get("hidden_layers", [])
    sp = model_cfg.get("string_processor", {})
    crop = sp.get("crop_size") or (max(sp.get("crop_sizes", [0])) or None)
    click.echo(receptive_field_summary(layers, crop_size=crop))


# reference command-name spelling (cli.py `utils receptive_field`)
utils.add_command(receptive_field, "receptive_field")


@main.command("register-models")
@click.argument("model_path_arg", required=False,
                type=click.Path(exists=True))
@click.option("-p", "--path", "path_opt", default=None,
              type=click.Path(exists=True, file_okay=False),
              help="Path to model weights and configuration files.")
@click.option("-c", "--config", "--registry", "registry", default=None,
              type=click.Path(),
              help="Registry config file to update (container use).")
@click.option("-v", "--verbose", count=True)
def register_models(model_path_arg, path_opt, registry, verbose):
    """Register a local model bundle in the model registry."""
    _apply_verbosity(verbose)
    model_path = path_opt or model_path_arg
    if not model_path:
        raise click.UsageError("provide a model path (-p/--path)")
    from jaeger_tpu.utils.registry import add_to_registry

    data = add_to_registry(model_path, registry)
    click.echo(f"registered; {len(data['model_paths'])} model path(s) known")


@main.command("list-models")
@click.option("--registry", default=None, type=click.Path())
def list_models(registry):
    """List registered model bundles."""
    from jaeger_tpu.utils.registry import AvailableModels

    models = AvailableModels(registry_path=registry)
    if not models.info:
        click.echo("no models registered")
    for name, info in sorted(models.info.items()):
        click.echo(f"{name}\t{info['path']}")


@main.command()
@click.argument("url", required=False)
@click.option("-p", "--path", "-d", "--dest", "dest", default=None,
              help="Directory to save model weights and configuration "
                   "files [default: models].")
@click.option("-m", "--model_name", "model_name", default=None,
              help="Identifier of a catalog model to download.")
@click.option("-c", "--config", "--registry", "registry", default=None,
              type=click.Path(),
              help="Registry config file to update (container use).")
@click.option("-l", "--list", "list_catalog", is_flag=True, default=False,
              help="List downloadable models from the published catalog.")
@click.option("-v", "--verbose", count=True)
def download(url, dest, model_name, registry, list_catalog, verbose):
    """Download and register a model archive (requires network access).

    Pass a direct URL, or -m with a catalog model name; with --list,
    query the CKAN model catalog instead (reference
    commands/downloads.py)."""
    _apply_verbosity(verbose)
    from jaeger_tpu.utils.registry import download_models, list_model_catalog

    if list_catalog and (model_name or url):
        raise click.UsageError(
            "the '--list' option cannot be used with a model or URL")
    if list_catalog:
        try:
            for name, link in sorted(list_model_catalog().items()):
                click.echo(f"- {name}\t{link}")
        except (ConnectionError, ValueError) as e:
            raise click.ClickException(str(e))
        return
    if model_name:
        try:
            links = list_model_catalog()
        except (ConnectionError, ValueError) as e:
            raise click.ClickException(str(e))
        if model_name not in links:
            raise click.UsageError(
                f"model '{model_name}' not found; use '--list' to see "
                "available models")
        url = links[model_name]
        # avoid scanning huge user dirs for models (reference cli.py:745)
        dest = str(Path(dest or "models") / "jaeger_models")
    if not url:
        raise click.UsageError(
            "provide a URL or -m MODEL_NAME, or --list for the catalog")
    try:
        registered = download_models(url, dest or "models", registry)
        click.echo(f"registered {len(registered)} model(s)")
    except OSError as e:
        raise click.ClickException(
            f"download failed ({e}); in sealed environments place the "
            "bundle locally and use `register-models` instead"
        )


@utils.command("dataset")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--out-prefix", "--output", "out_prefix",
              required=True)
@click.option("--fraglen", "--frag-len", "frag_len", default=2048,
              show_default=True, help="Max fragment length.")
@click.option("--overlap", default=1024, show_default=True)
@click.option("--trainperc", default=0.8, show_default=True)
@click.option("--valperc", default=0.1, show_default=True)
@click.option("--testperc", default=0.1, show_default=True)
@click.option("--class", "--label", "label", default=None, type=int,
              help="Class label (FASTA input).")
@click.option("--seed", default=42, show_default=True)
@click.option("--intype", default=None,
              type=click.Choice(["CSV", "FASTA"], case_sensitive=False),
              help="Input type [default: inferred from extension].")
@click.option("--outtype", default="CSV", show_default=True,
              type=click.Choice(["CSV", "FASTA"], case_sensitive=False))
@click.option("--seq_col", "--seq-col", "seq_col", default=None, type=int,
              help="CSV column holding the sequence (CSV input).")
@click.option("--class_col", "--class-col", "class_col", default=None,
              type=int,
              help="CSV column holding the class id (CSV input; "
                   "overrides --class per row).")
@click.option("--method", default="ANI", show_default=True,
              type=click.Choice(["ANI", "AAI"], case_sensitive=False),
              help="Dereplication similarity: nucleotide (ANI) or "
                   "six-frame amino-acid (AAI) MinHash.")
@click.option("--maxiden", "--dedupe-threshold", "dedupe_threshold",
              default=0.6, show_default=True, type=float,
              help="Max identity between any two kept fragments "
                   "(MinHash Jaccard threshold).")
@click.option("--maxcov", default=0.6, show_default=True, type=float,
              help="Max coverage between fragments (folded into the "
                   "single MinHash threshold here).")
@click.option("--dedupe", default="minhash", show_default=True,
              type=click.Choice(["minhash", "exact", "none"]),
              help="minhash = ANI/AAI-style MinHash clustering (mmseqs2 "
                   "equivalent); exact = endpoint signatures.")
@click.option("--mmseqs-bin", "mmseqs_bin", default=None,
              help="Path/name of a real mmseqs2 binary: dereplicate with "
                   "`easy-cluster --min-seq-id MAXIDEN -c MAXCOV` "
                   "(the reference's exact semantics, separate identity "
                   "and coverage knobs) instead of the in-repo MinHash. "
                   "Fidelity of the MinHash fallback: docs/fidelity.md.")
def dataset(input_path, out_prefix, frag_len, overlap, trainperc, valperc,
            testperc, label, seed, intype, outtype, seq_col, class_col,
            method, dedupe_threshold, maxcov, dedupe, mmseqs_bin):
    """Fragment + dedupe + split genomes into train/val/test sets."""
    from jaeger_tpu.commands.utils import dataset_core

    if (intype or "").upper() == "CSV" and (seq_col is None
                                            or class_col is None):
        raise click.UsageError(
            "for CSV input, specify both --seq_col and --class_col")
    if (intype or "").upper() == "FASTA" and label is None:
        raise click.UsageError("for FASTA input, specify --class")
    summary = dataset_core(input_path, out_prefix, frag_len=frag_len,
                           overlap=overlap, trainperc=trainperc,
                           valperc=valperc, testperc=testperc,
                           label=(0 if label is None else label),
                           seed=seed, seq_col=seq_col, class_col=class_col,
                           dedupe=(False if dedupe == "none" else dedupe),
                           dedupe_threshold=dedupe_threshold,
                           method=method.upper(), mmseqs_bin=mmseqs_bin,
                           maxcov=maxcov, outtype=outtype.upper())
    click.echo(summary)


if __name__ == "__main__":
    main()
