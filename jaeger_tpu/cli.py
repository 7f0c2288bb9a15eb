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


@click.group()
@click.option("-v", "--verbose", count=True)
def main(verbose: int) -> None:
    """jaeger-tpu: TPU-native phage and prophage detection."""
    if verbose >= 2:
        logging.getLogger().setLevel(logging.DEBUG)
    _honour_platform_env()


@main.command()
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--output", "output_dir", required=True, type=click.Path())
@click.option("-m", "--model", "model_path", default=None,
              help="Model bundle path or registered model name "
                   "(default: the bundled demo model).")
@click.option("--fsize", default=2000, show_default=True)
@click.option("--stride", default=2000, show_default=True)
@click.option("--batch", default=96, show_default=True)
@click.option("--min-len", "min_len", default=None, type=int)
@click.option("--dustmask/--no-dustmask", default=True, show_default=True)
@click.option("--dynamic-stride", is_flag=True, default=False)
@click.option("--dynamic-stride-threshold", default=10.0, show_default=True,
              help="Contigs shorter than threshold*fsize get evenly "
                   "spread windows under --dynamic-stride.")
@click.option("--precision", default="bfloat16", show_default=True,
              type=click.Choice(["bfloat16", "float32", "bf16", "fp32"]))
@click.option("--devices", default="auto", show_default=True,
              help="Data-parallel device count: 'auto' uses every local "
                   "device, an integer caps it (1 disables the mesh).")
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
@click.option("--crf-switch-cost", default=None, type=float,
              help="Enable CRF (Viterbi) window smoothing with this cost.")
@click.option("--crf-prior", default="biological", show_default=True,
              type=click.Choice(["biological", "uniform"]))
@click.option("--crf-transition-matrix", default=None,
              type=click.Path(exists=True),
              help="JSON file of per-class-pair transition costs.")
@click.option("--reliability-cutoff", default=0.5, show_default=True)
@click.option("--phage-score", default=1.0, show_default=True)
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
@click.option("-f", "--overwrite", is_flag=True, default=False,
              help="Overwrite an existing output summary.")
def predict(input_path, output_dir, model_path, fsize, stride, batch,
            min_len, dustmask, dynamic_stride, dynamic_stride_threshold,
            precision, devices,
            workers, num_hosts, host_id,
            crf_switch_cost,
            crf_prior, crf_transition_matrix, reliability_cutoff,
            phage_score, no_termini,
            window_scores, prophage, sensitivity, lc, plot_type, refine,
            refine_mode, refine_min_windows, refine_merge_split,
            refine_allow_merged_contig_call, refine_contig_hedge_margin,
            getsequences, save_embedding, save_nmd,
            mask_tandem, profile, overwrite):
    """Identify phage/prophage sequences in a FASTA of contigs."""
    from jaeger_tpu.commands.predict import resolve_model_path, run_core

    model_path = resolve_model_path(model_path)

    table = run_core(
        input_path=input_path, output_dir=output_dir, model_path=model_path,
        fsize=fsize, stride=stride, batch=batch, min_len=min_len,
        dustmask=dustmask, dynamic_stride=dynamic_stride,
        dynamic_stride_threshold=dynamic_stride_threshold,
        precision=precision,
        devices=("auto" if devices == "auto" else int(devices)),
        num_hosts=num_hosts, host_id=host_id, workers=workers,
        crf_switch_cost=crf_switch_cost, crf_prior=crf_prior,
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
def predict_legacy(input_path, output_dir, model_dir, fsize, stride, batch,
                   min_len, model_name, num_res_blocks):
    """Legacy predict: bundled default WRes or v2 experimental models."""
    from jaeger_tpu.commands.predict_legacy import run_core

    table = run_core(input_path=input_path, output_dir=output_dir,
                     model_dir=model_dir, fsize=fsize, stride=stride,
                     batch=batch, min_len=min_len, model_name=model_name,
                     num_res_blocks=num_res_blocks)
    click.echo(f"summary written to {table}")


@main.command()
def health() -> None:
    """Install self-test: devices, encode path, tiny model round trip."""
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
def train(config_path, output_dir, epochs, steps_per_epoch,
          self_supervised_pretraining, generate_reliability_data,
          from_last_checkpoint, force, ignore_convergence,
          only_classification_head, only_reliability_head, only_save,
          id_threshold, synthetic_ood_threshold, synthetic_ood_multiplier):
    """Train a fragment classifier from a YAML config."""
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
    )


@main.group()
def taxonomy() -> None:
    """Experimental embedding-based taxonomy assignment."""


@taxonomy.command("build")
@click.option("-m", "--model", "model_path", required=True,
              type=click.Path(exists=True))
@click.option("-i", "--input", "fasta", required=True,
              type=click.Path(exists=True))
@click.option("--acc2taxid", required=True, type=click.Path(exists=True))
@click.option("--taxdump", "taxdump_dir", required=True,
              type=click.Path(exists=True))
@click.option("-o", "--output", "out_dir", required=True)
@click.option("--fsize", default=2000, show_default=True)
@click.option("--batch", default=256, show_default=True)
def taxonomy_build(model_path, fasta, acc2taxid, taxdump_dir, out_dir,
                   fsize, batch):
    """Build a cosine taxonomy index from reference genomes."""
    from jaeger_tpu.commands.taxonomy import build_taxdb

    _honour_platform_env()
    out = build_taxdb(model_path, fasta, acc2taxid, taxdump_dir, out_dir,
                      fsize=fsize, batch=batch)
    click.echo(f"taxonomy db written to {out}")


@taxonomy.command("predict")
@click.option("-m", "--model", "model_path", required=True,
              type=click.Path(exists=True))
@click.option("--db", "db_dir", required=True, type=click.Path(exists=True))
@click.option("-i", "--input", "fasta", required=True,
              type=click.Path(exists=True))
@click.option("-o", "--output", required=True)
@click.option("-k", default=5, show_default=True)
@click.option("--fraction", default=0.6, show_default=True)
@click.option("--fsize", default=2000, show_default=True)
@click.option("--batch", default=256, show_default=True)
def taxonomy_predict(model_path, db_dir, fasta, output, k, fraction, fsize,
                     batch):
    """Assign lineages to contigs via embedding k-NN + majority LCA."""
    from jaeger_tpu.commands.taxonomy import predict_taxonomy

    _honour_platform_env()
    out = predict_taxonomy(model_path, db_dir, fasta, output, k=k,
                           fraction=fraction, fsize=fsize, batch=batch)
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
@click.option("--stride", default=0, show_default=True)
@click.option("--one-hot", is_flag=True, default=False)
@click.option("--codon-map", default="codon_id", show_default=True)
@click.option("--compress", default="fast", show_default=True,
              type=click.Choice(["default", "none", "fast"]))
@click.option("--pad", is_flag=True, default=False,
              help="Pad all crops to the maximum length (dense arrays) "
                   "instead of ragged per-crop arrays (reference "
                   "cli.py:1193 parity — ragged is the default).")
@click.option("--balance-classes", is_flag=True, default=False)
@click.option("--shard-size", default=None, type=int,
              help="Stream output as class-balanced shards of this size.")
@click.option("--workers", default=4, show_default=True,
              help="Thread workers for shard/chunk materialization.")
def optimize_data(input_path, output_path, fmt, crop_size, stride, one_hot,
                  codon_map, compress, pad, balance_classes, shard_size,
                  workers):
    """Convert a label,sequence CSV to a preprocessed NPZ dataset."""
    from jaeger_tpu.commands.utils import optimize_data_core

    summary = optimize_data_core(
        input_path, output_path, format=fmt,
        crop_size=list(crop_size), stride=stride, one_hot=one_hot,
        codon_map=codon_map, compress=compress, pad=pad,
        balance_classes=balance_classes, shard_size=shard_size,
        workers=workers,
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
def fragment(input_path, output_path, fsize, stride, min_len, label):
    """Fragment a FASTA into fixed windows (CSV or FASTA output)."""
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
def stats(input_path):
    """Summary statistics for a prediction TSV."""
    import json

    from jaeger_tpu.commands.utils import stats_core

    click.echo(json.dumps(stats_core(input_path), indent=2, default=str))


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
@click.option("-o", "--output", "output_path", required=True)
@click.option("--method", default="dinuc", show_default=True,
              type=click.Choice(["dinuc", "kmer", "random"]))
@click.option("--kmer", default=2, show_default=True)
@click.option("--n-shuffles", default=1, show_default=True)
@click.option("--tandem-repeats", default=0, show_default=True)
@click.option("--seed", default=42, show_default=True)
@click.option("--output-format", default="csv", show_default=True,
              type=click.Choice(["csv", "fasta"]))
@click.option("--seq-col", default=1, show_default=True,
              help="CSV column holding the sequence.")
def ood_data(input_path, output_path, method, kmer, n_shuffles,
             tandem_repeats, seed, output_format, seq_col):
    """Build a shuffled-negative OOD dataset."""
    from jaeger_tpu.dataops.ood import shuffle_core

    summary = shuffle_core(input_path, output_path, method=method, kmer=kmer,
                           n_shuffles=n_shuffles,
                           tandem_repeats=tandem_repeats, seed=seed,
                           output_format=output_format, seq_col=seq_col)
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
def quantize(model_path, output_path):
    """Write an int8-weight variant of a model bundle."""
    from jaeger_tpu.models.conversion import quantize_bundle

    stats = quantize_bundle(model_path, output_path)
    click.echo(stats)


@utils.command("convert-graph")
@click.option("-m", "--model", "model_path", required=True,
              type=click.Path(exists=True))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--batch", default=96, show_default=True)
@click.option("--precision", default="bfloat16", show_default=True,
              type=click.Choice(["bfloat16", "float32"]))
def convert_graph(model_path, output_path, batch, precision):
    """Export the jitted forward pass as a portable StableHLO artifact."""
    import jax.numpy as jnp

    from jaeger_tpu.models.conversion import export_stablehlo

    _honour_platform_env()
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    out = export_stablehlo(model_path, output_path, batch=batch, dtype=dtype)
    click.echo(f"StableHLO artifact written to {out}")


@utils.command("combine-models")
@click.argument("model_paths", nargs=-1, required=True,
                type=click.Path(exists=True))
@click.option("-o", "--output", "output_path", required=True)
@click.option("--method", default="mean", show_default=True,
              type=click.Choice(["mv", "sum", "mean", "none"]))
def combine_models(model_paths, output_path, method):
    """Combine N trained model bundles into an ensemble bundle."""
    from jaeger_tpu.models.ensemble import combine_models_core

    out = combine_models_core(list(model_paths), output_path, method)
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


@main.command("register-models")
@click.argument("model_path", type=click.Path(exists=True))
@click.option("--registry", default=None, type=click.Path())
def register_models(model_path, registry):
    """Register a local model bundle in the model registry."""
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
@click.option("-d", "--dest", default="models", show_default=True)
@click.option("--registry", default=None, type=click.Path())
@click.option("--list", "list_catalog", is_flag=True, default=False,
              help="List downloadable models from the published catalog.")
def download(url, dest, registry, list_catalog):
    """Download and register a model archive (requires network access).

    With --list, query the CKAN model catalog instead (reference
    commands/downloads.py)."""
    from jaeger_tpu.utils.registry import download_models, list_model_catalog

    if list_catalog:
        try:
            for name, link in sorted(list_model_catalog().items()):
                click.echo(f"{name}\t{link}")
        except (ConnectionError, ValueError) as e:
            raise click.ClickException(str(e))
        return
    if not url:
        raise click.UsageError("provide a URL, or --list for the catalog")
    try:
        registered = download_models(url, dest, registry)
        click.echo(f"registered {len(registered)} model(s)")
    except OSError as e:
        raise click.ClickException(
            f"download failed ({e}); in sealed environments place the "
            "bundle locally and use `register-models` instead"
        )


@utils.command("dataset")
@click.option("-i", "--input", "input_path", required=True,
              type=click.Path(exists=True, dir_okay=False))
@click.option("-o", "--out-prefix", "out_prefix", required=True)
@click.option("--frag-len", default=2048, show_default=True)
@click.option("--overlap", default=1024, show_default=True)
@click.option("--trainperc", default=0.8, show_default=True)
@click.option("--valperc", default=0.1, show_default=True)
@click.option("--testperc", default=0.1, show_default=True)
@click.option("--label", default=0, show_default=True)
@click.option("--seed", default=42, show_default=True)
@click.option("--seq-col", default=None, type=int,
              help="CSV column holding the sequence (CSV input).")
@click.option("--class-col", default=None, type=int,
              help="CSV column holding the class id (CSV input; "
                   "overrides --label per row).")
@click.option("--dedupe", default="minhash", show_default=True,
              type=click.Choice(["minhash", "exact", "none"]),
              help="minhash = ANI-style MinHash clustering (mmseqs2 "
                   "equivalent); exact = endpoint signatures.")
@click.option("--dedupe-threshold", default=0.8, show_default=True,
              help="Estimated Jaccard similarity above which fragments "
                   "deduplicate (minhash mode).")
def dataset(input_path, out_prefix, frag_len, overlap, trainperc, valperc,
            testperc, label, seed, seq_col, class_col, dedupe,
            dedupe_threshold):
    """Fragment + dedupe + split genomes into train/val/test CSVs."""
    from jaeger_tpu.commands.utils import dataset_core

    summary = dataset_core(input_path, out_prefix, frag_len=frag_len,
                           overlap=overlap, trainperc=trainperc,
                           valperc=valperc, testperc=testperc, label=label,
                           seed=seed, seq_col=seq_col, class_col=class_col,
                           dedupe=(False if dedupe == "none" else dedupe),
                           dedupe_threshold=dedupe_threshold)
    click.echo(summary)


if __name__ == "__main__":
    main()
