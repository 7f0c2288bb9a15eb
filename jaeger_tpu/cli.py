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
              type=click.Path(exists=True))
@click.option("-o", "--output", "output_dir", required=True, type=click.Path())
@click.option("-m", "--model", "model_path", required=True,
              type=click.Path(exists=True),
              help="Path to a jaeger-tpu model bundle directory.")
@click.option("--fsize", default=2000, show_default=True)
@click.option("--stride", default=2000, show_default=True)
@click.option("--batch", default=96, show_default=True)
@click.option("--min-len", "min_len", default=None, type=int)
@click.option("--dustmask/--no-dustmask", default=True, show_default=True)
@click.option("--dynamic-stride", is_flag=True, default=False)
@click.option("--precision", default="bfloat16", show_default=True,
              type=click.Choice(["bfloat16", "float32", "bf16", "fp32"]))
@click.option("--crf-switch-cost", default=None, type=float,
              help="Enable CRF (Viterbi) window smoothing with this cost.")
@click.option("--crf-prior", default="biological", show_default=True,
              type=click.Choice(["biological", "uniform"]))
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
def predict(input_path, output_dir, model_path, fsize, stride, batch,
            min_len, dustmask, dynamic_stride, precision, crf_switch_cost,
            crf_prior, reliability_cutoff, phage_score, no_termini,
            window_scores, prophage, sensitivity, lc, plot_type):
    """Identify phage/prophage sequences in a FASTA of contigs."""
    from jaeger_tpu.commands.predict import run_core

    table = run_core(
        input_path=input_path, output_dir=output_dir, model_path=model_path,
        fsize=fsize, stride=stride, batch=batch, min_len=min_len,
        dustmask=dustmask, dynamic_stride=dynamic_stride, precision=precision,
        crf_switch_cost=crf_switch_cost, crf_prior=crf_prior,
        reliability_cutoff=reliability_cutoff, phage_score=phage_score,
        scan_termini=not no_termini, save_window_scores=window_scores,
        prophage=prophage, sensitivity=sensitivity, lc=lc,
        plot_type=plot_type,
    )
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
@click.option("--steps-per-epoch", default=None, type=int)
def train(config_path, output_dir, epochs, steps_per_epoch):
    """Train a fragment classifier from a YAML config."""
    from jaeger_tpu.commands.train import train_fragment_core

    train_fragment_core(
        config_path=config_path, output_dir=output_dir,
        epochs_override=epochs, steps_override=steps_per_epoch,
    )


if __name__ == "__main__":
    main()
