"""Sequence-sharded Hyena as a PRODUCT path: `predict --seq-shard N`
runs a full-contig Hyena model with its long convolutions length-sharded
over the mesh (parallel/hyena_sp ppermute ring) and writes TSVs
byte-identical to --seq-shard 1 (round-2 verdict item 2).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jaeger_tpu.models.artifacts import save_model
from jaeger_tpu.models.builder import ModelBuilder

#: a "full-contig" style model: Hyena long-convolution stack over the
#: whole window (crop 83 codons -> L=83, NOT divisible by 2/4/8 so the
#: chunk-padding path is exercised)
CFG = {
    "model": {
        "name": "hyena_seq",
        "seed": 3,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 16},
        "string_processor": {"crop_size": 83, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 16, "kernel_size": 3,
                            "padding": "same"}},
                {"name": "gelu"},
                {"name": "hyena_block",
                 "config": {"dim": 16, "order": 2, "filter_hidden": 8,
                            "filter_layers": 2, "dropout": 0.0}},
            ],
            "pooling": "average",
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    },
    "training": {},
}


@pytest.fixture(scope="module")
def hyena_bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hyseq")
    b = ModelBuilder(CFG)
    model, variables = b.init()
    path = tmp / "model"
    save_model(variables, CFG, path)
    return path


@pytest.fixture(scope="module")
def fasta(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hyseq_data")
    rng = np.random.default_rng(11)
    path = tmp / "contigs.fasta"
    with path.open("w") as fh:
        for i, ln in enumerate([900, 720, 505, 300]):
            seq = "".join(rng.choice(list("ACGT"), size=ln))
            fh.write(f">hy_contig_{i}\n{seq}\n")
    return path


def _predict(bundle, fasta, out, seq_shard):
    from jaeger_tpu.commands.predict import run_core

    return run_core(
        input_path=str(fasta), output_dir=str(out),
        model_path=str(bundle), fsize=300, stride=300, min_len=300,
        batch=16, precision="float32", seq_shard=seq_shard,
        scan_termini=False, overwrite=True,
    )


def test_seq_shard_tsv_byte_identical(hyena_bundle, fasta, tmp_path):
    base = _predict(hyena_bundle, fasta, tmp_path / "w1", 1).read_bytes()
    for width in (2, 4, 8):
        tsv = _predict(hyena_bundle, fasta, tmp_path / f"w{width}", width)
        assert tsv.read_bytes() == base, f"width {width} diverged"


def test_seq_shard_from_cli(hyena_bundle, fasta, tmp_path):
    """The flag is reachable from the real click surface."""
    from click.testing import CliRunner

    from jaeger_tpu import cli as cli_mod

    res = CliRunner().invoke(
        cli_mod.main,
        ["predict", "-i", str(fasta), "-o", str(tmp_path / "cli"),
         "-m", str(hyena_bundle), "--fsize", "300", "--stride", "300",
         "--min-len", "300", "--seq-shard", "2", "--no-termini",
         "--precision", "float32"])
    assert res.exit_code == 0, res.output
    ref = _predict(hyena_bundle, fasta, tmp_path / "plain", 1)
    got = next((tmp_path / "cli").glob("*_default_jaeger.tsv"))
    assert got.read_bytes() == ref.read_bytes()


def test_seq_shard_model_outputs_match_unsharded(hyena_bundle):
    """Logit-level parity of the rebuilt (parallel.seq_axis) model under
    jax.set_mesh vs the plain model, same params."""
    import copy

    from jax.sharding import Mesh

    from jaeger_tpu.models.artifacts import load_model

    model, variables, config, _ = load_model(hyena_bundle,
                                             dtype=jnp.float32)
    rng = np.random.default_rng(5)
    crop_nt = 3 * 83 + 5
    inputs = {
        "bases": rng.integers(0, 4, size=(4, crop_nt)).astype(np.uint8),
        "lengths": np.full((4,), crop_nt, np.int32),
    }
    ref = np.asarray(
        model.apply(variables, inputs, train=False)["prediction"])

    cfg2 = copy.deepcopy(config)
    cfg2["model"].setdefault("parallel", {})["seq_axis"] = "seq"
    smodel = ModelBuilder(cfg2, dtype=jnp.float32).build()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(
            lambda v, i: smodel.apply(v, i, train=False)["prediction"]
        )(variables, inputs))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
