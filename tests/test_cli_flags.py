"""Behavior of the reference-parity CLI flags (wiring, not models).

Covers the dispatch logic added for reference surface parity: legacy
model-name routing from `predict`, --crf gating of the switch cost,
--rc/--pc threshold passing, --quantized/--int8 bundle resolution,
--onnx rejection, and the --mixed_precision deprecation path.
"""

from __future__ import annotations

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from jaeger_tpu import cli as cli_mod


@pytest.fixture
def fasta(tmp_path, rng):
    p = tmp_path / "in.fasta"
    seq = "".join(rng.choice(list("ACGT"), size=4200))
    p.write_text(f">c1\n{seq}\n")
    return p


def _capture(monkeypatch, module, name):
    calls = []

    def fake(**kwargs):
        calls.append(kwargs)
        return module and None or None

    monkeypatch.setattr(module, name, lambda **kw: calls.append(kw) or "out.tsv")
    return calls


def test_predict_routes_legacy_models(monkeypatch, fasta, tmp_path):
    from jaeger_tpu.commands import predict_legacy as pl

    calls = []
    monkeypatch.setattr(pl, "run_core",
                        lambda **kw: calls.append(kw) or "legacy.tsv")
    r = CliRunner().invoke(cli_mod.main, [
        "predict", "-i", str(fasta), "-o", str(tmp_path / "o"),
        "-m", "default", "--getalllabels", "--pc", "2.5", "--rc", "0.2",
    ])
    assert r.exit_code == 0, r.output
    assert "legacy prediction workflow" in r.output
    (kw,) = calls
    assert kw["model_name"] == "default"
    assert kw["getalllabels"] is True
    assert kw["phage_score"] == 2.5
    assert kw["reliability_cutoff"] == 0.2
    # reference defaults flow through
    assert kw["fsize"] == 2000 and kw["stride"] == 1500


def test_predict_crf_flag_gates_switch_cost(monkeypatch, fasta, tmp_path):
    from jaeger_tpu.commands import predict as pred

    calls = []
    monkeypatch.setattr(pred, "run_core",
                        lambda **kw: calls.append(kw) or "t.tsv")
    monkeypatch.setattr(pred, "resolve_model_path",
                        lambda m, registry_path=None: "/fake")
    base = ["predict", "-i", str(fasta), "-o", str(tmp_path / "o")]
    assert CliRunner().invoke(cli_mod.main, base).exit_code == 0
    assert calls[-1]["crf_switch_cost"] is None  # no --crf: disabled
    assert CliRunner().invoke(
        cli_mod.main, base + ["--crf"]).exit_code == 0
    assert calls[-1]["crf_switch_cost"] == 2.0  # reference default
    assert CliRunner().invoke(
        cli_mod.main, base + ["--crf", "--crf-switch-cost", "3.5"],
    ).exit_code == 0
    assert calls[-1]["crf_switch_cost"] == 3.5
    # reference rc/pc defaults reach run_core
    assert calls[-1]["reliability_cutoff"] == 0.1
    assert calls[-1]["phage_score"] == 3.0


def test_predict_onnx_rejected(fasta, tmp_path):
    r = CliRunner().invoke(cli_mod.main, [
        "predict", "-i", str(fasta), "-o", str(tmp_path / "o"), "--onnx",
    ])
    assert r.exit_code != 0
    assert "single XLA path" in r.output


def test_quantize_modes_and_int8_predict_flag(tmp_path, rng, monkeypatch):
    """utils quantize --mode {dynamic,float16} writes loadable bundles;
    predict --int8 resolves the sibling _int8 bundle."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "tmc", Path(__file__).with_name("test_modern_convert.py"))
    tmc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tmc)

    from jaeger_tpu.models.artifacts import load_model, save_model
    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.conversion import quantize_bundle

    b = ModelBuilder(tmc.CONFIG)
    model, variables = b.init()
    bundle = tmp_path / "m"
    save_model(variables, tmc.CONFIG, bundle)

    stats = quantize_bundle(bundle, tmp_path / "m_int8", mode="dynamic")
    assert (tmp_path / "m_int8" / "params_int8.msgpack").exists()
    # tiny test kernels sit under the quantization size gate; the
    # int8 bundle must still load transparently
    _ = load_model(tmp_path / "m_int8")

    hstats = quantize_bundle(bundle, tmp_path / "m_bf16", mode="float16")
    assert hstats["ratio"] > 1.5
    _, hvars, _, _ = load_model(tmp_path / "m_bf16")
    leaf = next(iter(
        hvars["params"]["classifier"].values()))["kernel"]
    assert np.asarray(leaf).dtype.name == "bfloat16"

    # --int8 resolution: bundle itself, sibling, then a clear error
    assert cli_mod._resolve_int8_bundle(str(bundle)) == str(
        tmp_path / "m_int8")
    assert cli_mod._resolve_int8_bundle(
        str(tmp_path / "m_int8")) == str(tmp_path / "m_int8")
    import click
    with pytest.raises(click.UsageError, match="utils quantize"):
        cli_mod._resolve_int8_bundle(str(tmp_path / "nowhere"))


def test_train_mixed_precision_deprecation(monkeypatch, tmp_path):
    from jaeger_tpu.commands import train as train_mod

    calls = []
    monkeypatch.setattr(train_mod, "train_fragment_core",
                        lambda **kw: calls.append(kw) or {})
    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.safe_dump({"model": {}, "training": {}}))
    r = CliRunner().invoke(cli_mod.main, [
        "train", "-c", str(cfg), "--mixed_precision",
    ])
    assert r.exit_code == 0, r.output
    assert "deprecated" in r.output
    assert calls[0]["precision"] == "fp16"


def test_fragment_reference_mode_dispatches_to_split(tmp_path, fasta):
    r = CliRunner().invoke(cli_mod.main, [
        "utils", "fragment", "-i", str(fasta),
        "-o", str(tmp_path / "f.fasta"),
        "--minlen", "500", "--maxlen", "900",
    ])
    assert r.exit_code == 0, r.output
    from jaeger_tpu.seqops.fasta import read_fasta

    lens = [len(s) for _, s in read_fasta(str(tmp_path / "f.fasta"))]
    assert lens and all(500 <= n <= 900 for n in lens)
    # both flags required together
    r2 = CliRunner().invoke(cli_mod.main, [
        "utils", "fragment", "-i", str(fasta),
        "-o", str(tmp_path / "g.fasta"), "--minlen", "500",
    ])
    assert r2.exit_code != 0


def test_dataset_aai_method_and_fasta_output(tmp_path, rng):
    fa = tmp_path / "g.fasta"
    with open(fa, "w") as fh:
        for i in range(3):
            seq = "".join(rng.choice(list("ACGT"), size=5000))
            fh.write(f">g{i}\n{seq}\n")
    r = CliRunner().invoke(cli_mod.main, [
        "utils", "dataset", "-i", str(fa),
        "-o", str(tmp_path / "ds"), "--class", "1",
        "--method", "AAI", "--outtype", "FASTA", "--fraglen", "1024",
    ])
    assert r.exit_code == 0, r.output
    train = (tmp_path / "ds_train.fasta").read_text()
    assert train.startswith(">train_0_class_1")
