"""Data-prep scripts exercised end-to-end (live parity where comparable).

Reference ships unit tests for its data-prep scripts
(``tests/unit/test_{merge_npz_for_variable_length,prepare_length_csvs,
create_variable_length_config}.py``); this pins ours to the same
contracts and runs ``filter_csv_by_ns`` byte-for-byte against the LIVE
reference script on the same input. ``merge_npz``/``class_distribution``
operate on our converter's NPZ layout (different from the reference's
``features`` key by design), so those assert the behavioral contract.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
REF_SCRIPTS = Path("/root/reference/scripts")


def _load(path: Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(mod, argv: list[str], capsys=None):
    old = sys.argv
    sys.argv = argv
    try:
        return mod.main()
    finally:
        sys.argv = old


def test_filter_csv_by_ns_matches_live_reference(tmp_path, rng):
    csv = tmp_path / "in.csv"
    rows = ["label,sequence,id\n"]  # header passes through verbatim
    for i in range(60):
        seq = "".join(rng.choice(list("ACGTN"),
                                 p=[0.22, 0.22, 0.22, 0.22, 0.12],
                                 size=120))
        rows.append(f"{i % 3},{seq},frag{i}\n")
    rows.append("not-a-label,ACGT\n")
    csv.write_text("".join(rows))

    ours = _load(SCRIPTS / "filter_csv_by_ns.py", "our_filter")
    ref = _load(REF_SCRIPTS / "filter_csv_by_ns.py", "ref_filter")
    for max_run in (3, 5, 8):
        a, b = tmp_path / f"ours_{max_run}.csv", tmp_path / f"ref_{max_run}.csv"
        _run_main(ours, ["x", str(csv), "-o", str(a),
                         "--max-run", str(max_run)])
        _run_main(ref, ["x", str(csv), "-o", str(b),
                        "--max-run", str(max_run)])
        assert a.read_bytes() == b.read_bytes(), f"max_run={max_run}"
    # default thresholds agree too
    a, b = tmp_path / "ours_d.csv", tmp_path / "ref_d.csv"
    _run_main(ours, ["x", str(csv), "-o", str(a)])
    _run_main(ref, ["x", str(csv), "-o", str(b)])
    assert a.read_bytes() == b.read_bytes()


def test_merge_npz_for_variable_length(tmp_path, rng):
    """Per-length converter NPZs merge into one mixed dense NPZ padded
    to the longest crop, loadable by the training loader."""
    from jaeger_tpu.dataops.convert import convert_dataset

    csvs = []
    for li, L in enumerate((200, 400)):
        csv = tmp_path / f"in_{L}.csv"
        with open(csv, "w") as fh:
            for i in range(12):
                seq = "".join(rng.choice(list("ACGT"), size=L))
                fh.write(f"{i % 3},{seq}\n")
        convert_dataset(str(csv), str(tmp_path / f"d_{L}.npz"),
                        format="translated", crop_size=L, pad=True)
        csvs.append(L)

    mod = _load(SCRIPTS / "merge_npz_for_variable_length.py", "our_merge")
    out = tmp_path / "mixed.npz"
    _run_main(mod, ["x", "--inputs", str(tmp_path / "d_200.npz"),
                    str(tmp_path / "d_400.npz"), "--output", str(out)])
    data = np.load(out, allow_pickle=True)
    assert data["labels"].shape[0] == 24
    assert data["translated"].shape[0] == 24
    # padded to the longest crop's frame length
    d400 = np.load(tmp_path / "d_400.npz", allow_pickle=True)
    assert data["translated"].shape[-1] == d400["translated"].shape[-1]
    # short-crop rows are zero-padded beyond their translated length
    tl = data["translated_lengths"]
    short = np.where(tl < tl.max())[0]
    assert short.size and np.all(
        data["translated"][short[0], :, tl[short[0]]:] == 0)

    from jaeger_tpu.train.data import batches_from_npz

    batch = next(iter(batches_from_npz(str(out), batch_size=8,
                                       num_classes=3)))
    assert batch["translated"].shape[0] == 8


def test_create_variable_length_config(tmp_path):
    base = {
        "model": {
            "name": "m", "experiment": "exp",
            "string_processor": {"crop_size": 500, "crop_units": "codon"},
        },
        "training": {"batch_size": 32},
    }
    base_p = tmp_path / "base.yaml"
    base_p.write_text(yaml.safe_dump(base))
    mod = _load(SCRIPTS / "create_variable_length_config.py", "our_cvlc")
    out_p = tmp_path / "var.yaml"
    _run_main(mod, ["x", "--base-config", str(base_p), "--output",
                    str(out_p), "--crop-sizes", "160", "331", "498",
                    "--crop-mode", "sample"])
    cfg = yaml.safe_load(out_p.read_text())
    sp = cfg["model"]["string_processor"]
    assert sp["crop_sizes"] == [160, 331, 498]
    assert sp["crop_size"] is None  # dynamic: builder uses max(crop_sizes)
    assert cfg["training"]["crop_mode"] == "sample"
    assert cfg["model"]["experiment"].endswith("variable")

    # the derived config must build
    from jaeger_tpu.models.builder import ModelBuilder

    cfg["model"].setdefault("classifier_out_dim", 3)
    cfg["model"].setdefault("embedding", {"use_embedding_layer": True,
                                          "input_type": "translated",
                                          "embedding_size": 4})
    cfg["model"].setdefault("representation_learner", {
        "hidden_layers": [{"name": "masked_conv1d",
                           "config": {"filters": 4, "kernel_size": 3}}],
        "pooling": "average"})
    cfg["model"].setdefault("classifier", {
        "hidden_layers": [{"name": "dense", "config": {"units": 3}}]})
    ModelBuilder(cfg).init(batch=1)


def test_prepare_length_csvs(tmp_path, rng):
    fasta = tmp_path / "g.fasta"
    tsv = tmp_path / "labels.tsv"
    with open(fasta, "w") as fh, open(tsv, "w") as lt:
        for i in range(20):
            L = int(rng.integers(600, 2500))
            seq = "".join(rng.choice(list("ACGT"), size=L))
            fh.write(f">rec{i}\n{seq}\n")
            cls = ["chromosome", "virus", "plasmid"][i % 3]
            lt.write(f"rec{i}\t{cls}\n")
    mod = _load(SCRIPTS / "prepare_length_csvs.py", "our_plc")
    out_dir = tmp_path / "csvs"
    _run_main(mod, ["x", "--fasta", str(fasta), "--tsv", str(tsv),
                    "--out-dir", str(out_dir), "--lengths", "500", "1000",
                    "--label-column", "1", "--val-frac", "0.2",
                    "--seed", "3"])
    for L in (500, 1000):
        train = (out_dir / f"train_{L}.csv").read_text().splitlines()
        val = (out_dir / f"val_{L}.csv").read_text().splitlines()
        assert train and val
        for row in train + val:
            label, seq = row.split(",", 1)
            assert int(label) in (0, 1, 2)
            assert len(seq) == L  # length-L prefixes only
    # longer length keeps fewer records (short ones dropped)
    n500 = sum(len((out_dir / f"{s}_500.csv").read_text().splitlines())
               for s in ("train", "val"))
    n1000 = sum(len((out_dir / f"{s}_1000.csv").read_text().splitlines())
                for s in ("train", "val"))
    assert n1000 <= n500 == 20


def test_class_distribution(tmp_path, rng, capsys):
    from jaeger_tpu.dataops.convert import convert_dataset

    csv = tmp_path / "in.csv"
    with open(csv, "w") as fh:
        for i in range(30):
            seq = "".join(rng.choice(list("ACGT"), size=300))
            fh.write(f"{i % 3},{seq}\n")
    convert_dataset(str(csv), str(tmp_path / "d.npz"),
                    format="translated", crop_size=300)
    mod = _load(SCRIPTS / "class_distribution.py", "our_cd")
    counts = mod.label_counts(tmp_path / "d.npz")
    assert counts == {0: 10, 1: 10, 2: 10}
    _run_main(mod, ["x", str(tmp_path / "d.npz")])
    out = capsys.readouterr().out
    assert "10" in out and "33.3" in out
