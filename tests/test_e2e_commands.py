"""End-to-end command tests (CPU): predict + prophage + taxonomy."""

import numpy as np
import pytest
import yaml

from jaeger_tpu.models.artifacts import save_model
from jaeger_tpu.models.builder import ModelBuilder

CONFIG = {
    "model": {
        "name": "e2e_tiny",
        "seed": 3,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 8},
        "string_processor": {"crop_size": 60, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 3}},
                {"name": "masked_batchnorm", "config": {"return_nmd": True}},
                {"name": "gelu"},
            ],
            "pooling": "average",
        },
        "reliability_model": {
            "mode": "nmd",
            "hidden_layers": [{"name": "dense", "config": {"units": 1}}],
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    },
    "training": {},
}


@pytest.fixture(scope="module")
def model_bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bundle")
    b = ModelBuilder(CONFIG)
    model, variables = b.init()
    path = tmp / "model"
    save_model(variables, CONFIG, path)
    return path


def _fasta(tmp_path, rng, lengths, name="in.fasta"):
    p = tmp_path / name
    with open(p, "w") as fh:
        for i, n in enumerate(lengths):
            seq = "".join(rng.choice(list("ATGC"), size=n))
            fh.write(f">ctg{i}\n{seq}\n")
    return p


def test_predict_run_core_outputs(tmp_path, rng, model_bundle):
    from jaeger_tpu.commands.predict import run_core

    fasta = _fasta(tmp_path, rng, [1200, 800, 500])
    table = run_core(
        input_path=str(fasta), output_dir=str(tmp_path / "out"),
        model_path=str(model_bundle), fsize=400, stride=400,
        batch=16, min_len=300, scan_termini=True,
        save_window_scores=True,
    )
    import pandas as pd

    df = pd.read_table(table)
    assert len(df) == 3
    assert {"prediction", "reliability_score", "window_summary",
            "terminal_repeats"} <= set(df.columns)
    npz = np.load(tmp_path / "out" / "in_window_scores.npz",
                  allow_pickle=True)
    assert npz["predictions"].shape[0] == 3  # per-contig object arrays
    assert sum(p.shape[0] for p in npz["predictions"]) == 6


def test_predict_dynamic_stride_threshold(tmp_path, rng, model_bundle):
    """--dynamic-stride-threshold gates the even-spread windowing
    (reference seqops/io.py:38-71): a 900 bp contig at fsize 400 gets 3
    evenly spread windows under threshold 10 but the fixed-stride 2
    when the threshold excludes it."""
    import numpy as np

    from jaeger_tpu.commands.predict import run_core

    fasta = _fasta(tmp_path, rng, [900], name="dyn.fasta")

    def n_windows(outdir, threshold):
        run_core(
            input_path=str(fasta), output_dir=str(tmp_path / outdir),
            model_path=str(model_bundle), fsize=400, stride=400,
            batch=16, min_len=300, scan_termini=False,
            dynamic_stride=True, dynamic_stride_threshold=threshold,
            save_window_scores=True,
        )
        npz = np.load(tmp_path / outdir / "dyn_window_scores.npz",
                      allow_pickle=True)
        return sum(p.shape[0] for p in npz["predictions"])

    assert n_windows("out10", 10.0) == 3
    assert n_windows("out2", 2.0) == 2


def test_predict_mask_tandem(tmp_path, rng, model_bundle):
    """--mask-tandem pre-masks the input: a tandem-repeat tract is
    N-masked before windowing, the masked FASTA lands in the output dir
    and output naming stays keyed to the original stem."""
    from jaeger_tpu.commands.predict import run_core

    rep = "GATTACAGGC" * 30  # period-10 tract, well above minscore
    # keep the tract under the TSV writer's N%>0.3 drop filter
    seq = ("".join(rng.choice(list("ATGC"), size=700)) + rep
           + "".join(rng.choice(list("ATGC"), size=700)))
    fasta = tmp_path / "rep.fasta"
    fasta.write_text(f">ctg0\n{seq}\n")
    table = run_core(
        input_path=str(fasta), output_dir=str(tmp_path / "out"),
        model_path=str(model_bundle), fsize=400, stride=400,
        batch=16, min_len=300, scan_termini=False, mask_tandem=True,
    )
    assert table.name.startswith("rep_")
    masked = tmp_path / "out" / "rep_tandem_masked.fasta"
    assert masked.exists()
    from jaeger_tpu.seqops.fasta import read_fasta

    out = dict(read_fasta(str(masked)))
    assert len(out["ctg0"]) == len(seq)
    # the repeat interior is masked, the flanks are not
    assert set(out["ctg0"][750:950]) == {"N"}
    assert "N" not in out["ctg0"][:680]
    import pandas as pd

    assert len(pd.read_table(table)) == 1


def test_predict_prophage_path(tmp_path, rng, model_bundle):
    """-p path end-to-end at a small lc cutoff (segmentation + report +
    plots run; regions may be empty for a random model)."""
    from jaeger_tpu.commands.predict import run_core

    fasta = _fasta(tmp_path, rng, [6000], name="big.fasta")
    run_core(
        input_path=str(fasta), output_dir=str(tmp_path / "outp"),
        model_path=str(model_bundle), fsize=400, stride=400,
        batch=16, scan_termini=False, prophage=True, lc=3000,
        sensitivity=0.1, plot_type="linear",
    )
    pro_dir = tmp_path / "outp" / "big_prophages"
    assert pro_dir.exists()
    plots = list((pro_dir / "plots").glob("*.png"))
    assert plots  # linear plot rendered


def test_taxonomy_build_and_predict(tmp_path, rng, model_bundle):
    from jaeger_tpu.commands.taxonomy import build_taxdb, predict_taxonomy

    fasta = _fasta(tmp_path, rng, [900, 900], name="refs.fasta")
    (tmp_path / "taxdump").mkdir()
    (tmp_path / "taxdump" / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tsuperkingdom\t|\n"
        "3\t|\t2\t|\tspecies\t|\n"
    )
    (tmp_path / "taxdump" / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
        "3\t|\tE.coli\t|\t\t|\tscientific name\t|\n"
    )
    (tmp_path / "acc2taxid.tsv").write_text("ctg0\t3\nctg1\t3\n")
    db = build_taxdb(
        str(model_bundle), str(fasta), str(tmp_path / "acc2taxid.tsv"),
        str(tmp_path / "taxdump"), str(tmp_path / "db"),
        fsize=400, batch=8,
    )
    out = predict_taxonomy(
        str(model_bundle), str(db), str(fasta),
        str(tmp_path / "tax.tsv"), fsize=400, batch=8,
    )
    import pandas as pd

    df = pd.read_table(out)
    assert len(df) == 2
    # self-query: every contig maps into the indexed lineage
    assert set(df["name"]) <= {"E.coli", "Bacteria", "root"}


def test_predict_legacy_bundled(tmp_path):
    """Legacy predict with the bundled production model (pytest-level)."""
    from pathlib import Path

    import pandas as pd

    from jaeger_tpu.commands.predict_legacy import DEFAULT_MODEL_DIR, run_core

    if not (DEFAULT_MODEL_DIR / "WRes_1024.h5").exists():
        import pytest

        pytest.skip("bundled default model unavailable")
    fasta = Path(__file__).resolve().parent.parent / (
        "jaeger_tpu/data/test/test_contigs.fasta"
    )
    table = run_core(str(fasta), str(tmp_path / "out"), batch=64)
    df = pd.read_table(table)
    assert len(df) == 9
    assert set(df["prediction"]) <= {
        "bacteria", "phage", "eukarya", "archaea"
    }
    assert df["reliability_score"].between(0, 1).all()


def test_resolve_model_path(tmp_path):
    from jaeger_tpu.commands.predict import (
        BUNDLED_DEMO_MODEL, resolve_model_path,
    )

    assert resolve_model_path(None) == str(BUNDLED_DEMO_MODEL)
    assert resolve_model_path(str(tmp_path)) == str(tmp_path)
    import pytest

    with pytest.raises(FileNotFoundError):
        resolve_model_path("no_such_model_name")


def test_predict_overwrite_guard(tmp_path, rng, model_bundle):
    """Second run into the same output dir refuses without overwrite
    (reference commands/predict.py:574-577)."""
    import pytest

    from jaeger_tpu.commands.predict import run_core

    fasta = _fasta(tmp_path, rng, [600], name="ow.fasta")
    kwargs = dict(input_path=str(fasta), output_dir=str(tmp_path / "o"),
                  model_path=str(model_bundle), fsize=400, stride=400,
                  batch=8, scan_termini=False)
    run_core(**kwargs)
    with pytest.raises(SystemExit):
        run_core(**kwargs)
    run_core(**kwargs, overwrite=True)


def test_predict_gzip_matches_plain(tmp_path, rng, model_bundle):
    """Gzipped FASTA input: same predictions, clean output stem."""
    import gzip

    import pandas as pd

    from jaeger_tpu.commands.predict import run_core

    fasta = _fasta(tmp_path, rng, [900, 600], name="gz.fasta")
    gz = tmp_path / "gz.fasta.gz"
    gz.write_bytes(gzip.compress(fasta.read_bytes()))

    t1 = run_core(input_path=str(fasta), output_dir=str(tmp_path / "a"),
                  model_path=str(model_bundle), fsize=400, stride=400,
                  batch=8, scan_termini=False)
    t2 = run_core(input_path=str(gz), output_dir=str(tmp_path / "b"),
                  model_path=str(model_bundle), fsize=400, stride=400,
                  batch=8, scan_termini=False)
    assert t2.name == "gz_default_jaeger.tsv"  # .fasta.gz fully stripped
    a = pd.read_table(t1).drop(columns=["terminal_repeats"], errors="ignore")
    b = pd.read_table(t2).drop(columns=["terminal_repeats"], errors="ignore")
    pd.testing.assert_frame_equal(a, b)


def test_predict_mesh_auto_matches_single_device(tmp_path, rng,
                                                 model_bundle):
    """`jaeger predict` auto-constructs a data mesh over all local
    devices (8 virtual CPU devices here); the TSV must be byte-identical
    to a single-device run, on both the device-reduced default path and
    the full-logit (CRF) path. Reference behavior parity:
    commands/predict.py:656-664 strategy auto-selection."""
    import jax

    from jaeger_tpu.commands.predict import run_core

    assert len(jax.devices()) == 8  # conftest virtual mesh
    fasta = _fasta(tmp_path, rng, [1200, 800, 500, 950, 410], name="dp.fasta")

    kwargs = dict(model_path=str(model_bundle), fsize=400, stride=400,
                  batch=16, min_len=300, scan_termini=False)
    t_single = run_core(input_path=str(fasta),
                        output_dir=str(tmp_path / "one"),
                        devices=1, **kwargs)
    for width in (2, 4, 8):
        t_mesh = run_core(input_path=str(fasta),
                          output_dir=str(tmp_path / f"mesh{width}"),
                          devices=width, **kwargs)
        assert t_single.read_bytes() == t_mesh.read_bytes(), width

    # full-logit path (CRF forces it)
    t_single_f = run_core(input_path=str(fasta),
                          output_dir=str(tmp_path / "onef"),
                          devices=1, crf_switch_cost=0.5, **kwargs)
    t_mesh_f = run_core(input_path=str(fasta),
                        output_dir=str(tmp_path / "meshf"),
                        devices="auto", crf_switch_cost=0.5, **kwargs)
    assert t_single_f.read_bytes() == t_mesh_f.read_bytes()


def test_multihost_predict_cli_two_processes(tmp_path, rng, model_bundle):
    """The --num-hosts/--host-id product path: two REAL CLI processes
    run concurrently on the same FASTA, each writes its shard, the last
    to finish merges — rows identical to a single-host run."""
    import os
    import subprocess
    import sys

    import pandas as pd

    from jaeger_tpu.commands.predict import run_core
    from jaeger_tpu.parallel.multihost import contig_owner

    fasta = _fasta(tmp_path, rng, [900, 700, 650, 1200, 480, 820],
                   name="mh2.fasta")
    owners = {contig_owner(f"ctg{i}", 2) for i in range(6)}
    assert owners == {0, 1}  # both hosts own contigs

    single = run_core(input_path=str(fasta), output_dir=str(tmp_path / "s"),
                      model_path=str(model_bundle), fsize=400, stride=400,
                      min_len=400, batch=8, scan_termini=False, devices=1)

    out = tmp_path / "m"
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": "/root/repo"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "jaeger_tpu.cli", "predict",
             "-i", str(fasta), "-o", str(out),
             "-m", str(model_bundle), "--fsize", "400", "--stride", "400",
             "--min-len", "400",
             "--batch", "8", "--no-termini", "--devices", "1",
             "--num-hosts", "2", "--host-id", str(h)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for h in range(2)
    ]
    logs = [p.communicate()[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), logs

    merged = out / "mh2_default_jaeger.tsv"
    assert merged.exists(), logs
    assert not list(out.glob("*.shard*"))  # shards cleaned up

    a = pd.read_table(single).sort_values("contig_id").reset_index(drop=True)
    b = pd.read_table(merged).sort_values("contig_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sharded_predict_matches_single(tmp_path, rng, model_bundle):
    """Two-host contig-sharded predict (the slurm recipe flow) merges to
    the same rows as a single-host run."""
    import shutil

    import pandas as pd

    from jaeger_tpu.commands.predict import run_core
    from jaeger_tpu.parallel.multihost import (
        filter_contigs_for_host, merge_output_shards, shard_path,
    )
    from jaeger_tpu.seqops.fasta import read_fasta, write_fasta

    fasta = _fasta(tmp_path, rng, [900, 700, 650, 1200], name="mh.fasta")
    single = run_core(input_path=str(fasta), output_dir=str(tmp_path / "s"),
                      model_path=str(model_bundle), fsize=400, stride=400,
                      batch=8, scan_termini=False)

    n_hosts = 2
    base = tmp_path / "m" / "mh_default_jaeger.tsv"
    (tmp_path / "m").mkdir()
    for host in range(n_hosts):
        part = tmp_path / f"part{host}.fasta"
        records = list(
            filter_contigs_for_host(read_fasta(fasta), host, n_hosts))
        if not records:
            continue  # a host may own no contigs; merge skips its shard
        write_fasta(records, part)
        out = run_core(input_path=str(part),
                       output_dir=str(tmp_path / f"h{host}"),
                       model_path=str(model_bundle), fsize=400, stride=400,
                       batch=8, scan_termini=False)
        shutil.copy(out, shard_path(base, host))
    merged = merge_output_shards(base, n_hosts)

    a = pd.read_table(single).sort_values("contig_id").reset_index(drop=True)
    b = pd.read_table(merged).sort_values("contig_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_refinement_all_abstain_falls_back_to_unrefined(tmp_path, rng,
                                                        model_bundle):
    """Taus that abstain every window used to produce an EMPTY refined
    aggregate whose missing call columns crashed the summary merge (the
    reference has the same fragility); ours now falls back to the
    unrefined table with a warning."""
    import numpy as np

    from jaeger_tpu.commands.predict import _build_refined_contig_df

    harsh = {c: {"logit": 1e9, "margin": 1e9, "n": 10}
             for c in ["phage", "virus", "archaea", "bacteria",
                       "plasmid", "eukarya"]}
    data_full = {
        "headers": ["c1", "c2"],
        "predictions": [np.asarray(rng.normal(size=(5, 6)), np.float32),
                        np.asarray(rng.normal(size=(4, 6)), np.float32)],
    }
    assert _build_refined_contig_df(data_full, harsh) is None
