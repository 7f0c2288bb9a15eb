"""THE acceptance test: the complete reference ``predict`` pipeline
runs LIVE in this image (real DynamicModelBuilder SavedModel, real
tf.data windowing+encode, real InferModel, real collect/TSV writer —
only pyfastx/pydustmasker/parasail are stubbed with our byte-exact
equivalents) and our ``predict`` on the SAME weights, converted with
``convert_modern_weights``, must produce a **byte-identical TSV** on
the reference's own ``test_contigs.fasta``.

Covers the full-window path and the ``min_len < fsize`` two-pass
short-window path (reference ``commands/predict.py:771-816``).
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import refstubs  # noqa: E402

refstubs.install()

tf = pytest.importorskip("tensorflow")
jaeger_ref_builder = pytest.importorskip("jaeger.nnlib.builder")

FASTA = Path("/root/reference/src/jaeger/data/test/test_contigs.fasta")
pytestmark = pytest.mark.skipif(not FASTA.exists(),
                                reason="reference tree unavailable")


def _reference_config(out_dir: Path) -> dict:
    return {
        "model": {
            "name": "e2etest", "seed": 7, "classifier_out_dim": 3,
            "activation": "gelu", "mode": "inference",
            "reliability_out_dim": 1,
            "class_label_map": [
                {"class": "bacteria", "label": 0},
                {"class": "phage", "label": 1},
                {"class": "plasmid", "label": 2},
            ],
            "embedding": {
                "use_embedding_layer": True, "input_type": "translated",
                "strands": 2, "frames": 6, "length": None,
                "input_shape": [6, None], "embedding_size": 8,
            },
            "string_processor": {
                "crop_size": 165, "crop_units": "codon",
                "seq_onehot": False, "codon": "CODON",
                "codon_id": "CODON_ID",
            },
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 8, "kernel_size": 3}},
                    {"name": "masked_batchnorm",
                     "config": {"return_nmd": True}},
                    {"name": "activation", "config": {"activation": "gelu"}},
                    {"name": "residual_block",
                     "config": {"block_size": 2, "filters": 8,
                                "kernel_size": 3, "dilation_rate": 2,
                                "norm_type": "masked_batchnorm"}},
                ],
                "pooling": "max",
            },
            "classifier": {
                "input_shape": 8,
                "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
            },
            "reliability_model": {
                "mode": "nmd",
                "hidden_layers": [{"name": "dense", "config": {"units": 1}}],
            },
        },
        "training": {
            "classifier_dir": str(out_dir / "ck" / "classifier"),
            "reliability_dir": str(out_dir / "ck" / "reliability"),
            "model_saving": {
                "path": str(out_dir / "model"),
                "save_weights": True, "save_exec_graph": True,
                "save_embedding_graph": False,
            },
        },
        "force": True,
    }


#: representation-learner stack exercising the attention/long-context
#: families end-to-end (each is weight-conversion golden-pinned in
#: test_modern_convert_real.py; here the FULL predict pipeline runs them)
_RICH_LAYERS = [
    {"name": "masked_conv1d", "config": {"filters": 8, "kernel_size": 3}},
    {"name": "masked_batchnorm", "config": {"return_nmd": True}},
    {"name": "transformer_encoder",
     "config": {"embed_dim": 8, "num_heads": 2, "feed_forward_dim": 16,
                "dropout_rate": 0.0}},
    {"name": "hyena_block",
     "config": {"dim": 8, "order": 2, "filter_hidden": 8,
                "filter_layers": 2, "dropout": 0.0}},
    {"name": "masked_bilstm",
     "config": {"units": 4, "return_sequences": True}},
]


def _build_artifact(tmp_path_factory, cfg_patch=None, name="e2etest"):
    import yaml

    out_dir = tmp_path_factory.mktemp(f"e2e_live_{name}")
    cfg = _reference_config(out_dir)
    cfg["model"]["name"] = name
    if cfg_patch:
        cfg["model"].update(cfg_patch)
    cfg_path = out_dir / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    cfg["config_path"] = str(cfg_path)

    b = jaeger_ref_builder.DynamicModelBuilder(cfg)
    with contextlib.redirect_stdout(io.StringIO()):
        models = b.build_fragment_classifier()
    jm = models["jaeger_model"]
    rng = np.random.default_rng(0)
    for w in jm.weights:
        if "variance" in w.path:
            vals = rng.uniform(0.5, 1.5, size=w.shape)
        else:
            vals = rng.uniform(-0.4, 0.4, size=w.shape)
        w.assign(vals.astype("float32"))
    b.save_model(jm)
    return out_dir / "model"


@pytest.fixture(scope="module")
def reference_artifact(tmp_path_factory):
    """Build + randomize + save a real modern artifact via the
    reference builder; returns the model directory."""
    return _build_artifact(tmp_path_factory)


@pytest.fixture(scope="module")
def reference_artifact_rich(tmp_path_factory):
    """Same, with a transformer+Hyena+BiLSTM representation learner."""
    return _build_artifact(
        tmp_path_factory,
        cfg_patch={"representation_learner": {
            "hidden_layers": _RICH_LAYERS, "pooling": "max"}},
        name="e2erich",
    )


def _run_reference_predict(model_dir: Path, out_dir: Path,
                           min_len: int, crf: bool = False,
                           fasta: Path = FASTA) -> Path:
    import jaeger.commands.predict as ref_predict

    ref_predict.version = lambda *_: "0.0.0-live"
    ref_predict.run_core(
        model_path=str(model_dir), config=None, input=str(fasta),
        output=str(out_dir), fsize=500, stride=500, min_len=min_len,
        batch=96, workers=2, mem=4, verbose=1,
        cpu=True, xla=False, onnx=False, int8=False, quantized=False,
        overwrite=True, getsequences=False, getalllabels=False,
        window_scores=False, save_embedding=False, save_nmd=False,
        prophage=False, sensitivity=0.5, plot_type=None,
        crf=crf, crf_prior="biological", crf_switch_cost=3.0,
        crf_transition_matrix=None,
        refine=False, refine_mode="gated", refine_min_windows=2,
        refine_merge_split=False, refine_contig_hedge_margin=0.0,
        lc=None, pc=None, rc=None, dynamic_stride=False, dustmask=True,
    )
    tsvs = list(out_dir.glob(f"*/{fasta.stem}.tsv"))
    assert len(tsvs) == 1
    return tsvs[0]


def _run_our_predict(model_dir: Path, out_dir: Path, min_len: int,
                     crf: bool = False, fasta: Path = FASTA) -> Path:
    from jaeger_tpu.commands.predict import run_core
    from jaeger_tpu.models.artifacts import save_model
    from jaeger_tpu.models.modern_convert import convert_modern_weights
    from jaeger_tpu.utils.config import load_model_config

    project = next(model_dir.glob("*_project.yaml"))
    h5 = next(model_dir.glob("*.weights.h5"))
    cfg = load_model_config(project)
    variables = convert_modern_weights(cfg, h5)

    bundle = out_dir / "bundle"
    save_model(variables, cfg, bundle)

    run_core(
        input_path=str(fasta), output_dir=str(out_dir / "pred"),
        model_path=str(bundle), fsize=500, stride=500, min_len=min_len,
        batch=96, precision="float32",
        crf_switch_cost=3.0 if crf else None, crf_prior="biological",
    )
    tsvs = [p for p in (out_dir / "pred").glob("*_jaeger.tsv")
            if "phage" not in p.name]
    assert len(tsvs) == 1
    return tsvs[0]


@pytest.mark.parametrize("min_len,crf", [(500, False), (137, False),
                                         (500, True)])
def test_full_pipeline_tsv_byte_identical(reference_artifact, tmp_path,
                                          min_len, crf):
    """min_len=500: full windows only; min_len=137: the reference's
    two-pass long+short padded path; crf=True: Viterbi-decoded window
    labels through the whole pipeline."""
    ref_tsv = _run_reference_predict(reference_artifact,
                                     tmp_path / "ref", min_len, crf=crf)
    our_tsv = _run_our_predict(reference_artifact, tmp_path / "ours",
                               min_len, crf=crf)
    assert our_tsv.read_bytes() == ref_tsv.read_bytes()
    # the phage-call table must agree too (reliability+score cutoffs)
    ref_ph = ref_tsv.with_name("test_contigs_phages.tsv")
    our_ph = next(our_tsv.parent.glob("*_phages_jaeger.tsv"), None)
    if ref_ph.exists() or our_ph is not None:
        assert ref_ph.exists() and our_ph is not None
        assert our_ph.read_bytes() == ref_ph.read_bytes()


# ---------------------------------------------------------------------------
# Fuzzed full-pipeline parity: adversarial FASTA through BOTH live pipelines
# ---------------------------------------------------------------------------

_IUPAC = "RYSWKMBDHVNryswkmbdhvn"


def _fuzz_fasta(path: Path, seed: int) -> Path:
    """Adversarial FASTA around the fsize=500/min_len=137 windowing edges:
    exact/off-by-one window lengths, sub-min_len contigs (consume contig-id
    slots without emitting windows — regression for the segment-densify fix),
    N-heavy contigs (writer's N%<0.3 filter), soft-mask + IUPAC runs, a
    multi-window long contig, and >96 interleaved tiny contigs between two
    windowed ones (one device batch spans a contig-id gap > batch size)."""
    rng = np.random.default_rng(seed)

    def contig(n: int, n_run: int = 0, soft: bool = False,
               iupac: bool = False) -> str:
        seq = rng.choice(list("ATGC"), size=max(n, 1))
        if soft and n > 60:
            s = int(rng.integers(0, n - 50))
            seq[s:s + 40] = [c.lower() for c in seq[s:s + 40]]
        if n_run and n > n_run + 2:
            s = int(rng.integers(0, n - n_run))
            seq[s:s + n_run] = "N"
        if iupac:
            for _ in range(int(rng.integers(1, 10))):
                seq[int(rng.integers(0, n))] = _IUPAC[
                    int(rng.integers(0, len(_IUPAC)))]
        return "".join(seq)

    lines = []

    def emit(name: str, seq: str, width: int = 70) -> None:
        lines.append(f">{name}")
        lines.extend(seq[i:i + width] for i in range(0, len(seq), width))

    emit("edge_499", contig(499))
    emit("edge_500", contig(500, soft=True))
    emit("edge_501", contig(501, iupac=True))
    emit("short_136", contig(136))        # < min_len: header slot only
    emit("short_137", contig(137))        # == min_len: short-window path
    emit("short_300 with a description", contig(300, soft=True))
    emit("n_heavy", contig(450, n_run=200))   # N% > 0.3: writer filters
    emit("long_multiwin", contig(2600, soft=True, iupac=True))
    # >96 sub-min_len contigs between two windowed contigs: inside one
    # device batch the contig-id span exceeds the batch size
    for i in range(110):
        emit(f"tiny_{i}", contig(int(rng.integers(20, 120))))
    emit("tail_full", contig(1200, soft=True))
    path.write_text("\n".join(lines) + "\n")
    return path


@pytest.mark.parametrize("seed,crf,gz", [(11, False, False), (12, True, False),
                                         (13, False, True)])
def test_fuzz_full_pipeline_tsv_byte_identical(reference_artifact, tmp_path,
                                               seed, crf, gz):
    fasta = _fuzz_fasta(tmp_path / f"fuzz_{seed}.fasta", seed)
    if gz:
        import gzip

        gz_path = tmp_path / f"fuzz_{seed}.fasta.gz"
        gz_path.write_bytes(gzip.compress(fasta.read_bytes()))
        fasta = gz_path
    ref_tsv = _run_reference_predict(reference_artifact, tmp_path / "ref",
                                     min_len=137, crf=crf, fasta=fasta)
    our_tsv = _run_our_predict(reference_artifact, tmp_path / "ours",
                               min_len=137, crf=crf, fasta=fasta)
    assert our_tsv.read_bytes() == ref_tsv.read_bytes()
    ref_ph = ref_tsv.with_name(f"{fasta.stem}_phages.tsv")
    our_ph = next(our_tsv.parent.glob("*_phages_jaeger.tsv"), None)
    if ref_ph.exists() or our_ph is not None:
        assert ref_ph.exists() and our_ph is not None
        assert our_ph.read_bytes() == ref_ph.read_bytes()
