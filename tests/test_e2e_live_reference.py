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


@pytest.fixture(scope="module")
def reference_artifact(tmp_path_factory):
    """Build + randomize + save a real modern artifact via the
    reference builder; returns the model directory."""
    import yaml

    out_dir = tmp_path_factory.mktemp("e2e_live")
    cfg = _reference_config(out_dir)
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


def _run_reference_predict(model_dir: Path, out_dir: Path,
                           min_len: int, crf: bool = False) -> Path:
    import jaeger.commands.predict as ref_predict

    ref_predict.version = lambda *_: "0.0.0-live"
    ref_predict.run_core(
        model_path=str(model_dir), config=None, input=str(FASTA),
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
    tsvs = list(out_dir.glob("*/test_contigs.tsv"))
    assert len(tsvs) == 1
    return tsvs[0]


def _run_our_predict(model_dir: Path, out_dir: Path, min_len: int,
                     crf: bool = False) -> Path:
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
        input_path=str(FASTA), output_dir=str(out_dir / "pred"),
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
