"""Legacy (``default`` WRes model) predict pinned LIVE, byte-identical.

The COMPLETE reference ``predict_legacy`` pipeline runs in this image
(the real bundled ``WRes_1024.h5`` + sklearn OOD pickle, its real
tf.data v1 amino windowing, ``JaegerModel.predict``,
``pred_to_dict_legacy``/``write_output_legacy``), and our
``predict-legacy`` on the SAME weights (converted by
``convert_wres_h5``) must write byte-identical main and phage TSVs —
the legacy schema (raw-logit statistics, softmax_entropy-on-logits,
mean sklearn ID probability, G+C/N%/prediction_2, per-class
count/score/var triplets, ``12n3V`` window summaries, terminal-repeat
join) end to end.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

tf = pytest.importorskip("tensorflow")

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, str(Path(__file__).parent))

import refstubs  # noqa: E402

refstubs.install()

ref_legacy = pytest.importorskip("jaeger.commands.predict_legacy")

FASTA = Path("/root/reference/src/jaeger/data/test/test_contigs.fasta")


@pytest.fixture(scope="module")
def reference_tsvs(tmp_path_factory):
    out = tmp_path_factory.mktemp("ref_legacy")
    ref_legacy.version = lambda *_: "0.0.0-live"
    ref_legacy.run_core(
        model="default", input=str(FASTA), output=str(out),
        fsize=2048, stride=2048, min_len=2048, batch=96, workers=2,
        cpu=True, physicalid=0, verbose=1, overwrite=True,
        getalllabels=False, getsequences=False, window_scores=False,
        prophage=False, sensitivity=0.5, lc=None, pc=3, rc=0.5,
        dynamic_stride=False, dustmask=True,
    )
    table = out / "default" / "test_contigs_jaeger.tsv"
    phage = out / "default" / "test_contigs_phages_jaeger.tsv"
    assert table.exists() and phage.exists()
    return table, phage


def test_legacy_tsv_matches_live(reference_tsvs, tmp_path):
    from jaeger_tpu.commands.predict_legacy import run_core

    table = run_core(
        str(FASTA), str(tmp_path), fsize=2048, stride=2048, batch=96,
        min_len=2048, reliability_cutoff=0.5, phage_score=3,
        model_name="default", workers=2,
    )
    phage = tmp_path / "test_contigs_default_phages_jaeger.tsv"

    ref_table, ref_phage = reference_tsvs
    ref_text = ref_table.read_text()
    assert ref_text.count("\n") >= 10  # all 9 contigs + header
    assert Path(table).read_text() == ref_text
    assert phage.read_text() == ref_phage.read_text()
