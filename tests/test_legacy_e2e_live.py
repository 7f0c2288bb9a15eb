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


def test_legacy_fuzz_tsv_matches_live(tmp_path):
    """Adversarial FASTA around the legacy fsize=2048 edges: off-by-one
    lengths, soft-mask runs (v1 tables are case-sensitive: soft-masked
    codons hit token 0), IUPAC codes, N stretches, a multi-window contig
    and sub-min_len contigs."""
    import numpy as np

    rng = np.random.default_rng(21)
    iupac = "RYSWKMBDHVNryswkmbdhvn"

    def contig(n, soft=False, n_run=0, amb=0):
        seq = rng.choice(list("ATGC"), size=n)
        if soft and n > 400:
            s = int(rng.integers(0, n - 300))
            seq[s:s + 256] = [ch.lower() for ch in seq[s:s + 256]]
        if n_run and n > n_run + 2:
            s = int(rng.integers(0, n - n_run))
            seq[s:s + n_run] = "N"
        for _ in range(amb):
            seq[int(rng.integers(0, n))] = iupac[
                int(rng.integers(0, len(iupac)))]
        return "".join(seq)

    lines = []
    for name, seq in [
        ("edge_2047", contig(2047)),          # < min_len: dropped
        ("edge_2048", contig(2048, soft=True)),
        ("edge_2049", contig(2049, amb=6)),
        ("multiwin", contig(7000, soft=True, amb=9)),
        ("n_run", contig(3000, n_run=700)),
        ("plain", contig(4096)),
    ]:
        lines.append(f">{name}")
        lines.extend(seq[i:i + 60] for i in range(0, len(seq), 60))
    fasta = tmp_path / "legacy_fuzz.fasta"
    fasta.write_text("\n".join(lines) + "\n")

    ref_out = tmp_path / "ref"
    ref_legacy.version = lambda *_: "0.0.0-live"
    ref_legacy.run_core(
        model="default", input=str(fasta), output=str(ref_out),
        fsize=2048, stride=2048, min_len=2048, batch=96, workers=2,
        cpu=True, physicalid=0, verbose=1, overwrite=True,
        getalllabels=False, getsequences=False, window_scores=False,
        prophage=False, sensitivity=0.5, lc=None, pc=3, rc=0.5,
        dynamic_stride=False, dustmask=True,
    )
    ref_table = ref_out / "default" / "legacy_fuzz_jaeger.tsv"
    ref_phage = ref_out / "default" / "legacy_fuzz_phages_jaeger.tsv"
    assert ref_table.exists()

    from jaeger_tpu.commands.predict_legacy import run_core

    our_out = tmp_path / "ours"
    table = run_core(
        str(fasta), str(our_out), fsize=2048, stride=2048, batch=96,
        min_len=2048, reliability_cutoff=0.5, phage_score=3,
        model_name="default", workers=2,
    )
    _assert_tsv_equal_to_f16_ulp(Path(table), ref_table)
    our_phage = our_out / "legacy_fuzz_default_phages_jaeger.tsv"
    if ref_phage.exists() or our_phage.exists():
        assert ref_phage.exists() and our_phage.exists()
        _assert_tsv_equal_to_f16_ulp(our_phage, ref_phage)


def _assert_tsv_equal_to_f16_ulp(ours: Path, ref: Path) -> None:
    """Exact equality for every non-float cell; float cells must agree
    within one float16 ulp. On random fuzz inputs the deep 1024-wide
    WRes tower accumulates TF-vs-JAX float32 reduction-order noise
    (~1e-5) that can land a float16-cast statistic on either side of a
    ``%.3f`` rounding boundary — byte-exactness on arbitrary inputs is
    not a property even two runs of the reference on different BLAS
    builds would have. Byte-parity stays pinned by the non-fuzz test."""
    import numpy as np

    ours_lines = ours.read_text().splitlines()
    ref_lines = ref.read_text().splitlines()
    assert len(ours_lines) == len(ref_lines)
    for ol, rl in zip(ours_lines, ref_lines):
        oc, rc = ol.split("\t"), rl.split("\t")
        assert len(oc) == len(rc), (ol, rl)
        for o, r in zip(oc, rc):
            if o == r:
                continue
            fo, fr = float(o), float(r)  # raises -> genuine divergence
            ulp = float(np.spacing(np.float16(max(abs(fo), abs(fr)))))
            # a 1-ulp float16 difference prints one decimal step apart
            step = 10.0 ** -(len(o) - o.index(".") - 1) if "." in o else 0.0
            assert abs(fo - fr) <= max(ulp, step) + 1e-9, (ol, rl)


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
