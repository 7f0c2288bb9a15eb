"""Byte-identical TSVs vs the LIVE reference reduction + writer.

The reference package imports in this image (its native deps do not, so
``predict`` as a whole cannot run — but the window->contig reduction and
TSV writer only need numpy/pandas plus a one-line ``pyfastx`` stub for
an unused import). These tests feed IDENTICAL synthetic window logits +
metadata through the reference's ``pred_to_dict`` -> ``write_output``
(``collect.py:247-640``) and through our ``reduce_windows`` ->
``write_output`` and require the produced TSV files to match
byte-for-byte — stats, float16 rounding, formats, run-length
window_summary strings, terminal-repeat join, N% filter and the phage
sub-table, in one shot.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pandas as pd
import pytest

sys.modules.setdefault("pyfastx", types.ModuleType("pyfastx"))
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

ref_collect = pytest.importorskip("jaeger.postprocess.collect")

from jaeger_tpu.postprocess import collect as our_collect  # noqa: E402

CLASSES = ["bacteria", "phage", "eukarya", "archaea", "plasmid", "virus"]
FSIZE = 2000


def _synthetic(seed=0, n_contigs=6):
    rng = np.random.default_rng(seed)
    win_counts = rng.integers(1, 9, size=n_contigs)
    n = int(win_counts.sum())
    prediction = rng.normal(scale=3.0, size=(n, len(CLASSES))).astype(
        np.float32)
    reliability = rng.normal(scale=2.0, size=(n, 1)).astype(np.float32)

    headers, end_flags, seqlen = [], [], []
    for ci, wc in enumerate(win_counts):
        headers += [f"contig_{ci}"] * wc
        end_flags += [0] * (wc - 1) + [1]
        seqlen += [int(wc) * FSIZE] * wc
    acgt = rng.integers(0, FSIZE // 4, size=(4, n))
    # one contig gets N% >= 0.3 so the filter row drops on both sides
    acgt[:, np.asarray(headers) == "contig_2"] = FSIZE // 8
    gc_skew = np.round(rng.uniform(-0.5, 0.5, size=n), 3)

    repeats = pd.DataFrame({
        "contig_id": [f"contig_{i}" for i in range(n_contigs)],
        "terminal_repeats": ["DTR", None, None, "ITR", None, None],
        "repeat_length": [13.0, np.nan, np.nan, 27.0, np.nan, np.nan],
    })
    return {
        "prediction": prediction, "reliability": reliability,
        "headers": np.asarray(headers), "end": np.asarray(end_flags,
                                                          np.int8),
        "seqlen": np.asarray(seqlen, np.int32),
        "a": acgt[0], "c": acgt[1], "g": acgt[2], "t": acgt[3],
        "gc_skew": gc_skew, "repeats": repeats,
    }


def _reference_tsvs(s, tmp_path, crf_switch_cost=None):
    y_pred = {
        "prediction": s["prediction"], "reliability": s["reliability"],
        "meta_0": s["headers"], "meta_2": s["end"], "meta_4": s["seqlen"],
        "meta_5": s["c"], "meta_6": s["g"], "meta_7": s["a"],
        "meta_8": s["t"], "meta_9": s["gc_skew"],
    }
    class_map = {"num_classes": len(CLASSES),
                 "index": list(range(len(CLASSES))), "class": CLASSES}
    data, _ = ref_collect.pred_to_dict(
        y_pred, fsize=FSIZE, class_map=class_map,
        term_repeats=s["repeats"], crf_switch_cost=crf_switch_cost,
    )
    t1 = tmp_path / "ref.tsv"
    t2 = tmp_path / "ref_phage.tsv"
    ref_collect.write_output(
        data, labels=CLASSES, indices=list(range(len(CLASSES))),
        output_table_path=str(t1), output_phage_table_path=str(t2),
    )
    return t1, t2


def _our_tsvs(s, tmp_path, crf_switch_cost=None):
    meta = our_collect.PredictionMeta(
        headers=s["headers"], contig_end=s["end"], seqlen=s["seqlen"],
        g=s["g"], c=s["c"], a=s["a"], t=s["t"], gc_skew=s["gc_skew"],
    )
    data, _ = our_collect.reduce_windows(
        s["prediction"], meta, fsize=FSIZE, num_classes=len(CLASSES),
        reliability=s["reliability"], class_names=CLASSES,
        term_repeats=s["repeats"], crf_switch_cost=crf_switch_cost,
    )
    t1 = tmp_path / "ours.tsv"
    t2 = tmp_path / "ours_phage.tsv"
    our_collect.write_output(
        data, output_table_path=t1, output_phage_table_path=t2,
        labels=CLASSES, indices=list(range(len(CLASSES))),
    )
    return t1, t2


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tsv_bytes_match_reference(seed, tmp_path):
    s = _synthetic(seed)
    r1, r2 = _reference_tsvs(s, tmp_path)
    o1, o2 = _our_tsvs(s, tmp_path)
    assert o1.read_bytes() == r1.read_bytes()
    assert o2.exists() == r2.exists()
    if r2.exists():
        assert o2.read_bytes() == r2.read_bytes()


def test_tsv_bytes_match_reference_with_crf(tmp_path):
    s = _synthetic(3)
    r1, _ = _reference_tsvs(s, tmp_path, crf_switch_cost=0.5)
    o1, _ = _our_tsvs(s, tmp_path, crf_switch_cost=0.5)
    assert o1.read_bytes() == r1.read_bytes()
