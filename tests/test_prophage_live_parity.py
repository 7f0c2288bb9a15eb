"""Prophage pipeline pinned LIVE against the reference.

Runs the reference's ``logits_to_df_v2`` → ``segment`` →
``refine_prophage_boundaries`` → ``prophage_report`` chain
(``postprocess/prophages.py:99-153,524-602,605-874``,
``postprocess/prophage_boundaries.py:138-193``) with its engine
dependencies stubbed by our implementations (``refstubs.install_prophage``:
ruptures→our ``kernel_cpd_linear``, kneed→our ``KneeLocator``,
pyrodigal_gv→our gene caller, parasail→our SW, pyfastx→our reader) and
compares against our pipeline on a planted prophage scenario.

The engines are shared (and separately oracle-tested), so what this
pins is the reference's first-party logic: softmax + 4-window score
smoothing + GC/GC-skew track assembly, the CPD penalty sweep + knee
selection + sensitivity filter + overlap merge, boundary snapping to
intergenic positions with the 2*fsize cap, and the att-repeat report
arithmetic down to the byte-identical ``prophages_jaeger.tsv``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, str(Path(__file__).parent))

import refstubs  # noqa: E402

refstubs.install()
refstubs.install_prophage()

ref_pp = pytest.importorskip("jaeger.postprocess.prophages")
ref_pb = pytest.importorskip("jaeger.postprocess.prophage_boundaries")

from jaeger_tpu.postprocess import genes as our_genes  # noqa: E402
from jaeger_tpu.postprocess import prophages as our_pp  # noqa: E402

CLASS_MAP = {
    "class": ["bacteria", "phage", "eukaryota", "archaea"],
    "index": [0, 1, 2, 3],
}
FSIZE = 2000
KW = {"lc": 500_000, "fsize": FSIZE, "stride": FSIZE}


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    """One 620 kb contig with a planted prophage (windows 100..140) whose
    boundaries carry a 60 bp direct repeat (attL/attR), plus a 400 kb
    contig under the 500 kb segmentation cutoff."""
    rng = np.random.default_rng(11)

    n_win = 310
    length = n_win * FSIZE  # 620_000
    att = _random_seq(rng, 60)
    # segment() places the region at windows [101, 141] for these logits
    # (raw span 202_000..282_000); plant attL/attR straddling those raw
    # boundaries so they sit inside the report's att search windows even
    # after gene-boundary refinement shifts them outward by < ~2 kb.
    region_start, region_end = 101 * FSIZE, 141 * FSIZE
    seq = list(_random_seq(rng, length))
    seq[region_start - 30 : region_start + 30] = att
    seq[region_end - 30 : region_end + 30] = att
    seq = "".join(seq)

    logits = rng.normal(0.0, 0.3, size=(n_win, 4)).astype(np.float32)
    logits[:, 0] += 1.0  # bacterial host baseline
    logits[100:140, 1] += 5.0  # planted prophage band
    logits[100:140, 0] -= 1.0

    short_n = 200
    short_logits = rng.normal(0.0, 0.3, size=(short_n, 4)).astype(np.float32)

    headers = np.array(["big,contig", "small_contig"])
    predictions = [logits, short_logits]
    lengths = np.array([length, short_n * FSIZE])
    gcs = [rng.uniform(0.3, 0.7, size=n_win),
           rng.uniform(0.3, 0.7, size=short_n)]
    gc_skews = [rng.uniform(-0.4, 0.4, size=n_win),
                rng.uniform(-0.4, 0.4, size=short_n)]

    fasta = tmp_path_factory.mktemp("prophage") / "contigs.fasta"
    with open(fasta, "w") as fh:
        fh.write(f">big,contig\n{seq}\n")
        fh.write(f">small_contig\n{_random_seq(rng, short_n * FSIZE)}\n")

    return dict(
        fasta=fasta, headers=headers, predictions=predictions,
        lengths=lengths, gcs=gcs, gc_skews=gc_skews,
    )


@pytest.fixture(scope="module")
def dfs(scenario):
    kwargs = dict(
        headers=scenario["headers"],
        predictions=scenario["predictions"],
        lengths=scenario["lengths"],
        gc_skews=scenario["gc_skews"],
        gcs=scenario["gcs"],
    )
    # lc below both lengths so the sub-cutoff contig flows into segment()
    kw = dict(KW, lc=300_000)
    ref = ref_pp.logits_to_df_v2(CLASS_MAP, kw, **kwargs)
    ours = our_pp.logits_to_df_v2(CLASS_MAP, kw, **kwargs)
    return ref, ours


def test_logits_to_df_matches_live(dfs):
    ref, ours = dfs
    assert set(ref) == set(ours) == {"big,contig", "small_contig"}
    for key in ref:
        rt, rhost, rlen = ref[key]
        ot, ohost, olen = ours[key]
        assert (ohost, olen) == (rhost, rlen)
        pd.testing.assert_frame_equal(ot, rt, check_dtype=False)


@pytest.fixture(scope="module")
def cords(dfs, tmp_path_factory):
    ref_df, our_df = dfs
    out = tmp_path_factory.mktemp("seg")
    ref = ref_pp.segment(ref_df, out, sensitivity=1.5)
    ours = our_pp.segment(our_df, out, sensitivity=1.5)
    return ref, ours


def test_segment_matches_live(cords):
    ref, ours = cords
    assert set(ref) == set(ours) == {"big,contig"}  # small under cutoff
    for key in ref:
        r_ranges, r_scores = ref[key]
        o_ranges, o_scores = ours[key]
        np.testing.assert_array_equal(o_ranges, r_ranges)
        np.testing.assert_allclose(o_scores, r_scores, rtol=0, atol=0)
    # the planted band is actually found
    (s, e), = ref["big,contig"][0]
    assert abs(s - 100) <= 2 and abs(e - 140) <= 2


@pytest.fixture(scope="module")
def refined(cords, scenario):
    ref_cords, our_cords = cords
    # reference keys are FASTA headers with , -> ___ ; segment() keys came
    # from the prediction headers, remap like commands/predict does
    ref_by_hdr = {k.replace(",", "___"): v for k, v in ref_cords.items()}
    our_by_hdr = {k.replace(",", "___"): v for k, v in our_cords.items()}
    ref = ref_pb.refine_prophage_boundaries(
        ref_by_hdr, scenario["fasta"], FSIZE)
    ours = our_genes.refine_prophage_boundaries(
        our_by_hdr, scenario["fasta"], FSIZE)
    return ref, ours, ref_by_hdr, our_by_hdr


def test_boundary_refinement_matches_live(refined):
    ref, ours, *_ = refined
    assert set(ref) == set(ours)
    for key in ref:
        assert [tuple(t) for t in ours[key]] == [tuple(t) for t in ref[key]]
    assert ref["big___contig"], "no refined regions produced"


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_fuzz_full_chain_matches_live(seed, tmp_path):
    """Randomized scenarios through the WHOLE chain: random contig
    counts/lengths, 0..3 planted bands per contig (including bands at
    window 0, at the last window, and adjacent bands that the overlap
    merge must fuse), contigs under the lc cutoff, and a byte-compared
    final report."""
    rng = np.random.default_rng(seed)
    n_contigs = int(rng.integers(2, 5))
    headers, predictions, lengths, gcs, gc_skews, seqs = [], [], [], [], [], []
    for ci in range(n_contigs):
        n_win = int(rng.integers(80, 220))
        logits = rng.normal(0.0, 0.3, size=(n_win, 4)).astype(np.float32)
        logits[:, 0] += 1.0
        n_bands = int(rng.integers(0, 4))
        for _ in range(n_bands):
            w = int(rng.integers(12, 40))
            pos = rng.choice(["start", "end", "mid"])
            if pos == "start":
                s = 0
            elif pos == "end":
                s = n_win - w
            else:
                s = int(rng.integers(0, n_win - w))
            logits[s:s + w, 1] += 5.0
            logits[s:s + w, 0] -= 1.0
        headers.append(f"contig_{seed}_{ci}")
        predictions.append(logits)
        lengths.append(n_win * FSIZE)
        gcs.append(rng.uniform(0.3, 0.7, size=n_win))
        gc_skews.append(rng.uniform(-0.4, 0.4, size=n_win))
        seqs.append(_random_seq(rng, n_win * FSIZE))

    fasta = tmp_path / "fuzz.fasta"
    with open(fasta, "w") as fh:
        for h, s in zip(headers, seqs):
            fh.write(f">{h}\n{s}\n")

    kwargs = dict(
        headers=np.array(headers), predictions=predictions,
        lengths=np.array(lengths), gc_skews=gc_skews, gcs=gcs,
    )
    kw = dict(KW, lc=150 * FSIZE)  # some contigs fall under the cutoff
    ref_df = ref_pp.logits_to_df_v2(CLASS_MAP, kw, **kwargs)
    our_df = our_pp.logits_to_df_v2(CLASS_MAP, kw, **kwargs)
    assert set(ref_df) == set(our_df)
    for key in ref_df:
        pd.testing.assert_frame_equal(our_df[key][0], ref_df[key][0],
                                      check_dtype=False)

    ref_cords = ref_pp.segment(ref_df, tmp_path / "r", sensitivity=1.5)
    our_cords = our_pp.segment(our_df, tmp_path / "o", sensitivity=1.5)
    assert set(ref_cords) == set(our_cords)
    for key in ref_cords:
        np.testing.assert_array_equal(our_cords[key][0], ref_cords[key][0])
        np.testing.assert_allclose(our_cords[key][1], ref_cords[key][1],
                                   rtol=0, atol=0)
    if not ref_cords:
        return

    ref_refined = ref_pb.refine_prophage_boundaries(ref_cords, fasta, FSIZE)
    our_refined = our_genes.refine_prophage_boundaries(our_cords, fasta, FSIZE)
    assert set(ref_refined) == set(our_refined)
    for key in ref_refined:
        assert ([tuple(t) for t in our_refined[key]]
                == [tuple(t) for t in ref_refined[key]])

    ref_out, our_out = tmp_path / "ref_rep", tmp_path / "our_rep"
    ref_out.mkdir(), our_out.mkdir()
    ref_pp.prophage_report(FSIZE, str(fasta), ref_cords, ref_out,
                           refined_boundaries=ref_refined)
    our_pp.prophage_report(FSIZE, str(fasta), our_cords, our_out,
                           refined_boundaries=our_refined)
    assert ((our_out / "prophages_jaeger.tsv").read_bytes()
            == (ref_out / "prophages_jaeger.tsv").read_bytes())


def test_prophage_report_matches_live_byte_for_byte(
    refined, scenario, tmp_path_factory
):
    ref_refined, our_refined, ref_by_hdr, our_by_hdr = refined
    ref_out = tmp_path_factory.mktemp("ref_report")
    our_out = tmp_path_factory.mktemp("our_report")
    ref_pp.prophage_report(
        FSIZE, str(scenario["fasta"]), ref_by_hdr, ref_out,
        refined_boundaries=ref_refined,
    )
    our_pp.prophage_report(
        FSIZE, str(scenario["fasta"]), our_by_hdr, our_out,
        refined_boundaries=our_refined,
    )
    ref_tsv = (ref_out / "prophages_jaeger.tsv").read_bytes()
    our_tsv = (our_out / "prophages_jaeger.tsv").read_bytes()
    assert our_tsv == ref_tsv
    # the planted att repeat is detected as a direct repeat
    df = pd.read_csv(our_out / "prophages_jaeger.tsv", sep="\t")
    assert df["att_type"].iloc[0] == "DTR"
    assert df["att_alignment_length"].iloc[0] >= 50
