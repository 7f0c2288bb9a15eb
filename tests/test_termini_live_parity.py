"""Terminal-repeat scan pinned LIVE against the reference.

Runs the reference's ``scan_for_terminal_repeats``
(``utils/termini.py:88-189``) with pyfastx/parasail stubbed by our
byte-exact equivalents (``tests/refstubs.py``) and compares every column
of the summary DataFrame against :mod:`jaeger_tpu.postprocess.termini`
on planted DTR / ITR / LTR / repeat-free / sub-``fsize`` contigs.  The
SW engine is shared (separately oracle-tested in ``tests/test_sw.py``),
so what this pins is the reference's scan-length clamp, the >12 repeat
gate, ITR-vs-DTR score selection, the LTR>=250 promotion, and the
coordinate/gap/identity arithmetic of ``get_alignment_summary``.
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

ref_termini = pytest.importorskip("jaeger.utils.termini")

from jaeger_tpu.postprocess.termini import (  # noqa: E402
    reverse_complement,
    scan_for_terminal_repeats,
)


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _write_fasta(path: Path, records):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n{seq}\n")


@pytest.fixture(scope="module")
def fasta(tmp_path_factory):
    rng = np.random.default_rng(7)
    records = []

    # DTR: 80 bp direct repeat at both ends of a 5 kb contig.
    rep = _random_seq(rng, 80)
    records.append(("dtr_contig", rep + _random_seq(rng, 5000) + rep))

    # ITR: 60 bp inverted repeat (front + its RC at the end).
    rep = _random_seq(rng, 60)
    records.append(
        ("itr_contig", rep + _random_seq(rng, 4200) + reverse_complement(rep))
    )

    # LTR: 300 bp direct repeat -> promoted to LTR_DTR (>= 250 cutoff).
    rep = _random_seq(rng, 300)
    records.append(("ltr_contig", rep + _random_seq(rng, 8000) + rep))

    # Repeat with an internal gap (exercises gap/coordinate arithmetic).
    rep = _random_seq(rng, 50)
    gapped = rep[:25] + rep[27:]  # 2 bp deleted at the end copy
    records.append(("gap_contig", rep + _random_seq(rng, 3000) + gapped))

    # No terminal repeat at all.
    records.append(("plain_contig", _random_seq(rng, 3500)))

    # Header with a comma (reference replaces , with ___).
    rep = _random_seq(rng, 40)
    records.append(("weird,header", rep + _random_seq(rng, 2600) + rep))

    # Shorter than fsize -> must be excluded by both.
    records.append(("short_contig", _random_seq(rng, 900)))

    path = tmp_path_factory.mktemp("termini") / "planted.fasta"
    _write_fasta(path, records)
    return path


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values("contig_id").reset_index(drop=True)
    return df[sorted(df.columns)]


def test_scan_matches_live_reference(fasta):
    ours = _norm(scan_for_terminal_repeats(str(fasta), fsize=2000, workers=2))
    ref = _norm(
        ref_termini.scan_for_terminal_repeats(str(fasta), 6, 2, 2000)
    )
    assert list(ours.columns) == list(ref.columns)
    assert len(ours) == len(ref) == 6  # short_contig excluded
    pd.testing.assert_frame_equal(ours, ref, check_dtype=False)
    # The planted structure is actually detected (not all-None parity).
    by_id = ours.set_index("contig_id")
    assert by_id.loc["dtr_contig", "terminal_repeats"] == "DTR"
    assert by_id.loc["itr_contig", "terminal_repeats"] == "ITR"
    assert by_id.loc["ltr_contig", "terminal_repeats"] == "LTR_DTR"
    assert pd.isna(by_id.loc["plain_contig", "terminal_repeats"])
    assert "weird___header" in by_id.index


def test_scan_matches_live_reference_on_bundled_contigs(fasta):
    bundled = "/root/reference/src/jaeger/data/test/test_contigs.fasta"
    ours = _norm(scan_for_terminal_repeats(bundled, fsize=2000, workers=2))
    ref = _norm(ref_termini.scan_for_terminal_repeats(bundled, 9, 2, 2000))
    pd.testing.assert_frame_equal(ours, ref, check_dtype=False)
