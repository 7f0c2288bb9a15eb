"""``utils convert`` CSV<->FASTA pinned LIVE, byte-identical.

Reference: ``commands/utils.py:248-293`` (pandas + pyfastx).  Both
directions round-trip through the real reference implementation and
ours on the same inputs and the output files must be identical.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, str(Path(__file__).parent))

import refstubs  # noqa: E402

refstubs.install()

pytest.importorskip("pandas")
ref_utils = pytest.importorskip("jaeger.commands.utils")

from jaeger_tpu.commands.utils import convert_core  # noqa: E402


def test_csv_to_fasta_matches_live(tmp_path, rng):
    csv_in = tmp_path / "in.csv"
    rows = [
        f"{i % 4},{''.join(rng.choice(list('ATGC'), size=80))},seq_{i}"
        for i in range(12)
    ]
    csv_in.write_text("\n".join(rows) + "\n")

    ref_out = tmp_path / "ref.fasta"
    our_out = tmp_path / "ours.fasta"
    ref_utils.convert_core(input=str(csv_in), output=str(ref_out),
                           itype="CSV")
    convert_core(str(csv_in), str(our_out), itype="CSV")
    ref_text = ref_out.read_text()
    assert ref_text.startswith(">seq_0__class=0\n")
    assert our_out.read_text() == ref_text


def test_fasta_to_csv_matches_live(tmp_path, rng):
    fasta_in = tmp_path / "in.fasta"
    recs = [
        f">seq_{i}__class={i % 3}\n"
        f"{''.join(rng.choice(list('ATGC'), size=60))}"
        for i in range(9)
    ]
    fasta_in.write_text("\n".join(recs) + "\n")

    ref_out = tmp_path / "ref.csv"
    our_out = tmp_path / "ours.csv"
    ref_utils.convert_core(input=str(fasta_in), output=str(ref_out),
                           itype="FASTA")
    convert_core(str(fasta_in), str(our_out), itype="FASTA")
    ref_text = ref_out.read_text()
    assert ref_text.splitlines()[0].endswith(",seq_0")
    assert our_out.read_text() == ref_text
