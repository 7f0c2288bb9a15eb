"""``utils fragment`` genome splitting pinned LIVE, byte-identical.

The reference's ``split_core`` (``dataops/split.py:30-169``) seeds the
global ``random`` stream, so given the same FASTA + seed our output
file must be IDENTICAL: fragment lengths drawn in the same order,
random starts (sequential, coverage, circular wrap-around), the
accepted-bases coverage accounting (rejected fragments don't count),
the N-proportion filter, header format and 60-column wrapping.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import numpy as np
import pytest

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, str(Path(__file__).parent))

import refstubs  # noqa: E402

refstubs.install()

ref_split = pytest.importorskip("jaeger.dataops.split")

from jaeger_tpu.dataops.split import split_core  # noqa: E402


def _genomes(tmp_path, rng):
    path = tmp_path / "genomes.fasta"
    recs = []
    for i, n in enumerate([9000, 4000, 800, 12000]):
        seq = list(rng.choice(list("ATGC"), size=n))
        if i == 3:  # N-heavy stretch to exercise the filter
            seq[2000:4500] = "N" * 2500
        recs.append(f">genome_{i} desc{i}\n" + "".join(seq))
    path.write_text("\n".join(recs) + "\n")
    return path


CASES = [
    dict(minlen=1000, maxlen=3000, overlap=0),
    dict(minlen=1000, maxlen=3000, overlap=250),
    dict(minlen=500, maxlen=500, overlap=0),          # constant window
    dict(minlen=700, maxlen=2000, coverage=2.0),
    dict(minlen=700, maxlen=2000, coverage=1.5, circular=True),
    dict(minlen=600, maxlen=1500, coverage=1.0, max_n_prop=0.05),
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_split_output_matches_live(case, tmp_path, rng):
    fasta = _genomes(tmp_path, rng)
    ref_out = tmp_path / "ref.fasta"
    our_out = tmp_path / "ours.fasta"

    # The reference's pyfastx iteration yields the FULL header; the stub
    # (tests/refstubs.py) backs it with our reader, so name parity holds.
    ref_split.split_core(input=str(fasta), output=str(ref_out),
                         seed=42, **case)
    split_core(str(fasta), str(our_out), seed=42, **case)

    ref_text = ref_out.read_text()
    assert ref_text  # the case produced fragments
    assert our_out.read_text() == ref_text


def test_split_shuffle_deterministic_with_seed(tmp_path, rng):
    """Documented improvement: the reference's --shuffle uses an
    unseeded RandomState inside dinuc_shuffle, so its shuffled output
    differs run-to-run even with --seed; ours is reproducible."""
    fasta = _genomes(tmp_path, rng)
    outs = []
    for name in ("a", "b"):
        out = tmp_path / f"{name}.fasta"
        split_core(str(fasta), str(out), minlen=1000, maxlen=2000,
                   seed=7, shuffle=True)
        outs.append(out.read_text())
    assert outs[0] == outs[1]

    refs = []
    for name in ("ra", "rb"):
        out = tmp_path / f"{name}.fasta"
        random.seed(7)
        np.random.seed(7)
        ref_split.split_core(input=str(fasta), output=str(out),
                             minlen=1000, maxlen=2000, seed=7,
                             shuffle=True)
        refs.append(out.read_text())
    assert refs[0] != refs[1]  # upstream nondeterminism, pinned
