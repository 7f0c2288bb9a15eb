"""``utils mask`` progressive masking pinned LIVE, byte-identical.

The reference's ``mask_core`` (``commands/utils.py:19-113``) draws fresh
mask positions from the global ``np.random`` stream each level; seeding
that stream identically on both sides must yield IDENTICAL output files:
the per-level headers (``_mutperc_{pct:.2f}``), the 70-column wrapping,
the set-difference available-index ordering, and the accumulating mask.
The --mutate base choices use an UNSEEDED generator upstream
(irreproducible run-to-run, pinned); ours draws them from the seeded
stream instead.
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

ref_utils = pytest.importorskip("jaeger.commands.utils")

from jaeger_tpu.commands.utils import mask_core  # noqa: E402


def _fasta(tmp_path, rng):
    path = tmp_path / "in.fasta"
    recs = [
        f">rec_{i}\n" + "".join(rng.choice(list("ATGC"), size=n))
        for i, n in enumerate([300, 777, 1500])
    ]
    path.write_text("\n".join(recs) + "\n")
    return path


@pytest.mark.parametrize(
    "params",
    [
        {"minperc": 0.0, "maxperc": 0.2, "step": 0.05},
        {"minperc": 0.1, "maxperc": 1.0, "step": 0.25},
    ],
    ids=["fine", "coarse"])
def test_mask_output_matches_live(params, tmp_path, rng):
    fasta = _fasta(tmp_path, rng)
    ref_out = tmp_path / "ref.fasta"
    our_out = tmp_path / "ours.fasta"

    np.random.seed(99)
    ref_utils.mask_core(input=str(fasta), output=str(ref_out), **params)
    mask_core(str(fasta), str(our_out), seed=99, **params)

    ref_text = ref_out.read_text()
    assert ref_text.count(">rec_0_mutperc_") >= 2
    assert our_out.read_text() == ref_text


def test_mutate_mode_reproducible_ours_only(tmp_path, rng):
    fasta = _fasta(tmp_path, rng)
    outs = []
    for name in ("a", "b"):
        out = tmp_path / f"{name}.fasta"
        mask_core(str(fasta), str(out), maxperc=0.3, step=0.1,
                  mutate=True, seed=3)
        outs.append(out.read_text())
    assert outs[0] == outs[1]

    refs = []
    for name in ("ra", "rb"):
        out = tmp_path / f"{name}.fasta"
        np.random.seed(3)
        ref_utils.mask_core(input=str(fasta), output=str(out),
                            maxperc=0.3, step=0.1, mutate=True)
        refs.append(out.read_text())
    assert refs[0] != refs[1]  # unseeded upstream default_rng, pinned
