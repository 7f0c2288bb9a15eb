"""Pin the codon<->nucleotide crop contract (reference seqops/crop.py)."""

import pytest

from jaeger_tpu.seqops import crop


@pytest.mark.parametrize("codons", [1, 2, 100, 165, 500, 512, 665, 1024])
def test_roundtrip(codons):
    nt = crop.codons_to_nucleotides(codons)
    assert nt == 3 * codons + 5
    assert crop.nucleotides_to_codons(nt) == codons


@pytest.mark.parametrize("codons", [1, 7, 165, 500, 1024])
def test_contract_agreement(codons):
    """At nt = 3c+5 the TF-slice and array (nt//3 - 1) paths agree."""
    nt = crop.codons_to_nucleotides(codons)
    assert crop.frame_length(nt, nt) == codons
    assert crop.numpy_frame_length(nt) == codons


def test_frame_length_short_sequences():
    # shorter-than-crop windows under a fixed crop C
    C = crop.codons_to_nucleotides(500)  # 1505
    assert crop.frame_length(C, C) == 500
    assert crop.frame_length(100, C) == -(-(100 - 5) // 3)
    assert crop.frame_length(5, C) == 0
    assert crop.frame_length(1, C) == 0


def test_resolve_crop():
    assert crop.resolve_crop({"crop_size": 500}) == (500, 1505)
    assert crop.resolve_crop({"crop_size": 500, "crop_units": "codon"}) == (500, 1505)
    assert crop.resolve_crop({"crop_size": 1505, "crop_units": "nucleotide"}) == (
        500,
        1505,
    )
    with pytest.raises(ValueError):
        crop.resolve_crop({})
    with pytest.raises(ValueError):
        crop.resolve_crop({"crop_size": -1})
    with pytest.raises(ValueError):
        crop.resolve_crop({"crop_size": 10, "crop_units": "bogus"})
