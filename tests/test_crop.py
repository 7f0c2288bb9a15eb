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


def test_fasta_validation_errors(tmp_path):
    """Non-FASTA inputs fail with specific messages; fasta_stem strips
    compound extensions."""
    import pytest

    from jaeger_tpu.seqops.fasta import fasta_stem, validate_fasta_entries

    binary = tmp_path / "x.bin"
    binary.write_bytes(bytes(range(200, 256)) * 10)
    with pytest.raises(ValueError, match="not a FASTA"):
        validate_fasta_entries(binary, min_len=10)

    headerless = tmp_path / "x.txt"
    headerless.write_text("no header\nACGT\n")
    with pytest.raises(ValueError, match="no FASTA records"):
        validate_fasta_entries(headerless, min_len=10)

    short = tmp_path / "s.fasta"
    short.write_text(">a\nACGT\n")
    with pytest.raises(ValueError, match="< 100bp"):
        validate_fasta_entries(short, min_len=100)

    assert fasta_stem("dir/in.fasta.gz") == "in"
    assert fasta_stem("in.fa") == "in"
    assert fasta_stem("in.fna.gz") == "in"
    assert fasta_stem("reads.txt") == "reads"
    assert fasta_stem("v1.2.fasta") == "v1.2"
