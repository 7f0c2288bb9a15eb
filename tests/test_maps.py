"""Codon table parity with the reference (seqops/maps.py)."""

from jaeger_tpu.seqops import maps


def test_codon_order_head_and_tail():
    # classical codon-table order: the reference hand-lists these
    assert maps.CODONS[:8] == ["TTT", "TTC", "TTA", "TTG", "CTT", "CTC", "CTA", "CTG"]
    assert maps.CODONS[16:20] == ["TCT", "TCC", "TCA", "TCG"]
    assert maps.CODONS[-4:] == ["GGT", "GGC", "GGA", "GGG"]
    assert len(maps.CODONS) == 64
    assert len(set(maps.CODONS)) == 64


def test_codon_ids_identity():
    assert maps.CODON_ID == list(range(64))


def test_aa_translation():
    table = dict(zip(maps.CODONS, maps.AA))
    assert table["ATG"] == "M"
    assert table["TAA"] == "*"
    assert table["TGG"] == "W"
    assert table["GGG"] == "G"
    # 20 aa + stop
    assert len(set(maps.AA)) == 21


def test_reduced_alphabets_are_consistent():
    # each reduced map must be a surjection of codon IDs onto 0..max
    for name in ["AA", "MURPHY10", "PC5", "PC2"]:
        _, ids = maps.resolve_alphabet(name)
        assert len(ids) == 64
        assert set(ids) == set(range(max(ids) + 1))
    # Murphy10: 10 aa classes + stop
    assert maps.alphabet_depth(maps.MURPHY10_ID) == 11
    assert maps.alphabet_depth(maps.PC5_ID) == 6
    assert maps.alphabet_depth(maps.PC2_ID) == 3


def test_dicodons():
    assert len(maps.DICODONS) == 4096
    assert maps.DICODONS[0] == "TTTTTT"
    assert maps.DICODONS[1] == "TTTTTC"
