"""Tandem-repeat detection/masking (seqops/tandem.py) — the in-process
replacement for the reference's external ``trf`` binary pipeline
(reference ``seqops/io.py:26-35,371-441``)."""

import numpy as np
import pytest

from jaeger_tpu.seqops.tandem import (
    find_tandem_repeats,
    mask_fasta,
    mask_tandem_repeats,
)


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


class TestFind:
    def test_clean_period_repeat_found_with_tight_bounds(self):
        left, right = _rand(300, 1), _rand(300, 2)
        unit = "ACGTGATCAT"  # period 10
        rep = unit * 12
        seq = left + rep + right
        iv = find_tandem_repeats(seq)
        assert len(iv) == 1
        s, e = iv[0]
        # the tract must cover the repeat, give or take chance edge matches
        assert abs(s - 300) <= 15 and abs(e - (300 + len(rep))) <= 15

    def test_homopolymer_and_dinucleotide(self):
        seq = _rand(200, 3) + "A" * 60 + _rand(200, 4) + "TG" * 35 + _rand(200, 5)
        iv = find_tandem_repeats(seq)
        covered = set()
        for s, e in iv:
            covered.update(range(s, e))
        assert set(range(205, 255)).issubset(covered)  # poly-A interior
        assert set(range(465, 525)).issubset(covered)  # TG tract interior

    def test_mismatches_tolerated(self):
        unit = "GATTACAGGC"
        rep = list(unit * 20)
        for p in (35, 95, 155):  # sparse mismatches
            rep[p] = "T" if rep[p] != "T" else "A"
        seq = _rand(250, 6) + "".join(rep) + _rand(250, 7)
        iv = find_tandem_repeats(seq)
        assert any(s < 270 and e > 430 for s, e in iv)

    def test_single_indel_caught_at_neighbor_lag(self):
        unit = "CCATGAACGT"
        rep = unit * 10 + unit[:4] + unit[5:] + unit * 10  # one deletion
        seq = _rand(300, 8) + rep + _rand(300, 9)
        iv = find_tandem_repeats(seq)
        covered = sum(e - s for s, e in iv)
        assert covered >= 150  # both halves found despite the indel

    def test_below_minscore_not_reported(self):
        # 3 copies of a 10-mer: 20 matched bases * 2 = 40 < minscore 50
        seq = _rand(400, 10) + "ACGTGATCAT" * 3 + _rand(400, 11)
        assert find_tandem_repeats(seq) == []

    def test_random_sequence_clean(self):
        assert find_tandem_repeats(_rand(5000, 12)) == []

    def test_ambiguous_bases_break_repeats(self):
        seq = "ACGTGATCAT" * 30
        broken = seq[:100] + "N" * 200 + seq[300:]
        iv = find_tandem_repeats(broken)
        for s, e in iv:
            assert e <= 105 or s >= 295  # the N block is never "repeat"

    def test_maxperiod_cap(self):
        unit = _rand(600, 13)  # period 600 > maxperiod 500
        seq = unit * 4
        assert find_tandem_repeats(seq) == []
        # but the same structure under the cap is found
        unit2 = _rand(400, 14)
        assert find_tandem_repeats(unit2 * 4) != []

    def test_lowercase_input(self):
        seq = (_rand(300, 15) + "ACGTGATCAT" * 12 + _rand(300, 16)).lower()
        assert find_tandem_repeats(seq) != []


class TestMask:
    def test_mask_is_n_and_preserves_rest(self):
        left, right = _rand(300, 20), _rand(300, 21)
        rep = "ACGTGATCAT" * 12
        seq = left + rep + right
        masked = mask_tandem_repeats(seq)
        assert len(masked) == len(seq)
        assert "N" in masked
        # unmasked positions identical
        for a, b in zip(seq, masked):
            assert b == a or b == "N"
        # repeat interior fully masked
        assert set(masked[320:380]) == {"N"}

    def test_no_repeat_identity(self):
        seq = _rand(1000, 22)
        assert mask_tandem_repeats(seq) is seq


class TestMaskFasta(object):
    def test_roundtrip_and_worker_parity(self, tmp_path):
        recs = {
            "plain": _rand(800, 30),
            "rep": _rand(200, 31) + "TTAGGG" * 40 + _rand(200, 32),
            "short": "ACGT",
        }
        fi = tmp_path / "in.fasta"
        fi.write_text("".join(f">{h}\n{s}\n" for h, s in recs.items()))
        f1, f8 = tmp_path / "m1.fasta", tmp_path / "m8.fasta"
        n1 = mask_fasta(str(fi), str(f1), workers=1)
        n8 = mask_fasta(str(fi), str(f8), workers=8)
        assert f1.read_text() == f8.read_text()
        assert n1 == n8 > 0

        from jaeger_tpu.seqops.fasta import read_fasta

        out = dict(read_fasta(str(f1)))
        assert set(out) == set(recs)
        assert out["plain"] == recs["plain"]
        assert out["short"] == recs["short"]
        assert "N" in out["rep"] and len(out["rep"]) == len(recs["rep"])


def test_cli_mask_tandem(tmp_path):
    from click.testing import CliRunner

    from jaeger_tpu.cli import main

    fi = tmp_path / "in.fasta"
    fi.write_text(">r1\n" + _rand(200, 40) + "GATTACA" * 30 + _rand(200, 41) + "\n")
    fo = tmp_path / "out.fasta"
    res = CliRunner().invoke(
        main, ["utils", "mask-tandem", "-i", str(fi), "-o", str(fo)]
    )
    assert res.exit_code == 0, res.output
    assert fo.exists() and "N" in fo.read_text()
