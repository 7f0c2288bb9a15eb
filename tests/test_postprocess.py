"""Postprocess tests: reduction, CRF, CPD, SW, termini, window summary."""

import numpy as np
import pandas as pd
import pytest

from jaeger_tpu.postprocess import collect, helpers as H
from jaeger_tpu.postprocess.cpd import KneeLocator, kernel_cpd_linear
from jaeger_tpu.postprocess.sw import smith_waterman
from jaeger_tpu.postprocess.termini import reverse_complement, scan_contig


class TestHelpers:
    def test_find_runs(self):
        v, l, s = H.find_runs(np.array([1, 1, 0, 0, 0, 2]))
        np.testing.assert_array_equal(v, [1, 0, 2])
        np.testing.assert_array_equal(l, [2, 3, 1])
        np.testing.assert_array_equal(s, [0, 2, 5])

    def test_window_summary(self):
        cm = {0: "chromosome", 1: "phage", 2: "plasmid"}
        x = np.array([0, 0, 1, 1, 1, 2])
        assert H.get_window_summary(x, cm) == "2c3P1p"

    def test_viterbi_matches_argmax_at_zero_cost(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(20, 3))
        np.testing.assert_array_equal(
            H.viterbi_decode(logits, 0.0), np.argmax(logits, axis=-1)
        )

    def test_viterbi_smooths_flickers(self):
        # one weakly-confident flicker inside a confident run is smoothed
        logits = np.full((9, 2), 0.0)
        logits[:, 0] = 2.0
        logits[4] = [1.05, 1.2]  # weak flip
        path = H.viterbi_decode(logits, switch_cost=2.0)
        assert (path == 0).all()

    def test_biological_prior(self):
        p = H.default_transition_prior(["bacteria", "phage", "eukarya"])
        assert p[0, 1] == 0.5     # bacteria<->phage plausible
        assert p[0, 2] == 3.0     # bacteria<->eukarya implausible
        assert p[1, 2] == 3.0     # eukarya<->phage implausible
        assert (np.diag(p) == 0).all()

    def test_energy_matches_reference_shapes(self):
        logits = np.array([[1.0, 2.0, 3.0]])
        e = H.energy(logits)
        expected = -np.log(np.exp(1) + np.exp(2) + np.exp(3))
        # 3-class path: plain -logsumexp over classes? reference uses the
        # binary fallback for C not in (2,): -logsumexp([z, 0]) per element
        assert e.shape == (1, 3)
        np.testing.assert_allclose(
            e, -np.logaddexp(logits, 0.0), rtol=1e-12
        )
        e2 = H.energy(np.array([[1.0, 2.0]]))
        np.testing.assert_allclose(
            e2, [-np.log(np.exp(1) + np.exp(2))], rtol=1e-12
        )


class TestReduce:
    def _meta(self, windows_per_contig):
        n = sum(windows_per_contig)
        headers, end = [], []
        for ci, w in enumerate(windows_per_contig):
            headers += [f"c{ci}"] * w
            end += [0] * (w - 1) + [1]
        return collect.PredictionMeta(
            headers=np.array(headers, dtype=object),
            contig_end=np.array(end, np.int8),
            seqlen=np.repeat(
                [w * 2000 for w in windows_per_contig], windows_per_contig
            ).astype(np.int32),
            g=np.full(n, 500), c=np.full(n, 500),
            a=np.full(n, 500), t=np.full(n, 500),
            gc_skew=np.zeros(n, np.float32),
        )

    def test_reduce_and_write(self, tmp_path):
        rng = np.random.default_rng(0)
        wpc = [3, 5, 2]
        meta = self._meta(wpc)
        logits = rng.normal(size=(10, 3)).astype(np.float32)
        logits[3:8, 1] += 4.0  # contig c1 looks viral
        rel = rng.normal(size=(10, 1)).astype(np.float32)
        data, full = collect.reduce_windows(
            logits, meta, fsize=2000, num_classes=3, reliability=rel,
            class_names=["chromosome", "phage", "plasmid"],
        )
        assert list(data["headers"]) == ["c0", "c1", "c2"]
        assert data["consensus"][1] == 1
        assert len(full["predictions"][1]) == 5
        n = collect.write_output(
            data,
            output_table_path=tmp_path / "out.tsv",
            output_phage_table_path=tmp_path / "phage.tsv",
            labels=["chromosome", "phage", "plasmid"], indices=[0, 1, 2],
        )
        assert n == 3
        df = pd.read_table(tmp_path / "out.tsv")
        assert df.loc[1, "prediction"] == "phage"
        assert "window_summary" in df.columns
        assert (tmp_path / "phage.tsv").exists()

    def test_two_pass_row_order(self):
        """Short contigs (seqlen < fsize) list AFTER all full-size
        contigs — the reference runs the full-window pass first and
        appends the short-window pass (predict.py:771-816); pinned
        end-to-end by tests/test_e2e_live_reference.py fuzz cases."""
        rng = np.random.default_rng(2)
        meta = self._meta([1, 2, 1, 3])
        # c0 and c2 are short-pass contigs
        meta.seqlen[0] = 400
        meta.seqlen[3] = 900
        logits = rng.normal(size=(7, 3)).astype(np.float32)
        data, full = collect.reduce_windows(
            logits, meta, fsize=2000, num_classes=3,
            class_names=["chromosome", "phage", "plasmid"],
        )
        assert list(data["headers"]) == ["c1", "c3", "c0", "c2"]
        assert list(data["length"]) == [4000, 6000, 400, 900]
        # per-contig window groups permute with the rows
        assert [len(p) for p in full["predictions"]] == [2, 3, 1, 1]
        np.testing.assert_array_equal(full["predictions"][0], logits[1:3])
        np.testing.assert_array_equal(full["predictions"][2], logits[:1])

    def test_binary_head(self):
        rng = np.random.default_rng(1)
        meta = self._meta([4])
        logits = rng.normal(size=(4, 1)).astype(np.float32) + 3.0
        data, _ = collect.reduce_windows(
            logits, meta, fsize=2000, num_classes=2,
            class_names=["host", "phage"],
        )
        assert data["consensus"][0] == 1.0

    def test_binary_entropy_uses_sigmoid_probabilities(self):
        """Pins the documented divergence: binary entropy is computed on
        sigmoid(logit), not on the raw logit (which the reference clips
        to [eps, 1-eps] as if it were a probability)."""
        meta = self._meta([2])
        logits = np.array([[0.0], [-3.0]], dtype=np.float32)
        data, _ = collect.reduce_windows(
            logits, meta, fsize=2000, num_classes=2,
            class_names=["host", "phage"],
        )
        from jaeger_tpu.postprocess import helpers as H

        p = H.sigmoid(logits)
        expected = np.mean(-(p * np.log2(p) + (1 - p) * np.log2(1 - p)))
        np.testing.assert_allclose(
            float(data["entropy"][0]), expected, rtol=1e-3
        )
        # a logit of 0.0 is p=0.5 -> entropy 1 bit; the reference's
        # raw-logit form clips both logits to eps and would give ~0
        assert float(data["entropy"][0]) > 0.5


class TestCPD:
    def test_detects_step(self):
        x = np.concatenate([np.zeros(30), np.ones(20) * 3.0, np.zeros(30)])
        bkps = kernel_cpd_linear(x, pen=1.0)
        assert bkps[-1] == 80
        assert any(abs(b - 30) <= 1 for b in bkps)
        assert any(abs(b - 50) <= 1 for b in bkps)

    def test_high_penalty_no_breaks(self):
        x = np.random.default_rng(0).normal(size=60) * 0.01
        assert kernel_cpd_linear(x, pen=100.0) == [60]

    def test_knee(self):
        # classic convex decreasing curve with a knee
        x = np.array([10, 7, 5, 3, 2, 2, 2, 2, 2])[::-1]  # ascending
        y = np.arange(9)[::-1]
        kn = KneeLocator(x, y, curve="convex", direction="decreasing")
        assert kn.knee is not None

    def test_segment_end_to_end(self):
        from jaeger_tpu.postprocess.prophages import segment

        n = 300
        score = np.full(n, 0.3)
        score[120:160] = 3.5  # prophage island
        t = pd.DataFrame({"phage": score,
                          "length": np.arange(n) * 2000})
        result = segment(
            {"contig": [t, "bacteria", n * 2000]},
            cutoff_length=100_000, sensitivity=1.5,
        )
        cords, scores = result["contig"]
        assert len(cords) >= 1
        s, e = cords[0]
        assert 110 <= s <= 130
        assert 150 <= e <= 170
        assert scores[0] > 1.5


class TestSW:
    def test_exact_repeat(self):
        r = smith_waterman("AAATTTGGGCCC", "TTTGGG")
        assert r.score == 12  # 6 matches * 2
        assert r.query_aligned == "TTTGGG"
        assert r.comp == "||||||"

    def test_no_similarity(self):
        r = smith_waterman("AAAAAAA", "GGGGGGG")
        assert r.score <= 2

    def test_gap(self):
        # repeat with one base inserted: open=100 forbids short gaps,
        # expect the longer exact block to win instead
        r = smith_waterman("ATGCATGCATGC", "ATGCAGTGCATGC")
        assert r.score >= 10

    def test_positions(self):
        q = "NNNNATGCATGCNNNN"
        ref = "XXATGCATGCXX"
        r = smith_waterman(q, ref)
        assert q[r.end_query - r.length + 1 : r.end_query + 1] == "ATGCATGC"


class TestTermini:
    def test_dtr_detection(self, random_dna):
        core = random_dna(3000)
        repeat = random_dna(60)
        seq = repeat + core + repeat
        res = scan_contig("ctg1", seq)
        assert res["terminal_repeats"] == "DTR"
        assert res["repeat_length"] >= 55
        assert res["identity"] > 0.95

    def test_itr_detection(self, random_dna):
        core = random_dna(3000)
        repeat = random_dna(60)
        seq = repeat + core + reverse_complement(repeat)
        res = scan_contig("ctg1", seq)
        assert res["terminal_repeats"] == "ITR"

    def test_no_repeat(self, random_dna):
        res = scan_contig("ctg1", random_dna(2500))
        assert res["terminal_repeats"] is None


class TestGenes:
    def test_orf_and_refine(self):
        from jaeger_tpu.postprocess.genes import (
            find_genes, refine_boundary, refine_region,
        )

        gene = "ATG" + "GCT" * 40 + "TAA"   # 126 nt ORF
        seq = "C" * 50 + gene + "C" * 50
        genes = find_genes(seq)
        assert any(s == 50 and e == 50 + len(gene) for s, e in genes)
        # boundary inside the gene snaps outward
        inside = 60
        left = refine_boundary(inside, genes, "left")
        assert left == 50
        right = refine_boundary(inside, genes, "right")
        assert right == 50 + len(gene)
        rs, re_ = refine_region(60, 100, genes)
        assert rs == 50 and re_ == 50 + len(gene)
        # max extension caps movement
        capped = refine_boundary(inside, genes, "left", max_extension=5)
        assert capped == 55

    def test_rbs_start_selection(self):
        """Prodigal-style start choice: a strong Shine-Dalgarno site
        outweighs a slightly longer upstream extension."""
        from jaeger_tpu.postprocess.genes import find_genes

        body = "GCT" * 40 + "TAA"
        # early ATG with no RBS; 7 codons later a second ATG preceded by
        # a perfect AGGAGG at spacer 6 — the RBS (+3.0) outweighs the
        # 7-codon length advantage (+2.1)
        seq = (
            "C" * 30
            + "ATG" + "CAC" * 2                      # early start, no RBS
            + "AGGAGG" + "CCCCCC"                    # SD + spacer, in-frame
            + "ATG" + body
            + "C" * 30
        )
        genes = find_genes(seq)
        late_start = seq.index("ATG" + body)
        assert any(s == late_start for s, e in genes), genes

    def test_overlap_conflict_resolution(self):
        """The DP keeps the strong gene and drops a conflicting weak
        candidate (old maximal-ORF mode returned both)."""
        from jaeger_tpu.postprocess.genes import _select, find_genes

        strong = (0, 300, 10.0)
        weak_far = (250, 400, 2.0)     # 50 nt overlap: allowed
        weak_near = (200, 400, 2.0)    # 100 nt overlap: conflict
        chosen, total = _select([strong, weak_far])
        assert [c[:2] for c in chosen] == [(0, 300), (250, 400)]
        assert total == 12.0
        chosen, total = _select([strong, weak_near])
        assert [c[:2] for c in chosen] == [(0, 300)] and total == 10.0
        # negative-score candidates never selected
        assert _select([(0, 300, -1.0)]) == ([], 0.0)

        # mode='orf' retains the permissive superset
        gene = "ATG" + "GCT" * 40 + "TAA"
        seq = "C" * 30 + gene + "C" * 30
        sup = find_genes(seq, mode="orf")
        assert any(s == 30 for s, e in sup)

    def test_hex_score_matches_naive(self):
        """The stride-3 prefix-sum coding score equals a direct sum of
        in-frame interior hexamer log-odds."""
        import numpy as np

        from jaeger_tpu.postprocess.genes import (
            _hex_ids, _hex_score, _prefix_from_logodds,
        )

        rng = np.random.default_rng(0)
        seq = "".join(rng.choice(list("ACGT"), size=400))
        lo = rng.normal(size=4096)
        ids = _hex_ids(seq)
        pref = _prefix_from_logodds(ids, lo)
        for start, end in [(12, 120), (1, 91), (2, 302), (350, 398)]:
            naive = sum(
                lo[ids[p]]
                for p in range(start + 3, end - 8, 3)
                if ids[p] >= 0
            )
            assert abs(_hex_score(pref, start, end) - naive) < 1e-9

    def test_hexamer_training_learns_coding_bias(self):
        """Self-trained log-odds are positive for hexamers enriched in
        first-pass gene interiors and negative for background-only ones."""
        import numpy as np

        from jaeger_tpu.postprocess.genes import (
            _hex_ids, _hex_logodds, _interior_positions,
        )

        gene_body = "GCTGAA" * 30            # one dominant hexamer
        gene = "ATG" + gene_body + "TAA"
        spacer = "TTTTTT" * 20
        seq = (spacer + gene) * 8 + spacer
        genes = []
        pos = 0
        for _ in range(8):
            pos += len(spacer)
            genes.append((pos, pos + len(gene)))
            pos += len(gene)
        ids = _hex_ids(seq)
        empty = np.zeros(0, np.int64)
        lo = _hex_logodds(ids, np.full(6, -1, np.int64),
                          _interior_positions(genes), empty)
        assert lo is not None

        def hid(h):
            return int(_hex_ids(h + "AAAAA")[0])

        assert lo[hid("GCTGAA")] > 0.5      # in-frame interior hexamer
        assert lo[hid("GAAGCT")] > 0.5      # the alternating interior one
        assert lo[hid("TTTTTT")] < -0.5     # background only

    def test_genetic_code_autodetect_tga_readthrough(self):
        """Genes riddled with in-frame TGA (code 4, TGA=Trp) fragment
        under code 11; the sweep must pick code 4 and call them intact."""
        from jaeger_tpu.postprocess.genes import find_genes

        # 7-codon unit CAT GAT CAT CTA GCT ATC TGA: frame 0 is clean
        # under code 4 (TGA=Trp) but every other frame on BOTH strands
        # contains a code-11 stop within each 21-nt repeat, so under
        # code 11 nothing >= min_len exists anywhere
        unit = "CATGATCATCTAGCTATCTGA"
        gene = "ATG" + unit * 17 + "TAA"
        spacer = "CCCCCCCCCC"
        seq = (spacer + gene) * 4 + spacer
        pinned11 = find_genes(seq, genetic_code=11)
        assert pinned11 == [], pinned11
        auto = find_genes(seq)
        true = [
            (10 + i * (10 + len(gene)), 10 + i * (10 + len(gene)) + len(gene))
            for i in range(4)
        ]
        assert auto == true, auto
        assert find_genes(seq, genetic_code=4) == auto

    def test_genetic_code_11_stays_default_on_standard_genes(self):
        """A standard-code contig must give identical calls with the
        sweep and with genetic_code=11 (the prior holds)."""
        import numpy as np

        rng = np.random.default_rng(2)
        from jaeger_tpu.postprocess.genes import find_genes

        aa_codons = ["GCT", "GAA", "CTG", "AAA", "GAT"]
        genes = []
        seq = ""
        for _ in range(5):
            seq += "".join(rng.choice(list("ACGT"), size=40))
            body = "".join(aa_codons[rng.integers(len(aa_codons))]
                           for _ in range(80))
            g = "ATG" + body + "TAA"
            genes.append((len(seq), len(seq) + len(g)))
            seq += g
        seq += "".join(rng.choice(list("ACGT"), size=40))
        assert find_genes(seq) == find_genes(seq, genetic_code=11)

    def test_unsupported_genetic_code_raises(self):
        import pytest

        from jaeger_tpu.postprocess.genes import find_genes

        with pytest.raises(ValueError, match="unsupported genetic code"):
            find_genes("ATGAAATAA", genetic_code=7)


def test_circular_plot_renders_reference_layout(tmp_path):
    """The circos-style plot renders the reference's track layout and
    file naming ({base}_jaeger_{contig}.pdf)."""
    import numpy as np
    import pandas as pd

    from jaeger_tpu.postprocess import prophages as pro

    n = 30
    t = pd.DataFrame({
        "length": np.arange(n) * 2000,
        "phage": np.linspace(0, 4, n),
        "bacteria": np.linspace(2, 0, n),
        "gc": np.random.default_rng(0).uniform(0.3, 0.6, n),
        "gc_skew": np.random.default_rng(1).uniform(-0.2, 0.2, n),
    })
    out = pro.plot_scores(
        {"c1 extra": (t, "bacteria", n * 2000)}, fsize=2000,
        infile_base="x", outdir=tmp_path,
        phage_cordinates={"c1 extra": ([(5, 10)], [3.0])},
    )
    assert out == [tmp_path / "x_jaeger_c1.pdf"]
    assert out[0].stat().st_size > 5000


class TestRefinementMergeRules:
    """Window-level merge/abstain semantics of refinement.refine()
    (restructured round 4: rules driven from MERGE_MAP)."""

    def _df(self, rows):
        import pandas as pd

        from jaeger_tpu.postprocess import refinement as R

        recs = []
        for top, second, top_logit, margin in rows:
            s = {c: top_logit - margin - 10.0 for c in R.SCORE_COLS}
            s[f"{top}_score"] = top_logit
            s[f"{second}_score"] = top_logit - margin
            recs.append(s)
        df = pd.DataFrame(recs)
        return R.add_score_features(df)

    def _taus(self, logit=-1.0, margin=0.5):
        from jaeger_tpu.postprocess import refinement as R

        return {c: {"logit": logit, "margin": margin, "n": 100}
                for c in R.CLASSES}

    def test_under_margin_pairs_merge_both_orders(self):
        from jaeger_tpu.postprocess import refinement as R

        df = self._df([
            ("bacteria", "plasmid", 5.0, 0.1),
            ("plasmid", "bacteria", 5.0, 0.1),
            ("phage", "virus", 5.0, 0.1),
            ("virus", "phage", 5.0, 0.1),
        ])
        out = R.refine(df, self._taus())
        assert list(out["refined_prediction"]) == [
            "bacteria_or_plasmid", "bacteria_or_plasmid",
            "virus_any", "virus_any",
        ]

    def test_confident_windows_keep_their_class(self):
        from jaeger_tpu.postprocess import refinement as R

        df = self._df([
            ("bacteria", "plasmid", 5.0, 2.0),  # margin above tau
            ("phage", "bacteria", 5.0, 0.1),    # not a merge pair
        ])
        out = R.refine(df, self._taus())
        # above-margin pair keeps its call; non-pair low margin abstains
        assert list(out["refined_prediction"]) == ["bacteria", "unknown"]

    def test_low_logit_abstains_but_merged_windows_do_not(self):
        from jaeger_tpu.postprocess import refinement as R

        df = self._df([
            ("bacteria", "plasmid", -5.0, 0.1),  # merged: immune
            ("eukarya", "archaea", -5.0, 2.0),   # low logit: unknown
        ])
        out = R.refine(df, self._taus())
        assert list(out["refined_prediction"]) == [
            "bacteria_or_plasmid", "unknown"]

    def test_disabled_rules_fall_through_to_abstain(self):
        from jaeger_tpu.postprocess import refinement as R

        df = self._df([
            ("bacteria", "plasmid", 5.0, 0.1),
            ("phage", "virus", 5.0, 0.1),
        ])
        out = R.refine(df, self._taus(), merge_bp=False, merge_pv=False)
        assert list(out["refined_prediction"]) == ["unknown", "unknown"]
