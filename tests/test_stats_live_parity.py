"""utils/stats + `utils stats` artifacts pinned LIVE vs the reference.

The reference annotates every contig call with a Welch one-tailed
p-value (top-1 vs top-2 class score at n = total windows) and ships a
paired t-test helper (``utils/stats.py``); ``utils stats`` writes a
plot set + ``jaeger_output_with_pvals.tsv``. Pins our implementations
value-for-value against the live reference module and checks the
artifact set exists.
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

ref_stats = pytest.importorskip("jaeger.utils.stats")

from jaeger_tpu.utils import stats as our_stats  # noqa: E402


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_significant_top_class_matches_live(seed):
    rng = np.random.default_rng(seed)
    l1 = rng.normal(1.0, 0.5, size=40)
    l2 = rng.normal(0.8, 0.5, size=40)
    ours = our_stats.significant_top_class(l1, l2)
    ref = ref_stats.significant_top_class(l1, l2)
    assert ours["significant"] == ref["significant"]
    np.testing.assert_allclose(ours["t_stat"], ref["t_stat"], rtol=1e-12)
    np.testing.assert_allclose(ours["p_value"], ref["p_value"], rtol=1e-12)


@pytest.mark.parametrize("alt", ["greater", "less"])
@pytest.mark.parametrize("seed", [1, 5])
def test_welch_t_matches_live(alt, seed):
    rng = np.random.default_rng(seed)
    m1, m2 = rng.normal(size=2)
    v1, v2 = rng.uniform(0.1, 2.0, size=2)
    n1, n2 = rng.integers(5, 200, size=2)
    ours = our_stats.welch_t_one_tailed(m1, v1, n1, m2, v2, n2, alt)
    ref = ref_stats.welch_t_one_tailed(m1, v1, n1, m2, v2, n2, alt)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def _fake_output_tsv(path, rng, n=40):
    import pandas as pd

    classes = ["bacteria", "phage", "eukarya"]
    rows = []
    for i in range(n):
        scores = rng.dirichlet(np.ones(3))
        rows.append({
            "contig_id": f"c{i}",
            "length": int(rng.integers(2_000, 100_000)),
            "prediction": classes[int(np.argmax(scores))],
            "entropy": float(rng.uniform(0, 1.5)),
            "energy": float(rng.normal(-4, 1)),
            "reliability_score": float(rng.uniform(0, 1)),
            "bacteria_score": scores[0], "phage_score": scores[1],
            "eukarya_score": scores[2],
            "bacteria_var": rng.uniform(0.01, 0.2),
            "phage_var": rng.uniform(0.01, 0.2),
            "eukarya_var": rng.uniform(0.01, 0.2),
            "bacteria_windows": int(rng.integers(1, 30)),
            "phage_windows": int(rng.integers(1, 30)),
            "eukarya_windows": int(rng.integers(1, 30)),
        })
    pd.DataFrame(rows).to_csv(path, sep="\t", index=False)


def test_stats_core_pvals_match_live_math(tmp_path, rng):
    """The pval column equals the live welch_t_one_tailed applied the
    reference's way (top-2 by mean score, n = summed windows)."""
    import pandas as pd

    from jaeger_tpu.commands.utils import stats_core

    tsv = tmp_path / "out.tsv"
    _fake_output_tsv(tsv, rng)
    summary = stats_core(str(tsv), output=str(tmp_path / "plots"))
    got = pd.read_table(summary["pvals_tsv"])
    assert "pval" in got.columns

    df = pd.read_table(tsv)
    mean_cols = ["bacteria_score", "phage_score", "eukarya_score"]
    var_cols = ["bacteria_var", "phage_var", "eukarya_var"]
    win_cols = ["bacteria_windows", "phage_windows", "eukarya_windows"]
    for i in range(len(df)):
        means = df.loc[i, mean_cols].to_numpy(dtype=float)
        variances = df.loc[i, var_cols].to_numpy(dtype=float)
        n = float(df.loc[i, win_cols].sum())
        order = np.argsort(means)[::-1][:2]
        _, _, p = ref_stats.welch_t_one_tailed(
            mean1=means[order[0]], var1=variances[order[0]], n1=n,
            mean2=means[order[1]], var2=variances[order[1]], n2=n)
        assert got.loc[i, "pval"] == pytest.approx(p, abs=5e-4)

    # the reference's artifact set
    for name in ("class_percentages.png", "class_percentages_pval.png",
                 "reliability_scores.png", "entropy.png", "energy.png",
                 "class_scores.png", "reliability_scores_by_length.png",
                 "jaeger_output_with_pvals.tsv"):
        assert (tmp_path / "plots" / name).exists(), name
