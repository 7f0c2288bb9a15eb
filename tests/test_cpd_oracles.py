"""Independent oracles for the CPD + knee engines (round-2 verdict item 5:
the prophage live-parity installs OUR engines into the reference, so these
numerics need oracles that do NOT share the implementation under test).

* exhaustive enumeration over ALL valid segmentations (tiny n) and an
  independent O(n^2) forward DP (larger n), both computing segment costs
  directly from raw numpy means — no code shared with the PELT engine;
* the Kneedle paper's figure-2 curve (Satopaa et al. 2011; the kneed
  library's canonical DataGenerator.figure2 example, knee = 0.222...).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from jaeger_tpu.postprocess.cpd import KneeLocator, kernel_cpd_linear


def _segment_cost(x: np.ndarray, s: int, e: int) -> float:
    """Linear-kernel cost = within-segment sum of squared deviations,
    computed the naive way (mean-centered SSE)."""
    seg = x[s:e]
    mu = seg.mean(axis=0)
    return float(((seg - mu) ** 2).sum())


def _total(x: np.ndarray, bkps: list[int], pen: float) -> float:
    edges = [0] + list(bkps)
    return sum(
        _segment_cost(x, a, b) for a, b in zip(edges, edges[1:])
    ) + pen * (len(bkps) - 1)


def _exhaustive_best(x: np.ndarray, pen: float, min_size: int):
    """Enumerate EVERY segmentation whose segments all have
    >= min_size points; return (best breakpoints, best cost)."""
    n = len(x)
    interior = range(min_size, n - min_size + 1)
    best, best_bkps = np.inf, [n]
    for k in range(0, len(list(interior)) + 1):
        for cuts in combinations(interior, k):
            bkps = list(cuts) + [n]
            edges = [0] + bkps
            if any(b - a < min_size for a, b in zip(edges, edges[1:])):
                continue
            c = _total(x, bkps, pen)
            if c < best - 1e-12:
                best, best_bkps = c, bkps
    return best_bkps, best


def _forward_dp_best(x: np.ndarray, pen: float, min_size: int):
    """Independent O(n^2) forward DP (no pruning, naive costs)."""
    n = len(x)
    F = np.full(n + 1, np.inf)
    F[0] = -pen
    arg = np.zeros(n + 1, dtype=int)
    for t in range(min_size, n + 1):
        for s in range(0, t - min_size + 1):
            if not np.isfinite(F[s]):
                continue
            v = F[s] + _segment_cost(x, s, t) + pen
            if v < F[t]:
                F[t], arg[t] = v, s
    bkps, t = [], n
    while t > 0:
        bkps.append(t)
        t = arg[t]
    return sorted(bkps), float(F[n])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("pen", [0.5, 2.0, 8.0])
def test_pelt_matches_exhaustive_enumeration(seed, pen):
    rng = np.random.default_rng(seed)
    n = 14
    x = rng.normal(size=(n, 1))
    x[n // 2:] += rng.normal() * 3  # a plausible change
    got = kernel_cpd_linear(x, pen=pen, min_size=3)
    want, want_cost = _exhaustive_best(x, pen, 3)
    got_cost = _total(x, got, pen)
    # the minimizer may tie; require identical OPTIMAL cost and a valid
    # segmentation, and identical breakpoints when the optimum is unique
    assert got[-1] == n
    assert got_cost == pytest.approx(want_cost, abs=1e-9)
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("pen", [1.0, 5.0, 20.0])
@pytest.mark.parametrize("dims", [1, 3])
def test_pelt_matches_forward_dp(seed, pen, dims):
    rng = np.random.default_rng(100 + seed)
    n = 120
    x = rng.normal(size=(n, dims))
    for at in (30, 55, 90):
        x[at:] += rng.normal(size=dims)
    got = kernel_cpd_linear(x, pen=pen, min_size=3)
    want, want_cost = _forward_dp_best(x, pen, 3)
    assert _total(x, got, pen) == pytest.approx(want_cost, abs=1e-8)
    assert got == want


def test_pelt_short_signal_returns_single_segment():
    assert kernel_cpd_linear(np.zeros((4, 1)), pen=1.0, min_size=3) == [4]


def test_kneedle_paper_figure2():
    """kneed's canonical example (DataGenerator.figure2, from the Kneedle
    paper): x = linspace(0, 1, 10), y = -1/(x+0.1) + 5 -> documented
    knee = 0.22222 with S=1, concave/increasing."""
    x = np.linspace(0.0, 1.0, 10)
    y = -1.0 / (x + 0.1) + 5.0
    kl = KneeLocator(x, y, curve="concave", direction="increasing", S=1.0)
    assert kl.knee == pytest.approx(0.22222, abs=1e-4)


def test_kneedle_convex_decreasing_elbow():
    """The reference's exact call pattern (penalty sweep curve): a convex
    decreasing 1/x-style curve elbows at its curvature maximum."""
    x = np.arange(1, 10, dtype=float)
    y = 1.0 / x
    kl = KneeLocator(x, y, curve="convex", direction="decreasing", S=1.0)
    assert kl.knee == pytest.approx(2.0, abs=1.0)
