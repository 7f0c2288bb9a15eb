"""Synthetic OOD sequence generation pinned LIVE, seed-for-seed.

The reliability-data pipeline's corrupted negatives come from
``dataops/synthetic_perturbations.py:319`` in the reference.  Given the
same records, config and base seed, our generator must emit the
IDENTICAL sequence list: the per-spec budget split (explicit
count/multiplier knobs, even remainder, round-robin leftover), the
chunked re-seeding, the in-order ``records[i % n]`` walk, the
distinct-class chimera sampling, and every perturbation's RNG stream
(window draws, motif draws, N-stretch partitions, mix cuts).
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

ref_sp = pytest.importorskip("jaeger.dataops.synthetic_perturbations")

from jaeger_tpu.dataops.reliability_generator import (  # noqa: E402
    compute_perturbation_counts,
    generate_synthetic_sequences,
    normalize_perturbations,
)


def _records(rng, n=30, length=240):
    return [(i % 3, "".join(rng.choice(list("ATGC"), size=length)))
            for i in range(n)]


#: dinuc/kmer shuffle modes are EXCLUDED from the value-for-value
#: comparison: the reference's apply_dinuc_shuffle / kmer_shuffle build
#: fresh unseeded RNGs (transform.py:88-131), so its own output for
#: those modes is irreproducible — see
#: test_reference_dinuc_mode_is_irreproducible_ours_is_not.
CONFIGS = {
    "defaults": {},
    "all_modes": {
        "shuffle": {"mode": ["random"]},
        "n_stretch": True,
        "mix": {"n_segments": 2},
    },
    "explicit_budgets": {
        "shuffle": {"count": 7},
        "subseq_repeat": {"multiplier": 0.5},
        "tandem_repeat": {"motif_length_range": [4, 6], "num_repeats": 3,
                          "window_fraction": 0.4},
        "n_stretch": {"n_fraction_range": [0.2, 0.5], "max_stretches": 2,
                      "point_n_share": 0.3},
        "mix": {"n_segments": 3},
    },
}


def _reference_sequences(records, multiplier, cfg, crop_size, base_seed,
                         chunk):
    """Drive the live reference generator with a pinned base seed (it
    draws ``base_seed = random.randint(...)`` from the global stream)."""
    random.seed(0)
    drawn = random.randint(0, 2**31 - 1)
    assert drawn == base_seed  # the seed our side must use
    random.seed(0)
    return list(ref_sp.generate_synthetic_sequences(
        records, multiplier, cfg, crop_size=crop_size,
        generation_chunk_size=chunk, n_workers=1,
    ))


@pytest.mark.parametrize("name", sorted(CONFIGS))
@pytest.mark.parametrize("multiplier", [1.0, 2.5])
def test_sequences_match_live(name, multiplier, rng):
    cfg = CONFIGS[name]
    records = _records(rng)
    random.seed(0)
    base_seed = random.randint(0, 2**31 - 1)
    ref = _reference_sequences(records, multiplier, cfg, 150, base_seed,
                               chunk=10_000)
    ours = generate_synthetic_sequences(
        records, multiplier, cfg, crop_size=150, seed=base_seed)
    assert ours == ref


def test_chunked_generation_matches_live(rng):
    """A chunk size smaller than any spec's budget exercises the
    seed-per-chunk discipline on both sides."""
    records = _records(rng, n=20)
    random.seed(0)
    base_seed = random.randint(0, 2**31 - 1)
    ref = _reference_sequences(records, 3.0, CONFIGS["all_modes"],
                               None, base_seed, chunk=7)
    ours = generate_synthetic_sequences(
        records, 3.0, CONFIGS["all_modes"], crop_size=None,
        seed=base_seed, generation_chunk_size=7)
    assert ours == ref


def test_budget_split_matches_live(rng):
    records = _records(rng, n=25)
    for cfg in CONFIGS.values():
        specs_ref = ref_sp._normalize_perturbation_cfg(cfg)
        specs_ours = normalize_perturbations(cfg)
        assert [s["name"] for s in specs_ours] == \
            [s["name"] for s in specs_ref]
        for mult in (0.5, 1.0, 3.3):
            ref = ref_sp._compute_perturbation_counts(
                records, mult, specs_ref, cfg)
            ours = compute_perturbation_counts(records, mult,
                                               specs_ours, cfg)
            assert ours == ref, (cfg, mult)


def test_reference_dinuc_mode_is_irreproducible_ours_is_not(rng):
    """Documented improvement: the reference's dinuc/kmer shuffle modes
    build fresh unseeded RNGs, so the SAME seed gives different
    reference outputs run-to-run; ours routes them through the seeded
    global stream and regenerates identically."""
    records = _records(rng, n=8)
    cfg = {"shuffle": {"mode": ["dinuc", "kmer"], "k": 3},
           "subseq_repeat": False, "tandem_repeat": False}

    def ref_run():
        return list(ref_sp.generate_synthetic_sequences(
            records, 2.0, cfg, crop_size=None,
            generation_chunk_size=10_000, n_workers=1))

    random.seed(0)
    a = ref_run()
    random.seed(0)
    b = ref_run()
    assert a != b  # upstream nondeterminism, pinned

    ours_a = generate_synthetic_sequences(records, 2.0, cfg, seed=11)
    ours_b = generate_synthetic_sequences(records, 2.0, cfg, seed=11)
    assert ours_a == ours_b
    assert len(ours_a) == len(a)


def test_mix_requires_distinct_classes(rng):
    records = [(0, "".join(rng.choice(list("ATGC"), size=100)))
               for _ in range(6)]
    with pytest.raises(ValueError, match="distinct classes"):
        generate_synthetic_sequences(
            records, 1.0, {"shuffle": False, "subseq_repeat": False,
                           "tandem_repeat": False,
                           "mix": {"n_segments": 2}},
            seed=3)
