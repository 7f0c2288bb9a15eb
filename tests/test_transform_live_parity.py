"""Seed-for-seed parity of the dinucleotide shuffle with the live
reference implementation (``seqops/transform.py`` Altschul–Erickson
Euler walk) — same RNG stream consumption for Generator and RandomState,
including the compounding across ``num_shufs``.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

ref_transform = pytest.importorskip("jaeger.seqops.transform")

from jaeger_tpu.seqops.transform import dinuc_shuffle  # noqa: E402


def _seq(rng, n=300, alphabet="ATGC"):
    return "".join(rng.choice(list(alphabet), size=n))


@pytest.mark.parametrize("seed", [0, 1, 7])
@pytest.mark.parametrize("rng_cls", [np.random.default_rng,
                                     np.random.RandomState])
def test_single_shuffle_matches_live_reference(rng, seed, rng_cls):
    seq = _seq(rng)
    ref = ref_transform.dinuc_shuffle(seq, rng=rng_cls(seed))
    ours = dinuc_shuffle(seq, rng=rng_cls(seed))
    assert ours == ref


def test_multi_shuffle_compounds_like_reference(rng):
    seq = _seq(rng, n=200, alphabet="ATGCN")
    ref = ref_transform.dinuc_shuffle(seq, num_shufs=4,
                                      rng=np.random.default_rng(3))
    ours = dinuc_shuffle(seq, num_shufs=4, rng=np.random.default_rng(3))
    assert ours == ref


def test_dinuc_counts_preserved(rng):
    seq = _seq(rng, n=400)
    out = dinuc_shuffle(seq, rng=np.random.default_rng(0))

    def counts(s):
        from collections import Counter

        return Counter(s[i : i + 2] for i in range(len(s) - 1))

    assert counts(out) == counts(seq)
    assert out != seq
