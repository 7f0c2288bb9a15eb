"""Synthetic / corrupted sequence generators.

Parity target: reference ``seqops/synthetic.py:17-217`` — homopolymers,
tandem repeats, biased and low-entropy sequences, and the windowed
perturbations (sub-sequence repeats, tandem-repeat windows, N-stretches,
chimera mixes) used to build out-of-distribution training data.
"""

from __future__ import annotations

import random

import numpy as np

from jaeger_tpu.seqops.stats import shannon_entropy
from jaeger_tpu.seqops.transform import dinuc_shuffle, kmer_shuffle


def generate_homopolymer(length: int, base: str = "A") -> str:
    return base * length


def generate_tandem_repeat(motif: str, copies: int) -> str:
    return motif * copies


def generate_random_tandem_repeats(
    num_sequences: int,
    motif_length_range: tuple = (3, 30),
    copy_number: int = 2000,
    alphabet=("A", "C", "G", "T"),
    max_len: int = 2048,
) -> list[str]:
    out = []
    for _ in range(num_sequences):
        motif_len = random.randint(*motif_length_range)
        motif = "".join(random.choices(alphabet, k=motif_len))
        out.append(generate_tandem_repeat(motif, copy_number)[:max_len])
    return out


def generate_biased_sequence(length: int, freqs: dict | None = None) -> str:
    if freqs is None:
        freqs = {"A": 0.7, "C": 0.1, "G": 0.1, "T": 0.1}
    return "".join(
        random.choices(list(freqs.keys()), weights=list(freqs.values()),
                       k=length)
    )


def generate_low_entropy_sequence(length: int, window_size: int,
                                  threshold: float,
                                  max_attempts: int = 10000) -> str:
    for _ in range(max_attempts):
        seq = generate_biased_sequence(length)
        if all(
            shannon_entropy(seq[i : i + window_size]) < threshold
            for i in range(length - window_size + 1)
        ):
            return seq
    raise ValueError(
        f"failed to generate a low-entropy sequence in {max_attempts} tries"
    )


def _random_window(seq_len: int, window_fraction: float) -> tuple[int, int]:
    window_len = max(1, int(seq_len * window_fraction))
    start = random.randint(0, max(0, seq_len - window_len))
    return start, start + window_len


def apply_shuffle(seq: str) -> str:
    chars = list(seq)
    random.shuffle(chars)
    return "".join(chars)


def apply_dinuc_shuffle(seq: str) -> str:
    # Intentional improvement over the reference: its apply_dinuc_shuffle
    # constructs a FRESH np.random.RandomState (transform.py:112-131),
    # so reference reliability datasets using dinuc mode are
    # irreproducible even under its own chunk seeding.  Routing through
    # the global np.random stream makes our generation deterministic
    # under the chunk seed (pinned in tests/test_synthetic_live_parity).
    return dinuc_shuffle(seq, rng=np.random)


def apply_kmer_shuffle(seq: str, k: int = 2) -> str:
    # Same reproducibility fix: the reference's kmer_shuffle uses an
    # unseeded np.random.default_rng() (transform.py:88-106).
    return kmer_shuffle(seq, k=k, rng=np.random)


def apply_subseq_repeat_window(seq: str, window_fraction: float = 0.25) -> str:
    """Replace a random window with a repeated subsequence of the input."""
    if not seq:
        return seq
    seq_len = len(seq)
    start, end = _random_window(seq_len, window_fraction)
    window_len = end - start
    sub_len = random.randint(1, min(window_len, seq_len))
    sub_start = random.randint(0, seq_len - sub_len)
    sub = seq[sub_start : sub_start + sub_len]
    fill = (sub * (window_len // sub_len + 1))[:window_len]
    return seq[:start] + fill + seq[end:]


def apply_tandem_repeat_window(
    seq: str,
    motif_length_range: tuple[int, int] = (3, 10),
    window_fraction: float = 0.25,
    num_repeats: int | None = None,
) -> str:
    """Replace a random window with a tandem repeat of a random motif."""
    if not seq:
        return seq
    seq_len = len(seq)
    start, end = _random_window(seq_len, window_fraction)
    window_len = end - start
    motif_len = random.randint(*motif_length_range)
    motif = "".join(random.choices("ACGT", k=motif_len))
    if num_repeats:
        block = motif * num_repeats
        fill = (block * (window_len // len(block) + 1))[:window_len]
    else:
        fill = (motif * (window_len // motif_len + 1))[:window_len]
    return seq[:start] + fill + seq[end:]


def apply_n_stretch(
    seq: str,
    n_fraction_range: tuple[float, float] = (0.3, 1.0),
    max_stretches: int = 3,
    point_n_share: float = 0.2,
) -> str:
    """Replace a sampled fraction of the sequence with Ns — part scattered
    single positions, part contiguous non-overlapping stretches."""
    if not seq:
        return seq
    seq_len = len(seq)
    fraction = random.uniform(*n_fraction_range)
    total_n = min(seq_len, max(1, round(seq_len * fraction)))
    n_points = min(total_n, round(total_n * point_n_share))
    stretch_n = total_n - n_points

    chars = list(seq)
    if stretch_n > 0:
        n_stretches = random.randint(1, max(1, min(max_stretches, stretch_n)))
        remaining = stretch_n
        lengths = []
        for i in range(n_stretches - 1):
            take = random.randint(1, remaining - (n_stretches - 1 - i))
            lengths.append(take)
            remaining -= take
        lengths.append(remaining)
        n_keep = seq_len - stretch_n
        cuts = sorted(random.choices(range(n_keep + 1), k=n_stretches))
        gaps = (
            [cuts[0]]
            + [cuts[i + 1] - cuts[i] for i in range(n_stretches - 1)]
            + [n_keep - cuts[-1]]
        )
        pos = 0
        for i in range(n_stretches):
            pos += gaps[i]
            chars[pos : pos + lengths[i]] = "N" * lengths[i]
            pos += lengths[i]
    if n_points > 0:
        free = [i for i, c in enumerate(chars) if c != "N"]
        for i in random.sample(free, k=min(n_points, len(free))):
            chars[i] = "N"
    return "".join(chars)


def apply_mix(sequences: list[str], output_length: int | None = None,
              pad_value: str = "N") -> str:
    """Chimeric mix of one random subsegment per source sequence.

    Reference semantics (``seqops/synthetic.py:217-264``, RNG
    stream-identical): without *output_length* the sources concatenate
    whole; otherwise ``n-1`` sorted sample cuts partition the output
    length into per-source segment budgets, each source contributes a
    random-start subsegment of (at most) its budget, and the result is
    padded with *pad_value* up to *output_length*.
    """
    if not sequences:
        raise ValueError("apply_mix requires at least one sequence")
    if output_length is not None and output_length < 0:
        raise ValueError("output_length must be non-negative")
    if output_length is None:
        return "".join(sequences)
    if output_length == 0:
        return ""

    n = len(sequences)
    if output_length < n:
        cuts = list(range(output_length)) + [output_length]
    else:
        cuts = sorted(random.sample(range(output_length), k=n - 1))
    cuts = [0] + cuts + [output_length]
    segment_lengths = [cuts[i + 1] - cuts[i] for i in range(n)]

    segments: list[str] = []
    for seq, seg_len in zip(sequences, segment_lengths):
        seq_len = len(seq)
        if seq_len == 0 or seg_len <= 0:
            segments.append("")
            continue
        actual_len = min(seg_len, seq_len)
        start = random.randint(0, seq_len - actual_len)
        segments.append(seq[start : start + actual_len])

    chimera = "".join(segments)
    if len(chimera) < output_length:
        chimera += pad_value * (output_length - len(chimera))
    return chimera
