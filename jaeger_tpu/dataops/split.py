"""Metagenomic fragment sampling (genome splitting / assembly simulation).

Parity target: reference ``dataops/split.py:30-...`` — two modes:
sequential walking with random fragment lengths + fixed overlap, or
coverage-based random sampling; optional circular wrap, N-proportion
filter, optional dinucleotide shuffling.
"""

from __future__ import annotations

import random
from typing import Iterator

from jaeger_tpu.seqops.fasta import read_fasta, write_fasta_entry
from jaeger_tpu.seqops.transform import dinuc_shuffle


def _fragments_sequential(seq: str, min_len: int, max_len: int,
                          overlap: int, rng: random.Random) -> Iterator[str]:
    pos = 0
    n = len(seq)
    while pos < n:
        frag_len = (
            min_len if min_len == max_len else rng.randint(min_len, max_len)
        )
        frag = seq[pos : pos + frag_len]
        if len(frag) >= min_len:
            yield frag
        step = max(1, frag_len - overlap)
        pos += step


def _fragments_coverage(seq: str, min_len: int, max_len: int, coverage: float,
                        circular: bool, rng: random.Random) -> Iterator[str]:
    n = len(seq)
    target = coverage * n
    sampled = 0
    while sampled < target:
        frag_len = (
            min_len if min_len == max_len else rng.randint(min_len, max_len)
        )
        if circular:
            start = rng.randrange(n)
            frag = (seq + seq)[start : start + frag_len]
        else:
            if n <= frag_len:
                frag = seq
            else:
                start = rng.randrange(n - frag_len)
                frag = seq[start : start + frag_len]
        sampled += len(frag)
        if len(frag) >= min_len:
            yield frag


def split_core(
    input: str,
    output: str,
    minlen: int = 2000,
    maxlen: int = 5000,
    overlap: int = 0,
    coverage: float | None = None,
    circular: bool = False,
    max_n_prop: float = 0.1,
    seed: int | None = None,
    shuffle: bool = False,
) -> int:
    """Sample fragments from genomes into a FASTA; returns fragment count."""
    rng = random.Random(seed)
    count = 0
    with open(output, "w") as out:
        for header, seq in read_fasta(input):
            seq = seq.upper()
            if shuffle:
                seq = dinuc_shuffle(seq)
            gen = (
                _fragments_coverage(seq, minlen, maxlen, coverage, circular,
                                    rng)
                if coverage is not None
                else _fragments_sequential(seq, minlen, maxlen, overlap, rng)
            )
            for i, frag in enumerate(gen):
                if frag.count("N") / len(frag) > max_n_prop:
                    continue
                write_fasta_entry(out, f"{header}__frag_{count}", frag)
                count += 1
    return count
