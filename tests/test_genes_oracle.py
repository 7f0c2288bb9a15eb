"""Planted-gene oracle for the Prodigal-style caller (round-2 verdict
item 5c): the truth is synthetic genomes with KNOWN planted genes —
coding-biased codon usage, ATG starts, SD ribosome-binding sites, realistic
lengths, both strands — so the agreement measurement shares nothing with
the engine under test. (Genuine pyrodigal-gv goldens are not obtainable
in-image: the package is not installed and there is no network; the
remaining divergence stays documented in postprocess/genes.py.)

Also pins the shipped pre-trained hexamer prior
(jaeger_tpu/data/hexamer_prior.npz, built by
scripts/build_hexamer_prior.py on the bundled real contigs): short /
gene-poor contigs that cannot self-train still get coding statistics.
"""

from __future__ import annotations

import numpy as np
import pytest

from jaeger_tpu.postprocess.genes import (
    find_genes,
    pretrained_hexamer_logodds,
)

_BASES = "ACGT"
_STOPS = {"TAA", "TAG", "TGA"}
_COMP = str.maketrans("ATGC", "TACG")

#: coding-biased codon sampler: GC-rich wobble preference, no stops —
#: a crude but *independent* model of real coding statistics
_CODING_CODONS = [
    a + b + c
    for a in _BASES for b in _BASES for c in "GC"
    if a + b + c not in _STOPS
]


def _coding_codon(rng) -> str:
    return _CODING_CODONS[int(rng.integers(0, len(_CODING_CODONS)))]


def _intergenic(rng, n: int) -> str:
    return "".join(rng.choice(list(_BASES), size=n))


def _plant_genome(rng, n_genes: int = 12, intergenic=(60, 220)):
    """Random genome with planted genes; returns (seq, truth_intervals)."""
    parts: list[str] = []
    truth: list[tuple[int, int, int]] = []  # (start, end, strand)
    pos = 0

    def emit(s: str) -> None:
        nonlocal pos
        parts.append(s)
        pos += len(s)

    emit(_intergenic(rng, int(rng.integers(*intergenic))))
    for _ in range(n_genes):
        n_codons = int(rng.integers(80, 280))
        body = "".join(_coding_codon(rng) for _ in range(n_codons))
        gene = "ATG" + body + "TAA"
        strand = 1 if rng.random() < 0.5 else -1
        if strand == 1:
            # SD ribosome-binding site ~8 nt upstream of the start
            emit(_intergenic(rng, 10) + "AGGAGG" + _intergenic(rng, 7))
            truth.append((pos, pos + len(gene), 1))
            emit(gene)
        else:
            rc = gene.translate(_COMP)[::-1]
            emit(rc)
            truth.append((pos - len(gene), pos, -1))
            emit(_intergenic(rng, 7) + "CCTCCT" + _intergenic(rng, 10))
        emit(_intergenic(rng, int(rng.integers(*intergenic))))
    return "".join(parts), [(s, e) for s, e, _ in truth]


def _nt_mask(intervals, n):
    m = np.zeros(n, bool)
    for s, e in intervals:
        m[max(0, s):max(0, e)] = True
    return m


def _agreement(pred, truth, n):
    pm, tm = _nt_mask(pred, n), _nt_mask(truth, n)
    tp = float((pm & tm).sum())
    prec = tp / max(pm.sum(), 1)
    rec = tp / max(tm.sum(), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    # per-gene recovery at IoU >= 0.5
    hit = 0
    for s, e in truth:
        best = 0.0
        for ps, pe in pred:
            inter = max(0, min(e, pe) - max(s, ps))
            union = max(e, pe) - min(s, ps)
            best = max(best, inter / union)
        hit += best >= 0.5
    return f1, hit / max(len(truth), 1)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_planted_genes_recovered(seed):
    rng = np.random.default_rng(seed)
    seq, truth = _plant_genome(rng)
    pred = find_genes(seq, mode="scored")
    f1, recovered = _agreement(pred, truth, len(seq))
    assert f1 >= 0.80, f"nt-level F1 {f1:.3f}"
    assert recovered >= 0.75, f"gene recovery {recovered:.2f}"


def test_prior_table_shipped_and_sane():
    lo = pretrained_hexamer_logodds()
    assert lo is not None and lo.shape == (4096,)
    # stop-containing hexamers must score against coding on average
    stop_ids = []
    for stop in _STOPS:
        for tail in ("AAA", "GCG", "TTT"):
            h = stop + tail
            i = 0
            for ch in h:
                i = i * 4 + _BASES.index(ch)
            stop_ids.append(i)
    assert np.mean(lo[stop_ids]) < 0
    assert np.isfinite(lo).all()


def _real_orf(min_codons: int = 250) -> str:
    """A long REAL open reading frame cut from the bundled real assembly
    contigs: an ORF of >= 250 codons in genomic DNA is a protein-coding
    gene as a biological fact (chance probability (61/64)^250 ~ 5e-6 per
    position), so its span is ground truth independent of the scorer."""
    from pathlib import Path

    from jaeger_tpu.seqops.fasta import read_fasta

    fasta = (Path(__file__).parent.parent / "jaeger_tpu" / "data" /
             "test" / "test_contigs.fasta")
    for _, seq in read_fasta(str(fasta)):
        seq = seq.upper()
        for frame in range(3):
            last_stop = frame
            i = frame
            while i + 3 <= len(seq):
                if seq[i:i + 3] in _STOPS:
                    if i - last_stop >= 3 * min_codons:
                        region = seq[last_stop:i + 3]
                        at = region.find("ATG")
                        while at != -1 and at % 3 != 0:
                            at = region.find("ATG", at + 1)
                        if at != -1 and (len(region) - at) >= 3 * min_codons:
                            return region[at:]
                    last_stop = i + 3
                i += 3
    raise AssertionError("no long real ORF found in bundled contigs")


def test_short_contig_uses_prior_on_real_gene(monkeypatch):
    """A gene-poor ~1.5 kb contig cannot self-train (first-pass coding nt
    below _MIN_TRAIN_NT): with the shipped pre-trained prior, a REAL gene
    planted in random background is found with matching boundaries."""
    rng = np.random.default_rng(7)
    gene = _real_orf()
    seq = _intergenic(rng, 300) + gene + _intergenic(rng, 300)
    start, end = 300, 300 + len(gene)
    pred = find_genes(seq, mode="scored", genetic_code=11)
    # the stop is frame-exact; the chosen start may sit a few in-frame
    # ATGs downstream (Prodigal behaves the same without RBS context)
    assert any(e == end and abs(s - start) <= 120 and (s - start) % 3 == 0
               for s, e in pred), (pred, (start, end))

    # starve the loader of the table: the no-prior path must still run
    from jaeger_tpu.postprocess import genes as G

    monkeypatch.setattr(G, "_prior_cache", [None])
    pred_noprior = find_genes(seq, mode="scored", genetic_code=11)
    assert isinstance(pred_noprior, list)
