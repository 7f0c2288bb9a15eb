"""Metagenomic gene calling for prophage boundary refinement.

Role parity: the reference calls ``pyrodigal_gv.ViralGeneFinder(meta=True)``
(``postprocess/prophage_boundaries.py:25-48``) solely to obtain gene
intervals for snapping window-grid prophage boundaries to intergenic
positions. This module implements a Prodigal-style caller scoped to that
interface:

* candidate generation per stop-to-stop region with EVERY in-frame start
  codon considered (ATG/GTG/TTG; stops TAA/TAG/TGA), both strands;
* per-candidate scoring: length log-odds (random ORFs hit a stop every
  ~21 codons, so coding length is evidence), start-codon type weights
  (ATG > GTG > TTG, Prodigal's ordering), and a Shine-Dalgarno
  ribosome-binding-site score over the upstream window (AGGAGG sub-motifs
  with spacer-dependent weights — Prodigal's RBS bins, simplified);
* gene selection by dynamic programming over compatible candidates
  (small inter-gene overlaps allowed, as in Prodigal's connection
  scoring), so weak/spurious ORFs drop out and each region gets ONE
  chosen start.

Remaining divergence vs pyrodigal-gv (documented): no pre-trained
hexamer coding statistics and no genetic-code auto-detection (gv's
TAG/TGA-readthrough viral codes); interval-level agreement on ordinary
coding regions is what the boundary snapper needs.
"""

from __future__ import annotations

from bisect import bisect_right

_STOPS = {"TAA", "TAG", "TGA"}
_STARTS = {"ATG", "GTG", "TTG"}
_COMP = str.maketrans("ATGCatgc", "TACGtacg")

# Prodigal-flavoured scoring weights (relative scale is what matters:
# the DP keeps only positive-score genes)
_START_W = {"ATG": 1.0, "GTG": 0.25, "TTG": -0.5}
_LEN_W = 0.30          # per codon beyond the chance baseline
_LEN_BASE = 25         # ~chance ORF length in codons
_MAX_OVERLAP = 60      # nt of allowed overlap between selected genes

#: SD sub-motifs scored in the upstream window, strongest first
_RBS_MOTIFS = (
    ("AGGAGG", 3.0), ("GGAGG", 2.5), ("AGGAG", 2.5), ("AGGA", 1.5),
    ("GGAG", 1.5), ("GAGG", 1.5), ("AGG", 0.8), ("GGA", 0.5),
)


def _rbs_score(seq: str, start: int) -> float:
    """Best SD-motif score in the 5-14 nt spacer window upstream of
    ``start`` (Prodigal's RBS spacer bins, simplified to a triangular
    spacer weight peaking at 5-10 nt)."""
    lo = max(0, start - 20)
    region = seq[lo:start]
    best = 0.0
    for motif, w in _RBS_MOTIFS:
        idx = region.find(motif)
        while idx != -1:
            spacer = start - (lo + idx + len(motif))
            if 3 <= spacer <= 15:
                spacer_w = 1.0 if 5 <= spacer <= 10 else 0.6
                best = max(best, w * spacer_w)
            idx = region.find(motif, idx + 1)
    return best


def _candidates_forward(seq: str, min_len: int):
    """Scored gene candidates on the forward strand.

    Yields ``(start, end, score)`` with ``end`` at the stop codon's 3'
    side; every in-frame start within a stop-to-stop region produces a
    candidate (Prodigal evaluates all starts, not just the first).
    """
    n = len(seq)
    for frame in range(3):
        starts: list[int] = []
        for i in range(frame, n - 2, 3):
            codon = seq[i : i + 3]
            if codon in _STOPS:
                end = i + 3
                for s in starts:
                    if end - s >= min_len:
                        yield s, end, _score(seq, s, end)
                starts = []
            elif codon in _STARTS:
                starts.append(i)
        # open region at the contig edge (Prodigal allows runoff genes)
        end = n - (n - frame) % 3
        for s in starts:
            if end - s >= min_len:
                yield s, end, _score(seq, s, end, edge=True)


def _score(seq: str, start: int, end: int, edge: bool = False) -> float:
    codons = (end - start) // 3
    score = _LEN_W * (codons - _LEN_BASE)
    score += _START_W.get(seq[start : start + 3], -0.5)
    score += _rbs_score(seq, start)
    if edge:
        score -= 0.5
    return score


def _select(cands: list[tuple[int, int, float]]) -> list[tuple[int, int]]:
    """Max-weight compatible subset (overlaps <= _MAX_OVERLAP allowed).

    Weighted-interval DP over candidates sorted by end — Prodigal's
    connection-scoring dynamic program restricted to overlap rules.
    """
    cands = sorted((c for c in cands if c[2] > 0), key=lambda c: c[1])
    if not cands:
        return []
    ends = [c[1] for c in cands]
    # dp[i] = best total using candidates[0..i-1]; keep chosen set via
    # parent pointers
    best = [0.0] * (len(cands) + 1)
    take = [False] * len(cands)
    prev = [0] * len(cands)
    for i, (s, e, w) in enumerate(cands):
        j = bisect_right(ends, s + _MAX_OVERLAP, 0, i)
        prev[i] = j
        with_i = best[j] + w
        if with_i > best[i]:
            best[i + 1] = with_i
            take[i] = True
        else:
            best[i + 1] = best[i]
    out = []
    i = len(cands)
    while i > 0:
        if take[i - 1]:
            s, e, _ = cands[i - 1]
            out.append((s, e))
            i = prev[i - 1]
        else:
            i -= 1
    out.reverse()
    return out


def find_genes(sequence: str, min_len: int = 90,
               mode: str = "scored") -> list[tuple[int, int]]:
    """0-based half-open gene intervals on both strands, sorted.

    ``mode='scored'`` (default) runs the Prodigal-style start selection
    + DP; ``mode='orf'`` returns the round-1 maximal-ORF superset."""
    seq = sequence.upper()
    n = len(seq)
    rc = seq.translate(_COMP)[::-1]
    if mode == "orf":
        intervals = [
            (s, e) for s, e, _ in _candidates_forward(seq, min_len)
        ]
        intervals += [
            (n - e, n - s) for s, e, _ in _candidates_forward(rc, min_len)
        ]
        intervals.sort()
        return _merge_same_stop(intervals)
    cands = list(_candidates_forward(seq, min_len))
    cands += [
        (n - e, n - s, w) for s, e, w in _candidates_forward(rc, min_len)
    ]
    return _select(cands)


def _merge_same_stop(intervals: list[tuple[int, int]]):
    """Keep the longest ORF per stop (round-1 behavior for mode='orf')."""
    by_end: dict[int, tuple[int, int]] = {}
    for s, e in intervals:
        cur = by_end.get(e)
        if cur is None or s < cur[0]:
            by_end[e] = (s, e)
    return sorted(by_end.values())


def _is_intergenic(position: int, genes: list[tuple[int, int]]) -> bool:
    for start, end in genes:
        if start <= position < end:
            return False
        if start > position:
            break
    return True


def refine_boundary(position: int, genes: list[tuple[int, int]], side: str,
                    max_extension: int | None = None) -> int:
    """Snap one boundary outward to the nearest intergenic position.

    Parity: reference ``prophage_boundaries.py:63-123`` — left boundaries
    move to the containing gene's start, right boundaries to its end,
    capped at ``max_extension``.
    """
    if side not in {"left", "right"}:
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    if _is_intergenic(position, genes):
        return position
    containing = next(
        ((s, e) for s, e in genes if s <= position < e), None
    )
    if containing is None:
        return position
    gene_start, gene_end = containing
    refined = gene_start if side == "left" else gene_end
    if max_extension is not None and abs(refined - position) > max_extension:
        refined = (
            position + max_extension if side == "right"
            else position - max_extension
        )
    return refined


def refine_region(raw_start: int, raw_end: int, genes, max_extension=None):
    return (
        refine_boundary(raw_start, genes, "left", max_extension),
        refine_boundary(raw_end, genes, "right", max_extension),
    )


def refine_prophage_boundaries(
    prophage_cordinates: dict,
    fasta_path,
    fsize: int,
    max_extension: int | None = None,
    stride: int | None = None,
) -> dict[str, list[tuple[int, int, int, int]]]:
    """Per-contig (raw_start, raw_end, refined_start, refined_end) tuples.

    Parity: reference ``prophage_boundaries.py:138-193`` — raw region =
    [first-window start, last-window end], default cap ``2*fsize``.
    """
    from jaeger_tpu.seqops.fasta import read_fasta

    if max_extension is None:
        max_extension = 2 * fsize
    step = stride or fsize
    refined: dict[str, list[tuple[int, int, int, int]]] = {}
    for header, sequence in read_fasta(str(fasta_path)):
        header = header.strip().replace(",", "___")
        if header not in prophage_cordinates:
            continue
        cords, _ = prophage_cordinates[header]
        if len(cords) == 0:
            refined[header] = []
            continue
        genes = find_genes(sequence)
        contig_refined = []
        for start_idx, end_idx in cords:
            raw_start = int(start_idx * step)
            raw_end = int((end_idx - 1) * step + fsize)
            rs, re_ = refine_region(raw_start, raw_end, genes, max_extension)
            contig_refined.append(
                (raw_start, raw_end, max(rs, 0), min(re_, len(sequence)))
            )
        refined[header] = contig_refined
    return refined
