"""Metagenomic ORF scanning for prophage boundary refinement.

Role parity: the reference calls ``pyrodigal_gv.ViralGeneFinder(meta=True)``
(``postprocess/prophage_boundaries.py:25-48``) solely to obtain gene
intervals for snapping window-grid prophage boundaries to intergenic
positions. This module provides that interval interface with a 6-frame ORF
scan (start codons ATG/GTG/TTG, stop TAA/TAG/TGA, minimum length 90 nt —
Prodigal's metagenomic defaults) instead of a full Prodigal-gv port; the
snapping consumer only needs "is this position inside a coding region",
for which maximal ORFs are a faithful superset signal. Documented
divergence: no ribosome-binding-site scoring, so ORF boundaries can differ
from Prodigal's gene calls by a few codons.
"""

from __future__ import annotations

_STOPS = {"TAA", "TAG", "TGA"}
_STARTS = {"ATG", "GTG", "TTG"}
_COMP = str.maketrans("ATGCatgc", "TACGtacg")


def _orfs_forward(seq: str, min_len: int) -> list[tuple[int, int]]:
    n = len(seq)
    out = []
    for frame in range(3):
        start_pos: int | None = None
        for i in range(frame, n - 2, 3):
            codon = seq[i : i + 3]
            if start_pos is None:
                if codon in _STARTS:
                    start_pos = i
            elif codon in _STOPS:
                end = i + 3
                if end - start_pos >= min_len:
                    out.append((start_pos, end))
                start_pos = None
        if start_pos is not None and n - start_pos >= min_len:
            out.append((start_pos, n - (n - frame) % 3))
    return out


def find_genes(sequence: str, min_len: int = 90) -> list[tuple[int, int]]:
    """0-based half-open putative gene intervals on both strands, sorted."""
    seq = sequence.upper()
    n = len(seq)
    intervals = _orfs_forward(seq, min_len)
    rc = seq.translate(_COMP)[::-1]
    for s, e in _orfs_forward(rc, min_len):
        intervals.append((n - e, n - s))
    intervals.sort()
    return intervals


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
