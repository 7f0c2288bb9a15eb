"""Build the shipped pre-trained hexamer coding prior.

Trains the gene caller's two-pass self-training on the bundled REAL
assembly contigs (jaeger_tpu/data/test/test_contigs.fasta — 9 contigs,
30-45 kb, long enough for per-contig self-training to be reliable),
pools the selected genes' interior in-frame hexamer counts against the
pooled background, and writes the log-odds table consumed by
``postprocess/genes.pretrained_hexamer_logodds``.

Role parity: pyrodigal-gv's meta-mode pre-trained profiles (reference
``postprocess/prophage_boundaries.py:25-48``). Genuine pyrodigal
profiles cannot be reproduced in this image (no package, no network);
this table gives short / gene-poor contigs real coding statistics with
the same interface, and the divergence stays documented in genes.py.

Usage: python scripts/build_hexamer_prior.py [fasta ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from jaeger_tpu.postprocess import genes as G  # noqa: E402
from jaeger_tpu.seqops.fasta import read_fasta  # noqa: E402


def main() -> None:
    fastas = [Path(p) for p in sys.argv[1:]] or [
        REPO / "jaeger_tpu" / "data" / "test" / "test_contigs.fasta"
    ]
    cod_counts = np.zeros(4096, np.float64)
    bg_counts = np.zeros(4096, np.float64)
    n_genes = 0
    for fasta in fastas:
        for header, seq in read_fasta(str(fasta)):
            seq = seq.upper()
            if len(seq) < 10_000:  # self-training needs real material
                continue
            rc = seq.translate(G._COMP)[::-1]
            ids_f, ids_r = G._hex_ids(seq), G._hex_ids(rc)
            cod_f, cod_r = G._codon_ids(seq), G._codon_ids(rc)
            n = len(seq)
            stops = G._CODE_STOPS[11]
            # two-pass SELF-trained selection (no prior: this script
            # builds it), keeping strand tags so interiors read in their
            # own orientation
            chosen, _ = G._select(G._gather(
                seq, rc, n, 90, stops, cod_f, cod_r))
            fwd = [(c[0], c[1]) for c in chosen if c[3] == 1]
            rev = [(n - c[1], n - c[0]) for c in chosen if c[3] == -1]
            lo = G._hex_logodds(ids_f, ids_r,
                                G._interior_positions(fwd),
                                G._interior_positions(rev))
            if lo is not None:
                hexp_f = G._prefix_from_logodds(ids_f, lo)
                hexp_r = G._prefix_from_logodds(ids_r, lo)
                chosen, _ = G._select(G._gather(
                    seq, rc, n, 90, stops, cod_f, cod_r, hexp_f, hexp_r))
                fwd = [(c[0], c[1]) for c in chosen if c[3] == 1]
                rev = [(n - c[1], n - c[0]) for c in chosen if c[3] == -1]
            pos_f = G._interior_positions(fwd)
            pos_r = G._interior_positions(rev)
            cod = np.concatenate([
                ids_f[pos_f] if pos_f.size else np.zeros(0, np.int64),
                ids_r[pos_r] if pos_r.size else np.zeros(0, np.int64),
            ])
            cod = cod[cod >= 0]
            bg = np.concatenate([ids_f[ids_f >= 0], ids_r[ids_r >= 0]])
            cod_counts += np.bincount(cod, minlength=4096)
            bg_counts += np.bincount(bg, minlength=4096)
            n_genes += len(fwd) + len(rev)
            print(f"{header.split()[0]}: {len(fwd) + len(rev)} genes, "
                  f"{cod.size} coding hexamers")

    p_bg = (bg_counts + G._HEX_EPS) / (bg_counts.sum() + 4096 * G._HEX_EPS)
    p_cod = (cod_counts + G._HEX_PRIOR * p_bg) / (
        cod_counts.sum() + G._HEX_PRIOR)
    logodds = np.log(p_cod / p_bg).astype(np.float32)
    out = REPO / "jaeger_tpu" / "data" / "hexamer_prior.npz"
    np.savez_compressed(
        out, logodds=logodds,
        coding_hexamers=np.float64(cod_counts.sum()),
        n_genes=np.int64(n_genes),
    )
    print(f"wrote {out} ({out.stat().st_size} bytes, "
          f"{n_genes} training genes, "
          f"{int(cod_counts.sum())} coding hexamers)")


if __name__ == "__main__":
    main()
