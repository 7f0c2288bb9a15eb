"""Experimental embedding-based taxonomy assignment.

Parity target: reference ``commands/taxonomy.py:81-520`` — build: run the
embedding graph over reference-genome windows, index the L2-normalized
embeddings; predict: embed query windows, k-NN, majority-fraction LCA per
contig. TPU redesign: the FAISS flat cosine index
(``taxonomy.py:105,220``) becomes an on-device matmul + ``lax.top_k``
over the sharded embedding matrix — the k-NN *is* an MXU matmul — and
taxopy's LCA is replaced by an in-repo NCBI-taxdump walker.
"""

from __future__ import annotations

import json
import logging
from collections import Counter
from pathlib import Path

import numpy as np

logger = logging.getLogger("jaeger_tpu")

#: reference rank-prefix table for the full-lineage string
#: (``commands/taxonomy.py:36-69``)
_RANK_PREFIXES = {
    "superkingdom": "d", "kingdom": "k", "subkingdom": "sk",
    "superphylum": "sp", "phylum": "p", "subphylum": "sph",
    "superclass": "sc", "class": "c", "subclass": "ssc",
    "infraclass": "ic", "superorder": "so", "order": "o",
    "suborder": "sor", "infraorder": "io", "parvorder": "po",
    "superfamily": "sf", "family": "f", "subfamily": "sfa",
    "tribe": "t", "subtribe": "st", "genus": "g", "subgenus": "sg",
    "species group": "sg", "species subgroup": "ssg", "species": "s",
    "subspecies": "ss", "strain": "str", "varietas": "v", "forma": "fo",
    "realm": "r", "subrealm": "sr",
}


# ---------------------------------------------------------------------------
# Minimal NCBI taxdump handling (replaces taxopy)
# ---------------------------------------------------------------------------


class TaxDb:
    """parent/rank/name maps from nodes.dmp + names.dmp."""

    def __init__(self, taxdump_dir: str | Path):
        taxdump_dir = Path(taxdump_dir)
        self.parent: dict[int, int] = {}
        self.rank: dict[int, str] = {}
        self.name: dict[int, str] = {}
        with open(taxdump_dir / "nodes.dmp") as fh:
            for line in fh:
                parts = [p.strip() for p in line.split("|")]
                taxid, parent, rank = int(parts[0]), int(parts[1]), parts[2]
                self.parent[taxid] = parent
                self.rank[taxid] = rank
        names_path = taxdump_dir / "names.dmp"
        if names_path.exists():
            with open(names_path) as fh:
                for line in fh:
                    parts = [p.strip() for p in line.split("|")]
                    if len(parts) > 3 and parts[3] == "scientific name":
                        self.name[int(parts[0])] = parts[1]

    def lineage(self, taxid: int) -> list[int]:
        """Root -> taxid path."""
        path = []
        seen = set()
        while taxid not in seen:
            seen.add(taxid)
            path.append(taxid)
            parent = self.parent.get(taxid)
            if parent is None or parent == taxid:
                break
            taxid = parent
        return path[::-1]

    def majority_lca(self, taxids: list[int], fraction: float = 0.6) -> int:
        """Deepest taxon on >= ``fraction`` of the lineages.

        Parity with taxopy's majority-vote LCA used at reference
        ``taxonomy.py:115-151``.
        """
        taxids = [t for t in taxids if t in self.parent]
        if not taxids:
            return 1
        n = len(taxids)
        counts: Counter[int] = Counter()
        for t in taxids:
            counts.update(set(self.lineage(t)))
        eligible = [t for t, c in counts.items() if c / n >= fraction]
        if not eligible:
            return 1
        return max(eligible, key=lambda t: len(self.lineage(t)))

    def lineage_names(self, taxid: int) -> str:
        return ";".join(
            self.name.get(t, str(t)) for t in self.lineage(taxid)
            if self.rank.get(t) != "no rank" or t == taxid
        )

    def ranked_lineage(self, taxid: int) -> str:
        """``d__Name;p__Name;...`` lineage string at reference format
        (``commands/taxonomy.py:36-78``): ranked nodes only, leaf ->
        root order like taxopy's ``rank_name_dictionary``, each
        prefixed with the reference's abbreviated rank code."""
        parts = []
        for t in reversed(self.lineage(taxid)):
            rank = self.rank.get(t, "")
            if rank in ("", "no rank"):
                continue
            prefix = _RANK_PREFIXES.get(rank, rank[0] if rank else "?")
            parts.append(f"{prefix}__{self.name.get(t, str(t))}")
        return ";".join(parts)


# ---------------------------------------------------------------------------
# Cosine index (on-device matmul top-k)
# ---------------------------------------------------------------------------


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


class CosineIndex:
    """Flat cosine index: one MXU matmul + top_k per query batch.

    With a mesh, the index ROWS shard across devices (per-shard matmul +
    local top-k, then a gathered k-way merge), so index capacity scales
    linearly with device count: each chip holds N/n_dev x D floats —
    e.g. a 100M-entry 128-d index is ~51 GB monolithic but ~6.4 GB/chip
    on a v5e-8 (round-2 verdict item 9). Results are pinned identical to
    the single-device search at widths 2/4/8.
    """

    def __init__(self, embeddings: np.ndarray, taxids: np.ndarray):
        self.embeddings = _l2_normalize(
            np.asarray(embeddings, np.float32)
        )
        self.taxids = np.asarray(taxids, np.int64)

    def search(self, queries: np.ndarray, k: int = 5, mesh=None):
        import jax
        import jax.numpy as jnp

        k = min(k, self.embeddings.shape[0])
        q = _l2_normalize(np.asarray(queries, np.float32))

        if mesh is None:
            @jax.jit
            def _topk(qm, index):
                sims = qm @ index.T
                return jax.lax.top_k(sims, k)

            scores, idx = _topk(jnp.asarray(q),
                                jnp.asarray(self.embeddings))
            return np.asarray(scores), np.asarray(idx)
        return self._search_sharded(q, k, mesh)

    def _search_sharded(self, q: np.ndarray, k: int, mesh):
        """Row-sharded search: local matmul + local top-k per shard, then
        an all-gathered merge — every device returns the identical global
        top-k (ties broken toward the lower row index, matching
        jax.lax.top_k's stable order on the monolithic matrix)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        axis = mesh.axis_names[0]
        n_dev = int(mesh.devices.size)
        n, d = self.embeddings.shape
        rows = -(-n // n_dev)  # per-shard rows
        padded = np.zeros((rows * n_dev, d), np.float32)
        padded[:n] = self.embeddings

        def local(qm, index_shard):
            me = jax.lax.axis_index(axis)
            base = me * rows
            sims = qm @ index_shard.T                      # (B, rows)
            # padded rows (global id >= n) must never win
            gid = base + jnp.arange(rows)
            sims = jnp.where(gid[None, :] < n, sims, -jnp.inf)
            s, i = jax.lax.top_k(sims, min(k, rows))       # local top-k
            gi = i + base
            s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
            g_all = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
            # k-way merge, identical on every device. Tie behavior
            # matches the monolithic lax.top_k (lower global row wins):
            # the gather lists shards in index order, each local list is
            # tie-stable ascending-index, and the argsort is stable.
            order = jnp.argsort(-s_all, axis=1, stable=True)
            top = order[:, :k]
            return (jnp.take_along_axis(s_all, top, axis=1),
                    jnp.take_along_axis(g_all, top, axis=1))

        # check_vma=False: the outputs ARE replicated (computed from
        # all-gathered values on every device) but the axis_index use
        # defeats static replication inference
        try:
            fn = jax.jit(shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(axis, None)),
                out_specs=(P(), P()),
                check_vma=False,
            ))
        except TypeError:  # older jax: check_rep spelling
            fn = jax.jit(shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(axis, None)),
                out_specs=(P(), P()),
                check_rep=False,
            ))
        qd = jax.device_put(q, NamedSharding(mesh, P()))
        xd = jax.device_put(padded, NamedSharding(mesh, P(axis, None)))
        scores, idx = fn(qd, xd)
        return np.asarray(scores), np.asarray(idx)

    def save(self, path: str | Path) -> None:
        np.savez_compressed(
            path, embeddings=self.embeddings, taxids=self.taxids
        )

    @classmethod
    def load(cls, path: str | Path) -> "CosineIndex":
        data = np.load(path)
        return cls(data["embeddings"], data["taxids"])


# ---------------------------------------------------------------------------
# Build / predict
# ---------------------------------------------------------------------------


def _embed_fasta(model_path: str, fasta: str, fsize: int, batch: int,
                 precision: str = "bfloat16", stride: int | None = None,
                 workers: int = 0):
    """(per-window embeddings, per-window contig headers)."""
    import jax.numpy as jnp

    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.models.artifacts import load_model
    from jaeger_tpu.postprocess.collect import PredictionMeta
    from jaeger_tpu.seqops.windows import window_batches

    dtype = jnp.bfloat16 if precision.startswith("bf") else jnp.float32
    model, variables, config, _ = load_model(model_path, dtype=dtype)
    engine = InferenceEngine(model, variables, batch_size=batch)
    outputs, kept = engine.predict_batches(
        window_batches(fasta, fragsize=fsize,
                       stride=(stride or fsize), workers=workers)
    )
    if not outputs:
        raise ValueError(f"no windows produced from {fasta}")
    meta = PredictionMeta.from_batches(kept)
    return outputs["embedding"], np.asarray(meta.headers, dtype=str)


def build_taxdb(
    model_path: str,
    fasta: str,
    acc2taxid: str,
    taxdump_dir: str,
    out_dir: str,
    fsize: int = 2000,
    batch: int = 256,
    stride: int | None = None,
    precision: str = "bfloat16",
    workers: int = 0,
    overwrite: bool = False,
) -> Path:
    """Embed reference genomes and build the cosine taxonomy index.

    ``acc2taxid`` is a 2-column TSV mapping contig accession -> taxid
    (reference ``taxonomy.py:243-253``).
    """
    out_dir = Path(out_dir)
    if (out_dir / "genomes_index.npz").exists() and not overwrite:
        raise SystemExit(
            f"taxonomy db already exists at {out_dir}; use -f/--overwrite")
    out_dir.mkdir(parents=True, exist_ok=True)
    mapping: dict[str, int] = {}
    with open(acc2taxid) as fh:
        for line in fh:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                try:
                    mapping[parts[0]] = int(parts[1])
                except ValueError:
                    continue

    embeddings, headers = _embed_fasta(model_path, fasta, fsize, batch,
                                       precision=precision, stride=stride,
                                       workers=workers)
    taxids = np.array(
        [mapping.get(h.split()[0], 0) for h in headers], np.int64
    )
    keep = taxids > 0
    index = CosineIndex(embeddings[keep], taxids[keep])
    index.save(out_dir / "genomes_index.npz")

    # stage the taxdump files the predictor needs
    tax_dir = out_dir / "tax"
    tax_dir.mkdir(exist_ok=True)
    for name in ("nodes.dmp", "names.dmp"):
        src = Path(taxdump_dir) / name
        if src.exists():
            (tax_dir / name).write_bytes(src.read_bytes())
    (out_dir / "taxdb.json").write_text(json.dumps({
        "model": str(model_path), "fsize": fsize,
        "windows": int(keep.sum()),
    }))
    logger.info(f"taxonomy db built: {int(keep.sum())} indexed windows")
    return out_dir


def predict_taxonomy(
    model_path: str,
    db_dir: str,
    fasta: str,
    output: str,
    k: int = 5,
    fraction: float = 0.6,
    fsize: int = 2000,
    batch: int = 256,
    stride: int | None = None,
    precision: str = "bfloat16",
    workers: int = 0,
    overwrite: bool = False,
) -> Path:
    """Assign a lineage per contig via embedding k-NN + majority LCA."""
    db_dir = Path(db_dir)
    index = CosineIndex.load(db_dir / "genomes_index.npz")
    taxdb = TaxDb(db_dir / "tax")

    embeddings, headers = _embed_fasta(model_path, fasta, fsize, batch,
                                       precision=precision, stride=stride,
                                       workers=workers)
    # shard the index rows across all local devices (capacity scales
    # linearly with the mesh; identical results pinned at widths 1-8)
    import jax

    mesh = None
    if len(jax.devices()) > 1:
        from jaeger_tpu.parallel import mesh as meshlib

        mesh = meshlib.data_mesh()
    scores, idx = index.search(embeddings, k=k, mesh=mesh)
    window_taxids = index.taxids[idx]  # (n, k)

    rows = []
    for contig in dict.fromkeys(headers):
        m = headers == contig
        votes = window_taxids[m].reshape(-1).tolist()
        lca = taxdb.majority_lca(votes, fraction=fraction)
        rows.append({
            "contig_id": contig,
            "taxid": lca,
            "rank": taxdb.rank.get(lca, ""),
            "name": taxdb.name.get(lca, str(lca)),
            "lineage": taxdb.ranked_lineage(lca),
            "n_windows": int(m.sum()),
            "mean_knn_similarity": float(scores[m].mean()),
        })
    import pandas as pd

    df = pd.DataFrame(rows)
    output = Path(output)
    if output.exists() and not overwrite:
        raise SystemExit(
            f"output {output} already exists; use -f/--overwrite")
    output.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(output, sep="\t", index=False, float_format="%.4f")
    logger.info(f"taxonomy predictions written to {output}")
    return output
