"""Multi-host scale-out design and helpers.

The reference has no multi-host story (SURVEY §2.6: single-host
MirroredStrategy only). jaeger-tpu's scale-out design, per the blueprint:

* **Contig sharding**: each host process reads the shared FASTA and keeps
  only contigs assigned to it by a deterministic hash
  (:func:`contig_owner`), so ingestion is embarrassingly parallel with no
  coordination and no contig's windows ever span hosts — the
  window->contig reduction stays host-local, sidestepping the
  cross-host ``meta_2`` ordering hazard called out in SURVEY §7.
* **Within a host**: the usual data mesh — batch sharded over local
  chips, params replicated, logits fetched to the owning host.
* **Across hosts**: each host writes an output shard
  (``<stem>_default_jaeger.tsv.shard<K>``); :func:`merge_output_shards`
  concatenates them in contig order.
* **Training** (``jaeger train --coordinator HOST:PORT --num-processes N
  --process-id K``): :func:`initialize_distributed` connects the
  processes, the data mesh becomes GLOBAL (``meshlib.data_mesh`` over
  ``jax.devices()`` after init), and the train step runs unchanged —
  batch rows sharded over the global ``data`` axis, params replicated,
  gradient/BN psums inserted by XLA (ICI within a slice, DCN across).
  Every process iterates the same deterministic batch stream and
  :class:`GlobalBatcher` turns each host batch into a global array
  (each process contributes its row slice); filesystem writes
  (checkpoints, exports, logs) happen on process 0 only
  (:func:`is_primary`). Final params are identical to the
  single-process data-mesh run on the same stream
  (tests/test_multihost_train.py).
"""

from __future__ import annotations

import zlib
from pathlib import Path


def contig_owner(header: str, num_hosts: int) -> int:
    """Deterministic contig -> host assignment (stable across runs)."""
    return zlib.crc32(header.encode("utf-8")) % max(1, num_hosts)


def filter_contigs_for_host(records, host_id: int, num_hosts: int):
    """Filter an iterable of (header, seq) down to this host's share."""
    for header, seq in records:
        if contig_owner(header, num_hosts) == host_id:
            yield header, seq


def shard_path(base: str | Path, host_id: int) -> Path:
    return Path(f"{base}.shard{host_id:03d}")


def merge_output_shards(base: str | Path, num_hosts: int,
                        delete: bool = True) -> Path:
    """Merge per-host TSV shards into the final table.

    The header comes from the first non-empty shard (a host that owned
    zero contigs writes an empty shard so completion is detectable).
    Written via a temp file + rename, and shard deletion tolerates
    concurrent merges (two hosts finishing simultaneously both produce
    the same merged file)."""
    base = Path(base)
    tmp = base.with_name(base.name + ".merging")
    with open(tmp, "w") as out:
        wrote_header = False
        for host in range(num_hosts):
            p = shard_path(base, host)
            if not p.exists():
                continue
            with open(p) as fh:
                for i, line in enumerate(fh):
                    if i == 0:
                        if wrote_header:
                            continue
                        wrote_header = True
                    out.write(line)
    tmp.replace(base)
    if delete:
        for host in range(num_hosts):
            shard_path(base, host).unlink(missing_ok=True)
    return base


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-process; returns
    (process_id, num_processes). No-op single-process fallback.

    On the CPU backend cross-process collectives need an explicit
    implementation — gloo ships with jaxlib and is selected here before
    the backend initializes (TPU slices don't need it: ICI/DCN
    collectives are native).
    """
    import jax

    if coordinator:
        try:
            if jax.config.jax_platforms in ("cpu",):
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jax: option absent; TPU paths unaffected
            pass
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns filesystem writes (checkpoints,
    exports, CSV logs, convergence markers). Always True single-process."""
    import jax

    return jax.process_index() == 0


class GlobalBatcher:
    """Host-batch <-> global-array conversion for multi-process training.

    Every process iterates the SAME deterministic host batch stream
    (same files, same seed); ``shard`` turns each full host batch into a
    global jax.Array with rows sharded over the mesh's data axis —
    ``jax.make_array_from_process_local_data`` takes each process's
    addressable row slice from the full array, so no rows cross hosts.
    ``replicate`` makes small trees (rng keys, fresh optimizer/model
    state) globally replicated; ``to_host`` brings fully-replicated
    results back to numpy at branch boundaries so downstream
    single-process code (threshold tuning, export) runs unchanged.
    """

    def __init__(self, mesh, axis: str = "data"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self._sharded = NamedSharding(mesh, P(axis))
        self._replicated = NamedSharding(mesh, P())

    def _to_global(self, leaf, sharding):
        import jax
        import numpy as np

        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return leaf  # already global (e.g. donated state round trip)
        arr = np.asarray(leaf)
        return jax.make_array_from_process_local_data(
            sharding, arr, arr.shape)

    def shard(self, tree):
        """Batch tree (leaves with leading global-batch axis) -> global
        arrays row-sharded over the data axis."""
        import jax

        return jax.tree.map(
            lambda x: self._to_global(x, self._sharded), tree)

    def replicate(self, tree):
        import jax

        return jax.tree.map(
            lambda x: self._to_global(x, self._replicated), tree)

    def to_host(self, tree):
        return tree_to_host(tree)


def tree_to_host(tree):
    """Fully-replicated global leaves -> host numpy (no-op on host
    leaves and on process-local arrays)."""
    import jax
    import numpy as np

    def back(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x)
        return x

    return jax.tree.map(back, tree)
