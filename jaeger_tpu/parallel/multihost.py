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
  concatenates them in contig order. Training uses
  ``jax.distributed``-initialized global meshes with the same
  data-parallel step (gradient psums ride ICI within a slice, DCN across
  slices — XLA places them from the sharding).
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
    (process_id, num_processes). No-op single-process fallback."""
    import jax

    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()
