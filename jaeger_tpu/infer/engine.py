"""Batched, statically-shaped TPU inference engine.

Parity target: the reference's ``InferModel`` predict loop
(``nnlib/inference.py:300-483``) — stream batches through the model,
offload logits to host every batch to bound device memory — redesigned for
XLA:TPU:

* one jitted forward per static (batch, crop) shape — no dynamic shapes,
  the final partial batch is padded and trimmed (replacing the reference's
  ``padded_batch(None)`` dynamic-length path);
* raw base IDs go to the device; codon encoding runs fused inside the
  same XLA program as the model (see :mod:`jaeger_tpu.ops.encode`);
* data-parallel over a 1-D mesh: batch sharded, params replicated;
* bf16 compute by default (fp32 islands inside norm/softmax per layer
  design), logits returned float32.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("jaeger_tpu")

from jaeger_tpu.parallel import mesh as meshlib
from jaeger_tpu.seqops.windows import WindowBatch


class InferenceEngine:
    def __init__(
        self,
        model,
        variables,
        batch_size: int = 512,
        mesh=None,
        seq_mesh=None,
        donate: bool = False,
        output_keys: tuple | None = None,
        pipeline_depth: int = 4,
        pack_transfer: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.batch_size = int(batch_size)
        # Fetch only what the caller needs: device->host readback is the
        # expensive leg (especially over a tunneled chip), and embedding/
        # NMD tensors dwarf the logits.
        self.output_keys = tuple(output_keys) if output_keys else None
        self.pipeline_depth = max(1, int(pipeline_depth))
        # nibble-pack base IDs for the host->device leg (2x fewer bytes;
        # unpacked on device inside the jitted program)
        self.pack_transfer = bool(pack_transfer)
        self.mesh = mesh
        # seq_mesh: length-shard Hyena long convolutions over this mesh's
        # "seq" axis (the model must be built with parallel.seq_axis; see
        # predict --seq-shard). Mutually exclusive with the data mesh —
        # the devices are spent on the sequence dimension.
        self.seq_mesh = seq_mesh
        if mesh is not None and seq_mesh is not None:
            raise ValueError("mesh and seq_mesh are mutually exclusive")
        if mesh is not None:
            n_dev = mesh.devices.size
            self.batch_size = meshlib.pad_to_multiple(self.batch_size, n_dev)
            self._data_sharding = meshlib.shard_along(mesh)
            self._replicated = meshlib.replicate(mesh)
            self.variables = jax.device_put(variables, self._replicated)
        self._compiled: dict = {}

    def _dense_batch(self, bases: np.ndarray, lengths: np.ndarray) -> bool:
        """True when the maskless program is exact for this batch: every
        window fills the model's crop with unambiguous uppercase bases
        (IDs 0-3; 4=N, 5-8=soft-masked) — the mask would be all-true, so
        skipping it saves the mask-propagation elementwise work."""
        crop = getattr(self.model, "crop_nt", None)
        if crop is None:
            return False
        from jaeger_tpu.ops.encode import dense_window_batch

        return dense_window_batch(
            bases, lengths, crop,
            getattr(self.model, "masking_enabled", True),
        )

    def _forward(self, variables, bases, lengths, dense: bool = False):
        kwargs = {"assume_dense": True} if dense else {}
        out = self.model.apply(
            variables, {"bases": bases, "lengths": lengths}, train=False,
            **kwargs,
        )
        if self.output_keys is not None:
            out = {k: v for k, v in out.items() if k in self.output_keys}
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    def _forward_packed(self, variables, packed, lengths, length: int,
                        dense: bool = False):
        from jaeger_tpu.ops.encode import unpack_bases

        bases = unpack_bases(packed, length)
        return self._forward(variables, bases, lengths, dense)

    def _get_fn(self, shape: tuple, dense: bool = False):
        key = (shape, dense)
        fn = self._compiled.get(key)
        if fn is None:
            jit_kwargs = {}
            if self.mesh is not None:
                jit_kwargs["in_shardings"] = (
                    self._replicated,
                    self._data_sharding,
                    self._data_sharding,
                )
            if self.pack_transfer:
                fn = jax.jit(
                    functools.partial(self._forward_packed, length=shape[1],
                                      dense=dense),
                    **jit_kwargs,
                )
            else:
                fn = jax.jit(functools.partial(self._forward, dense=dense),
                             **jit_kwargs)
            fn = self._with_seq_mesh(fn)
            self._compiled[key] = fn
        return fn

    def _with_seq_mesh(self, fn):
        """Wrap a jitted program so tracing + dispatch run under the
        sequence mesh context (the Hyena shard_map island resolves its
        mesh from the ambient jax.set_mesh)."""
        if self.seq_mesh is None:
            return fn

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.set_mesh(self.seq_mesh):
                return fn(*args, **kwargs)

        return wrapped

    def predict_windows(
        self, bases: np.ndarray, lengths: np.ndarray
    ) -> dict[str, np.ndarray]:
        """Run the model over (n, cap) base IDs; returns host float32 dict.

        The loop is pipelined two deep: the host->device transfer and
        dispatch of batch i+1 overlap the device compute of batch i, and
        the device->host readback of batch i-1 overlaps both (JAX
        dispatch is async; only the final ``np.asarray`` synchronizes).
        Per-batch host offload still bounds device memory like the
        reference's ``.numpy()`` loop (``inference.py:360-367``).
        """
        n = bases.shape[0]
        bs = self.batch_size
        starts = list(range(0, n, bs))
        chunks: list[dict[str, np.ndarray]] = []
        in_flight: list[tuple[dict, int]] = []  # (device outputs, valid rows)

        def drain_one() -> None:
            out, valid = in_flight.pop(0)
            host = {k: np.asarray(v)[:valid] for k, v in out.items()}
            chunks.append(host)

        for i in starts:
            b = bases[i : i + bs]
            ln = lengths[i : i + bs]
            valid = b.shape[0]
            # dense predicate on the valid rows only: padded rows' outputs
            # are trimmed, and per-example compute at inference means they
            # cannot contaminate valid rows
            dense = self._dense_batch(b, ln)
            pad = bs - valid
            if pad:
                b = np.pad(b, ((0, pad), (0, 0)), constant_values=4)
                ln = np.pad(ln, (0, pad), constant_values=0)
            fn = self._get_fn((bs, b.shape[1]), dense)
            if self.pack_transfer:
                from jaeger_tpu.ops.encode import pack_bases

                payload = jnp.asarray(pack_bases(b))
            else:
                payload = jnp.asarray(b)
            out = fn(self.variables, payload, jnp.asarray(ln))
            in_flight.append((out, valid))
            if len(in_flight) > self.pipeline_depth:
                drain_one()
        while in_flight:
            drain_one()
        if not chunks:
            return {}
        return {
            k: np.concatenate([c[k] for c in chunks], axis=0)
            for k in chunks[0]
        }

    # ------------------------------------------------------------------
    # device-reduced fast path: per-contig partial statistics are segment-
    # reduced on device; the host fetches tiny partials + one int8 class
    # per window instead of full logit matrices (ops/reduce.py)
    # ------------------------------------------------------------------

    def _get_reduced_fn(self, shape: tuple, with_reliability: bool,
                        dense: bool = False):
        key = ("reduced", shape, with_reliability, dense)
        fn = self._compiled.get(key)
        if fn is None:
            from jaeger_tpu.ops.encode import unpack_bases
            from jaeger_tpu.ops.reduce import contig_partials

            bs = shape[0]
            apply_kwargs = {"assume_dense": True} if dense else {}

            def forward_reduced(variables, payload, lengths, seg_ids, valid):
                if self.pack_transfer:
                    bases = unpack_bases(payload, shape[1])
                else:
                    bases = payload
                out = self.model.apply(
                    variables, {"bases": bases, "lengths": lengths},
                    train=False, **apply_kwargs,
                )
                return contig_partials(
                    out["prediction"].astype(jnp.float32),
                    seg_ids, valid, num_segments=bs,
                    reliability=(
                        out["reliability"].astype(jnp.float32)
                        if with_reliability and "reliability" in out
                        else None
                    ),
                )

            jit_kwargs = {}
            if self.mesh is not None:
                # batch-sharded inputs, replicated params; the segment
                # scatter-add over the sharded batch lowers to a per-shard
                # partial + all-reduce under SPMD
                jit_kwargs["in_shardings"] = (
                    self._replicated,
                    self._data_sharding,
                    self._data_sharding,
                    self._data_sharding,
                    self._data_sharding,
                )
                jit_kwargs["out_shardings"] = self._replicated
            fn = self._with_seq_mesh(jax.jit(forward_reduced, **jit_kwargs))
            self._compiled[key] = fn
        return fn

    def predict_batches_reduced(
        self, batches: Iterable[WindowBatch], num_classes: int,
        with_reliability: bool = True,
    ):
        """Stream batches through the device-reduced path.

        Returns (ContigAccumulator-final stats keyed by global contig
        index, kept WindowBatches).
        """
        from jaeger_tpu.ops.encode import pack_bases
        from jaeger_tpu.ops.reduce import ContigAccumulator

        acc = ContigAccumulator(num_classes, with_reliability)
        kept: list[WindowBatch] = []
        bs = self.batch_size
        in_flight: list[tuple[dict, np.ndarray, np.ndarray]] = []

        def drain_one():
            partial, seg_to_contig, win_contigs = in_flight.pop(0)
            acc.add_batch(
                {k: np.asarray(v) for k, v in partial.items()},
                seg_to_contig, win_contigs,
            )

        for batch in batches:
            if len(batch) == 0:
                continue
            kept.append(batch)
            for i in range(0, len(batch), bs):
                b = batch.bases[i : i + bs]
                ln = batch.length[i : i + bs]
                contig = batch.contig[i : i + bs].astype(np.int64)
                n_valid = b.shape[0]
                dense = self._dense_batch(b, ln)
                pad = bs - n_valid
                if pad:
                    b = np.pad(b, ((0, pad), (0, 0)), constant_values=4)
                    ln = np.pad(ln, (0, pad))
                    contig = np.pad(contig, (0, pad),
                                    constant_values=contig[-1])
                # Densify segment ids: global contig indices have gaps
                # (sub-min_len contigs consume header slots, windows.py),
                # so ``contig - contig[0]`` can exceed num_segments=bs and
                # segment_sum would silently drop those windows. Unique
                # ids per device batch are always <= bs.
                uniq, seg_local = np.unique(contig, return_inverse=True)
                seg_local = seg_local.astype(np.int32)
                valid = np.zeros(bs, bool)
                valid[:n_valid] = True
                fn = self._get_reduced_fn((bs, b.shape[1]),
                                          with_reliability, dense)
                payload = jnp.asarray(
                    pack_bases(b) if self.pack_transfer else b
                )
                partial = fn(self.variables, payload, jnp.asarray(ln),
                             jnp.asarray(seg_local), jnp.asarray(valid))
                seg_to_contig = np.full(bs, uniq[-1], dtype=np.int64)
                seg_to_contig[: uniq.size] = uniq
                in_flight.append(
                    (partial, seg_to_contig, contig[:n_valid])
                )
                if len(in_flight) > self.pipeline_depth:
                    drain_one()
        while in_flight:
            drain_one()
        return acc.finalize(), kept

    def predict_batches(
        self, batches: Iterable[WindowBatch]
    ) -> tuple[dict[str, np.ndarray], list[WindowBatch]]:
        """Stream WindowBatches; returns concatenated outputs + kept batches."""
        kept: list[WindowBatch] = []
        outs: list[dict[str, np.ndarray]] = []
        t0 = time.time()
        done = 0
        for batch in batches:
            if len(batch) == 0:
                continue
            kept.append(batch)
            outs.append(self.predict_windows(batch.bases, batch.length))
            done += len(batch)
            # ms/step-style progress (parity: reference track_ms,
            # utils/misc.py:27-54)
            elapsed = time.time() - t0
            logger.info(
                f"inference: {done} windows "
                f"({done / max(elapsed, 1e-9):,.0f} windows/s)"
            )
        if not outs:
            return {}, kept
        merged = {
            k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }
        return merged, kept
