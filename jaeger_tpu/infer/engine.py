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
        split_mixed: bool = True,
        int8_variables=None,
    ):
        self.model = model
        self.variables = variables
        # `predict --int8 auto`: run the DENSE program (full-length,
        # unambiguous windows — the qualification-clean class,
        # docs/int8_qualification.md) on the int8 MXU variables; masked
        # / short-window / bucket programs keep the float variables.
        # INT8_QUAL_r04's only disagreement class was sub-fsize
        # single-window contigs, which never take the dense program.
        self.int8_variables = int8_variables
        self.batch_size = int(batch_size)
        # Fetch only what the caller needs: device->host readback is the
        # expensive leg (especially over a tunneled chip), and embedding/
        # NMD tensors dwarf the logits.
        self.output_keys = tuple(output_keys) if output_keys else None
        self.pipeline_depth = max(1, int(pipeline_depth))
        # nibble-pack base IDs for the host->device leg (2x fewer bytes;
        # unpacked on device inside the jitted program)
        self.pack_transfer = bool(pack_transfer)
        # split-mixed execution: real metagenomes almost always put at
        # least one N/soft-masked window in every device batch, which
        # used to force the ~23% slower masked program on EVERYTHING.
        # When a batch is mostly dense, run the dense program on all
        # rows (masked rows neutralized and discarded — inference
        # compute is per-example, so they cannot contaminate others)
        # and the masked program on just the masked rows gathered into
        # a small fixed bucket, scattering their outputs back in place.
        # Order-preserving, so every downstream byte-parity contract is
        # untouched (pinned by tests/test_engine_split.py).
        self.split_mixed = bool(split_mixed)
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
            if self.int8_variables is not None:
                self.int8_variables = jax.device_put(
                    self.int8_variables, self._replicated)
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

    def _vars_for(self, dense: bool):
        """Variables for a base program: int8 on the dense program when
        auto-int8 is active, float otherwise (see __init__)."""
        if dense and self.int8_variables is not None:
            return self.int8_variables
        return self.variables

    def _mask_plans(self):
        """Bounded-mask cut candidates for this model (cached), or []."""
        plans = getattr(self, "_mask_plans_cache", None)
        if plans is None:
            from jaeger_tpu.models.builder import mask_cut_plan

            cfg = getattr(self.model, "config", None) or {}
            plans = mask_cut_plan(cfg.get("representation_learner", {})) \
                if isinstance(cfg, dict) else None
            plans = plans or []
            self._mask_plans_cache = plans
        return plans

    def _plan_batch(self, bases: np.ndarray, lengths: np.ndarray,
                    n_valid: int):
        """One host scan -> (dense, split, mask_cut).

        ``dense`` selects the maskless program for the whole batch;
        ``split`` is (masked_idx, bucket) when the batch should run as
        base-program-on-all + masked-bucket-on-few; ``mask_cut`` (a
        ``builder.mask_cut_plan`` cut spec) selects the BOUNDED program
        as the base — mask machinery only up to the cut, exact because
        every remaining row's invalid runs are short enough that the
        mask is provably all-true there (encode.bounded_mask_levels).
        (False, None, None) keeps the plain masked program.

        The bucket is the smallest of {bs/16, bs/8} (rounded up to a
        mesh multiple, and always < bs — at bucket == bs the split
        would run BOTH full-size programs) that fits the bucket rows —
        each bucket shape compiles once and is cached like every other
        program. Chip-measured on the flagship
        (experiments/split_bench.py): the split runs 1.18x the
        all-masked program at bucket bs/16 and 1.10x at bs/8, but only
        0.97x at bs/4 — hence the bs/8 cap. Bounded programs:
        experiments/bounded_bench.py (cut A 0.98x dense, cut B 0.94x
        vs masked 0.88x)."""
        crop = getattr(self.model, "crop_nt", None)
        if crop is None or n_valid == 0:
            return False, None, None
        from jaeger_tpu.ops.encode import (bounded_mask_levels,
                                           dense_window_rows)

        masking = getattr(self.model, "masking_enabled", True)
        rows = dense_window_rows(bases[:n_valid], lengths[:n_valid],
                                 crop, masking)
        if rows.all():
            return True, None, None

        mult = self.mesh.devices.size if self.mesh is not None else 1
        bs = self.batch_size

        def bucket_for(k: int):
            for b in (bs // 16, bs // 8):
                b = -(-max(b, 1) // mult) * mult
                if b >= bs:
                    break
                if k <= b:
                    return b
            return None

        if self.split_mixed and rows.any():
            masked_idx = np.nonzero(~rows)[0]
            b = bucket_for(masked_idx.size)
            if b is not None:
                return False, (masked_idx, b), None
        plans = self._mask_plans()
        if plans:
            levels = bounded_mask_levels(
                bases[:n_valid], lengths[:n_valid], crop, masking, plans)
            bad_idx = np.nonzero(levels < 0)[0]
            if bad_idx.size == 0:
                return False, None, plans[int(levels.max())][0]
            if self.split_mixed and bad_idx.size < n_valid:
                # long-run rows to a full-masked bucket; the bounded
                # program covers the rest (its neutralized bucket slots
                # are clean placeholder windows)
                b = bucket_for(bad_idx.size)
                if b is not None:
                    cut = plans[int(levels[levels >= 0].max())][0]
                    return False, (bad_idx, b), cut
        return False, None, None  # plain masked program

    def _mixed_split(self, bases: np.ndarray, lengths: np.ndarray,
                     n_valid: int):
        """Split decision alone (see :meth:`_plan_batch`)."""
        return self._plan_batch(bases, lengths, n_valid)[1]

    @staticmethod
    def _gather_masked(b: np.ndarray, ln: np.ndarray,
                       midx: np.ndarray, bucket: int):
        """(bucket bases, bucket lengths, neutralized b, neutralized ln):
        the masked rows move into the bucket (N-padded past m); their
        slots in the dense run get well-formed placeholder windows whose
        outputs are discarded."""
        m = midx.size
        mb = np.full((bucket, b.shape[1]), 4, np.uint8)
        mb[:m] = b[midx]
        mln = np.zeros(bucket, np.int32)
        mln[:m] = ln[midx]
        b = b.copy()
        ln = np.asarray(ln).copy()
        b[midx] = 0
        ln[midx] = b.shape[1]
        return mb, mln, b, ln

    def _forward(self, variables, bases, lengths, dense: bool = False,
                 mask_cut=None):
        kwargs = {}
        if dense:
            kwargs["assume_dense"] = True
        elif mask_cut is not None:
            kwargs["mask_layers"] = mask_cut
        out = self.model.apply(
            variables, {"bases": bases, "lengths": lengths}, train=False,
            **kwargs,
        )
        if self.output_keys is not None:
            out = {k: v for k, v in out.items() if k in self.output_keys}
        return {k: v.astype(jnp.float32) for k, v in out.items()}

    def _forward_packed(self, variables, packed, lengths, length: int,
                        dense: bool = False, mask_cut=None):
        from jaeger_tpu.ops.encode import unpack_bases

        bases = unpack_bases(packed, length)
        return self._forward(variables, bases, lengths, dense, mask_cut)

    def _get_fn(self, shape: tuple, dense: bool = False, mask_cut=None):
        mask_cut = None if dense else mask_cut
        key = (shape, dense, mask_cut)
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
                                      dense=dense, mask_cut=mask_cut),
                    **jit_kwargs,
                )
            else:
                fn = jax.jit(functools.partial(self._forward, dense=dense,
                                               mask_cut=mask_cut),
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
        # (device outputs, valid rows, None | (masked outputs, idx, m))
        in_flight: list[tuple[dict, int, tuple | None]] = []

        def drain_one() -> None:
            out, valid, merge = in_flight.pop(0)
            if merge is not None:
                # scatter the masked bucket's rows back in place: order
                # through the pipeline is unchanged (np.array: device
                # fetches are read-only views)
                out_m, midx, m = merge
                host = {k: np.array(v) for k, v in out.items()}
                for k, v in host.items():
                    v[midx] = np.asarray(out_m[k])[:m]
            else:
                host = {k: np.asarray(v) for k, v in out.items()}
            chunks.append({k: v[:valid] for k, v in host.items()})

        def to_payload(arr: np.ndarray):
            if self.pack_transfer:
                from jaeger_tpu.ops.encode import pack_bases

                return jnp.asarray(pack_bases(arr))
            return jnp.asarray(arr)

        for i in starts:
            b = bases[i : i + bs]
            ln = lengths[i : i + bs]
            valid = b.shape[0]
            # plan on the valid rows only: padded rows' outputs are
            # trimmed, and per-example compute at inference means they
            # cannot contaminate valid rows
            dense, split, mask_cut = self._plan_batch(b, ln, valid)
            pad = bs - valid
            if pad:
                b = np.pad(b, ((0, pad), (0, 0)), constant_values=4)
                ln = np.pad(ln, (0, pad), constant_values=0)
            merge = None
            if split is not None:
                midx, bucket = split
                mb, mln, b, ln = self._gather_masked(b, ln, midx, bucket)
                fn_m = self._get_fn((bucket, b.shape[1]), dense=False)
                out_m = fn_m(self.variables, to_payload(mb),
                             jnp.asarray(mln))
                merge = (out_m, midx, midx.size)
                # base program covers the rest: dense when every other
                # row is clean, bounded when they merely qualify a cut
                dense = mask_cut is None
            fn = self._get_fn((bs, b.shape[1]), dense, mask_cut)
            out = fn(self._vars_for(dense), to_payload(b),
                     jnp.asarray(ln))
            in_flight.append((out, valid, merge))
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
                        dense: bool = False, mask_cut=None):
        mask_cut = None if dense else mask_cut
        key = ("reduced", shape, with_reliability, dense, mask_cut)
        fn = self._compiled.get(key)
        if fn is None:
            from jaeger_tpu.ops.encode import unpack_bases
            from jaeger_tpu.ops.reduce import contig_partials

            bs = shape[0]
            apply_kwargs = {}
            if dense:
                apply_kwargs["assume_dense"] = True
            elif mask_cut is not None:
                apply_kwargs["mask_layers"] = mask_cut

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
        # (partials, seg map, window contigs, n_valid,
        #  None | (masked partials, masked seg map, idx, m))
        in_flight: list[tuple] = []

        def drain_one():
            partial, seg_to_contig, win_contigs, n_valid, merge = (
                in_flight.pop(0))
            p = {k: np.asarray(v) for k, v in partial.items()}
            if merge is None:
                acc.add_batch(p, seg_to_contig, win_contigs)
                return
            # split execution: per-contig statistics arrive as TWO
            # partial batches (dense rows excluded the masked rows via
            # `valid`; the bucket covered only them) — the accumulator
            # merges partials across batches by design. Per-window
            # classes must stay in stream order, so scatter the
            # bucket's back before handing them over.
            partial_m, seg_to_m, midx, m = merge
            pm = {k: np.asarray(v) for k, v in partial_m.items()}
            cls = p["window_cls"].copy()
            cls[midx] = pm["window_cls"][:m]
            acc.add_batch(p, seg_to_contig, win_contigs,
                          window_cls=cls[:n_valid])
            acc.add_batch(pm, seg_to_m, None)

        def seg_maps(contig_ids: np.ndarray, n_seg: int):
            # Densify segment ids: global contig indices have gaps
            # (sub-min_len contigs consume header slots, windows.py),
            # so ``contig - contig[0]`` can exceed num_segments and
            # segment_sum would silently drop those windows. Unique
            # ids per device batch are always <= the batch rows.
            uniq, seg_local = np.unique(contig_ids, return_inverse=True)
            seg_to_contig = np.full(n_seg, uniq[-1], dtype=np.int64)
            seg_to_contig[: uniq.size] = uniq
            return seg_local.astype(np.int32), seg_to_contig

        def to_payload(arr: np.ndarray):
            return jnp.asarray(pack_bases(arr) if self.pack_transfer
                               else arr)

        for batch in batches:
            if len(batch) == 0:
                continue
            kept.append(batch)
            for i in range(0, len(batch), bs):
                b = batch.bases[i : i + bs]
                ln = batch.length[i : i + bs]
                contig = batch.contig[i : i + bs].astype(np.int64)
                n_valid = b.shape[0]
                dense, split, mask_cut = self._plan_batch(b, ln, n_valid)
                pad = bs - n_valid
                if pad:
                    b = np.pad(b, ((0, pad), (0, 0)), constant_values=4)
                    ln = np.pad(ln, (0, pad))
                    contig = np.pad(contig, (0, pad),
                                    constant_values=contig[-1])
                seg_local, seg_to_contig = seg_maps(contig, bs)
                valid = np.zeros(bs, bool)
                valid[:n_valid] = True
                merge = None
                if split is not None:
                    midx, bucket = split
                    m = midx.size
                    mb, mln, b, ln = self._gather_masked(b, ln, midx,
                                                         bucket)
                    seg_m, seg_to_m = seg_maps(contig[midx], bucket)
                    seg_m = np.pad(seg_m, (0, bucket - m))
                    valid_m = np.zeros(bucket, bool)
                    valid_m[:m] = True
                    fn_m = self._get_reduced_fn(
                        (bucket, b.shape[1]), with_reliability,
                        dense=False)
                    partial_m = fn_m(self.variables, to_payload(mb),
                                     jnp.asarray(mln), jnp.asarray(seg_m),
                                     jnp.asarray(valid_m))
                    # the dense run covers everything else; its masked
                    # slots hold neutralized placeholders, excluded from
                    # the segment sums
                    valid[midx] = False
                    merge = (partial_m, seg_to_m, midx, m)
                    dense = mask_cut is None
                fn = self._get_reduced_fn((bs, b.shape[1]),
                                          with_reliability, dense,
                                          mask_cut)
                partial = fn(self._vars_for(dense), to_payload(b),
                             jnp.asarray(ln),
                             jnp.asarray(seg_local), jnp.asarray(valid))
                in_flight.append(
                    (partial, seg_to_contig, contig[:n_valid], n_valid,
                     merge)
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
