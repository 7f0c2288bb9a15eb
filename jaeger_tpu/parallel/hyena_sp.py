"""Sequence-sharded Hyena for full-contig models.

The reference handles long context only algorithmically (Hyena FFT conv,
SURVEY §5.7) on a single device; a full-length-contig model's activations
(order+1 projection streams of (B, F, L, D)) are the memory wall. This
module shards the **length** axis over a mesh axis: every dense
projection, gate multiply and norm runs on its L/n shard, and only the
causal long convolution gathers the (much smaller) single input stream
``z`` across chips before each device computes just its own output slice.

Exactness: the convolution is causal, so device i's outputs depend only on
chunks j <= i; computing ``causal_conv(gathered_z, h)`` and slicing the
local segment is bit-identical to the unsharded op (pinned by tests on a
virtual 8-device mesh). Peak per-chip activation memory drops from
O((order+2) * B*F*L*D) to O(B*F*L*D/n * (order+2)) + one transient
gathered stream per recurrence step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jaeger_tpu.models.layers import causal_fft_convolve


def sharded_causal_conv(z_shard: jnp.ndarray, h: jnp.ndarray,
                        axis_name: str) -> jnp.ndarray:
    """Inside shard_map: (B, D, S) local chunk -> (B, D, S) local output
    of the full-length causal convolution with (D, L) filters."""
    z_full = jax.lax.all_gather(z_shard, axis_name, axis=2, tiled=True)
    y_full = causal_fft_convolve(z_full, h)
    i = jax.lax.axis_index(axis_name)
    s = z_shard.shape[2]
    return jax.lax.dynamic_slice_in_dim(y_full, i * s, s, axis=2)


def hyena_recurrence_sp(projections: list[jnp.ndarray],
                        filters: jnp.ndarray,
                        axis_name: str) -> jnp.ndarray:
    """Order-N gated recurrence on sequence shards.

    ``projections``: order+1 local streams (B, S, D) (length-sharded);
    ``filters``: (order, D, L) full-length filters (replicated).
    Returns the local (B, S, D) output shard.
    """
    z = jnp.swapaxes(projections[0], 1, 2)      # (B, D, S)
    order = filters.shape[0]
    for i in range(order):
        gate = jnp.swapaxes(projections[i + 1], 1, 2)
        conv = sharded_causal_conv(z, filters[i], axis_name)
        z = conv * gate
    return jnp.swapaxes(z, 1, 2)


def make_sequence_sharded_hyena(mesh: Mesh, seq_axis: str = "seq"):
    """Build a shard_mapped (projections, filters) -> output callable.

    Inputs: projections (order+1, B, L, D) sharded on L; filters
    (order, D, L) replicated. Output (B, L, D) sharded on L.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def inner(projections, filters):
        streams = [projections[i] for i in range(projections.shape[0])]
        return hyena_recurrence_sp(streams, filters, seq_axis)

    return shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, None, seq_axis, None), P()),
        out_specs=P(None, seq_axis, None),
    )


def sequence_sharded_hyena_op(projections: jnp.ndarray,
                              filters: jnp.ndarray,
                              mesh: Mesh,
                              seq_axis: str = "seq") -> jnp.ndarray:
    """Convenience wrapper: place inputs and run the sharded recurrence.

    projections: (order+1, B, L, D); filters: (order, D, L).
    """
    shard = NamedSharding(mesh, P(None, None, seq_axis, None))
    rep = NamedSharding(mesh, P())
    projections = jax.device_put(projections, shard)
    filters = jax.device_put(filters, rep)
    fn = make_sequence_sharded_hyena(mesh, seq_axis)
    return fn(projections, filters)
