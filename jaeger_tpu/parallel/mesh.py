"""Device mesh construction and sharding helpers.

The reference's distribution story is a single-host
``tf.distribute.MirroredStrategy`` (``commands/predict.py:656-664``,
``commands/train.py:619-633``). The TPU-native design replaces it with a
``jax.sharding.Mesh`` over ICI: inference and training are data-parallel
(batch sharded over the ``data`` axis, parameters replicated), and every
reduction inside jit (batch-norm stats, gradient means) becomes a global
XLA collective automatically under SPMD.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the available devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def shard_along(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading array axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding."""
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
