"""Test configuration: run JAX on CPU with 8 virtual devices.

Mirrors the reference's CPU-only unit-test strategy (SURVEY §4) and adds
what it lacked: a virtual multi-chip mesh so sharding paths are exercised
without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU platform at interpreter start
# and sets jax_platforms="axon,cpu" directly on jax.config, overriding the
# env var — force it back to CPU before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def random_dna(rng):
    def make(n: int, alphabet: str = "ATGC") -> str:
        return "".join(rng.choice(list(alphabet), size=n))

    return make
