"""Device helpers.

Parity target: reference ``utils/gpu.py`` (virtual-GPU splitting, device
listing). On JAX, virtual multi-device CPU setups come from XLA flags and
must be configured before backend initialization.
"""

from __future__ import annotations

import os


def configure_virtual_cpu_devices(count: int = 8) -> None:
    """Request ``count`` virtual CPU devices (call before importing jax)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={count}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"


def honour_platform_env() -> None:
    """Re-apply JAX_PLATFORMS over environments that force a platform on
    jax.config at interpreter start (e.g. the axon sitecustomize)."""
    env = os.environ.get("JAX_PLATFORMS")
    if env and "axon" not in env:
        try:
            import jax

            jax.config.update("jax_platforms", env)
        except Exception:
            pass


def device_summary() -> dict:
    import jax

    devices = jax.devices()
    return {
        "backend": jax.default_backend(),
        "n_devices": len(devices),
        "kinds": sorted({d.device_kind for d in devices}),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
