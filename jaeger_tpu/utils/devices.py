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


def enable_persistent_compile_cache(cache_dir: str | None = None) -> str | None:
    """Persist XLA compilations across processes.

    On TPU a fresh process pays a minutes-scale compile for each program
    shape; the reference's TF stack amortizes this with SavedModels, and the
    JAX-native equivalent is the persistent compilation cache. Enabled by
    default for every CLI entry point; ``JAEGER_TPU_COMPILE_CACHE`` overrides
    the location, and setting it to ``0``/``off``/empty disables it. Only
    compiles slower than 1 s are persisted, so test/virtual-CPU programs do
    not churn the cache. Returns the cache directory, or None when disabled
    or unavailable (e.g. a PJRT backend without executable serialization —
    jax then skips persistence on its own, so failure here is never fatal).
    """
    env = os.environ.get("JAEGER_TPU_COMPILE_CACHE")
    if env is not None and env.strip().lower() in {"", "0", "off", "none", "false"}:
        return None
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "jaeger_tpu", "xla"
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path


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
