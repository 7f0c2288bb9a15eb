"""Persistent XLA compilation cache for CLI entry points.

On TPU every fresh process pays a minutes-scale compile per program shape;
``enable_persistent_compile_cache`` (wired into ``cli.main``) persists
compiled executables across processes — the JAX-native counterpart of the
reference amortizing compiles through TF SavedModels. Pins: the helper's
config/dir behavior, the env kill-switch, and the actual cross-process
round trip (first process populates the cache, a second identical process
adds nothing new and reproduces the result).
"""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def restore_cache_config():
    import jax

    before = jax.config.jax_compilation_cache_dir
    before_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", before_min)


def test_helper_sets_config_and_creates_dir(tmp_path, monkeypatch, restore_cache_config):
    import jax

    from jaeger_tpu.utils.devices import enable_persistent_compile_cache

    monkeypatch.delenv("JAEGER_TPU_COMPILE_CACHE", raising=False)
    target = tmp_path / "xla_cache"
    got = enable_persistent_compile_cache(str(target))
    assert got == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0


def test_env_overrides_location(tmp_path, monkeypatch, restore_cache_config):
    from jaeger_tpu.utils.devices import enable_persistent_compile_cache

    target = tmp_path / "from_env"
    monkeypatch.setenv("JAEGER_TPU_COMPILE_CACHE", str(target))
    assert enable_persistent_compile_cache() == str(target)
    assert target.is_dir()


@pytest.mark.parametrize("off", ["", "0", "off", "none", "False"])
def test_env_kill_switch(monkeypatch, off):
    from jaeger_tpu.utils.devices import enable_persistent_compile_cache

    monkeypatch.setenv("JAEGER_TPU_COMPILE_CACHE", off)
    assert enable_persistent_compile_cache() is None


SUBPROC = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from jaeger_tpu.utils.devices import enable_persistent_compile_cache
    assert enable_persistent_compile_cache({cache!r}) == {cache!r}
    # The product default (1 s) keeps tiny programs out; force 0 here so
    # the test program is persisted.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp, numpy as np
    f = jax.jit(lambda x: (x @ x.T).sum(axis=1))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(128, 128)), jnp.float32)
    print("RESULT", float(f(x)[7]))
    """
)


def _run(cache: str) -> str:
    env = dict(os.environ)
    env.pop("JAEGER_TPU_COMPILE_CACHE", None)
    out = subprocess.run(
        [sys.executable, "-c", SUBPROC.format(repo=str(REPO), cache=cache)],
        capture_output=True, text=True, env=env, timeout=300, check=True,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, out.stdout + out.stderr
    return lines[-1]


def test_cross_process_cache_hit(tmp_path):
    cache = str(tmp_path / "xla")
    first = _run(cache)
    entries = sorted(os.listdir(cache))
    assert entries, "first process persisted nothing"
    second = _run(cache)
    assert second == first
    assert sorted(os.listdir(cache)) == entries, (
        "second identical process should hit the cache, not add entries"
    )
