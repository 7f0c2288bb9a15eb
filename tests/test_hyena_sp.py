"""Sequence-sharded Hyena vs single-device reference (8 virtual devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from jaeger_tpu.models.layers import causal_fft_convolve
from jaeger_tpu.parallel.hyena_sp import sequence_sharded_hyena_op


@pytest.fixture
def seq_mesh():
    return Mesh(np.array(jax.devices()), ("seq",))


def _mesh_of(width):
    return Mesh(np.array(jax.devices()[:width]), ("seq",))


def _reference_recurrence(projections, filters):
    z = jnp.swapaxes(projections[0], 1, 2)
    for i in range(filters.shape[0]):
        gate = jnp.swapaxes(projections[i + 1], 1, 2)
        z = causal_fft_convolve(z, filters[i]) * gate
    return jnp.swapaxes(z, 1, 2)


@pytest.mark.parametrize("width", [2, 4, 8])
def test_sharded_matches_reference(width, rng):
    """Ring overlap-save recurrence == unsharded FFT recurrence at every
    mesh width (round-2 verdict: exactness pinned at widths 2/4/8)."""
    order, B, L, D = 2, 2, 64, 8
    projections = jnp.asarray(
        rng.normal(size=(order + 1, B, L, D)).astype(np.float32)
    )
    filters = jnp.asarray(
        rng.normal(size=(order, D, L)).astype(np.float32) * 0.1
    )
    ref = _reference_recurrence(projections, filters)
    out = sequence_sharded_hyena_op(projections, filters, _mesh_of(width))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ring_matches_gathered_oracle(seq_mesh, rng):
    """The O(L/n)-memory ring conv equals the round-2 all_gather form."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jaeger_tpu.parallel import hyena_sp

    B, D, L = 2, 4, 64
    z = jnp.asarray(rng.normal(size=(B, D, L)).astype(np.float32))
    h = jnp.asarray(
        (rng.normal(size=(D, L)) * np.exp(-np.arange(L) / 16.0))
        .astype(np.float32))
    from jax import shard_map

    spec = P(None, None, "seq")
    args = dict(mesh=seq_mesh, in_specs=(spec, P()), out_specs=spec)
    zs = jax.device_put(z, NamedSharding(seq_mesh, spec))
    ring = shard_map(
        lambda a, b: hyena_sp.ring_causal_conv(a, b, "seq"), **args
    )(zs, h)
    gathered = shard_map(
        lambda a, b: hyena_sp.gathered_causal_conv(a, b, "seq"), **args
    )(zs, h)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(gathered),
                               rtol=2e-4, atol=2e-4)


def test_ring_conv_hlo_has_no_all_gather(seq_mesh):
    """The memory story holds in the compiled program: the ring path
    lowers to collective-permutes, never an all-gather of the stream."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jaeger_tpu.parallel import hyena_sp
    from jax import shard_map

    B, D, L = 1, 4, 64
    spec = P(None, None, "seq")
    fn = jax.jit(shard_map(
        lambda a, b: hyena_sp.ring_causal_conv(a, b, "seq"),
        mesh=seq_mesh, in_specs=(spec, P()), out_specs=spec,
    ))
    z = jnp.zeros((B, D, L), jnp.float32)
    h = jnp.zeros((D, L), jnp.float32)
    txt = fn.lower(
        jax.device_put(z, NamedSharding(seq_mesh, spec)), h
    ).compile().as_text()
    assert "collective-permute" in txt
    assert "all-gather" not in txt


def test_causality_under_sharding(seq_mesh, rng):
    """Perturbing the tail must not change earlier output shards."""
    order, B, L, D = 1, 1, 64, 4
    projections = rng.normal(size=(order + 1, B, L, D)).astype(np.float32)
    filters = rng.normal(size=(order, D, L)).astype(np.float32) * 0.1
    out1 = np.asarray(sequence_sharded_hyena_op(
        jnp.asarray(projections), jnp.asarray(filters), seq_mesh
    ))
    projections2 = projections.copy()
    projections2[:, :, 48:, :] += 10.0  # change only the last quarter
    out2 = np.asarray(sequence_sharded_hyena_op(
        jnp.asarray(projections2), jnp.asarray(filters), seq_mesh
    ))
    np.testing.assert_allclose(out1[:, :48], out2[:, :48],
                               rtol=1e-4, atol=1e-4)
    assert np.abs(out1[:, 48:] - out2[:, 48:]).max() > 1e-3


def test_ring_is_differentiable(rng):
    """Training through the sharded operator (docs/parallelism.md): grads
    wrt projections AND filters through the ppermute ring equal grads
    through the unsharded FFT recurrence. (Width 4: reverse-mode through
    an n-step ppermute ring costs ~n^2 on the CPU mesh — width 8 measured
    165 s for no extra coverage; widths 2/4/8 forward exactness is pinned
    by test_sharded_matches_reference.)"""
    seq_mesh = _mesh_of(4)
    order, B, L, D = 2, 1, 32, 4
    projections = jnp.asarray(
        rng.normal(size=(order + 1, B, L, D)).astype(np.float32))
    filters = jnp.asarray(
        rng.normal(size=(order, D, L)).astype(np.float32) * 0.1)

    def loss_ref(p, f):
        return jnp.sum(_reference_recurrence(p, f) ** 2)

    def loss_ring(p, f):
        return jnp.sum(sequence_sharded_hyena_op(p, f, seq_mesh) ** 2)

    gp_ref, gf_ref = jax.grad(loss_ref, argnums=(0, 1))(projections, filters)
    gp, gf = jax.grad(loss_ring, argnums=(0, 1))(projections, filters)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                               rtol=5e-4, atol=5e-4)


def test_bf16_direct_matches_fft_form(rng):
    """The bf16 Toeplitz-matmul dispatch equals the FFT convolution up to
    bf16 output rounding (models/layers.py::causal_fft_convolve)."""
    import jax.numpy as jnp

    from jaeger_tpu.models.layers import (
        _causal_toeplitz_convolve, causal_fft_convolve)

    u = rng.standard_normal((3, 8, 161)).astype(np.float32)
    h = (rng.standard_normal((8, 161)) *
         np.exp(-np.arange(161) / 30.0)).astype(np.float32)
    ref = np.asarray(causal_fft_convolve(jnp.asarray(u), jnp.asarray(h)))
    direct = np.asarray(_causal_toeplitz_convolve(
        jnp.asarray(u), jnp.asarray(h)))
    np.testing.assert_allclose(direct, ref, rtol=0, atol=2e-4)
    # the public entry dispatches on dtype: bf16 in, bf16 out, same values
    bf = np.asarray(causal_fft_convolve(
        jnp.asarray(u, jnp.bfloat16), jnp.asarray(h, jnp.bfloat16)
    ).astype(jnp.float32))
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(bf - ref) / scale) < 0.05  # bf16 rounding


def test_toeplitz_gate_on_operator_bytes(rng, monkeypatch):
    """The bf16 direct dispatch is gated on the materialized (D, L, L)
    operator size, not only L — a wide model dim must fall back to the
    FFT form instead of silently materializing gigabytes (advisor r2)."""
    from jaeger_tpu.models import layers as lyr

    u = jnp.asarray(rng.standard_normal((1, 4, 32)), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((4, 32)) * 0.1, jnp.bfloat16)

    calls = []
    real = lyr._causal_toeplitz_convolve
    monkeypatch.setattr(
        lyr, "_causal_toeplitz_convolve",
        lambda *a: calls.append(1) or real(*a))
    lyr.causal_fft_convolve(u, h)
    assert calls  # small operator: direct path taken

    calls.clear()
    monkeypatch.setattr(lyr, "_DIRECT_CONV_MAX_BYTES", 4 * 32 * 32 * 4 - 1)
    out = lyr.causal_fft_convolve(u, h)
    assert not calls  # over budget: FFT fallback
    assert out.dtype == jnp.bfloat16


def test_blocked_toeplitz_matches_direct_and_fft(rng):
    """The blocked banded form (L past the direct cap) equals both the
    direct Toeplitz matmul and the FFT convolution in f32 (same
    accumulation dtype; einsum order differs -> tiny tolerance). L is
    deliberately NOT a chunk multiple to cover the padded tail."""
    import jax.numpy as jnp

    from jaeger_tpu.models.layers import (_causal_block_toeplitz_convolve,
                                          _causal_toeplitz_convolve,
                                          causal_fft_convolve)

    L = 1337
    u = rng.standard_normal((2, 4, L)).astype(np.float32)
    h = (rng.standard_normal((4, L)) *
         np.exp(-np.arange(L) / 150.0)).astype(np.float32)
    blocked = np.asarray(_causal_block_toeplitz_convolve(
        jnp.asarray(u), jnp.asarray(h), chunk=256))
    direct = np.asarray(_causal_toeplitz_convolve(
        jnp.asarray(u), jnp.asarray(h)))
    fft = np.asarray(causal_fft_convolve(jnp.asarray(u), jnp.asarray(h)))
    np.testing.assert_allclose(blocked, direct, rtol=0, atol=2e-3)
    np.testing.assert_allclose(blocked, fft, rtol=0, atol=2e-3)


def test_bf16_blocked_dispatch_and_gradient(rng, monkeypatch):
    """bf16 + L in (direct cap, block cap] routes through the blocked
    form; the path is differentiable; L past the block cap stays FFT."""
    from jaeger_tpu.models import layers as lyr

    calls = []
    real = lyr._causal_block_toeplitz_convolve
    monkeypatch.setattr(
        lyr, "_causal_block_toeplitz_convolve",
        lambda *a, **k: calls.append(1) or real(*a, **k))
    # shrink the caps so the test stays small: direct cap 64, block cap 256
    monkeypatch.setattr(lyr, "_DIRECT_CONV_MAX_L", 64)
    monkeypatch.setattr(lyr, "_BLOCK_CONV_MAX_L", 256)
    monkeypatch.setattr(lyr, "_BLOCK_CONV_CHUNK", 64)

    L = 160
    u = jnp.asarray(rng.standard_normal((2, 4, L)), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((4, L)) * 0.1, jnp.bfloat16)
    out = lyr.causal_fft_convolve(u, h)
    assert calls and out.dtype == jnp.bfloat16
    ref = np.asarray(lyr.causal_fft_convolve(
        u.astype(jnp.float32), h.astype(jnp.float32)))
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(np.asarray(out.astype(jnp.float32)) - ref)
                  / scale) < 0.05  # bf16 rounding

    g = jax.grad(lambda a, b: jnp.sum(
        lyr.causal_fft_convolve(a, b).astype(jnp.float32)))(u, h)
    assert np.isfinite(np.asarray(g, np.float32)).all()

    calls.clear()
    u_big = jnp.asarray(rng.standard_normal((1, 2, 300)), jnp.bfloat16)
    h_big = jnp.asarray(rng.standard_normal((2, 300)) * 0.1, jnp.bfloat16)
    lyr.causal_fft_convolve(u_big, h_big)
    assert not calls  # past the block cap: the chunked-scan form takes over


def test_scan_conv_matches_fft(rng):
    """The chunked-scan form (single-chip long-context path) equals the
    FFT convolution in f32; L deliberately not a chunk multiple."""
    from jaeger_tpu.models.layers import (_causal_chunked_scan_convolve,
                                          causal_fft_convolve)

    L = 2500
    u = rng.standard_normal((2, 3, L)).astype(np.float32)
    h = (rng.standard_normal((3, L)) *
         np.exp(-np.arange(L) / 400.0)).astype(np.float32)
    scan = np.asarray(_causal_chunked_scan_convolve(
        jnp.asarray(u), jnp.asarray(h), chunk=256))
    fft = np.asarray(causal_fft_convolve(jnp.asarray(u), jnp.asarray(h)))
    np.testing.assert_allclose(scan, fft, rtol=0, atol=2e-3)


def test_bf16_scan_dispatch_and_gradient(rng, monkeypatch):
    """bf16 + L past the block cap routes through the chunked-scan form
    (not the slow TPU FFT); the path is differentiable; L past the scan
    cap still falls back to FFT."""
    from jaeger_tpu.models import layers as lyr

    calls = []
    real = lyr._causal_chunked_scan_convolve
    monkeypatch.setattr(
        lyr, "_causal_chunked_scan_convolve",
        lambda *a, **k: calls.append(k.get("chunk")) or real(*a, **k))
    monkeypatch.setattr(lyr, "_DIRECT_CONV_MAX_L", 64)
    monkeypatch.setattr(lyr, "_BLOCK_CONV_MAX_L", 128)
    monkeypatch.setattr(lyr, "_BLOCK_CONV_CHUNK", 64)
    monkeypatch.setattr(lyr, "_SCAN_CONV_MAX_L", 1024)

    L = 333
    u = jnp.asarray(rng.standard_normal((2, 4, L)), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((4, L)) * 0.1, jnp.bfloat16)
    out = lyr.causal_fft_convolve(u, h)
    # the gate must hand the scan kernel its own chunk constant (advisor
    # round 4: gate/kernel chunk mismatch) -> multi-block execution here
    assert calls == [64] and out.dtype == jnp.bfloat16
    ref = np.asarray(lyr.causal_fft_convolve(
        u.astype(jnp.float32), h.astype(jnp.float32)))
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(np.asarray(out.astype(jnp.float32)) - ref)
                  / scale) < 0.05  # bf16 rounding

    g = jax.grad(lambda a, b: jnp.sum(
        lyr.causal_fft_convolve(a, b).astype(jnp.float32)))(u, h)
    assert np.isfinite(np.asarray(g, np.float32)).all()

    calls.clear()
    u_big = jnp.asarray(rng.standard_normal((1, 2, 2048)), jnp.bfloat16)
    h_big = jnp.asarray(rng.standard_normal((2, 2048)) * 0.1, jnp.bfloat16)
    lyr.causal_fft_convolve(u_big, h_big)
    assert not calls  # past the scan cap: FFT fallback


def test_blocked_gate_catches_direct_byte_rejection(rng, monkeypatch):
    """L under the direct cap whose (D, L, L) operator is over budget must
    route to the blocked form (its banded operator fits), not fall through
    to the FFT (advisor round 4, dispatch gap)."""
    from jaeger_tpu.models import layers as lyr

    blocked_calls = []
    real = lyr._causal_block_toeplitz_convolve
    monkeypatch.setattr(
        lyr, "_causal_block_toeplitz_convolve",
        lambda *a, **k: blocked_calls.append(1) or real(*a, **k))
    monkeypatch.setattr(lyr, "_DIRECT_CONV_MAX_L", 1024)
    monkeypatch.setattr(lyr, "_BLOCK_CONV_CHUNK", 64)
    # budget admits D*nblk*64^2*4 = 4*4*16384*4 = 1 MB banded operator but
    # not the 4*256*256*4 = 1 MB direct one... make direct strictly larger
    monkeypatch.setattr(lyr, "_DIRECT_CONV_MAX_BYTES", 4 * 4 * 64 * 64 * 4)

    L = 256  # direct operator 4*256*256*4 = 1 MB > 256 KB budget
    u = jnp.asarray(rng.standard_normal((1, 4, L)), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((4, L)) * 0.1, jnp.bfloat16)
    out = lyr.causal_fft_convolve(u, h)
    assert blocked_calls and out.dtype == jnp.bfloat16
    ref = np.asarray(lyr.causal_fft_convolve(
        u.astype(jnp.float32), h.astype(jnp.float32)))
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(np.asarray(out.astype(jnp.float32)) - ref)
                  / scale) < 0.05


def test_scan_conv_custom_vjp_grads_match_fft(rng):
    """The chunked-scan conv's custom VJP (both cotangents: anticausal
    correlation for du, batch-reduced causal correlation for dh) equals
    reverse-mode through the FFT form, at an L that is not a chunk
    multiple."""
    from jaeger_tpu.models.layers import _causal_chunked_scan_convolve

    L, chunk = 333, 64
    u = jnp.asarray(rng.standard_normal((2, 3, L)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((3, L)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 3, L)), jnp.float32)

    def via_scan(a, b):
        return jnp.sum(_causal_chunked_scan_convolve(a, b, chunk=chunk) * w)

    def via_fft(a, b):
        n = 2 * L - 1
        y = jnp.fft.irfft(
            jnp.fft.rfft(a, n=n, axis=-1) * jnp.fft.rfft(b, n=n, axis=-1)[None],
            n=n, axis=-1)[..., :L]
        return jnp.sum(y * w)

    gu1, gh1 = jax.grad(via_scan, argnums=(0, 1))(u, h)
    gu2, gh2 = jax.grad(via_fft, argnums=(0, 1))(u, h)
    np.testing.assert_allclose(np.asarray(gu1), np.asarray(gu2),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                               rtol=0, atol=1e-3)


def test_scan_conv_backward_memory_bounded():
    """Training through the scan tier must not store per-step carries:
    reverse-mode through the raw forward scan keeps O(n_blocks) copies
    of the full input, the custom VJP keeps O(1). Pinned via XLA's own
    memory analysis so the long-context train regime can't silently
    regress to the OOM form."""
    from jaeger_tpu.models.layers import (_causal_chunked_scan_convolve,
                                          _scan_conv_forward)

    b, d, L, chunk = 2, 8, 4096, 256
    u = jnp.zeros((b, d, L), jnp.float32)
    h = jnp.zeros((d, L), jnp.float32)

    def temp_bytes(fn):
        g = jax.jit(jax.grad(
            lambda a, bb: jnp.sum(fn(a, bb, chunk) ** 2), argnums=(0, 1)))
        return g.lower(u, h).compile().memory_analysis().temp_size_in_bytes

    vjp_mem = temp_bytes(_causal_chunked_scan_convolve)
    raw_mem = temp_bytes(_scan_conv_forward)
    assert vjp_mem * 3 < raw_mem, (vjp_mem, raw_mem)
