"""Analytic scaling substantiation (round-4 verdict item 5).

Real multi-chip hardware is unreachable in this harness and the
CPU-socket harness (scripts/scaling_shape.py) measures socket
contention, not ICI. The honest substitute, per VERDICT r3: derive the
efficiency-at-width from first principles —

  1. compile the ACTUAL programs (flagship train step; data-parallel
     inference; sequence-sharded Hyena forward) over 1/2/4/8-device
     meshes and extract every collective op + its tensor bytes from the
     compiled HLO (nothing assumed about what XLA inserts);
  2. combine the per-step collective bytes with the public v5e ICI/DCN
     bandwidth model and the MEASURED single-chip step times
     (BENCH_r03 / docs/optimizations.md) into a predicted step time and
     efficiency at each width.

Model (assumptions stated in the artifact):
  * weak scaling: per-chip batch fixed (train 1024 windows, infer 2048),
    so single-chip compute time is width-independent;
  * ring all-reduce of B bytes over an n-chip ICI axis moves
    2*B*(n-1)/n bytes through each link pair; v5e ICI one-way link
    bandwidth 4.5e10 B/s, both directions usable -> 9e10 B/s per axis
    (jax-ml.github.io/scaling-book numbers);
  * collective-permute (the Hyena ring) moves its payload once per hop:
    B/n bytes per step per link at 4.5e10 B/s one-way;
  * cross-host (2 hosts x 4 chips) the gradient all-reduce crosses DCN
    at 2.5e10 B/s per host after an in-host reduce-scatter.

Writes SCALING_r04.json beside the CPU-harness numbers.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_analytic.py [--out SCALING_r04.json]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_PLATFORMS", "cpu")
from jaeger_tpu.utils.devices import honour_platform_env  # noqa: E402

honour_platform_env()

# --- hardware model (public v5e numbers; see module docstring) ---
ICI_AXIS_BW = 9.0e10      # B/s, one torus axis, both directions
ICI_LINK_BW = 4.5e10      # B/s, one direction (ppermute hop)
DCN_HOST_BW = 2.5e10      # B/s per host
# measured single-chip step times (chip, HLO-cache-warm; BENCH_r03 +
# docs/optimizations.md train attribution)
MEASURED = {
    "train_step_ms_b1024": 1024 / 6107 * 1e3,      # 167.7 ms
    "infer_fwd_ms_b2048": 2048 / 23135 * 1e3,      # 88.5 ms
}

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape: str) -> int:
    """bytes of an HLO shape string like 'f32[128,3]{1,0}' or a tuple."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collectives_in_hlo(hlo: str) -> dict[str, dict]:
    """{op_kind: {count, bytes}} over the compiled module; bytes are the
    RESULT tensor bytes of each collective instruction (start ops only —
    '-done' ops carry the same tensor)."""
    out: dict[str, dict] = {}
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"%?\S+\s*=\s*(\([^)]*\)|\S+)\s+(\S+)\(", line)
        if not m:
            continue
        op = m.group(2).rstrip(".0123456789")
        base = op.replace("-start", "")
        if base not in _COLLECTIVES or op.endswith("-done"):
            continue
        b = _shape_bytes(m.group(1))
        slot = out.setdefault(base, {"count": 0, "bytes": 0})
        slot["count"] += 1
        slot["bytes"] += b
    return out


def _flagship(n_devices_batch: int, crop_override: int | None = None):
    import jax.numpy as jnp

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.models.flagship import flagship_config

    cfg = flagship_config()
    if crop_override:
        cfg["model"]["string_processor"].pop("crop_sizes", None)
        cfg["model"]["string_processor"]["crop_size"] = crop_override
    builder = ModelBuilder(cfg, dtype=jnp.bfloat16)
    model, variables = builder.init(batch=1)
    return cfg, builder, model, variables


def train_step_hlo(width: int, per_chip_batch: int = 8) -> str:
    """Compiled HLO of the sharded flagship train step at `width`.

    The COLLECTIVE bytes depend on the parameter tree (gradient psum)
    and batch-stat reductions, not on the batch rows (those stay
    sharded), so a small per-chip batch compiles fast and reports the
    same collective payload as batch 1024."""
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.parallel import mesh as meshlib
    from jaeger_tpu.train.loop import (
        StepConfig, TrainState, make_train_step, shard_train_step,
    )
    from jaeger_tpu.train.optimizers import make_optimizer

    cfg, builder, model, variables = _flagship(width, crop_override=200)
    _, crop_nt = builder.crop
    mesh = meshlib.data_mesh(width)
    tx = make_optimizer("adam", {})
    state = TrainState.create(variables, tx)
    step = make_train_step(model, StepConfig(
        loss_name="categorical_crossentropy",
        loss_params={"from_logits": True},
        reg_specs=tuple(builder.regularizer_specs()),
    ))
    sharded = shard_train_step(step, mesh)
    n_cls = int(cfg["model"].get("classifier_out_dim", 3))
    b = per_chip_batch * width
    batch = {
        "bases": jnp.zeros((b, crop_nt), jnp.uint8),
        "lengths": jnp.full((b,), crop_nt, jnp.int32),
        "labels": jnp.zeros((b, n_cls), jnp.float32),
    }
    import jax

    rng = jax.random.PRNGKey(0)
    lowered = sharded.lower(state, batch, rng)
    return lowered.compile().as_text()


def infer_hlo(width: int, per_chip_batch: int = 8) -> str:
    """Compiled HLO of the data-parallel device-reduced inference program
    (the product path of `jaeger predict` on a mesh)."""
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.parallel import mesh as meshlib

    cfg, builder, model, variables = _flagship(width, crop_override=200)
    _, crop_nt = builder.crop
    mesh = meshlib.data_mesh(width)
    bs = per_chip_batch * width
    engine = InferenceEngine(model, variables, batch_size=bs, mesh=mesh,
                             pack_transfer=False)
    fn = engine._get_reduced_fn((bs, crop_nt), with_reliability=False,
                                dense=True)
    args = (
        jax.device_put(variables, engine._replicated),
        jnp.zeros((bs, crop_nt), jnp.uint8),
        jnp.full((bs,), crop_nt, jnp.int32),
        jnp.zeros((bs,), jnp.int32),
        jnp.ones((bs,), jnp.bool_),
    )
    return fn.lower(*args).compile().as_text()


def hyena_hlo(width: int) -> str:
    """Compiled HLO of the sequence-sharded Hyena ring at `width`."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from jaeger_tpu.parallel.hyena_sp import make_sequence_sharded_hyena

    mesh = Mesh(np.array(jax.devices()[:width]), ("seq",))
    fn = make_sequence_sharded_hyena(mesh, "seq")
    L, D, order = 4096, 64, 2
    proj = jnp.zeros((order + 1, 2, L, D), jnp.float32)
    filt = jnp.zeros((order, D, L), jnp.float32)
    return jax.jit(fn).lower(proj, filt).compile().as_text()


def predict_efficiency(kind: str, colls: dict, width: int,
                       hosts: int = 1) -> dict:
    """Predicted v5e step time + efficiency from collective bytes."""
    if kind == "train":
        t_compute = MEASURED["train_step_ms_b1024"] / 1e3
    else:
        t_compute = MEASURED["infer_fwd_ms_b2048"] / 1e3
    t_ici = 0.0
    for op, d in colls.items():
        B = d["bytes"]
        if op in ("all-reduce", "all-gather", "reduce-scatter"):
            t_ici += 2 * B * (width - 1) / max(width, 1) / ICI_AXIS_BW
        elif op in ("collective-permute", "all-to-all"):
            t_ici += B / ICI_LINK_BW
    t_dcn = 0.0
    if hosts > 1:
        # gradient bytes cross DCN once per step after in-host reduction
        grad_b = colls.get("all-reduce", {}).get("bytes", 0)
        t_dcn = 2 * grad_b * (hosts - 1) / hosts / DCN_HOST_BW
    t_total = t_compute + t_ici + t_dcn
    return {
        "collective_bytes": {k: v["bytes"] for k, v in colls.items()},
        "collective_counts": {k: v["count"] for k, v in colls.items()},
        "t_compute_ms": round(t_compute * 1e3, 3),
        "t_ici_ms": round(t_ici * 1e3, 4),
        "t_dcn_ms": round(t_dcn * 1e3, 4),
        "predicted_efficiency": round(t_compute / t_total, 5),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "SCALING_r04.json"))
    ap.add_argument("--widths", default="2,4,8")
    args = ap.parse_args()

    import jax

    widths = [int(w) for w in args.widths.split(",")]
    assert len(jax.devices()) >= max(widths), (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu")

    result = {
        "metric": "analytic scaling from compiled-HLO collective bytes "
                  "+ v5e ICI/DCN bandwidth model + measured single-chip "
                  "step times",
        "assumptions": {
            "weak_scaling": "per-chip batch fixed (train 1024 windows, "
                            "infer 2048); t_compute from chip "
                            "measurements (BENCH_r03, train breakdown)",
            "ici_axis_bw_Bps": ICI_AXIS_BW,
            "ici_link_bw_Bps": ICI_LINK_BW,
            "dcn_host_bw_Bps": DCN_HOST_BW,
            "all_reduce_model": "ring: 2*B*(n-1)/n / axis_bw",
            "source": "public v5e numbers (jax-ml.github.io/scaling-book)",
        },
        "programs": {},
    }

    for width in widths:
        print(f"--- width {width} ---", flush=True)
        row: dict = {}
        hlo = train_step_hlo(width)
        colls = collectives_in_hlo(hlo)
        row["train_step"] = predict_efficiency("train", colls, width)
        row["train_step_2hosts"] = predict_efficiency(
            "train", colls, width, hosts=2)
        print("  train:", row["train_step"], flush=True)

        hlo = infer_hlo(width)
        colls = collectives_in_hlo(hlo)
        row["inference_reduced"] = predict_efficiency(
            "infer", colls, width)
        print("  infer:", row["inference_reduced"], flush=True)

        hlo = hyena_hlo(width)
        colls = collectives_in_hlo(hlo)
        row["hyena_seq_ring"] = {
            "collective_bytes": {k: v["bytes"] for k, v in colls.items()},
            "collective_counts": {k: v["count"] for k, v in colls.items()},
            "note": "ppermute ring payload per forward at L=4096, D=64, "
                    "B=2 f32 (scales linearly with B*L*D/n per hop)",
        }
        print("  hyena:", row["hyena_seq_ring"], flush=True)
        result["programs"][str(width)] = row

    # carry the CPU-socket harness numbers for contrast
    r03 = REPO / "SCALING_r03.json"
    if r03.exists():
        result["cpu_socket_harness_r03"] = json.loads(r03.read_text())

    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result)[:2000])


if __name__ == "__main__":
    main()
