"""Install self-test.

Parity target: reference ``commands/health.py:88-262`` — environment
diagnostics, FASTA validation over the bundled edge-case files, a device
matmul test, and a tiny-model build -> save -> reload -> predict round
trip.
"""

from __future__ import annotations

import tempfile
import traceback
from pathlib import Path

TEST_DATA = Path(__file__).resolve().parent.parent / "data" / "test"

_TINY_CONFIG = {
    "model": {
        "name": "health_tiny",
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {
            "use_embedding_layer": True,
            "input_type": "translated",
            "embedding_size": 8,
        },
        "string_processor": {"crop_size": 100, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 5}},
                {"name": "masked_batchnorm", "config": {}},
                {"name": "gelu"},
            ],
            "pooling": "average",
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    },
    "training": {},
}


def _print_diagnostics() -> None:
    """Environment diagnostics (parity: reference commands/health.py:88)."""
    import platform
    import sys

    import jax

    print("environment:")
    print(f"  python   : {sys.version.split()[0]} ({platform.platform()})")
    for mod in ("jax", "flax", "optax", "numpy", "pandas"):
        try:
            import importlib

            version = getattr(importlib.import_module(mod), "__version__", "?")
            print(f"  {mod:<9}: {version}")
        except ImportError:
            print(f"  {mod:<9}: MISSING")
    print(f"  devices  : {jax.devices()} "
          f"(default backend: {jax.default_backend()})")
    try:
        from jaeger_tpu import native

        print(f"  native   : {'built' if native.available() else 'python fallback'}")
    except Exception as e:
        print(f"  native   : unavailable ({e})")
    try:
        import psutil

        mem = psutil.virtual_memory()
        print(f"  host mem : {mem.available / 2**30:.1f} / "
              f"{mem.total / 2**30:.1f} GB free")
    except ImportError:
        pass
    try:
        from jaeger_tpu.utils.registry import AvailableModels

        models = AvailableModels()
        print(f"  models   : {sorted(models.info) or 'none registered'}")
    except Exception:
        pass


def health_core() -> int:
    import jax

    failures = 0

    def check(name, fn):
        nonlocal failures
        try:
            detail = fn()
            print(f"  [ok] {name}" + (f": {detail}" if detail else ""))
        except Exception as e:
            failures += 1
            print(f"  [FAIL] {name}: {e}")
            traceback.print_exc(limit=2)

    print("jaeger-tpu health check")
    _print_diagnostics()

    def t_matmul():
        import jax.numpy as jnp

        x = jnp.ones((128, 128))
        return f"matmul sum={float((x @ x).sum()):.0f}"

    check("device matmul", t_matmul)

    def t_fasta():
        from jaeger_tpu.seqops.fasta import count_fasta, validate_fasta_entries

        results = []
        for name, min_len in [("test_contigs.fasta", 2048),
                              ("test_short.fasta", 2048),
                              ("test_empty.fasta", 2048)]:
            path = TEST_DATA / name
            if not path.exists():
                continue
            total, above = count_fasta(path, min_len)
            if name == "test_contigs.fasta":
                validate_fasta_entries(path, min_len)
            results.append(f"{name}:{above}/{total}")
        return " ".join(results)

    check("fasta validation", t_fasta)

    def t_encode():
        import numpy as np

        from jaeger_tpu.ops.encode import encode_frames
        from jaeger_tpu.seqops.windows import windows_from_sequences

        batch = windows_from_sequences(["ATGC" * 30], fragsize=120)
        toks = np.asarray(
            encode_frames(batch.bases, batch.length, crop_size=104)
        )
        return f"tokens {toks.shape}"

    check("device codon encode", t_encode)

    def t_roundtrip():
        import numpy as np

        from jaeger_tpu.models.artifacts import load_model, save_model
        from jaeger_tpu.models.builder import ModelBuilder

        builder = ModelBuilder(_TINY_CONFIG)
        model, variables = builder.init()
        with tempfile.TemporaryDirectory() as tmp:
            save_model(variables, _TINY_CONFIG, tmp)
            model2, variables2, config, classes = load_model(tmp)
            rng = np.random.default_rng(0)
            inputs = {
                "bases": rng.integers(0, 4, size=(4, 305), dtype=np.uint8),
                "lengths": np.full(4, 305, np.int32),
            }
            out = model2.apply(variables2, inputs, train=False)
            assert out["prediction"].shape == (4, 3)
            return f"classes={classes}"

    check("model save/load/predict round trip", t_roundtrip)

    print("health: " + ("OK" if failures == 0 else f"{failures} FAILURES"))
    return 1 if failures else 0
