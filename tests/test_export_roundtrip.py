"""StableHLO export portability round trip (round-5 verdict item 10).

The repo's replacement for the reference's ONNX/TFLite portability
story (``nnlib/conversion.py:34-233``) is the ``utils convert-graph``
StableHLO artifact. This pins the actual claim: a FRESH CPU-only
process with no bundle, no config, and no jaeger_tpu import can
deserialize the blob and reproduce the model's logits.
"""

import json
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax.numpy as jnp

from jaeger_tpu.models.artifacts import save_model
from jaeger_tpu.models.builder import ModelBuilder

CFG = {
    "model": {
        "name": "export_rt",
        "seed": 0,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 16},
        "string_processor": {"crop_size": 62, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 24, "kernel_size": 5,
                            "padding": "same"}},
                {"name": "masked_dyt", "config": {}},
                {"name": "gelu"},
                {"name": "residual_block",
                 "config": {"block_size": 1, "filters": 24,
                            "kernel_size": 3, "norm_type": "masked_dyt"}},
            ],
            "pooling": "max",
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    },
    "training": {},
}


@pytest.mark.parametrize("dtype", ["float32"])
def test_stablehlo_roundtrip_fresh_cpu_process(tmp_path, dtype):
    b = ModelBuilder(CFG, dtype=jnp.float32)
    model, variables = b.init()
    path = tmp_path / "model"
    save_model(variables, CFG, path)

    from jaeger_tpu.models.conversion import export_stablehlo

    blob_path = export_stablehlo(path, tmp_path / "g.stablehlo", batch=4,
                                 dtype=jnp.float32)

    _, crop_nt = b.crop
    rng = np.random.default_rng(0)
    bases = rng.integers(0, 4, size=(4, crop_nt)).astype(np.uint8)
    lengths = np.full((4,), crop_nt, np.int32)
    want = model.apply(
        variables,
        {"bases": jnp.asarray(bases), "lengths": jnp.asarray(lengths)},
        train=False)
    np.save(tmp_path / "bases.npy", bases)
    np.save(tmp_path / "lengths.npy", lengths)

    # fresh process: CPU-only jax, no jaeger_tpu import, no bundle —
    # only the serialized artifact + raw inputs
    script = textwrap.dedent(f"""
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import json
        import numpy as np
        from jax import export as jax_export

        blob = open({str(blob_path)!r}, "rb").read()
        fn = jax_export.deserialize(blob)
        bases = np.load({str(tmp_path / 'bases.npy')!r})
        lengths = np.load({str(tmp_path / 'lengths.npy')!r})
        out = fn.call(bases, lengths)
        print(json.dumps({{k: np.asarray(v).tolist()
                           for k, v in out.items()}}))
    """)
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    got = json.loads(res.stdout.strip().splitlines()[-1])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k]),
            rtol=1e-6, atol=1e-6, err_msg=k)
