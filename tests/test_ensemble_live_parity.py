"""Ensemble combination pinned LIVE against the reference EnsembleModel.

The reference's ``utils combine_models`` wraps N SavedModels in a
``tf.Module`` that combines their serving outputs (mean/sum/mv/none,
``commands/utils_models.py:11-76``).  Here two genuine
``DynamicModelBuilder``-saved graphs are ensembled by the REFERENCE
class and by our ``EnsembleModel`` (on the converted weights), and every
common output tensor is compared for each method — including the mv
masked-mean subtlety: the combined prediction vector is zero except at
the per-example majority class, whose value is the mean over ALL member
logits at that class (not only the voters).
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, str(Path(__file__).parent))

import refstubs  # noqa: E402

refstubs.install()

jaeger_ref_builder = pytest.importorskip("jaeger.nnlib.builder")

from test_e2e_live_reference import _reference_config  # noqa: E402


@pytest.fixture(scope="module")
def two_artifacts(tmp_path_factory):
    """Two real saved reference models (same architecture, different
    weights); returns [(graph_dir, project_yaml, weights_h5), ...]."""
    import yaml

    arts = []
    for seed in (0, 1):
        out_dir = tmp_path_factory.mktemp(f"ens_live_{seed}")
        cfg = _reference_config(out_dir)
        cfg["model"]["name"] = f"member{seed}"
        cfg_path = out_dir / "config.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
        cfg["config_path"] = str(cfg_path)
        b = jaeger_ref_builder.DynamicModelBuilder(cfg)
        with contextlib.redirect_stdout(io.StringIO()):
            models = b.build_fragment_classifier()
        jm = models["jaeger_model"]
        rng = np.random.default_rng(seed)
        for w in jm.weights:
            if "variance" in w.path:
                vals = rng.uniform(0.5, 1.5, size=w.shape)
            else:
                vals = rng.uniform(-0.4, 0.4, size=w.shape)
            w.assign(vals.astype("float32"))
        b.save_model(jm)
        model_dir = out_dir / "model"
        graph = next(model_dir.glob("*_graph"))
        project = next(model_dir.glob("*_project.yaml"))
        h5 = next(model_dir.glob("*.weights.h5"))
        arts.append((graph, project, h5))
    return arts


def _reference_combined(two_artifacts, toks, method):
    from jaeger.commands.utils_models import EnsembleModel

    ens = EnsembleModel([str(g) for g, _, _ in two_artifacts],
                        method=method)
    sig = ens._signatures[0]
    (_, spec), = sig.structured_input_signature[1].items()
    out = ens(tf.constant(toks, dtype=spec.dtype))
    return {k: np.asarray(v) for k, v in out.items()}


def _our_combined(two_artifacts, toks, method, tmp_path):
    import jax.numpy as jnp

    from jaeger_tpu.models.artifacts import save_model
    from jaeger_tpu.models.ensemble import (
        combine_models_core, load_ensemble,
    )
    from jaeger_tpu.models.modern_convert import convert_modern_weights
    from jaeger_tpu.utils.config import load_model_config

    paths = []
    for i, (_, project, h5) in enumerate(two_artifacts):
        cfg = load_model_config(project)
        variables = convert_modern_weights(cfg, h5)
        bundle = tmp_path / f"bundle{i}"
        save_model(variables, cfg, bundle)
        paths.append(str(bundle))
    ens_path = combine_models_core(paths, tmp_path / f"ens_{method}",
                                   method=method)
    ens, variables, _, _ = load_ensemble(ens_path)
    out = ens.apply(variables, {"translated": jnp.asarray(toks)},
                    train=False)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("method", ["mean", "sum", "mv", "none"])
def test_ensemble_combination_matches_live(two_artifacts, tmp_path, method):
    rng = np.random.default_rng(7)
    toks = rng.integers(1, 65, size=(6, 6, 165)).astype("int32")

    ref = _reference_combined(two_artifacts, toks, method)
    ours = _our_combined(two_artifacts, toks, method, tmp_path)

    common = sorted(set(ref) & set(ours))
    assert "prediction" in common
    for k in common:
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=0, atol=5e-5,
            err_msg=f"{method}: combined {k!r} diverges from the live "
                    f"reference ensemble",
        )


def test_mv_members_disagree(two_artifacts, tmp_path):
    """The two random members must actually disagree on some windows —
    otherwise the mv masked-mean path isn't exercised."""
    import jax.numpy as jnp

    from jaeger_tpu.models.modern_convert import convert_modern_weights
    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.utils.config import load_model_config

    rng = np.random.default_rng(7)
    toks = rng.integers(1, 65, size=(6, 6, 165)).astype("int32")
    argmaxes = []
    for _, project, h5 in two_artifacts:
        cfg = load_model_config(project)
        variables = convert_modern_weights(cfg, h5)
        model = ModelBuilder(cfg).build()
        out = model.apply(variables, {"translated": jnp.asarray(toks)},
                          train=False)
        argmaxes.append(np.argmax(np.asarray(out["prediction"]), axis=-1))
    assert (argmaxes[0] != argmaxes[1]).any()
