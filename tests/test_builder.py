"""Model builder tests: config -> model -> forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaeger_tpu.models.builder import ModelBuilder

BASE_CONFIG = {
    "model": {
        "name": "test_tiny",
        "seed": 0,
        "classifier_out_dim": 3,
        "embedding": {
            "use_embedding_layer": True,
            "input_type": "translated",
            "embedding_size": 8,
            "embedding_regularizer": "l2",
            "embedding_regularizer_w": 1e-5,
        },
        "string_processor": {"crop_size": 40, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 16, "kernel_size": 7,
                            "kernel_regularizer": "l2",
                            "kernel_regularizer_w": 1e-5}},
                {"name": "masked_batchnorm", "config": {"return_nmd": False}},
                {"name": "activation", "config": {"activation": "gelu"}},
                {"name": "residual_block",
                 "config": {"use_1x1conv": False, "block_size": 2,
                            "filters": 16, "kernel_size": 3}},
                {"name": "masked_batchnorm", "config": {}},
                {"name": "gelu"},
            ],
            "pooling": "average",
        },
        "classifier": {
            "input_shape": 16,
            "hidden_layers": [
                {"name": "dropout", "config": {"rate": 0.3}},
                {"name": "dense",
                 "config": {"units": 3, "dtype": "float32"}},
            ],
        },
    },
    "training": {},
}


def _inputs(n, crop_nt, rng=None, lengths=None):
    rng = rng or np.random.default_rng(0)
    bases = rng.integers(0, 4, size=(n, crop_nt), dtype=np.uint8)
    if lengths is None:
        lengths = np.full(n, crop_nt, np.int32)
    return {"bases": jnp.asarray(bases), "lengths": jnp.asarray(lengths)}


def test_baseline_forward_shapes():
    b = ModelBuilder(BASE_CONFIG)
    model, variables = b.init()
    _, crop_nt = b.crop
    assert crop_nt == 125
    out = model.apply(variables, _inputs(4, crop_nt), train=False)
    assert out["prediction"].shape == (4, 3)
    assert out["embedding"].shape == (4, 16)


def test_train_mode_updates_batch_stats():
    b = ModelBuilder(BASE_CONFIG)
    model, variables = b.init()
    _, crop_nt = b.crop
    out, updates = model.apply(
        variables, _inputs(4, crop_nt), train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"],
    )
    before = variables["batch_stats"]
    after = updates["batch_stats"]
    diffs = jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()), before, after
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_padding_invariance():
    """A short window must produce identical logits whether delivered in a
    short buffer or padded into a longer one (mask correctness)."""
    b = ModelBuilder(BASE_CONFIG)
    model, variables = b.init()
    _, crop_nt = b.crop
    rng = np.random.default_rng(1)
    m = 80
    seq = rng.integers(0, 4, size=m, dtype=np.uint8)

    short = np.full((1, crop_nt), 4, dtype=np.uint8)
    short[0, :m] = seq
    out_short = model.apply(
        variables,
        {"bases": jnp.asarray(short),
         "lengths": jnp.asarray([m], np.int32)},
        train=False,
    )
    # wider buffer, same valid content
    wide = np.full((1, crop_nt + 64), 4, dtype=np.uint8)
    wide[0, :m] = seq
    out_wide = model.apply(
        variables,
        {"bases": jnp.asarray(wide),
         "lengths": jnp.asarray([m], np.int32)},
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_short["prediction"]),
        np.asarray(out_wide["prediction"]), rtol=1e-5, atol=1e-5,
    )


def test_nmd_and_reliability_head():
    cfg = {
        "model": {
            **BASE_CONFIG["model"],
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 8, "kernel_size": 3}},
                    {"name": "masked_batchnorm",
                     "config": {"return_nmd": True}},
                    {"name": "gelu"},
                ],
                "pooling": "average",
            },
            "reliability_model": {
                "mode": "nmd",
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 1}},
                ],
            },
        },
        "training": {},
    }
    b = ModelBuilder(cfg)
    model, variables = b.init()
    _, crop_nt = b.crop
    out = model.apply(variables, _inputs(4, crop_nt), train=False)
    assert out["nmd"].shape == (4, 8)
    assert out["reliability"].shape == (4, 1)


def test_nmd_plus_signals():
    cfg = {
        "model": {
            **BASE_CONFIG["model"],
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 8, "kernel_size": 3}},
                    {"name": "masked_batchnorm",
                     "config": {"return_nmd": True}},
                ],
                "pooling": "max",
            },
            "reliability_model": {
                "mode": "nmd_plus_signals",
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 1}},
                ],
            },
        },
        "training": {},
    }
    b = ModelBuilder(cfg)
    model, variables = b.init()
    _, crop_nt = b.crop
    out = model.apply(variables, _inputs(3, crop_nt), train=False)
    assert out["reliability"].shape == (3, 1)


def test_projection_head():
    cfg = {
        "model": {
            **BASE_CONFIG["model"],
            "projection": {
                "input_shape": 16,
                "margin": 0.5,
                "scale": 30,
                "hidden_layers": [
                    {"name": "dense", "config": {"units": 8,
                                                 "activation": "relu"}},
                    {"name": "dense", "config": {"units": 4}},
                ],
            },
        },
        "training": {},
    }
    b = ModelBuilder(cfg)
    model, variables = b.init()
    _, crop_nt = b.crop
    out = model.apply(
        variables, _inputs(2, crop_nt), train=False, with_projection=True
    )
    assert out["projection"].shape == (2, 4)


@pytest.mark.parametrize("pooling", ["average", "max", "last", "gatedframe"])
def test_poolers(pooling):
    cfg = {
        "model": {
            **BASE_CONFIG["model"],
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 8, "kernel_size": 3}},
                ],
                "pooling": pooling,
            },
        },
        "training": {},
    }
    b = ModelBuilder(cfg)
    model, variables = b.init()
    _, crop_nt = b.crop
    out = model.apply(variables, _inputs(2, crop_nt), train=False)
    assert out["embedding"].shape == (2, 8)
    if pooling == "gatedframe":
        assert out["gate"].shape == (2, 6)


def test_both_input_type():
    """translated + nucleotide dual-tower input (input_type: both)."""
    cfg = {
        "model": {
            **BASE_CONFIG["model"],
            "embedding": {
                "use_embedding_layer": True,
                "input_type": "both",
                "embedding_size": 8,
            },
            "string_processor": {"crop_size": 40, "seq_onehot": False,
                                 "nucleotide_crop": 125},
        },
        "training": {},
    }
    b = ModelBuilder(cfg)
    model, variables = b.init()
    _, crop_nt = b.crop
    out = model.apply(variables, _inputs(2, crop_nt), train=False)
    assert out["prediction"].shape == (2, 3)


def test_parallel_branches(rng):
    """parallel_branches layer: per-branch stacks + merge modes
    (reference nnlib/builder.py:1109-1153, test_builder_parallel_branches)."""
    import numpy as np

    from jaeger_tpu.models.builder import ModelBuilder

    def cfg(merge):
        return {
            "model": {
                "name": "pb", "seed": 0, "classifier_out_dim": 2,
                "embedding": {"use_embedding_layer": True,
                              "input_type": "translated",
                              "embedding_size": 6},
                "string_processor": {"crop_size": 30, "seq_onehot": False},
                "representation_learner": {
                    "hidden_layers": [
                        {"name": "parallel_branches", "config": {
                            "merge": merge,
                            "branches": [
                                {"hidden_layers": [
                                    {"name": "masked_conv1d",
                                     "config": {"filters": 4,
                                                "kernel_size": 3,
                                                "padding": "same"}}]},
                                {"hidden_layers": [
                                    {"name": "masked_conv1d",
                                     "config": {"filters": 4,
                                                "kernel_size": 5,
                                                "padding": "same"}}]},
                            ],
                        }},
                    ],
                    "pooling": "average",
                },
                "classifier": {"hidden_layers": [
                    {"name": "dense", "config": {"units": 2}}]},
            },
            "training": {},
        }

    for merge in ("concat", "sum", "average", "max"):
        b = ModelBuilder(cfg(merge))
        model, variables = b.init()
        out = model.apply(variables, b.example_inputs(2), train=False)
        assert out["prediction"].shape == (2, 2), merge
    # branch weights are separate modules
    params = variables["params"]["rep"]
    assert "parallel_branches_0_branch_0" in params
    assert "parallel_branches_0_branch_1" in params

    import pytest

    with pytest.raises(ValueError, match="merge"):
        ModelBuilder(cfg("bogus")).init()


def test_bundled_templates_build():
    """Every shipped train_config template builds and runs forward."""
    from pathlib import Path

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.utils.config import load_model_config

    root = Path(__file__).resolve().parent.parent / "train_config"
    templates = sorted(root.glob("*.yaml"))
    assert templates, "no templates shipped"
    for path in templates:
        cfg = load_model_config(path)
        b = ModelBuilder(cfg)
        model, variables = b.init()
        out = model.apply(variables, b.example_inputs(1), train=False)
        assert out["prediction"].shape[-1] == int(
            cfg["model"]["classifier_out_dim"]), path.name


def test_all_parseable_reference_configs_build():
    """Every parseable reference train_config YAML builds and initializes
    through our builder (schema parity, VERDICT r1 #6). The two excluded
    files (nn_config.yaml, nn_config_baseline.yaml) contain a literal
    YAML syntax error in the reference itself (doubled quote on
    data_dir) and are unparseable by any YAML loader."""
    from pathlib import Path

    import jax
    import pytest

    from jaeger_tpu.models.builder import ModelBuilder
    from jaeger_tpu.utils.config import load_model_config

    ref = Path("/root/reference/train_config")
    if not ref.exists():
        pytest.skip("reference tree unavailable")
    broken = {"nn_config.yaml", "nn_config_baseline.yaml"}
    names = sorted(p.name for p in ref.glob("*.yaml"))
    assert len(names) == 11
    built = []
    for name in names:
        if name in broken:
            with pytest.raises(Exception, match="while parsing|scann"):
                load_model_config(ref / name)
            continue
        cfg = load_model_config(ref / name)
        model, variables = ModelBuilder(cfg).init(batch=1)
        n_params = sum(
            x.size for x in jax.tree.leaves(variables.get("params", {}))
        )
        assert n_params > 1000, name
        built.append(name)
    assert len(built) == 9


def test_reliability_input_shape_mismatch_raises():
    """reference integration parity (test_builder_nmd_merge.py:113):
    an explicit reliability_model.input_shape that disagrees with the
    computed NMD input dimension raises the reference's error."""
    import copy

    import pytest

    from jaeger_tpu.models.builder import ModelBuilder

    cfg = {
        "model": {
            "name": "m", "seed": 0, "classifier_out_dim": 3,
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 4},
            "string_processor": {"crop_size": 30, "seq_onehot": False},
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 4, "kernel_size": 3}},
                    {"name": "masked_batchnorm",
                     "config": {"return_nmd": True}},
                ],
                "pooling": "average",
            },
            "classifier": {
                "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
            },
            "reliability_model": {
                "mode": "nmd", "input_shape": 999,
                "hidden_layers": [{"name": "dense", "config": {"units": 1}}],
            },
        },
    }
    with pytest.raises(ValueError, match="does not match"):
        ModelBuilder(cfg).init(batch=1)
    ok = copy.deepcopy(cfg)
    ok["model"]["reliability_model"]["input_shape"] = 4  # = NMD width
    ModelBuilder(ok).init(batch=1)


def test_model_level_use_masking_gate(rng):
    """model.use_masking: false propagates to every layer config as the
    default (reference nnlib/builder.py:259,1020) — masked and unmasked
    builds differ on short (padded) windows and agree on full windows."""
    import copy

    import jax.numpy as jnp
    import numpy as np

    from jaeger_tpu.models.builder import ModelBuilder

    cfg = {
        "model": {
            "name": "m", "seed": 0, "classifier_out_dim": 3,
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 4},
            "string_processor": {"crop_size": 60, "seq_onehot": False},
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 4, "kernel_size": 3}},
                    {"name": "masked_batchnorm"},
                    {"name": "gelu"},
                ],
                "pooling": "average",
            },
            "classifier": {
                "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
            },
        },
    }
    masked = copy.deepcopy(cfg)
    unmasked = copy.deepcopy(cfg)
    unmasked["model"]["use_masking"] = False
    bm, bu = ModelBuilder(masked), ModelBuilder(unmasked)
    # the gate landed in every layer config
    for name, lcfg in [(e["name"], e.get("config", {}))
                       for e in unmasked["model"]["representation_learner"]
                       ["hidden_layers"]]:
        assert lcfg.get("use_masking") is False, name

    mm, vm = bm.init()
    mu, vu = bu.init()
    bases = jnp.asarray(
        rng.integers(0, 4, size=(2, 60)).astype(np.uint8))
    short = {"bases": bases, "lengths": jnp.asarray([60, 33], jnp.int32)}
    om_s = np.asarray(mm.apply(vm, short, train=False)["prediction"])
    ou_s = np.asarray(mu.apply(vu, short, train=False)["prediction"])
    assert om_s.shape == ou_s.shape == (2, 3)
    assert np.isfinite(om_s).all() and np.isfinite(ou_s).all()
    # the gate changes the numerics (mask semantics disabled)
    assert not np.allclose(om_s[1], ou_s[1], atol=1e-5)
    # an explicit per-layer setting beats the model-level default
    mixed = copy.deepcopy(unmasked)
    mixed["model"]["representation_learner"]["hidden_layers"][0][
        "config"]["use_masking"] = True
    ModelBuilder(mixed)
    assert mixed["model"]["representation_learner"]["hidden_layers"][0][
        "config"]["use_masking"] is True
