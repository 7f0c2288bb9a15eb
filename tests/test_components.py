"""Component tests: ensemble, registry, receptive field, taxonomy."""

import numpy as np
import pytest

from jaeger_tpu.models.artifacts import save_model
from jaeger_tpu.models.builder import ModelBuilder

TINY = {
    "model": {
        "name": "tiny_a",
        "seed": 0,
        "classifier_out_dim": 3,
        "class_label_map": [
            {"class": "chromosome", "label": 0},
            {"class": "phage", "label": 1},
            {"class": "plasmid", "label": 2},
        ],
        "embedding": {"use_embedding_layer": True,
                      "input_type": "translated", "embedding_size": 8},
        "string_processor": {"crop_size": 30, "seq_onehot": False},
        "representation_learner": {
            "hidden_layers": [
                {"name": "masked_conv1d",
                 "config": {"filters": 8, "kernel_size": 3}},
            ],
            "pooling": "average",
        },
        "classifier": {
            "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
        },
    },
    "training": {},
}


def _save_tiny(tmp_path, name, seed=0):
    import copy

    cfg = copy.deepcopy(TINY)
    cfg["model"]["name"] = name
    cfg["model"]["seed"] = seed
    b = ModelBuilder(cfg)
    model, variables = b.init()
    path = tmp_path / name
    save_model(variables, cfg, path)
    return path


class TestEnsemble:
    def test_combine_and_apply(self, tmp_path):
        import jax.numpy as jnp

        from jaeger_tpu.models.ensemble import (
            combine_models_core, is_ensemble, load_ensemble,
        )

        p1 = _save_tiny(tmp_path, "m1", seed=1)
        p2 = _save_tiny(tmp_path, "m2", seed=2)
        ens_path = combine_models_core([str(p1), str(p2)],
                                       tmp_path / "ens", method="mean")
        assert is_ensemble(ens_path)
        ens, variables, config, classes = load_ensemble(ens_path)
        rng = np.random.default_rng(0)
        inputs = {
            "bases": jnp.asarray(
                rng.integers(0, 4, size=(4, 95), dtype=np.uint8)
            ),
            "lengths": jnp.full((4,), 95, jnp.int32),
        }
        out = ens.apply(variables, inputs)
        assert out["prediction"].shape == (4, 3)

    def test_mv_method(self, tmp_path):
        import jax.numpy as jnp

        from jaeger_tpu.models.ensemble import (
            combine_models_core, load_ensemble,
        )

        p1 = _save_tiny(tmp_path, "m1", seed=1)
        ens_path = combine_models_core([str(p1), str(p1)],
                                       tmp_path / "mv", method="mv")
        ens, variables, _, _ = load_ensemble(ens_path)
        inputs = {
            "bases": jnp.zeros((2, 95), jnp.uint8),
            "lengths": jnp.full((2,), 95, jnp.int32),
        }
        out = ens.apply(variables, inputs)
        # Reference MV semantics: zero everywhere except the majority
        # class, which holds the mean member logit there.  Two identical
        # members -> exactly one non-zero column equal to the member's
        # own logit at its argmax.
        import jax.numpy as jnp

        from jaeger_tpu.models.artifacts import load_model

        m, v, _, _ = load_model(p1)
        single = m.apply(v, inputs, train=False)["prediction"]
        win = jnp.argmax(single, axis=-1)
        pred = out["prediction"]
        assert pred.shape == single.shape
        for b in range(pred.shape[0]):
            for c in range(pred.shape[1]):
                expect = float(single[b, c]) if c == int(win[b]) else 0.0
                assert float(pred[b, c]) == pytest.approx(expect, abs=1e-6)


class TestRegistry:
    def test_register_and_scan(self, tmp_path):
        from jaeger_tpu.utils.registry import AvailableModels, add_to_registry

        p1 = _save_tiny(tmp_path, "reg_model")
        reg = tmp_path / "registry.json"
        add_to_registry(p1, reg)
        models = AvailableModels(registry_path=reg)
        assert "reg_model" in models.info
        assert models.resolve("reg_model") == str(p1)
        assert models.resolve(str(p1)) == str(p1)
        with pytest.raises(FileNotFoundError):
            models.resolve("nope")


class TestReceptiveField:
    def test_conv_stack(self):
        from jaeger_tpu.utils.receptive_field import compute_receptive_field

        layers = [
            {"name": "masked_conv1d", "config": {"kernel_size": 7}},
            {"name": "masked_batchnorm", "config": {}},
            {"name": "residual_block",
             "config": {"block_size": 2, "kernel_size": 3}},
        ]
        rf, trace = compute_receptive_field(layers)
        assert rf == 1 + 6 + 2 * 2  # conv k7 + 2 blocks * (3-1)
        assert trace[0] == ("input", 1)

    def test_bilstm_full(self):
        import math

        from jaeger_tpu.utils.receptive_field import compute_receptive_field

        rf, _ = compute_receptive_field(
            [{"name": "masked_bilstm", "config": {"units": 8}}]
        )
        assert math.isinf(rf)

    def test_summary_string(self):
        from jaeger_tpu.utils.receptive_field import receptive_field_summary

        s = receptive_field_summary(
            [{"name": "masked_conv1d", "config": {"kernel_size": 7}}],
            crop_size=500,
        )
        assert "Receptive field: 7" in s
        assert "crop size: 500" in s


class TestTaxonomy:
    def _taxdump(self, tmp_path):
        # tiny tree: 1 root; 2 bacteria; 3 e.coli; 4 viruses; 5 phageT4
        (tmp_path / "tax").mkdir()
        (tmp_path / "tax" / "nodes.dmp").write_text(
            "1\t|\t1\t|\tno rank\t|\n"
            "2\t|\t1\t|\tsuperkingdom\t|\n"
            "3\t|\t2\t|\tspecies\t|\n"
            "4\t|\t1\t|\tsuperkingdom\t|\n"
            "5\t|\t4\t|\tspecies\t|\n"
        )
        (tmp_path / "tax" / "names.dmp").write_text(
            "1\t|\troot\t|\t\t|\tscientific name\t|\n"
            "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
            "3\t|\tE.coli\t|\t\t|\tscientific name\t|\n"
            "4\t|\tViruses\t|\t\t|\tscientific name\t|\n"
            "5\t|\tPhageT4\t|\t\t|\tscientific name\t|\n"
        )
        return tmp_path / "tax"

    def test_taxdb_lca(self, tmp_path):
        from jaeger_tpu.commands.taxonomy import TaxDb

        db = TaxDb(self._taxdump(tmp_path))
        assert db.lineage(3) == [1, 2, 3]
        assert db.majority_lca([3, 3, 3]) == 3
        assert db.majority_lca([3, 5]) == 1           # split vote -> root
        assert db.majority_lca([3, 3, 5], fraction=0.6) == 3
        assert "Bacteria" in db.lineage_names(3)
        # reference rank-prefixed lineage string (commands/taxonomy.py:72)
        assert db.ranked_lineage(3) == "s__E.coli;d__Bacteria"
        assert db.ranked_lineage(1) == ""  # root: no ranked nodes

    def test_cosine_index(self, tmp_path):
        from jaeger_tpu.commands.taxonomy import CosineIndex

        rng = np.random.default_rng(0)
        emb = rng.normal(size=(50, 16)).astype(np.float32)
        taxids = np.arange(50)
        idx = CosineIndex(emb, taxids)
        scores, nn = idx.search(emb[:5], k=3)
        # nearest neighbour of each vector is itself
        np.testing.assert_array_equal(nn[:, 0], np.arange(5))
        assert scores[:, 0] == pytest.approx(1.0, abs=1e-5)
        idx.save(tmp_path / "index.npz")
        idx2 = CosineIndex.load(tmp_path / "index.npz")
        assert idx2.embeddings.shape == (50, 16)


def test_onehot_embed_matches_gather():
    """OneHotEmbed == flax nn.Embed exactly (same tree, same values) in
    f32 and bf16 — the MXU-friendly embedding swap must be invisible."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from jaeger_tpu.models import layers as L

    tok = jnp.asarray(np.random.default_rng(0).integers(
        0, 65, size=(3, 6, 20)))
    for dt in (jnp.float32, jnp.bfloat16):
        ref = nn.Embed(65, 24, embedding_init=nn.initializers.orthogonal(),
                       param_dtype=jnp.float32, dtype=dt)
        v = ref.init(jax.random.PRNGKey(7), tok)
        ours = L.OneHotEmbed(65, 24, dtype=dt)
        v2 = ours.init(jax.random.PRNGKey(7), tok)
        assert jax.tree_util.tree_structure(v) == (
            jax.tree_util.tree_structure(v2))
        y_ref = ref.apply(v, tok)
        y_ours = ours.apply(v, tok)  # ref params into ours: same tree
        assert y_ours.dtype == y_ref.dtype
        np.testing.assert_array_equal(np.asarray(y_ours, np.float32),
                                      np.asarray(y_ref, np.float32))


def test_conv_mask_modes():
    """any/majority/strict output-mask semantics of MaskedConv1D
    (reference nnlib/v2/layers.py mask_mode; unit test_mask_mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from jaeger_tpu.models import layers as L

    # 1 example, 1 frame, L=6, first 3 positions valid, k=3 VALID
    # (default padding): window valid-counts are [3, 2, 1, 0]
    x = jnp.ones((1, 1, 6, 2))
    mask = jnp.asarray([[[1, 1, 1, 0, 0, 0]]], bool)
    counts = {}
    for mode in ("any", "majority", "strict"):
        conv = L.MaskedConv1D(filters=2, kernel_size=3, mask_mode=mode)
        v = conv.init(jax.random.PRNGKey(0), x, mask)
        _, m = conv.apply(v, x, mask)
        counts[mode] = int(np.asarray(m).sum())
    assert counts["any"] == 3       # count > 0
    assert counts["majority"] == 2  # count >= 2
    assert counts["strict"] == 1    # count == 3
    with pytest.raises(ValueError, match="mask_mode"):
        conv = L.MaskedConv1D(filters=2, kernel_size=3, mask_mode="typo")
        conv.init(jax.random.PRNGKey(0), x, mask)


def test_resblock_norm_types():
    """ResidualBlock builds and runs under every norm_type; the param
    tree reflects the chosen norm (reference test_resblock_norm_type)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from jaeger_tpu.models import layers as L

    x = jnp.ones((2, 1, 8, 4))
    mask = jnp.ones((2, 1, 8), bool)
    for norm_type, param in (("masked_batchnorm", "gamma"),
                             ("masked_layernorm", "gamma"),
                             ("masked_dyt", "alpha"),
                             ("layernorm", "gamma")):
        blk = L.ResidualBlock(filters=4, kernel_size=3, norm_type=norm_type)
        v = blk.init(jax.random.PRNGKey(0), x, mask)
        norm_params = [k for k in jax.tree_util.tree_leaves_with_path(
            v["params"]) if param in str(k[0])]
        assert norm_params, norm_type
        out = blk.apply(v, x, mask,
                        mutable=["batch_stats"] if "batch" in norm_type
                        else [])
        y = out[0] if isinstance(out, tuple) else out
    with pytest.raises(ValueError, match="norm_type"):
        L._make_norm("nope", "n")


def test_gelu_bf16_approx_within_rounding():
    """'gelu' is erf-exact in f32 and tanh-approximate in bf16, where the
    approximation error stays below bf16 rounding of the exact value
    (documented perf divergence, models/layers.py::_gelu)."""
    import jax
    import jax.numpy as jnp

    from jaeger_tpu.models.layers import get_activation

    g = get_activation("gelu")
    x = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)

    # f32 path: exact erf form
    np.testing.assert_array_equal(np.asarray(g(x)), np.asarray(exact))

    # bf16 path: approximate, with error at the bf16 noise scale
    y = np.asarray(g(x.astype(jnp.bfloat16)).astype(jnp.float32))
    err = np.abs(y - np.asarray(exact))
    # bf16 has ~3 significant decimal digits; on |gelu|<=6 that is ~0.05
    # worst-case absolute; the observed combined (approx + rounding)
    # error must stay within it
    assert err.max() < 0.05


class TestShardedCosineIndex:
    """Row-sharded index search == monolithic search (verdict r2 item 9)."""

    def _index(self, rng, n=205, d=24):
        from jaeger_tpu.commands.taxonomy import CosineIndex

        emb = rng.normal(size=(n, d)).astype(np.float32)
        return CosineIndex(emb, rng.integers(1, 999, size=n))

    @pytest.mark.parametrize("width", [2, 4, 8])
    def test_matches_single_device(self, rng, width):
        import jax
        from jax.sharding import Mesh

        idx = self._index(rng)
        q = rng.normal(size=(17, 24)).astype(np.float32)
        s0, i0 = idx.search(q, k=5)
        mesh = Mesh(np.asarray(jax.devices()[:width]), ("data",))
        s1, i1 = idx.search(q, k=5, mesh=mesh)
        np.testing.assert_allclose(s1, s0, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(i1, i0)

    def test_duplicate_rows_tie_break(self, rng):
        """Tied scores resolve to the lower global row on both paths."""
        import jax
        from jax.sharding import Mesh

        from jaeger_tpu.commands.taxonomy import CosineIndex

        base = rng.normal(size=(12, 8)).astype(np.float32)
        emb = np.concatenate([base, base])  # every row duplicated
        idx = CosineIndex(emb, np.arange(24))
        q = base[:4] + 1e-8
        s0, i0 = idx.search(q, k=6)
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        s1, i1 = idx.search(q, k=6, mesh=mesh)
        np.testing.assert_array_equal(i1, i0)

    def test_k_larger_than_shard(self, rng):
        """k exceeding per-shard rows still returns the global top-k."""
        import jax
        from jax.sharding import Mesh

        idx = self._index(rng, n=30)
        q = rng.normal(size=(3, 24)).astype(np.float32)
        s0, i0 = idx.search(q, k=9)
        mesh = Mesh(np.asarray(jax.devices()), ("data",))  # 3-4 rows/shard
        s1, i1 = idx.search(q, k=9, mesh=mesh)
        np.testing.assert_array_equal(i1, i0)
