"""Bounded-mask program exactness (round-5 masked-vs-dense closure).

The engine's bounded program (``JaegerModel(..., mask_layers=cut)``)
drops the mask after the first residual stack. Exact iff the mask is
all-true at the cut, which ``builder.mask_cut_plan`` +
``encode.bounded_mask_rows`` prove per batch from invalid-run lengths
(any-mode convs only shrink runs — every output position is its own
center tap). Pinned here:

- the detector is CONSERVATIVE vs the model's actual mask at the cut
- the bounded program is BITWISE equal to the full masked program on
  qualifying inputs (f32 and bf16, all heads)
- the flagship plan is (5, 24)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jaeger_tpu.models.builder import (JaegerModel, LayerStack, ModelBuilder,
                                       _freeze_layers, mask_cut_plan)
from jaeger_tpu.ops import encode


def _small_config(crop_codons=120, filters=16):
    classes = ["a", "b", "c"]
    layers = []
    layers.append({"name": "masked_conv1d",
                   "config": {"filters": filters, "kernel_size": 7}})
    for _ in range(2):
        layers += [
            {"name": "nmd", "config": {}},
            {"name": "masked_dyt", "config": {}},
            {"name": "activation", "config": {"activation": "gelu"}},
            {"name": "residual_block",
             "config": {"block_size": 2, "filters": filters,
                        "kernel_size": 5, "dilation_rate": 3,
                        "norm_type": "masked_dyt"}},
        ]
    layers += [
        {"name": "nmd", "config": {}},
        {"name": "masked_dyt", "config": {}},
        {"name": "activation", "config": {"activation": "gelu"}},
    ]
    return {
        "model": {
            "name": "bounded_test",
            "seed": 0,
            "classifier_out_dim": 3,
            "reliability_out_dim": 1,
            "class_label_map": [
                {"class": c, "label": i} for i, c in enumerate(classes)
            ],
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 24},
            "string_processor": {"crop_size": crop_codons,
                                 "seq_onehot": False},
            "representation_learner": {"hidden_layers": layers,
                                       "pooling": "max"},
            "reliability_model": {
                "mode": "nmd",
                "merge": {"mode": "concat"},
                "hidden_layers": [
                    {"name": "dense",
                     "config": {"units": 1, "dtype": "float32"}}],
            },
            "classifier": {
                "hidden_layers": [
                    {"name": "dense",
                     "config": {"units": 3, "dtype": "float32"}}],
            },
        },
        "training": {},
    }


def _jitter(variables, seed=7):
    """Randomize params: fresh inits have zero biases/betas, which makes
    masked-position garbage exactly zero and would trivialize the
    bounded-vs-masked comparison."""
    import jax

    leaves, treedef = jax.tree.flatten(variables)
    rng = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            arr = arr + rng.normal(0, 0.05, arr.shape).astype(arr.dtype)
        out.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, out)


@pytest.fixture(scope="module")
def built():
    builder = ModelBuilder(_small_config(), dtype=jnp.float32)
    model, variables = builder.init(batch=1)
    return builder, model, _jitter(variables)


def _fuzz_bases(rng, n, crop_nt, max_run_nt, long_run=False):
    bases = rng.integers(0, 4, (n, crop_nt)).astype(np.uint8)
    lengths = np.full(n, crop_nt, np.int32)
    for i in range(n):
        k = rng.integers(0, 3)
        for _ in range(k):
            r = int(rng.integers(1, max(2, max_run_nt)))
            s = int(rng.integers(0, crop_nt - r))
            bases[i, s:s + r] = 4
        if long_run and i % 2 == 0:
            r = max_run_nt * 3
            s = int(rng.integers(0, crop_nt - r))
            bases[i, s:s + r] = 4
    return bases, lengths


def test_mask_cut_plan_flagship():
    from jaeger_tpu.models.flagship import flagship_config

    cfg = flagship_config()["model"]["representation_learner"]
    plans = mask_cut_plan(cfg)
    assert plans is not None and len(plans) == 2
    # cut A: inside the first residual block after conv1 — interior
    # shrink = entry VALID span-1 (6) + one k5 d3 conv (12); edge =
    # 0 (VALID right-edge) + 6
    (cut_a, ia, ea), (cut_b, ib, eb) = plans
    assert cut_a[1] == "conv1" and (ia, ea) == (18, 6)
    # cut B: after the whole first stack (2 blocks x 2 convs)
    assert (ib, eb) == (6 + 4 * 12, 4 * 6)
    layers = _freeze_layers(cfg["hidden_layers"])
    assert layers[cut_b - 1][0] == "residual_block"
    assert cut_a[0] == cut_b - 1


def test_small_config_plan(built):
    builder, model, variables = built
    plans = mask_cut_plan(
        _small_config()["model"]["representation_learner"])
    assert plans == [((4, "conv1"), 18, 6), (5, 54, 24)]


def test_detector_conservative_vs_model_mask(built):
    """Rows the detector passes really have an all-true mask at the cut
    (checked against the model's own mask chain, not the paper bound)."""
    builder, model, variables = built
    cfg = _small_config()["model"]
    rep = cfg["representation_learner"]
    cut, _, max_run = mask_cut_plan(rep)[1]  # cut B, single 24 bound
    crop_nt = model.crop_nt

    sub = LayerStack(
        layer_configs=_freeze_layers(rep["hidden_layers"])[:cut],
        pooling=None)
    rng = np.random.default_rng(0)
    # spread run lengths across the qualifying threshold (24 codons =
    # 72 nt) and beyond so both predicate outcomes occur
    bases, lengths = _fuzz_bases(rng, 24, crop_nt, max_run_nt=100)
    ok = encode.bounded_mask_rows(bases, lengths, crop_nt, True, max_run)
    assert ok.any() and not ok.all()  # both outcomes exercised

    tokens = encode.encode_frames(
        jnp.asarray(bases), jnp.asarray(lengths), crop_size=crop_nt,
        masking=True)
    mask = tokens != 0
    x = jnp.ones(tokens.shape + (16,), jnp.float32)
    import jax

    sub_vars = sub.init(jax.random.PRNGKey(0), x, mask)
    _, mask_at_cut, _ = sub.apply(sub_vars, x, mask, False)
    got = np.asarray(jnp.all(mask_at_cut, axis=(1, 2)))
    # conservative: detector-passing rows must be all-true at the cut
    assert (got[ok]).all()


def test_detector_short_window_tails(built):
    """Padded short-window tails are right-edge runs; tails within the
    bound qualify, long tails don't."""
    builder, model, variables = built
    crop_nt = model.crop_nt
    rng = np.random.default_rng(1)
    bases = rng.integers(0, 4, (4, crop_nt)).astype(np.uint8)
    # ~15 codons of tail (45 nt) qualifies; half-window tail doesn't
    lengths = np.array([crop_nt, crop_nt - 45, crop_nt // 2, crop_nt],
                       np.int32)
    for i, ln in enumerate(lengths):
        bases[i, ln:] = 4
    ok = encode.bounded_mask_rows(bases, lengths, crop_nt, True, 24)
    assert ok.tolist() == [True, True, False, True]


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_bounded_program_bitwise(dtype):
    """model.apply(mask_layers=cut) == full masked apply, bitwise, on
    qualifying inputs — every head."""
    dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    builder = ModelBuilder(_small_config(), dtype=dt)
    model, variables = builder.init(batch=1)
    variables = _jitter(variables)
    rep = _small_config()["model"]["representation_learner"]
    cut, _, max_run = mask_cut_plan(rep)[1]  # cut B, single 24 bound
    crop_nt = model.crop_nt

    rng = np.random.default_rng(2)
    bases, lengths = _fuzz_bases(rng, 8, crop_nt, max_run_nt=60)
    # short windows too (tail runs within bound)
    lengths[1] = crop_nt - 30
    bases[1, lengths[1]:] = 4
    ok = encode.bounded_mask_rows(bases, lengths, crop_nt, True, max_run)
    assert ok.all(), "fuzz inputs must qualify for this test"

    inp = {"bases": jnp.asarray(bases), "lengths": jnp.asarray(lengths)}
    full = model.apply(variables, inp, train=False)
    bounded = model.apply(variables, inp, train=False, mask_layers=cut)
    assert set(full) == set(bounded)
    for k in full:
        a, b = np.asarray(full[k]), np.asarray(bounded[k])
        assert a.dtype == b.dtype and np.array_equal(a, b), k


def test_bounded_program_differs_on_long_runs():
    """Sanity: on NON-qualifying inputs the bounded program is NOT the
    masked program (so the bitwise test above can actually fail)."""
    builder = ModelBuilder(_small_config(), dtype=jnp.float32)
    model, variables = builder.init(batch=1)
    variables = _jitter(variables)
    cut, _ib, max_run = mask_cut_plan(
        _small_config()["model"]["representation_learner"])[1]
    crop_nt = model.crop_nt
    rng = np.random.default_rng(3)
    bases = rng.integers(0, 4, (2, crop_nt)).astype(np.uint8)
    bases[:, 40:40 + 60 * 3] = 4  # 60-codon run >> bound
    lengths = np.full(2, crop_nt, np.int32)
    ok = encode.bounded_mask_rows(bases, lengths, crop_nt, True, max_run)
    assert not ok.any()
    inp = {"bases": jnp.asarray(bases), "lengths": jnp.asarray(lengths)}
    full = model.apply(variables, inp, train=False)
    bounded = model.apply(variables, inp, train=False, mask_layers=cut)
    assert not np.allclose(np.asarray(full["prediction"]),
                           np.asarray(bounded["prediction"]))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_cut_a_program_bitwise(dtype):
    """Cut A (inside the first residual block, after conv1) is bitwise
    the full masked program on interior runs within its (18, 6) bound."""
    dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    builder = ModelBuilder(_small_config(), dtype=dt)
    model, variables = builder.init(batch=1)
    variables = _jitter(variables)
    plans = mask_cut_plan(_small_config()["model"]["representation_learner"])
    cut_a, i_a, e_a = plans[0]
    crop_nt = model.crop_nt

    rng = np.random.default_rng(4)
    bases = rng.integers(0, 4, (6, crop_nt)).astype(np.uint8)
    lengths = np.full(6, crop_nt, np.int32)
    for i in range(6):
        # interior runs up to 48 nt (16-17 codons <= 18), away from edges
        r = int(rng.integers(3, 49))
        s = int(rng.integers(60, crop_nt - 60 - r))
        bases[i, s:s + r] = 4
    levels = encode.bounded_mask_levels(
        bases, lengths, crop_nt, True, plans)
    assert (levels == 0).all(), levels

    inp = {"bases": jnp.asarray(bases), "lengths": jnp.asarray(lengths)}
    full = model.apply(variables, inp, train=False)
    bounded = model.apply(variables, inp, train=False, mask_layers=cut_a)
    for k in full:
        a, b = np.asarray(full[k]), np.asarray(bounded[k])
        assert a.dtype == b.dtype and np.array_equal(a, b), k


def test_levels_classify_interior_vs_edge():
    """Interior runs use the interior bound; edge-touching runs (incl.
    short-window tails) the edge bound; earliest qualifying cut wins."""
    plans = mask_cut_plan(_small_config()["model"]["representation_learner"])
    builder = ModelBuilder(_small_config(), dtype=jnp.float32)
    model, _ = builder.init(batch=1)
    crop_nt = model.crop_nt
    rng = np.random.default_rng(5)
    bases = rng.integers(0, 4, (5, crop_nt)).astype(np.uint8)
    lengths = np.full(5, crop_nt, np.int32)
    # 0: clean -> cut A; 1: 45nt interior run (<=18 codons) -> cut A;
    # 2: 100nt interior run (~35 codons <= 54, > 18) -> cut B;
    # 3: 200nt interior run (>54 codons) -> none;
    # 4: 12nt tail (edge <= 6 codons) -> cut A
    bases[1, 100:145] = 4
    bases[2, 100:200] = 4
    bases[3, 60:260] = 4
    lengths[4] = crop_nt - 12
    bases[4, lengths[4]:] = 4
    levels = encode.bounded_mask_levels(bases, lengths, crop_nt, True,
                                        plans)
    assert levels.tolist() == [0, 0, 1, -1, 0]


def test_detector_conservative_cut_a(built):
    """Cut-A-passing rows really have an all-true mask right after the
    first block's conv1 (checked against the model's own mask chain)."""
    builder, model, variables = built
    rep = _small_config()["model"]["representation_learner"]
    plans = mask_cut_plan(rep)
    cut_a = plans[0][0]
    crop_nt = model.crop_nt

    # sub-stack: layers up to and including the entry conv, then the
    # first block's conv1 mask arithmetic == one masked conv (k5 d3)
    import jax

    entry = LayerStack(
        layer_configs=_freeze_layers(rep["hidden_layers"])[:cut_a[0]],
        pooling=None)
    rng = np.random.default_rng(6)
    bases, lengths = _fuzz_bases(rng, 24, crop_nt, max_run_nt=80)
    levels = encode.bounded_mask_levels(bases, lengths, crop_nt, True,
                                        plans)
    ok = levels == 0
    assert ok.any() and not ok.all()

    tokens = encode.encode_frames(
        jnp.asarray(bases), jnp.asarray(lengths), crop_size=crop_nt,
        masking=True)
    mask = tokens != 0
    x = jnp.ones(tokens.shape + (16,), jnp.float32)
    ev = entry.init(jax.random.PRNGKey(0), x, mask)
    _, mask_in, _ = entry.apply(ev, x, mask, False)

    from jaeger_tpu.models.layers import MaskedConv1D

    conv1 = MaskedConv1D(filters=4, kernel_size=5, dilation_rate=3,
                         padding="same")
    x2 = jnp.ones(mask_in.shape + (16,), jnp.float32)
    cv = conv1.init(jax.random.PRNGKey(1), x2, mask_in)
    _, m1 = conv1.apply(cv, x2, mask_in)
    got = np.asarray(jnp.all(m1, axis=(1, 2)))
    assert got[ok].all()


def test_engine_selects_bounded_and_matches_masked():
    """Engine plan: many masked rows with short runs -> bounded base
    program; outputs equal the always-masked reference engine. Rows with
    long runs land in a full-masked bucket over a bounded base; fully
    disqualifying batches keep the plain masked program."""
    from jaeger_tpu.infer.engine import InferenceEngine

    builder = ModelBuilder(_small_config(), dtype=jnp.float32)
    model, variables = builder.init(batch=1)
    variables = _jitter(variables)
    crop_nt = model.crop_nt
    rng = np.random.default_rng(8)

    n = 16
    bases = rng.integers(0, 4, (n, crop_nt)).astype(np.uint8)
    lengths = np.full(n, crop_nt, np.int32)
    # every row masked (one short interior run) -> no dense split
    for i in range(n):
        s = int(rng.integers(60, crop_nt - 100))
        bases[i, s:s + 30] = 4

    eng = InferenceEngine(model, variables, batch_size=16)
    plans = eng._mask_plans()
    assert plans, "flagship-shaped config must yield cut plans"
    dense, split, cut = eng._plan_batch(bases, lengths, n)
    assert dense is False and split is None and cut == plans[0][0]

    out = eng.predict_windows(bases, lengths)
    assert any(k[-1] == plans[0][0] for k in eng._compiled), \
        list(eng._compiled)

    class NeverDense(InferenceEngine):
        def _plan_batch(self, b_, ln_, n_valid_):
            return False, None, None

    ref = NeverDense(model, variables, batch_size=16)
    out_ref = ref.predict_windows(bases, lengths)
    for k in out:
        assert np.array_equal(out[k], out_ref[k]), k

    # one long-run row -> full-masked bucket over the bounded base
    bases2 = bases.copy()
    bases2[3, 30:330] = 4  # 100-codon run: disqualifies every cut
    dense, split, cut = eng._plan_batch(bases2, lengths, n)
    assert dense is False and cut is not None and split is not None
    midx, bucket = split
    assert list(midx) == [3]
    out2 = eng.predict_windows(bases2, lengths)
    out2_ref = ref.predict_windows(bases2, lengths)
    keep = np.arange(n) != 3
    for k in out2:
        # base-program rows are bitwise; the bucket row re-runs the
        # masked program at the bucket shape, whose NMD batch reductions
        # round differently (pre-existing split-path property, same as
        # tests/test_engine_split.py's allclose standard)
        assert np.array_equal(out2[k][keep], out2_ref[k][keep]), k
        np.testing.assert_allclose(out2[k][3], out2_ref[k][3],
                                   rtol=1e-5, atol=1e-6, err_msg=k)

    # most rows long-run -> no bucket fits, no cut qualifies: plain masked
    bases3 = bases.copy()
    for i in range(6):
        bases3[i, 30:330] = 4
    dense, split, cut = eng._plan_batch(bases3, lengths, n)
    assert (dense, split, cut) == (False, None, None)


def test_engine_reduced_bounded_matches_masked():
    """Device-reduced path: bounded base + masked bucket produce the
    same per-contig stats and window classes as the always-masked
    engine."""
    from jaeger_tpu.infer.engine import InferenceEngine
    from jaeger_tpu.seqops.windows import WindowBatch

    builder = ModelBuilder(_small_config(), dtype=jnp.float32)
    model, variables = builder.init(batch=1)
    variables = _jitter(variables)
    crop_nt = model.crop_nt
    rng = np.random.default_rng(9)
    n = 12
    bases = rng.integers(0, 4, (n, crop_nt)).astype(np.uint8)
    lengths = np.full(n, crop_nt, np.int32)
    for i in range(n):
        s = int(rng.integers(60, crop_nt - 100))
        bases[i, s:s + 24] = 4
    bases[5, 30:330] = 4  # bucket row
    contig = np.repeat(np.arange(4), 3).astype(np.int32)

    def mk():
        z = np.zeros(n, np.int32)
        return WindowBatch(
            bases=bases, length=lengths, contig=contig, start=z,
            contig_end=z.astype(np.int8), ordinal=z, seqlen=lengths,
            g=z, c=z, a=z, t=z, gc_skew=np.zeros(n, np.float32),
            headers=[f"c{i}" for i in range(4)])

    eng = InferenceEngine(model, variables, batch_size=12)

    class NeverDense(InferenceEngine):
        def _plan_batch(self, b_, ln_, n_valid_):
            return False, None, None

    ref = NeverDense(model, variables, batch_size=12)
    stats, _ = eng.predict_batches_reduced([mk()], num_classes=3)
    stats_ref, _ = ref.predict_batches_reduced([mk()], num_classes=3)
    assert set(stats) == set(stats_ref)
    for cid in stats:
        for k in stats[cid]:
            np.testing.assert_allclose(
                np.asarray(stats[cid][k]), np.asarray(stats_ref[cid][k]),
                rtol=1e-5, atol=1e-6, err_msg=f"{cid}/{k}")


def test_bench_masked_distribution_qualifies_cut_a():
    """bench.py's masked row claims to measure the engine-selected
    bounded program at tier A; that is only true if EVERY input its
    generator can draw qualifies for tier A. Pins the placement
    contract: a 48-base interior N run starting anywhere in
    [16, crop-64) is classified level 0 by bounded_mask_levels under
    the flagship plan (an edge-touching run would exceed tier A's
    edge bound and route to tier B)."""
    import jax.numpy as jnp
    import numpy as np

    from jaeger_tpu.models.builder import ModelBuilder, mask_cut_plan
    from jaeger_tpu.models.flagship import flagship_config
    from jaeger_tpu.ops.encode import bounded_mask_levels

    cfg = flagship_config()
    plans = mask_cut_plan(cfg["model"]["representation_learner"])
    b = ModelBuilder(cfg, dtype=jnp.bfloat16)
    _, crop_nt = b.crop

    rng = np.random.default_rng(0)
    starts = np.arange(16, crop_nt - 64)  # the generator's full support
    bases = rng.integers(0, 4, size=(starts.size, crop_nt)).astype(np.uint8)
    for i, s in enumerate(starts):
        bases[i, s : s + 48] = 4
    lengths = np.full(starts.size, crop_nt, np.int64)
    levels = bounded_mask_levels(bases, lengths, crop_nt, True, plans)
    assert (levels == 0).all(), np.unique(levels)

    # and the old edge placements really do disqualify tier A (the bug
    # this contract fixes): a run at start 0 must not be level 0
    edge = rng.integers(0, 4, size=(1, crop_nt)).astype(np.uint8)
    edge[0, :48] = 4
    lv = bounded_mask_levels(edge, lengths[:1], crop_nt, True, plans)
    assert lv[0] != 0
