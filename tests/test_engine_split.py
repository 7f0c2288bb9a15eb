"""Split-mixed execution: dense program on the clean rows, masked
program on the N/soft-masked rows gathered into a small bucket.

Real metagenomes put at least one masked window in nearly every device
batch, which previously forced the ~23% slower masked program on whole
batches. The split is order-preserving and must be output-equivalent to
the single-program engine on BOTH engine paths (full logits and the
device-reduced statistics path).
"""

import numpy as np
import pytest

from jaeger_tpu.infer.engine import InferenceEngine
from jaeger_tpu.seqops.windows import WindowBatch

from tests.test_dense_path import CONFIG, built  # noqa: F401


def _mixed_windows(rng, crop_nt, n=64, masked_positions=(3, 17, 40)):
    cap = crop_nt + 20
    bases = rng.integers(0, 4, size=(n, cap)).astype(np.uint8)
    lengths = np.full(n, cap, np.int32)
    for j in masked_positions:
        bases[j, rng.integers(0, crop_nt)] = 4  # an N inside the crop
    return bases, lengths


def _window_batch(bases, lengths, contigs):
    n = len(lengths)
    z = np.zeros(n, np.int32)
    return WindowBatch(
        bases=bases, length=lengths, contig=np.asarray(contigs, np.int32),
        start=z, contig_end=np.zeros(n, np.int8),
        ordinal=np.arange(n, dtype=np.int32),
        seqlen=np.full(n, 10_000, np.int32),
        g=z, c=z, a=z, t=z, gc_skew=np.zeros(n, np.float32),
        headers=[f"c{i}" for i in range(int(np.max(contigs)) + 1)],
    )


def test_split_engages_and_matches_full_path(built, rng):  # noqa: F811
    b, model, variables = built
    _, crop_nt = b.crop
    bases, lengths = _mixed_windows(rng, crop_nt, n=64)

    eng = InferenceEngine(model, variables, batch_size=32)
    ref = InferenceEngine(model, variables, batch_size=32,
                          split_mixed=False)
    out = eng.predict_windows(bases, lengths)
    out_ref = ref.predict_windows(bases, lengths)
    # the split really ran: a masked bucket shape (< batch size) compiled
    shapes = [k[0] for k in eng._compiled
              if isinstance(k, tuple) and isinstance(k[0], tuple)]
    assert any(s[0] < 32 for s in shapes), list(eng._compiled)
    for k in out:
        np.testing.assert_allclose(out[k], out_ref[k],
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_split_thresholds(built, rng):  # noqa: F811
    """No split when the batch is all-dense, all-masked, or more than
    bs/8 masked (chip-measured: the plain masked program wins past
    that — experiments/split_bench.py)."""
    b, model, variables = built
    _, crop_nt = b.crop
    eng = InferenceEngine(model, variables, batch_size=32)
    cap = crop_nt + 20
    bases = rng.integers(0, 4, size=(32, cap)).astype(np.uint8)
    lengths = np.full(32, cap, np.int32)

    assert eng._mixed_split(bases, lengths, 32) is None  # all dense

    some = bases.copy()
    some[5, 2] = 4
    got = eng._mixed_split(some, lengths, 32)
    assert got is not None
    midx, bucket = got
    assert list(midx) == [5] and bucket == 2  # bs/16

    many = bases.copy()
    many[:5, 2] = 4                      # > bs/8 masked: no split
    assert eng._mixed_split(many, lengths, 32) is None

    allm = bases.copy()
    allm[:, 2] = 4
    assert eng._mixed_split(allm, lengths, 32) is None  # all masked

    off = InferenceEngine(model, variables, batch_size=32,
                          split_mixed=False)
    assert off._mixed_split(some, lengths, 32) is None


def test_split_reduced_path_matches(built, rng):  # noqa: F811
    """Device-reduced statistics: per-contig stats AND the per-window
    class sequences are identical with and without the split, including
    masked windows at batch boundaries and in the padded tail."""
    b, model, variables = built
    _, crop_nt = b.crop
    n = 50  # not a multiple of batch_size: exercises the padded tail
    bases, lengths = _mixed_windows(
        rng, crop_nt, n=n, masked_positions=(0, 15, 16, 31, 49))
    contigs = np.repeat(np.arange(5), 10)

    batch = _window_batch(bases, lengths, contigs)
    eng = InferenceEngine(model, variables, batch_size=16)
    ref = InferenceEngine(model, variables, batch_size=16,
                          split_mixed=False)
    stats, _ = eng.predict_batches_reduced([batch], num_classes=3)
    stats_ref, _ = ref.predict_batches_reduced([batch], num_classes=3)

    assert stats.keys() == stats_ref.keys()
    for g in stats:
        a, r = stats[g], stats_ref[g]
        assert a["n_windows"] == r["n_windows"]
        # per-window class sequence in stream order — exact
        np.testing.assert_array_equal(a["frag_pred"], r["frag_pred"])
        for key in a:
            if key == "frag_pred":
                continue
            np.testing.assert_allclose(
                np.asarray(a[key], np.float64),
                np.asarray(r[key], np.float64),
                rtol=2e-3, atol=1e-4,  # f16-cast stats; the split only
                err_msg=f"{g}/{key}")  # regroups the f32 summation


def test_split_full_path_order_preserved(built, rng):  # noqa: F811
    """Masked rows' outputs land at their original positions: perturbing
    a masked window changes ONLY its own row."""
    b, model, variables = built
    _, crop_nt = b.crop
    bases, lengths = _mixed_windows(rng, crop_nt, n=16,
                                    masked_positions=(7,))
    eng = InferenceEngine(model, variables, batch_size=16)
    out1 = eng.predict_windows(bases, lengths)

    bases2 = bases.copy()
    row = bases2[7].copy()
    row[row < 4] = (row[row < 4] + 1) % 4  # rewrite the masked window
    bases2[7] = row
    out2 = eng.predict_windows(bases2, lengths)
    p1, p2 = out1["prediction"], out2["prediction"]
    keep = np.arange(16) != 7
    np.testing.assert_allclose(p1[keep], p2[keep], rtol=1e-6, atol=1e-6)
    assert np.abs(p1[7] - p2[7]).max() > 1e-4
