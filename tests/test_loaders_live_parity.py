"""Live parity of the runtime-crop NPZ loader with the reference's
``data/loaders._load_cropped_numpy_dataset`` (tf.data): the exact
multiset of (crop tokens, label) pairs for the deterministic ``all``
crop mode, including ragged records, multi-crop fan-out, pad-to-max and
the one-hot conversion path. pyfastx/pydustmasker are stubbed — the
loader module only imports them transitively.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")
for _name in ("pyfastx", "pydustmasker"):
    sys.modules.setdefault(_name, types.ModuleType(_name))

tf = pytest.importorskip("tensorflow")
ref_loaders = pytest.importorskip("jaeger.data.loaders")

from jaeger_tpu.dataops import convert as our_convert  # noqa: E402
from jaeger_tpu.train import data as our_data  # noqa: E402


@pytest.fixture()
def ragged_npz(tmp_path, rng):
    rows = [
        f"{i % 3}," + "".join(rng.choice(list("ATGC"), size=L))
        for i, L in enumerate((300, 350, 400, 330, 280))
    ]
    csv = tmp_path / "in.csv"
    csv.write_text("\n".join(rows) + "\n")
    npz = tmp_path / "full.npz"
    our_convert.convert_dataset(str(csv), str(npz), format="translated",
                                crop_size=500, num_classes=3, pad=False)
    return npz


def _reference_crops(npz, crop_sizes, strides, seq_onehot=False):
    data = np.load(npz, allow_pickle=True)
    ds = ref_loaders._load_cropped_numpy_dataset(
        data, crop_sizes=crop_sizes, strides=strides,
        input_type="translated", seq_onehot=seq_onehot, codon_depth=65,
        nucleotide_onehot_map=None, num_classes=3, one_hot_labels=True,
        pad_to_max=True, crop_mode="all",
    )
    out = []
    for feats, lab in ds:
        t = np.asarray(feats["translated"])
        out.append((t.tobytes(), t.shape, int(np.argmax(np.asarray(lab)))))
    return out


def _our_crops(npz, crop_sizes, strides, dtype=np.int32):
    out = []
    for batch in our_data.cropped_batches_from_npz(
        npz, batch_size=1, num_classes=3, crop_sizes=crop_sizes,
        strides=strides, crop_mode="all", repeat=False,
    ):
        t = np.asarray(batch["translated"][0]).astype(dtype)
        lab = int(np.argmax(batch["labels"][0]))
        out.append((t.tobytes(), t.shape, lab))
    return out


def test_crop_mode_all_matches_live_reference(ragged_npz):
    """Same multiset of (tokens, label) crops as the reference tf.data
    loader: multi-crop sizes, sliding starts, ragged records, zero
    padding to max crop."""
    crop_sizes, strides = [60, 80], [60, 80]
    ref = _reference_crops(ragged_npz, crop_sizes, strides)
    ours = _our_crops(ragged_npz, crop_sizes, strides)
    assert len(ours) == len(ref)
    assert sorted(s for _, s, _ in ours) == sorted(s for _, s, _ in ref)
    assert sorted(ours) == sorted(ref)


def test_crop_mode_all_onehot_matches_live_reference(ragged_npz):
    """seq_onehot path: the reference one-hots tokens and zeroes masked
    (token 0) rows; ours must produce the identical float crops."""
    crop_sizes, strides = [70], [70]
    data = np.load(ragged_npz, allow_pickle=True)
    ds = ref_loaders._load_cropped_numpy_dataset(
        data, crop_sizes=crop_sizes, strides=strides,
        input_type="translated", seq_onehot=True, codon_depth=65,
        nucleotide_onehot_map=None, num_classes=3, one_hot_labels=True,
        pad_to_max=True, crop_mode="all",
    )
    ref = sorted(
        np.asarray(f["translated"]).tobytes() for f, _ in ds
    )
    ours = []
    for batch in our_data.cropped_batches_from_npz(
        ragged_npz, batch_size=1, num_classes=3, crop_sizes=crop_sizes,
        strides=strides, crop_mode="all", repeat=False,
    ):
        t = np.asarray(batch["translated"][0]).astype(np.int32)
        oh = np.eye(65, dtype=np.float32)[t] * (t > 0)[..., None]
        ours.append(oh.tobytes())
    assert sorted(ours) == ref


def test_crop_mode_sample_count_and_membership(ragged_npz):
    """'sample' draws one variant per record per epoch; every drawn crop
    must be a member of the reference's 'all' fan-out set."""
    crop_sizes, strides = [60, 80], [60, 80]
    all_set = {c for c, _, _ in
               _reference_crops(ragged_npz, crop_sizes, strides)}
    ours = _our_crops(ragged_npz, crop_sizes, strides)
    sampled = []
    for batch in our_data.cropped_batches_from_npz(
        ragged_npz, batch_size=1, num_classes=3, crop_sizes=crop_sizes,
        strides=strides, crop_mode="sample", repeat=False, seed=5,
    ):
        sampled.append(np.asarray(batch["translated"][0])
                       .astype(np.int32).tobytes())
    assert len(sampled) == 5  # one per record
    assert set(sampled) <= all_set
    assert len(ours) > len(sampled)  # 'all' fans out more
