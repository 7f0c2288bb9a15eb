"""Live parity of the device encoders against the reference's REAL TF
string pipelines (``seqops/encode.py``, ``preprocess/v1/convert.py``),
not the in-repo numpy oracle — removes the "oracle written by the same
author" circularity for the encode contract.

The reference package + TensorFlow import in this image (native deps
like pyfastx do not, but these modules only need TF).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

tf = pytest.importorskip("tensorflow")
ref_encode = pytest.importorskip("jaeger.seqops.encode")
ref_maps = pytest.importorskip("jaeger.seqops.maps")

from jaeger_tpu.seqops import maps  # noqa: E402

BASE_ID = {"A": 0, "T": 1, "G": 2, "C": 3, "N": 4,
           "a": 5, "t": 6, "g": 7, "c": 8}


def _row(seq: str) -> "tf.Tensor":
    # fragment_generator CSV rows carry 10 metadata fields after the seq
    return tf.constant(seq + "," + ",".join(["0"] * 10))


def _bases(seq: str) -> np.ndarray:
    return np.array([[BASE_ID[c] for c in seq]], dtype=np.uint8)


def test_codon_tables_match_reference_exactly():
    """Our derived tables == the reference's 546-line literal tables,
    including the reduced alphabets (PC2/PC5/Murphy-10) and the
    synonymous-ordinal COD table with its TGA->Trp counting quirk."""
    assert list(maps.CODONS) == list(ref_maps.CODONS)
    assert list(maps.AA) == list(ref_maps.AA)
    assert list(maps.AA_ID) == list(ref_maps.AA_ID)
    assert list(maps.COD_ID) == list(ref_maps.COD_ID)
    assert list(maps.CODON_ID) == list(ref_maps.CODON_ID)
    assert list(maps.PC2_ID) == list(ref_maps.PC2_ID)
    assert list(maps.PC5_ID) == list(ref_maps.PC5_ID)
    assert list(maps.MURPHY10_ID) == list(ref_maps.MURPHY10_ID)
    assert list(maps.DICODONS) == list(ref_maps.DICODONS)
    assert list(maps.DICODON_ID) == list(ref_maps.DICODON_ID)


def test_v1_trimer_table_matches_reference():
    """AA_V1 + the encoder's +1 shift == preprocess/v1/maps.TRIMER_INT."""
    ref_v1 = pytest.importorskip("jaeger.preprocess.v1.maps")
    table = dict(zip(ref_v1.TRIMERS, ref_v1.TRIMER_INT))
    assert [table[c] for c in maps.CODONS] == \
        [v + 1 for v in maps.AA_V1_ID]


@pytest.mark.parametrize("crop", [500, 1024, 2048])
@pytest.mark.parametrize("alphabet,codon_num_attr", [
    ("CODON", "CODON_ID"), ("AA", "AA_ID"),
])
def test_translated_tokens_match_live_tf(rng, crop, alphabet,
                                         codon_num_attr):
    import jax.numpy as jnp

    from jaeger_tpu.ops.encode import encode_frames

    seq = "".join(rng.choice(list("ATGCATGCATGCATGCN"), size=crop))
    fn = ref_encode.process_string_inference(
        codons=ref_maps.CODONS, codon_num=getattr(ref_maps, codon_num_attr),
        crop_size=crop, seq_onehot=False, input_type="translated",
    )
    out, *_ = fn(_row(seq))
    ref_tokens = np.asarray(out["translated"]).astype(np.int32)  # (6, K)

    ours = np.asarray(encode_frames(
        jnp.asarray(_bases(seq)), jnp.asarray([crop], np.int32), crop,
        alphabet=alphabet,
    ))[0]
    assert ours.shape == ref_tokens.shape
    np.testing.assert_array_equal(ours, ref_tokens)


@pytest.mark.parametrize("masking", [False, True])
def test_soft_mask_semantics_match_live_tf(rng, masking):
    """Lowercase handling: masked-out (lookup default) when masking=True,
    case-folded when masking=False — reference encode.py:259-262."""
    import jax.numpy as jnp

    from jaeger_tpu.ops.encode import encode_frames

    crop = 500
    seq = "".join(rng.choice(list("ATGCatgcN"), size=crop))
    fn = ref_encode.process_string_inference(
        codons=ref_maps.CODONS, codon_num=ref_maps.CODON_ID,
        crop_size=crop, seq_onehot=False, masking=masking,
        input_type="translated",
    )
    out, *_ = fn(_row(seq))
    ref_tokens = np.asarray(out["translated"]).astype(np.int32)

    ours = np.asarray(encode_frames(
        jnp.asarray(_bases(seq)), jnp.asarray([crop], np.int32), crop,
        masking=masking,
    ))[0]
    np.testing.assert_array_equal(ours, ref_tokens)


def test_short_window_prefix_matches_live_tf(rng):
    """A window shorter than the crop: our fixed-K output's valid prefix
    equals the reference's (shorter) frames; the tail is zero padding."""
    import jax.numpy as jnp

    from jaeger_tpu.ops.encode import encode_frames

    crop, m = 500, 350
    seq = "".join(rng.choice(list("ATGC"), size=m))
    fn = ref_encode.process_string_inference(
        codons=ref_maps.CODONS, codon_num=ref_maps.CODON_ID,
        crop_size=crop, seq_onehot=False, input_type="translated",
    )
    out, *_ = fn(_row(seq))
    ref_tokens = np.asarray(out["translated"]).astype(np.int32)  # (6, P)

    padded = np.full((1, crop), 4, dtype=np.uint8)
    padded[0, :m] = _bases(seq)
    ours = np.asarray(encode_frames(
        jnp.asarray(padded), jnp.asarray([m], np.int32), crop,
    ))[0]
    P = ref_tokens.shape[1]
    np.testing.assert_array_equal(ours[:, :P], ref_tokens)
    assert (ours[:, P:] == 0).all()


def test_nucleotide_onehot_matches_live_tf(rng):
    import jax.numpy as jnp

    from jaeger_tpu.ops.encode import encode_nucleotide

    crop = 300
    seq = "".join(rng.choice(list("ATGCN"), size=crop))
    fn = ref_encode.process_string_inference(
        codons=ref_maps.CODONS, codon_num=ref_maps.CODON_ID,
        crop_size=crop, input_type="nucleotide",
    )
    out, *_ = fn(_row(seq))
    ref_oh = np.asarray(out["nucleotide"])  # (2, L, 4)

    ours = np.asarray(encode_nucleotide(
        jnp.asarray(_bases(seq)), jnp.asarray([crop], np.int32), crop,
    ))[0]
    assert ours.shape == ref_oh.shape
    np.testing.assert_array_equal(ours, ref_oh)


def test_v1_amino_tokens_match_live_tf(rng):
    """Legacy v1 preprocessor (``preprocess/v1/convert.process_string``)
    vs :func:`encode_amino_windows` — the tokens the bundled default
    WRes model consumes."""
    import jax.numpy as jnp

    ref_v1 = pytest.importorskip("jaeger.preprocess.v1.convert")
    from jaeger_tpu.models.legacy import encode_amino_windows

    crop = 2048
    seq = "".join(rng.choice(list("ATGCATGCN"), size=crop))
    out, *_ = ref_v1.process_string(crop_size=crop)(_row(seq))
    ref_tokens = np.stack([
        np.asarray(out[k]).astype(np.int32)
        for k in ("forward_1", "forward_2", "forward_3",
                  "reverse_1", "reverse_2", "reverse_3")
    ])

    ours = np.asarray(encode_amino_windows(
        jnp.asarray(_bases(seq)), jnp.asarray([crop], np.int32), crop,
    ))[0]
    assert ours.shape == ref_tokens.shape
    np.testing.assert_array_equal(ours, ref_tokens)
