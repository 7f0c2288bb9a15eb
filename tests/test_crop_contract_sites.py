"""The 3*codons+5 contract pinned from every call site.

Mirrors the reference's six crop-contract test files (SURVEY §4): train,
predict/inference, optimize-data, reliability generation and the device
encoder must all agree on the codon count for a given config.
"""

import numpy as np

from jaeger_tpu.dataops.convert import (
    encode_translated_batch,
    translated_frame_length,
)
from jaeger_tpu.models.builder import ModelBuilder, _resolve_crop_nt
from jaeger_tpu.ops import encode
from jaeger_tpu.seqops import crop
from jaeger_tpu.seqops.windows import encode_ascii

CODONS = 165
NT = 3 * CODONS + 5  # 500


def test_config_resolution_sites():
    sp = {"crop_size": CODONS}
    assert crop.resolve_crop(sp) == (CODONS, NT)
    assert _resolve_crop_nt(sp) == NT
    # nucleotide-unit config
    assert crop.resolve_crop(
        {"crop_size": NT, "crop_units": "nucleotide"}
    ) == (CODONS, NT)
    # nucleotide input type consumes crop_size as nt directly
    assert _resolve_crop_nt({"crop_size": 500}, "nucleotide") == 500
    # multi-crop lists use the max
    assert _resolve_crop_nt({"crop_sizes": [100, CODONS]}) == NT
    # variable-length configs: crop_size explicitly null + crop_sizes
    # (scripts/create_variable_length_config.py output)
    assert _resolve_crop_nt({"crop_size": None,
                             "crop_sizes": [100, CODONS]}) == NT


def test_encoder_sites_agree(rng):
    """TF-path device encoder and array converter produce the same frame
    count at the contract crop."""
    seq = "".join(rng.choice(list("ATGC"), size=NT))
    bases = encode_ascii(seq)[None]
    lengths = np.array([NT], np.int32)

    dev = np.asarray(encode.encode_frames(bases, lengths, crop_size=NT))
    conv = encode_translated_batch(bases, lengths, NT)
    assert dev.shape == (1, 6, CODONS)
    assert conv.shape == (1, 6, CODONS)
    np.testing.assert_array_equal(dev, conv)
    assert crop.frame_length(NT, NT) == translated_frame_length(NT) == CODONS


def test_model_input_shape_matches_contract():
    cfg = {
        "model": {
            "name": "contract", "seed": 0, "classifier_out_dim": 3,
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 4},
            "string_processor": {"crop_size": CODONS, "seq_onehot": False},
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 4, "kernel_size": 3}},
                ],
                "pooling": "average",
            },
            "classifier": {
                "hidden_layers": [{"name": "dense", "config": {"units": 3}}],
            },
        },
        "training": {},
    }
    b = ModelBuilder(cfg)
    assert b.crop == (CODONS, NT)
    model, variables = b.init()
    # embedding table sees tokens from exactly CODONS frame positions
    inputs = b.example_inputs(1)
    assert inputs["bases"].shape[1] >= NT
    out = model.apply(variables, inputs, train=False)
    assert out["prediction"].shape == (1, 3)


def test_crop_length_warning():
    """predict warns when --fsize disagrees with the trained crop
    (reference commands/predict.py:36-63)."""
    from jaeger_tpu.commands.predict import crop_length_warning

    cfg = {"model": {
        "embedding": {"input_type": "translated"},
        "string_processor": {"crop_size": 60},   # 185 nt
    }}
    assert crop_length_warning(cfg, 185) is None
    too_long = crop_length_warning(cfg, 300)
    assert "98 codon frames" in too_long and "185" in too_long
    too_short = crop_length_warning(cfg, 100)
    assert "zero-masked" in too_short

    nt_cfg = {"model": {
        "embedding": {"input_type": "nucleotide"},
        "string_processor": {"crop_size": 500},
    }}
    assert crop_length_warning(nt_cfg, 500) is None
    assert "500" in crop_length_warning(nt_cfg, 2000)
    # unresolvable config: silent, never raises
    assert crop_length_warning({"model": {}}, 2000) is None
