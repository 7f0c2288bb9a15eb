"""Legacy (v1) model family.

Parity target: reference ``nnlib/v1/layers.py`` — the deprecated
``default``/``experimental_*`` models used by ``predict_legacy`` and
``health``: six amino-acid token streams through a shared-weight dilated
convolution tower ("RC-CNN": one kernel serves all six reading frames),
Add-merged, globally max-pooled into dense heads. Outputs
``{"output", "embedding"}`` like ``WRes_model_embeddings``
(``v1/layers.py:399-424``).

Tokens come from the on-device encoder with ``alphabet="AA"`` (21 amino
classes + stop, +1 shift -> vocab 22, matching the reference's
``Embedding(22, 4, mask_zero=True)``; token table verified identical to
the v1 preprocessor's TRIMER_INT). Trained reference weights load via
:mod:`jaeger_tpu.models.legacy_convert` — both the bundled test
SavedModel and the production ``WRes_1024.h5`` default model.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from jaeger_tpu.models import layers as L
from jaeger_tpu.models.layers import get_activation


class _SharedConvTower(nn.Module):
    """Dilated conv tower applied with shared weights to each of the six
    frame streams, then Add-merged (reference ``v1/layers.py:154-208``)."""

    num_res_blocks: int = 5
    add_residual: bool = True
    filters: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, streams: list[jnp.ndarray], train: bool = False):
        # streams: list of (B, L, C)
        def conv(name, k, dilation):
            return nn.Conv(
                self.filters, (k,), kernel_dilation=(dilation,),
                padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )

        def bn(name):
            # Keras BatchNormalization defaults (epsilon 1e-3) so converted
            # reference checkpoints reproduce inference outputs
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=jnp.float32, param_dtype=jnp.float32, name=name,
            )

        gelu = get_activation("gelu")

        c1 = conv("block1_0", 9, 1)
        b1 = bn("bn1_0")
        c2 = conv("block1_1", 5, 2)
        b2 = bn("bn1_1")
        res_convs = [
            (conv(f"block2_{n}_a", 5, 3 + n), conv(f"block2_{n}_b", 5, 3 + n),
             bn(f"bn2_{n}_a"), bn(f"bn2_{n}_b"))
            for n in range(self.num_res_blocks)
        ]

        outs = []
        for x in streams:
            h = b1(gelu(c1(x)))
            h = nn.max_pool(h, (2,), strides=(2,))
            h = b2(gelu(c2(h)))
            h = nn.max_pool(h, (2,), strides=(2,))
            for ca, cb, ba, bb in res_convs:
                r = ba(gelu(ca(h)))
                r = bb(gelu(cb(r)))
                # rc_resnet_block ends with a gelu — on the residual sum
                # when add_residual, else on the block output
                # (reference v1/layers.py:141-147)
                h = gelu(h + r) if self.add_residual else gelu(r)
            outs.append(h)
        return sum(outs)


class WResModel(nn.Module):
    """Legacy 4-class amino model with embedding side output.

    Parity: ``WRes_model_embeddings`` (reference ``v1/layers.py:399-424``).
    Input: (B, 6, L) amino tokens (0 = pad).
    """

    num_classes: int = 4
    dropout_active: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        tokens = inputs["translated"] if isinstance(inputs, dict) else inputs
        emb = L.OneHotEmbed(22, 4, dtype=self.dtype,
                            name="aa")(tokens)          # (B, 6, L, 4)
        streams = [emb[:, i] for i in range(emb.shape[1])]
        x = _SharedConvTower(
            num_res_blocks=5, add_residual=False, dtype=self.dtype,
            name="tower",
        )(streams, train)
        x = jnp.max(x, axis=1)                     # GlobalMaxPool1D
        drop = self.dropout_active and train
        x = nn.Dropout(0.5, deterministic=not drop)(x)
        x = get_activation("gelu")(
            nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                     name="augdense-1")(x)
        )
        x = nn.Dropout(0.5, deterministic=not drop)(x)
        gmp = get_activation("gelu")(
            nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                     name="augdense-2")(x)
        )
        out = nn.Dense(self.num_classes, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="outdense")(gmp)
        return {"output": out, "prediction": out, "embedding": gmp}


class LSTMModel(nn.Module):
    """Legacy conv-tower + BiLSTM classifier (reference ``v1/layers.py:427-450``)."""

    num_classes: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from jaeger_tpu.models.layers import MaskedBiLSTM

        tokens = inputs["translated"] if isinstance(inputs, dict) else inputs
        emb = L.OneHotEmbed(22, 4, dtype=self.dtype,
                            name="aa")(tokens)
        streams = [emb[:, i] for i in range(emb.shape[1])]
        x = _SharedConvTower(num_res_blocks=5, add_residual=True,
                             dtype=self.dtype, name="tower")(streams, train)
        seq, _ = MaskedBiLSTM(
            units=128, return_sequences=False, ignore_mask=True,
            dtype=self.dtype, name="bidirlstm",
        )(x[:, None], None, train)
        x = seq[:, 0]
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = get_activation("gelu")(
            nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                     name="augdense-1")(x)
        )
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = get_activation("gelu")(
            nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                     name="augdense-2")(x)
        )
        out = nn.Dense(self.num_classes, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="outdense")(x)
        return {"output": out, "prediction": out}


class Vitra(nn.Module):
    """Legacy ViT-style classifier: conv-tower patches -> transformer
    encoder -> global pool -> MLP head.

    Parity: reference ``v1/layers.py:450-520`` — PatchEncoder is a Dense
    projection + learned positional embedding over the tower output;
    pre-norm-free blocks (LN -> MHA -> add -> LN -> MLP -> add).
    """

    num_classes: int = 4
    transformer_layers: int = 4
    num_heads: int = 4
    projection_dim: int = 128
    att_hidden: tuple = (128, 128)
    mlp_hidden: tuple = (128, 128)
    att_dropout: float = 0.1
    mlp_dropout: float = 0.1
    global_type: str = "max"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        tokens = inputs["translated"] if isinstance(inputs, dict) else inputs
        emb = L.OneHotEmbed(22, 4, dtype=self.dtype,
                            name="aa")(tokens)
        streams = [emb[:, i] for i in range(emb.shape[1])]
        patches = _SharedConvTower(num_res_blocks=5, add_residual=True,
                                   dtype=self.dtype, name="tower")(
            streams, train)                        # (B, P, 128)
        n_patches = patches.shape[1]
        x = nn.Dense(self.projection_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="patch_proj")(patches)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(0.02),
            (n_patches, self.projection_dim), jnp.float32,
        )
        x = x + pos.astype(x.dtype)

        def mlp_block(h, units, rate, name):
            for i, u in enumerate(units):
                h = nn.Dense(u, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{name}_dense_{i}")(h)
                h = get_activation("gelu")(h)
                h = nn.Dropout(rate, deterministic=not train)(h)
            return h

        for layer in range(self.transformer_layers):
            h1 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                              name=f"ln1_{layer}")(x)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.projection_dim * self.num_heads,
                out_features=self.projection_dim,
                dropout_rate=self.att_dropout, deterministic=not train,
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"mha_{layer}",
            )(h1, h1)
            x2 = attn + x
            h3 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                              name=f"ln2_{layer}")(x2)
            h3 = mlp_block(h3, self.att_hidden, self.mlp_dropout,
                           f"attmlp_{layer}")
            x = h3 + x2

        rep = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                           name="final_ln")(x)
        if self.global_type == "average":
            rep = jnp.mean(rep, axis=1)
        else:
            rep = jnp.max(rep, axis=1)
        rep = nn.Dropout(0.1, deterministic=not train)(rep)
        feats = mlp_block(rep, self.mlp_hidden, 0.5, "head")
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="out")(feats)
        return {"output": logits, "prediction": logits}


class ExperimentalModel(nn.Module):
    """Legacy v2 ``experimental_*`` classifier.

    Parity target: reference ``create_jaeger_model``
    (``nnlib/v1/layers.py:735-785``) over ``ConvolutionalTower_g2``
    (``:686-733``) — per-frame shared-weight dilated conv tower on
    Murphy-10 one-hot codons, SumReduce over the six frames, global
    average pool, two 32-d dense+BN stages, linear head. Outputs
    ``{"output", "embedding"}`` where the embedding is the final 32-d
    BN'd feature (``:785``).

    Upstream note (documented divergence): the reference model cannot
    build under its own pinned Keras 3 — ``Conv1D`` there rejects the
    rank-4 ``(B, 6, L, 11)`` input the code was written against (TF2's
    ``tf.nn.convolution`` treated the frame axis as a batch dim). This
    module implements those TF2-era semantics; conversion and logits are
    pinned by ``tests/test_legacy_v2.py`` against a rank-3 Keras
    restatement with identical layer names.

    Input: ``{"translated": (B, 6, L, 11) one-hot}`` or ``(B, 6, L)``
    int class IDs from :func:`encode_murphy_windows`.
    """

    num_classes: int = 4
    num_res_blocks: int = 10
    add_residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs["translated"] if isinstance(inputs, dict) else inputs
        if x.ndim == 3:  # int class IDs -> one-hot depth 11
            import jax

            x = jax.nn.one_hot(x, 11, dtype=self.dtype)
        B, F = x.shape[0], x.shape[1]
        h = x.reshape(B * F, x.shape[2], x.shape[3]).astype(self.dtype)

        def conv(name, features, k, dilation=1):
            return nn.Conv(
                features, (k,), kernel_dilation=(dilation,), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        def bn(name):
            # Keras BatchNormalization defaults (epsilon 1e-3)
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=jnp.float32, param_dtype=jnp.float32, name=name,
            )

        def leaky(v):
            return nn.leaky_relu(v, negative_slope=0.1)

        # ConvolutionalTower_g2: entry conv k9 -> maxpool/2 -> BN -> leaky,
        # conv k3 d2 -> BN -> leaky, then residual 256-filter d3 blocks.
        h = conv("conv1", 128, 9)(h)
        h = nn.max_pool(h, (2,), strides=(2,), padding="VALID")
        h = leaky(bn("block1_1")(h))
        h = conv("conv2", 128, 3, dilation=2)(h)
        h = leaky(bn("block1_2")(h))
        for i in range(self.num_res_blocks):
            # resnet_block_g2 (v1/layers.py:612-683): conv names skip _2
            # because the reference enumerates from the kernel list tail.
            # The skip projection is applied between the two main convs
            # so the flax parameter-creation order matches the Keras
            # functional graph's topological layer order (the skip path
            # is shallower) — the conversion matcher's creation-ordinal
            # tiebreak for the identically-shaped norms relies on it.
            xx = nn.relu(bn(f"block2_{i}_1_norm")(
                conv(f"block2_{i}_1", 256, 3, dilation=3)(h)))
            skip = h
            if self.add_residual and h.shape[-1] != 256:
                skip = leaky(bn(f"block2_{i}_skip_norm")(
                    conv(f"block2_{i}_skip", 256, 1)(h)))
            xx = leaky(bn(f"block2_{i}_3_norm")(
                conv(f"block2_{i}_3", 256, 3, dilation=3)(xx)))
            h = skip + xx if self.add_residual else xx

        # SumReduce over the frame axis -> BN -> global average pool
        h = h.reshape(B, F, h.shape[1], h.shape[2]).sum(axis=1)
        h = bn("sum_reduce_norm")(h)
        h = jnp.mean(h, axis=1)

        def dense(name, units):
            return nn.Dense(units, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)

        h = bn("dense1")(nn.relu(dense("augdense-1", 32)(h)))
        x1 = bn("dense2")(nn.relu(dense("augdense-2", 32)(h)))
        out = nn.Dense(self.num_classes, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="outdense")(x1)
        return {"output": out, "prediction": out, "embedding": x1}


def encode_amino_windows(bases, lengths, crop_size: int):
    """(B, >=crop) base IDs -> (B, 6, K) amino tokens for legacy models.

    ``AA_V1`` is the v1 preprocessor's numbering (``preprocess/v1/maps.py``
    TRIMER_INT == these tokens; pinned live in
    ``tests/test_encode_live_parity.py``) — distinct from the modern
    ``AA`` alphabet, which sends stops to 0.

    ``masking=True`` because the v1 lookup tables are case-sensitive
    with ``default_value=0`` (``preprocess/v1/convert.py:21,37,53``):
    any codon touching a soft-masked (lowercase) or ambiguous base maps
    to token 0 in the reference — pinned live end-to-end in
    ``tests/test_legacy_e2e_live.py``.
    """
    from jaeger_tpu.ops.encode import encode_frames

    return encode_frames(bases, lengths, crop_size=crop_size,
                         masking=True, alphabet="AA_V1")


def encode_murphy_windows(bases, lengths, crop_size: int):
    """(B, >=crop) base IDs -> (B, 6, K) legacy-v2 Murphy-10 class IDs.

    Parity: reference ``preprocess/v2/convert.py::process_string`` — the
    tables there default unknown codons to class 0 (shared with stops)
    and keep soft-masked lowercase out of the uppercase-keyed lookup, so
    lowercase trigrams also land on 0; ``masking=True`` reproduces both.
    Window padding beyond the sequence behaves like N bases (class 0),
    identical to a reference run on N-padded input.
    """
    from jaeger_tpu.ops.encode import encode_frames

    t = encode_frames(bases, lengths, crop_size=crop_size,
                      masking=True, alphabet="MURPHY10_V2")
    return jnp.maximum(t - 1, 0)
