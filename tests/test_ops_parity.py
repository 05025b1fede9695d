"""Numerics parity of the core ops vs PyTorch (CPU) references.

The reference framework's published checkpoints are torch state_dicts built
from nn.TransformerEncoder / nn.Conv1d / nn.GroupNorm; these tests construct
the same torch modules locally, convert their weights with api/convert.py,
and require near-bit-identical outputs from our JAX modules — the foundation
for HF wavjepa-base embedding parity (SURVEY.md §4 'numerics parity').
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from wavjepa_tpu.ops.conv_frontend import (
    ConvFeatureExtractor,
    ConvChannelFeatureExtractor,
    WAVJEPA_CONV_SPEC,
    WAV2VEC2_CONV_SPEC,
    conv_output_length,
    conv_receptive_fields,
    conv_total_stride,
)
from wavjepa_tpu.ops.transformer import TransformerEncoder
from wavjepa_tpu.ops import pos_embed as pe
from wavjepa_tpu.api import convert

torch.manual_seed(0)


def make_torch_conv_stack(spec, in_channels=1, mode="default", conv_bias=False):
    """Reference-style conv stack (audio_feature_extractor.py:54-121)."""
    layers = []
    in_d = in_channels
    for i, (dim, k, stride) in enumerate(spec):
        conv = nn.Conv1d(in_d, dim, k, stride=stride, bias=conv_bias)
        nn.init.kaiming_normal_(conv.weight)
        mods = [conv, nn.Dropout(0.0)]
        if mode == "default" and i == 0:
            mods.append(nn.GroupNorm(dim, dim, affine=True))
        elif mode == "layer_norm":
            class ChanLN(nn.Module):
                def __init__(self, d):
                    super().__init__()
                    # emulate Sequential(Rearrange, LayerNorm, Rearrange) names
                    self.add_module("1", nn.LayerNorm(d, elementwise_affine=True))

                def forward(self, x):
                    return getattr(self, "1")(x.transpose(1, 2)).transpose(1, 2)

            mods.append(ChanLN(dim))
        mods.append(nn.GELU())
        layers.append(nn.Sequential(*mods))
        in_d = dim
    return nn.Sequential(*layers)


class TestConvFrontend:
    def test_shape_contract(self):
        # 2.01 s @ 16 kHz → exactly 200 patches; 10 s → 999 (SURVEY.md §2.1)
        assert conv_output_length(32160, WAVJEPA_CONV_SPEC) == 200
        assert conv_output_length(160000, WAVJEPA_CONV_SPEC) == 999
        assert conv_total_stride(WAVJEPA_CONV_SPEC) == 160
        assert conv_receptive_fields(WAVJEPA_CONV_SPEC)[0] == 240
        # wav2vec2 variant: 4.02 s → 200 patches at stride 320
        assert conv_output_length(int(4.02 * 16000), WAV2VEC2_CONV_SPEC) == 200
        assert conv_total_stride(WAV2VEC2_CONV_SPEC) == 320

    @pytest.mark.parametrize("mode", ["default", "layer_norm"])
    def test_torch_parity(self, mode):
        spec = [(32, 10, 5), (32, 3, 2), (32, 2, 2)]
        tmodel = make_torch_conv_stack(spec, mode=mode).eval()
        state = {f"cnn.{k}": v for k, v in tmodel.state_dict().items()}

        jmodel = ConvFeatureExtractor(conv_spec=tuple(spec), in_channels=1, mode=mode)
        params = {
            "params": convert.convert_conv_frontend(state, "cnn", len(spec), mode)
        }
        x = np.random.default_rng(0).normal(size=(2, 1, 400)).astype(np.float32)
        with torch.no_grad():
            ty = tmodel(torch.from_numpy(x)).transpose(1, 2).numpy()
        jy = np.asarray(jmodel.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(jy, ty, atol=2e-5, rtol=1e-4)

    def test_channel_extractor_parity(self):
        """Per-channel CNNs, stacked then flattened channel-major — matches
        reference audio_channel_feature_extractor.py:154-179."""
        spec = [(16, 10, 5), (16, 3, 2)]
        t0 = make_torch_conv_stack(spec, in_channels=1).eval()
        t1 = make_torch_conv_stack(spec, in_channels=1).eval()
        state = {f"cnns.0.{k}": v for k, v in t0.state_dict().items()}
        state.update({f"cnns.1.{k}": v for k, v in t1.state_dict().items()})

        jmodel = ConvChannelFeatureExtractor(
            conv_spec=tuple(spec), in_channels=2, mode="default"
        )
        params = {
            "params": convert.convert_channel_conv_frontend(
                state, "cnns", len(spec), in_channels=2
            )
        }
        x = np.random.default_rng(1).normal(size=(2, 2, 300)).astype(np.float32)
        with torch.no_grad():
            y0 = t0(torch.from_numpy(x[:, :1])).transpose(1, 2)
            y1 = t1(torch.from_numpy(x[:, 1:])).transpose(1, 2)
            ty = torch.flatten(torch.stack([y0, y1], dim=1), 1, 2).numpy()
        jy = np.asarray(jmodel.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(jy, ty, atol=2e-5, rtol=1e-4)
        assert jmodel.total_patches(300) == jy.shape[1]


class TestTransformer:
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_torch_parity(self, use_mask):
        d, h, ff, nl, t, b = 64, 4, 256, 3, 24, 2
        layer = nn.TransformerEncoderLayer(
            d_model=d, nhead=h, dim_feedforward=ff, dropout=0.0,
            activation=nn.GELU(), batch_first=True, norm_first=False,
            layer_norm_eps=1e-6,
        )
        tmodel = nn.TransformerEncoder(
            layer, num_layers=nl, norm=nn.LayerNorm(d, eps=1e-6),
            enable_nested_tensor=False,
        ).eval()
        state = {f"enc.{k}": v for k, v in tmodel.state_dict().items()}

        jmodel = TransformerEncoder(num_layers=nl, embed_dim=d, num_heads=h, mlp_dim=ff)
        params = {"params": convert.convert_transformer_encoder(state, "enc", nl)}

        rng = np.random.default_rng(2)
        x = rng.normal(size=(b, t, d)).astype(np.float32)
        mask = None
        if use_mask:
            mask = rng.random((b, t)) < 0.4
            mask[:, 0] = False  # never fully masked
        with torch.no_grad():
            ty = tmodel(
                torch.from_numpy(x),
                src_key_padding_mask=torch.from_numpy(mask) if use_mask else None,
            ).numpy()
        jy = np.asarray(
            jmodel.apply(
                params, jnp.asarray(x),
                key_padding_mask=jnp.asarray(mask) if use_mask else None,
            )
        )
        if use_mask:
            # masked query rows differ (torch NaN-propagates through softmax of
            # -inf only when a query is masked as key... both sides produce
            # outputs; compare only rows that are used downstream = all rows
            # here since key-padding affects keys, not queries)
            pass
        np.testing.assert_allclose(jy, ty, atol=3e-5, rtol=1e-4)

    def test_layer_outputs_match_final(self):
        d, h, ff, nl = 32, 4, 64, 2
        jmodel = TransformerEncoder(num_layers=nl, embed_dim=d, num_heads=h, mlp_dim=ff)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, d)), jnp.float32)
        params = jmodel.init(jax.random.PRNGKey(0), x)
        outs = jmodel.apply(params, x, method=jmodel.layer_outputs)
        assert len(outs) == nl
        final = jmodel.apply(params, x)
        # final = norm(last layer output)
        assert not np.allclose(np.asarray(outs[-1]), np.asarray(final))


class TestPosEmbed:
    def test_1d_matches_reference_formula(self):
        emb = pe.get_1d_sincos_pos_embed(8, 5)
        omega = 1.0 / 10000 ** (np.arange(4) / 4.0)
        out = np.outer(np.arange(5), omega)
        expected = np.concatenate([np.sin(out), np.cos(out)], axis=1)
        np.testing.assert_allclose(emb, expected)

    def test_binaural_shape_and_structure(self):
        emb = pe.get_binaural_pos_embed(16, time_steps=10)
        assert emb.shape == (20, 16)
        # time halves identical across channels
        np.testing.assert_allclose(emb[:10, :8], emb[10:, :8])
        # left channel code is zeros
        np.testing.assert_allclose(emb[:10, 8:], 0.0)


def test_conv1d_as_matmul_matches_lax_conv():
    """The alternative MXU-matmul conv formulation is numerically identical
    to lax.conv_general_dilated across layer shapes."""
    import jax
    import jax.numpy as jnp

    from wavjepa_tpu.ops.conv_frontend import conv1d_as_matmul

    rng = np.random.default_rng(0)
    for (c_in, k, s, t) in [(1, 10, 5, 517), (32, 3, 2, 101), (32, 2, 2, 64)]:
        x = jnp.asarray(rng.standard_normal((2, c_in, t)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((24, c_in, k)) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (s,), "VALID", dimension_numbers=("NCH", "OIH", "NCH")
        )
        got = conv1d_as_matmul(x, w, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fully_masked_row_is_finite_in_bf16():
    """A fully-masked attention row must yield finite (uniform-weight)
    outputs in bf16 training, not NaN: the mask bias must survive the cast
    to bf16 logits (-f32max would round to -inf)."""
    import jax
    import jax.numpy as jnp

    from wavjepa_tpu.ops.transformer import TransformerEncoder

    enc = TransformerEncoder(
        num_layers=1, embed_dim=16, num_heads=2, mlp_dim=32, dtype=jnp.bfloat16
    )
    x = jnp.ones((2, 4, 16), jnp.bfloat16)
    kpm = jnp.asarray([[False, False, True, True],
                       [True, True, True, True]])  # row 1: ALL keys masked
    params = enc.init(jax.random.PRNGKey(0), x, key_padding_mask=kpm)
    out = enc.apply(params, x, key_padding_mask=kpm)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())

    # and the masking still actually masks: outputs must be independent of
    # masked keys' values
    x2 = x.at[:, 2:, :].set(123.0)
    out2 = enc.apply(params, x2, key_padding_mask=kpm)
    import numpy as np
    np.testing.assert_allclose(
        np.asarray(out[0, :2], np.float32), np.asarray(out2[0, :2], np.float32),
        atol=1e-2,
    )
