"""Full-model numerics parity: JAX JEPA vs a reference-equivalent torch JEPA.

Builds the same computation the reference performs
(/root/reference/wavjepa/jepa.py:365-467) out of torch primitives at small
scale (dynamic boolean gather/scatter and all), imports the torch weights
through api/convert.convert_jepa_state_dict, and checks that our
static-shape re-design produces the same numbers for:
  * represent()            (inference path used by HEAR / HF endpoints)
  * student predictions    (gather→scatter ≡ where-select equivalence)
  * teacher targets        (top-k layer average with 4-D instance norm)
  * masked loss
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from wavjepa_tpu.api.convert import convert_jepa_state_dict
from wavjepa_tpu.models.jepa import JEPA, JEPAConfig, masked_prediction_loss
from wavjepa_tpu.ops.pos_embed import get_1d_sincos_pos_embed_from_grid

torch.manual_seed(0)

SPEC = [(32, 10, 5), (32, 3, 2), (32, 2, 2)]
D_ENC, D_DEC, HEADS, LAYERS = 64, 32, 4, 3
SR, SECONDS = 1600, 0.201  # target_length 321 → 14 patches
TOPK = 2

CFG = JEPAConfig(
    conv_spec=tuple(tuple(s) for s in SPEC),
    in_channels=1,
    encoder_layers=LAYERS,
    encoder_dim=D_ENC,
    encoder_heads=HEADS,
    decoder_layers=LAYERS,
    decoder_dim=D_DEC,
    decoder_heads=HEADS,
    sample_rate=SR,
    process_seconds=SECONDS,
    average_top_k_layers=TOPK,
)


def make_encoder(d, layers):
    layer = nn.TransformerEncoderLayer(
        d_model=d, nhead=HEADS, dim_feedforward=4 * d, dropout=0.0,
        activation=nn.GELU(), batch_first=True, norm_first=False,
        layer_norm_eps=1e-6,
    )
    return nn.TransformerEncoder(
        layer, num_layers=layers, norm=nn.LayerNorm(d, eps=1e-6),
        enable_nested_tensor=False,
    )


class TorchMiniJEPA(nn.Module):
    """Reference-equivalent computation from torch primitives (no reference
    imports), including the dynamic-shape gather/scatter the TPU build
    replaces."""

    def __init__(self):
        super().__init__()
        from tests.test_ops_parity import make_torch_conv_stack

        class Ext(nn.Module):
            def __init__(self):
                super().__init__()
                self.cnn = make_torch_conv_stack(SPEC)

            def forward(self, x):
                return self.cnn(x).transpose(1, 2)

        self.extract_audio = Ext()
        self.feature_norms = nn.LayerNorm(SPEC[-1][0])
        self.post_extraction_mapper = nn.Linear(SPEC[-1][0], D_ENC)
        self.encoder = make_encoder(D_ENC, LAYERS)
        self.decoder = make_encoder(D_DEC, LAYERS)
        self.encoder_to_decoder_mapper = nn.Linear(D_ENC, D_DEC)
        self.decoder_to_encoder_mapper = nn.Linear(D_DEC, D_ENC)
        self.mask_token = nn.Parameter(torch.randn(1, 1, D_DEC) * 0.02)
        t = CFG.total_patches
        pe = get_1d_sincos_pos_embed_from_grid(D_ENC, np.arange(t))
        pd = get_1d_sincos_pos_embed_from_grid(D_DEC, np.arange(t))
        self.register_buffer("pos_enc", torch.from_numpy(pe).float()[None])
        self.register_buffer("pos_dec", torch.from_numpy(pd).float()[None])

    def features(self, audio):
        x = self.extract_audio(audio)
        x = self.feature_norms(x)
        x = self.post_extraction_mapper(x)
        return x + self.pos_enc

    def represent(self, audio, padding_mask=None):
        return self.encoder(self.features(audio), src_key_padding_mask=padding_mask)

    def student(self, feats, ctx_mask, vis_mask):
        b, t, _ = feats.shape
        n = vis_mask.shape[1]
        enc = self.encoder(feats, src_key_padding_mask=ctx_mask)
        visible = enc[~ctx_mask]  # dynamic gather (reference jepa.py:399)
        visible = self.encoder_to_decoder_mapper(visible)
        tgt = self.mask_token.repeat(b, t, 1)
        tgt[~ctx_mask, :] = visible.reshape(-1, D_DEC)  # dynamic scatter
        tgt = tgt + self.pos_dec
        tgt = tgt[:, None].expand(b, n, t, D_DEC).reshape(b * n, t, D_DEC)
        kpm = vis_mask.reshape(b * n, t)
        out = self.decoder(tgt, src_key_padding_mask=kpm)
        return self.decoder_to_encoder_mapper(out).reshape(b, n, t, D_ENC)

    def teacher(self, feats):
        outs = []
        x = feats
        for i, bl in enumerate(self.encoder.layers):
            x = bl(x)
            if len(self.encoder.layers) - i <= TOPK:
                outs.append(x)
        stacked = torch.stack(outs)  # (k, B, T, D)
        normed = F.instance_norm(stacked.transpose(2, 3)).transpose(2, 3)
        return normed.mean(dim=0)


def build_pair():
    tmodel = TorchMiniJEPA().eval()
    params, teacher = convert_jepa_state_dict(
        tmodel.state_dict(),
        encoder_layers=LAYERS,
        decoder_layers=LAYERS,
        conv_layers=len(SPEC),
    )
    jmodel = JEPA(CFG)
    return tmodel, jmodel, {"params": params}


class TestJEPAParity:
    def setup_method(self):
        self.tmodel, self.jmodel, self.variables = build_pair()
        rng = np.random.default_rng(0)
        self.audio = rng.normal(size=(2, 1, CFG.target_length)).astype(np.float32)
        t = CFG.total_patches
        self.ctx = rng.random((2, t)) < 0.5
        self.ctx[:, :2] = False  # keep some context
        tgt = rng.random((2, 2, t)) < 0.3
        tgt &= self.ctx[:, None, :]  # targets within masked region
        self.tgt = tgt
        self.vis = self.ctx[:, None, :] ^ tgt

    def test_represent_parity(self):
        with torch.no_grad():
            ty = self.tmodel.represent(torch.from_numpy(self.audio)).numpy()
        jy = np.asarray(
            self.jmodel.apply(self.variables, jnp.asarray(self.audio), method="represent")
        )
        np.testing.assert_allclose(jy, ty, atol=5e-5, rtol=1e-3)

    def test_student_parity(self):
        """gather→scatter (torch, dynamic) ≡ where-select (JAX, static)."""
        with torch.no_grad():
            feats_t = self.tmodel.features(torch.from_numpy(self.audio))
            ty = self.tmodel.student(
                feats_t,
                torch.from_numpy(self.ctx),
                torch.from_numpy(self.vis),
            ).numpy()
        feats_j = self.jmodel.apply(
            self.variables, jnp.asarray(self.audio), method="encode_features"
        )
        jy = np.asarray(
            self.jmodel.apply(
                self.variables,
                feats_j,
                jnp.asarray(self.ctx),
                jnp.asarray(self.vis),
                method="student_forward",
            )
        )
        np.testing.assert_allclose(jy, ty, atol=1e-4, rtol=1e-3)

    def test_teacher_parity(self):
        with torch.no_grad():
            feats_t = self.tmodel.features(torch.from_numpy(self.audio))
            ty = self.tmodel.teacher(feats_t).numpy()
        feats_j = self.jmodel.apply(
            self.variables, jnp.asarray(self.audio), method="encode_features"
        )
        jy = np.asarray(
            self.jmodel.apply(self.variables, feats_j, method="teacher_forward")
        )
        np.testing.assert_allclose(jy, ty, atol=5e-5, rtol=1e-3)

    def test_masked_loss_parity(self):
        rng = np.random.default_rng(1)
        preds = rng.normal(size=(2, 2, CFG.total_patches, D_ENC)).astype(np.float32)
        targets = rng.normal(size=(2, CFG.total_patches, D_ENC)).astype(np.float32)
        # torch reference formula (jepa.py:335-362)
        tl = torch.from_numpy
        loss_t = F.mse_loss(
            tl(preds), tl(targets)[:, None].expand_as(tl(preds)), reduction="none"
        ).mean(-1)
        loss_t = (loss_t * tl(self.tgt).float()).sum() / (
            tl(self.tgt).float().sum() + 1e-8
        )
        loss_j = masked_prediction_loss(
            jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(self.tgt)
        )
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-6)
