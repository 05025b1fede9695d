"""Wav2Vec2-style stacked temporal-convolution waveform encoders (flax).

TPU-native re-design of the reference extractors
(/root/reference/wavjepa/extractors/audio_feature_extractor.py:13-177 and
audio_channel_feature_extractor.py:13-218):

  * `lax.conv_general_dilated` in NCH layout — XLA lowers strided 1-D conv to
    MXU matmuls; the first (512,10,5) layer over raw waveforms dominates the
    frontend FLOPs and tiles cleanly at 512 output channels.
  * GroupNorm(512,512) (i.e. per-channel instance norm over time) on the
    first block only in "default" mode, LayerNorm-over-channels in
    "layer_norm" mode — matching the reference block structure
    Conv → Dropout → {GroupNorm | LayerNorm} → GELU(exact).
  * Norms and GELU run in f32; conv accumulates f32 via
    preferred_element_type; activations carried in ``dtype`` (bf16).
  * `total_patches` / `receptive_fields` are closed-form (no dummy forward
    needed — shapes must be static under jit anyway).

Canonical specs (configs/extractor/*.yaml in the reference):
  wavjepa : [(512,10,5)] + [(512,3,2)]*4 + [(512,2,2)]        → stride 160 (10 ms @16 kHz)
  wav2vec2: [(512,10,5)] + [(512,3,2)]*4 + [(512,2,2)]*2      → stride 320 (20 ms)
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

ConvSpec = Sequence[tuple[int, int, int]]  # (out_dim, kernel, stride) per layer

WAVJEPA_CONV_SPEC: ConvSpec = tuple(
    [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)]
)
WAV2VEC2_CONV_SPEC: ConvSpec = tuple(
    [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2
)


def conv_output_length(time: int, spec: ConvSpec) -> int:
    """Output frames for an input of ``time`` samples (VALID, no dilation)."""
    for _, k, s in spec:
        time = (time - k) // s + 1
        if time <= 0:
            raise ValueError(f"input too short for conv spec at layer k={k},s={s}")
    return time


def conv_total_stride(spec: ConvSpec) -> int:
    return math.prod(s for _, _, s in spec)


def conv_receptive_fields(spec: ConvSpec) -> list[int]:
    """Analytic receptive field at each layer boundary (reference
    audio_feature_extractor.py:147-154)."""
    rf = 1
    fields = [rf]
    for _, width, stride in reversed(list(spec)):
        rf = (rf - 1) * stride + width
        fields.append(rf)
    return list(reversed(fields))


def _kaiming_normal_conv_init(key, shape, dtype):
    """torch kaiming_normal_(fan_in, leaky_relu a=0.01 gain) over OIH kernels —
    std = gain / sqrt(fan_in) with gain = sqrt(2/(1+0.01^2))."""
    out_c, in_c, k = shape
    fan_in = in_c * k
    gain = math.sqrt(2.0 / (1.0 + 0.01**2))
    std = gain / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def conv1d_as_matmul(x: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    """VALID strided 1-D convolution expressed as MXU matmuls.

    x: (B, C_in, T); kernel: (C_out, C_in, K) → (B, C_out, T_out).

    * C_in == 1 (the waveform layer): im2col via reshape — windows of a
      stride-s kernel cover ceil(K/s) stride blocks, so the (T_out, K)
      window matrix is a concat of shifted (T_blocks, s) reshapes of the
      signal; one (T_out, K) @ (K, C_out) matmul follows.
    * C_in > 1: y[t] = Σ_j W_j @ x[·, s·t+j] — K matmuls over strided slices
      with contraction C_in (=512 here), each a full-rate MXU op.

    Measured on v5e (full base train step, batch 256 crops): this
    formulation is ~9% SLOWER end-to-end than lax.conv_general_dilated
    (1765 ms vs 1622 ms) — XLA's conv lowering plus its native transpose
    beats the strided-slice matmuls, whose backward turns into pad/scatter
    chains. Kept as an alternative (`ConvBlock.impl="matmul"`) and as the
    building block for a future fully-fused Pallas frontend; the default is
    the conv path.
    """
    b, c_in, t = x.shape
    c_out, _, k = kernel.shape
    t_out = (t - k) // stride + 1
    if c_in == 1:
        n_blocks = -(-k // stride)  # stride blocks a window spans
        usable = (t_out - 1) * stride + n_blocks * stride
        pad = max(0, usable - t)
        sig = jnp.pad(x[:, 0, :], ((0, 0), (0, pad))) if pad else x[:, 0, :]
        blocks = sig[:, : (t_out - 1 + n_blocks) * stride].reshape(
            b, t_out - 1 + n_blocks, stride
        )
        cols = jnp.concatenate(
            [blocks[:, i : i + t_out] for i in range(n_blocks)], axis=-1
        )[..., :k]  # (B, T_out, K)
        y = cols @ kernel[:, 0, :].T  # (B, T_out, C_out)
        return y.transpose(0, 2, 1)  # (B, C_out, T_out)
    xt = x.transpose(0, 2, 1)  # (B, T, C_in)
    y = None
    for j in range(k):
        sl = jax.lax.slice_in_dim(xt, j, j + (t_out - 1) * stride + 1, axis=1)
        sl = sl[:, ::stride]  # (B, T_out, C_in)
        term = sl @ kernel[:, :, j].T  # (B, T_out, C_out)
        y = term if y is None else y + term
    return y.transpose(0, 2, 1)


class ConvBlock(nn.Module):
    """One frontend block: Conv1d → {GroupNorm|LayerNorm|none} → exact GELU."""

    out_dim: int
    kernel: int
    stride: int
    norm: str = "none"  # "group" | "layer" | "none"
    use_bias: bool = False
    groups: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    impl: str = "conv"  # "conv" (lax; measured faster) | "matmul" (MXU slices)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, C_in, T)
        in_c = x.shape[1]
        kernel = self.param(
            "kernel",
            _kaiming_normal_conv_init,
            (self.out_dim, in_c // self.groups, self.kernel),
            self.param_dtype,
        )
        if self.impl == "matmul" and self.groups == 1:
            y = conv1d_as_matmul(
                x.astype(self.dtype), kernel.astype(self.dtype), self.stride
            )
        else:
            # NOTE: no preferred_element_type here — conv_general_dilated's
            # transpose (backward) rule rejects an f32 cotangent against bf16
            # operands. The TPU MXU accumulates bf16 convolutions in f32
            # internally regardless, so same-dtype conv loses no precision.
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.stride,),
                padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_dim,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)[None, :, None]

        if self.norm == "group":
            # GroupNorm(num_groups=C, C): per-(sample, channel) stats over time,
            # computed in f32 (torch GroupNorm eps=1e-5).
            y32 = y.astype(jnp.float32)
            mean = jnp.mean(y32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
            y32 = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
            scale = self.param(
                "norm_scale", nn.initializers.ones, (self.out_dim,), self.param_dtype
            )
            nbias = self.param(
                "norm_bias", nn.initializers.zeros, (self.out_dim,), self.param_dtype
            )
            y32 = y32 * scale.astype(jnp.float32)[None, :, None] + nbias.astype(
                jnp.float32
            )[None, :, None]
        elif self.norm == "layer":
            # LayerNorm over channels at each timestep (torch eps=1e-5).
            y32 = y.astype(jnp.float32)
            mean = jnp.mean(y32, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(y32 - mean), axis=1, keepdims=True)
            y32 = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
            scale = self.param(
                "norm_scale", nn.initializers.ones, (self.out_dim,), self.param_dtype
            )
            nbias = self.param(
                "norm_bias", nn.initializers.zeros, (self.out_dim,), self.param_dtype
            )
            y32 = y32 * scale.astype(jnp.float32)[None, :, None] + nbias.astype(
                jnp.float32
            )[None, :, None]
        else:
            y32 = y.astype(jnp.float32)

        # GELU runs in the compute dtype (bf16 in training) — matching torch
        # autocast, where norms run f32 but GELU executes in bf16; also halves
        # the (B, 512, T) activation temporaries on TPU.
        return jax.nn.gelu(y32.astype(self.dtype), approximate=False)


class ConvFeatureExtractor(nn.Module):
    """Mono (or fully-mixed multichannel) conv frontend.

    Input (B, C_in, T) → output (B, T', embed_dim). "default" mode applies
    GroupNorm on the first block only (reference
    audio_feature_extractor.py:104-119).
    """

    conv_spec: ConvSpec = WAVJEPA_CONV_SPEC
    in_channels: int = 1
    mode: str = "default"  # "default" | "layer_norm"
    conv_bias: bool = False
    depthwise: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # rematerialize each block individually in backward: a whole-stack remat
    # keeps several (B, 512, T_i) f32 temporaries live at once during the
    # replay (measured 82 GB HBM demand for the denoiser at 512 crops);
    # per-block remat bounds the live recompute set to one layer.
    remat: bool = False

    @property
    def embedding_dim(self) -> int:
        return self.conv_spec[-1][0]

    def total_patches(self, time: int) -> int:
        return conv_output_length(time, self.conv_spec)

    @property
    def receptive_fields(self) -> list[int]:
        return conv_receptive_fields(self.conv_spec)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim == 2:
            x = x[:, None, :]
        in_d = self.in_channels
        block_cls = nn.remat(ConvBlock) if self.remat else ConvBlock
        for i, (dim, k, s) in enumerate(self.conv_spec):
            if self.mode == "layer_norm":
                norm = "layer"
            else:
                norm = "group" if i == 0 else "none"
            groups = in_d if self.depthwise else 1
            x = block_cls(
                out_dim=dim,
                kernel=k,
                stride=s,
                norm=norm,
                use_bias=self.conv_bias,
                groups=groups,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(x)
            in_d = dim
        # (B, C_emb, T') → (B, T', C_emb)
        return jnp.swapaxes(x, 1, 2)


class ConvChannelFeatureExtractor(nn.Module):
    """Per-audio-channel conv frontend for multi-channel (binaural/ambisonic)
    scenes. Each channel runs through its own CNN (or one shared CNN when
    ``share_weights``), and per-channel frame sequences are interleaved into
    the token axis: seq = C · T', ordered channel-major then flattened as
    (C, T') → tokens [c0t0, c0t1, ..., c1t0, ...] to match the reference's
    stack+flatten (audio_channel_feature_extractor.py:167-179).
    """

    conv_spec: ConvSpec = WAVJEPA_CONV_SPEC
    in_channels: int = 2
    mode: str = "default"
    conv_bias: bool = False
    depthwise: bool = False
    share_weights: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @property
    def embedding_dim(self) -> int:
        return self.conv_spec[-1][0]

    def total_patches(self, time: int) -> int:
        return self.in_channels * conv_output_length(time, self.conv_spec)

    @property
    def receptive_fields(self) -> list[int]:
        return conv_receptive_fields(self.conv_spec)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, C, T)
        if self.share_weights:
            cnn = ConvFeatureExtractor(
                conv_spec=self.conv_spec,
                in_channels=1,
                mode=self.mode,
                conv_bias=self.conv_bias,
                depthwise=self.depthwise,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                remat=self.remat,
                name="cnn_shared",
            )
            # Fold channels into batch: one big conv call keeps the MXU busy
            # instead of C sequential smaller ones.
            b, c, t = x.shape
            y = cnn(x.reshape(b * c, 1, t))  # (B*C, T', E)
            y = y.reshape(b, c, y.shape[1], y.shape[2])
        else:
            outs = []
            for ch in range(self.in_channels):
                cnn = ConvFeatureExtractor(
                    conv_spec=self.conv_spec,
                    in_channels=1,
                    mode=self.mode,
                    conv_bias=self.conv_bias,
                    depthwise=self.depthwise,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    remat=self.remat,
                    name=f"cnn_{ch}",
                )
                outs.append(cnn(x[:, ch : ch + 1, :]))
            y = jnp.stack(outs, axis=1)  # (B, C, T', E)
        b, c, tp, e = y.shape
        return y.reshape(b, c * tp, e)
