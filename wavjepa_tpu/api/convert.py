"""PyTorch checkpoint ↔ JAX parameter conversion.

Imports reference-format WavJEPA checkpoints (Lightning ``state_dict`` with
optional ``_orig_mod`` torch.compile prefixes — see
/root/reference/hear_api/runtime.py:63-77) into this framework's flax param
trees, so published wavjepa-base / wavjepa-nat-base weights produce
bit-comparable embeddings.

Key layout differences handled here:
  * torch ``Linear.weight`` is (out, in) → flax Dense ``kernel`` is (in, out).
  * torch MHA packs q/k/v into ``in_proj_weight``/``in_proj_bias``; we keep
    the same packing (module ``in_proj``), so conversion is one transpose.
  * torch ``Conv1d.weight`` is (out, in/groups, k) = our OIH kernel layout.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(x) -> np.ndarray:
    """Accept torch tensors or arrays without importing torch here."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def strip_compile_prefixes(state_dict: Mapping[str, object]) -> dict[str, object]:
    """Remove ``._orig_mod`` segments that torch.compile inserts into
    submodule names (reference strips them at every load site)."""
    return {k.replace("._orig_mod", ""): v for k, v in state_dict.items()}


def convert_linear(state_dict, prefix: str) -> dict:
    out = {"kernel": _np(state_dict[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in state_dict:
        out["bias"] = _np(state_dict[f"{prefix}.bias"])
    return out


def convert_layernorm(state_dict, prefix: str) -> dict:
    return {
        "scale": _np(state_dict[f"{prefix}.weight"]),
        "bias": _np(state_dict[f"{prefix}.bias"]),
    }


def convert_transformer_layer(state_dict, prefix: str) -> dict:
    return {
        "self_attn": {
            "in_proj": {
                "kernel": _np(state_dict[f"{prefix}.self_attn.in_proj_weight"]).T,
                "bias": _np(state_dict[f"{prefix}.self_attn.in_proj_bias"]),
            },
            "out_proj": convert_linear(state_dict, f"{prefix}.self_attn.out_proj"),
        },
        "linear1": convert_linear(state_dict, f"{prefix}.linear1"),
        "linear2": convert_linear(state_dict, f"{prefix}.linear2"),
        "norm1": convert_layernorm(state_dict, f"{prefix}.norm1"),
        "norm2": convert_layernorm(state_dict, f"{prefix}.norm2"),
    }


def convert_transformer_encoder(state_dict, prefix: str, num_layers: int) -> dict:
    """torch nn.TransformerEncoder (with final ``norm``) → TransformerEncoder
    params (ops/transformer.py)."""
    params = {
        f"layers_{i}": convert_transformer_layer(state_dict, f"{prefix}.layers.{i}")
        for i in range(num_layers)
    }
    params["norm"] = convert_layernorm(state_dict, f"{prefix}.norm")
    return params


def convert_conv_frontend(
    state_dict, prefix: str, num_layers: int, mode: str = "default",
    conv_bias: bool = False,
) -> dict:
    """Reference ConvFeatureExtractor ``cnn`` Sequential → ConvFeatureExtractor
    params. Block structure in the reference (audio_feature_extractor.py:54-98):
      default   : [conv, dropout, groupnorm, gelu]   (groupnorm on block 0 only)
      layer_norm: [conv, dropout, Sequential(rearr, layernorm, rearr), gelu]
    """
    params = {}
    for i in range(num_layers):
        block = {"kernel": _np(state_dict[f"{prefix}.{i}.0.weight"])}
        if conv_bias:
            block["bias"] = _np(state_dict[f"{prefix}.{i}.0.bias"])
        if mode == "default" and i == 0:
            block["norm_scale"] = _np(state_dict[f"{prefix}.{i}.2.weight"])
            block["norm_bias"] = _np(state_dict[f"{prefix}.{i}.2.bias"])
        elif mode == "layer_norm":
            block["norm_scale"] = _np(state_dict[f"{prefix}.{i}.2.1.weight"])
            block["norm_bias"] = _np(state_dict[f"{prefix}.{i}.2.1.bias"])
        params[f"block_{i}"] = block
    return params


def convert_jepa_state_dict(
    state_dict,
    *,
    encoder_layers: int = 12,
    decoder_layers: int = 12,
    conv_layers: int = 6,
    mode: str = "default",
    conv_bias: bool = False,
    channel_wise: bool = False,
    in_channels: int = 1,
    share_weights: bool = False,
    with_decoder: bool = True,
) -> tuple[dict, dict | None]:
    """Full reference JEPA/Denoiser checkpoint → (params, teacher_encoder).

    Handles both the Lightning wrapper dict (``{'state_dict': ...}``) and a
    bare state_dict; strips torch.compile prefixes. ``teacher_encoder`` is
    returned separately (or None if absent, e.g. Denoiser checkpoints).
    Module names follow /root/reference/wavjepa/jepa.py:108-140.
    """
    if "state_dict" in state_dict and not hasattr(state_dict["state_dict"], "shape"):
        state_dict = state_dict["state_dict"]
    sd = strip_compile_prefixes(state_dict)

    if channel_wise:
        extractor = convert_channel_conv_frontend(
            sd, "extract_audio.cnns", conv_layers, in_channels,
            mode, conv_bias, share_weights,
        )
    else:
        extractor = convert_conv_frontend(
            sd, "extract_audio.cnn", conv_layers, mode, conv_bias
        )

    params: dict = {
        "extract_audio": extractor,
        "feature_norms": convert_layernorm(sd, "feature_norms"),
        "encoder": convert_transformer_encoder(sd, "encoder", encoder_layers),
    }
    if "post_extraction_mapper.weight" in sd:
        params["post_extraction_mapper"] = convert_linear(sd, "post_extraction_mapper")
    if with_decoder and "decoder.norm.weight" in sd:
        params["decoder"] = convert_transformer_encoder(sd, "decoder", decoder_layers)
        params["encoder_to_decoder_mapper"] = convert_linear(
            sd, "encoder_to_decoder_mapper"
        )
        params["decoder_to_encoder_mapper"] = convert_linear(
            sd, "decoder_to_encoder_mapper"
        )
        params["mask_token"] = _np(sd["mask_token"])

    teacher = None
    if "teacher_encoder.norm.weight" in sd:
        teacher = convert_transformer_encoder(sd, "teacher_encoder", encoder_layers)
    return params, teacher


def load_torch_checkpoint(path: str):
    """Load a reference .ckpt/.pt file (requires torch, CPU map)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_channel_conv_frontend(
    state_dict, prefix: str, num_layers: int, in_channels: int,
    mode: str = "default", conv_bias: bool = False, share_weights: bool = False,
) -> dict:
    """Reference ConvChannelFeatureExtractor ``cnns`` ModuleList → params."""
    if share_weights:
        return {
            "cnn_shared": convert_conv_frontend(
                state_dict, f"{prefix}.0", num_layers, mode, conv_bias
            )
        }
    return {
        f"cnn_{c}": convert_conv_frontend(
            state_dict, f"{prefix}.{c}", num_layers, mode, conv_bias
        )
        for c in range(in_channels)
    }
