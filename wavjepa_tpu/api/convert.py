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


def detect_pos_embed(
    state_dict: Mapping[str, object],
    encoder_dim: int,
    frames_per_window: int,
    total_patches: int,
    atol: float = 1e-3,
) -> "str | None":
    """Infer which positional table a reference checkpoint trained with.

    The reference stores the (frozen) positional table as a parameter
    (``pos_encoding_encoder``, /root/reference/wavjepa/jepa.py:139,163-180),
    so real checkpoints carry the exact table they trained with — while this
    framework derives it from ``JEPAConfig.pos_embed``, which the loader must
    therefore get right. The reference's training path always builds the 1-D
    sincos table over ``total_patches`` (its ``get_binaural_pos_embed`` is
    never called in the snapshot we mirror), but published Nat weights could
    in principle use either, so compare against both candidates.

    Returns "time", "binaural", or None (no pos buffer in the dict / neither
    table matches — caller should fall back to its configured default).
    """
    from wavjepa_tpu.ops.pos_embed import (
        get_1d_sincos_pos_embed_from_grid,
        get_binaural_pos_embed,
    )

    if "state_dict" in state_dict and not hasattr(state_dict["state_dict"], "shape"):
        state_dict = state_dict["state_dict"]
    stored = None
    for key, value in state_dict.items():
        if key.replace("._orig_mod", "").endswith("pos_encoding_encoder"):
            stored = _np(value)
            break
    if stored is None or stored.size != total_patches * encoder_dim:
        return None  # absent, or trained at different dims than the probe
    stored = stored.reshape(total_patches, encoder_dim).astype(np.float64)
    time_table = get_1d_sincos_pos_embed_from_grid(
        encoder_dim, np.arange(total_patches, dtype=np.float64)
    )
    if np.allclose(stored, time_table, atol=atol):
        return "time"
    if total_patches == 2 * frames_per_window and np.allclose(
        stored, get_binaural_pos_embed(encoder_dim, frames_per_window), atol=atol
    ):
        return "binaural"
    return None


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


# ----------------------------------------------------------------- export


def _t(x) -> np.ndarray:
    return np.asarray(x)


def export_linear(params: Mapping, prefix: str, out: dict):
    out[f"{prefix}.weight"] = _t(params["kernel"]).T
    if "bias" in params:
        out[f"{prefix}.bias"] = _t(params["bias"])


def export_layernorm(params: Mapping, prefix: str, out: dict):
    out[f"{prefix}.weight"] = _t(params["scale"])
    out[f"{prefix}.bias"] = _t(params["bias"])


def export_transformer_encoder(params: Mapping, prefix: str, out: dict):
    for name, layer in params.items():
        if not name.startswith("layers_"):
            continue
        i = int(name.split("_")[1])
        lp = f"{prefix}.layers.{i}"
        out[f"{lp}.self_attn.in_proj_weight"] = _t(
            layer["self_attn"]["in_proj"]["kernel"]
        ).T
        out[f"{lp}.self_attn.in_proj_bias"] = _t(layer["self_attn"]["in_proj"]["bias"])
        export_linear(layer["self_attn"]["out_proj"], f"{lp}.self_attn.out_proj", out)
        export_linear(layer["linear1"], f"{lp}.linear1", out)
        export_linear(layer["linear2"], f"{lp}.linear2", out)
        export_layernorm(layer["norm1"], f"{lp}.norm1", out)
        export_layernorm(layer["norm2"], f"{lp}.norm2", out)
    export_layernorm(params["norm"], f"{prefix}.norm", out)


def export_conv_frontend(params: Mapping, prefix: str, out: dict):
    for name, block in params.items():
        i = int(name.split("_")[1])
        out[f"{prefix}.{i}.0.weight"] = _t(block["kernel"])
        if "bias" in block:
            out[f"{prefix}.{i}.0.bias"] = _t(block["bias"])
        if "norm_scale" in block:
            # GroupNorm sits at Sequential index 2 in the reference block
            out[f"{prefix}.{i}.2.weight"] = _t(block["norm_scale"])
            out[f"{prefix}.{i}.2.bias"] = _t(block["norm_bias"])


def export_jepa_state_dict(params: Mapping, teacher_encoder=None,
                           model_config=None) -> dict:
    """flax JEPA params → reference-format torch ``state_dict`` (numpy
    values; wrap with torch.as_tensor to save as a .ckpt / publish to the
    Hub). Inverse of convert_jepa_state_dict — roundtrips bit-exactly.

    Pass ``model_config`` (a JEPAConfig) to also emit the frozen positional
    tables (``pos_encoding_encoder``/``pos_encoding_decoder``): the reference
    stores them as parameters (wavjepa/jepa.py:139,163-180) and loads with
    ``strict=False``, so an export without them silently falls back to the
    loader's own 1-D table — wrong for binaural-trained Nat models.
    """
    out: dict = {}
    if model_config is not None:
        out["pos_encoding_encoder"] = model_config.pos_table(
            model_config.encoder_dim
        )
        out["pos_encoding_decoder"] = model_config.pos_table(
            model_config.decoder_dim
        )
    extractor = params["extract_audio"]
    if any(k.startswith("cnn_") for k in extractor):
        for name, cnn in extractor.items():
            idx = 0 if name == "cnn_shared" else int(name.split("_")[1])
            export_conv_frontend(cnn, f"extract_audio.cnns.{idx}", out)
    else:
        export_conv_frontend(extractor, "extract_audio.cnn", out)
    export_layernorm(params["feature_norms"], "feature_norms", out)
    if "post_extraction_mapper" in params:
        export_linear(params["post_extraction_mapper"], "post_extraction_mapper", out)
    export_transformer_encoder(params["encoder"], "encoder", out)
    if "decoder" in params:
        export_transformer_encoder(params["decoder"], "decoder", out)
        export_linear(params["encoder_to_decoder_mapper"], "encoder_to_decoder_mapper", out)
        export_linear(params["decoder_to_encoder_mapper"], "decoder_to_encoder_mapper", out)
        out["mask_token"] = _t(params["mask_token"])
    if teacher_encoder is not None:
        export_transformer_encoder(teacher_encoder, "teacher_encoder", out)
    return out


def flatten_params_dict(params: Mapping, prefix: str = "") -> dict[str, np.ndarray]:
    """Nested param dict → flat {'a/b/c': array} mapping (npz-friendly; used
    by scripts/check_real_weights.py golden fixtures)."""
    out: dict[str, np.ndarray] = {}
    for key, value in params.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, Mapping):
            out.update(flatten_params_dict(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten_params_dict(flat: Mapping[str, np.ndarray]) -> dict:
    """Inverse of flatten_params_dict."""
    out: dict = {}
    for path, value in flat.items():
        node = out
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)
    return out
