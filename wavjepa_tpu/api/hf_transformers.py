"""transformers-native WavJEPA: AutoModel.from_pretrained on a local export.

Reference consumers load the published checkpoint through the transformers
loading idiom (/root/reference/hear_configs/WavJEPA_huggingface.py:19-39,
README.md:72-108):

    extractor = AutoFeatureExtractor.from_pretrained(dir)
    model = AutoModel.from_pretrained(dir)           # offline local dir
    emb, ts = model(extractor(audio)["input_values"])

This module provides the same contract for the TPU-native stack: a real
``PreTrainedModel`` subclass whose torch parameters live in the REFERENCE
state-dict layout (the same names/shapes ``api/convert.py`` imports and
exports, so the safetensors file doubles as a reference-format checkpoint),
with ``forward`` bridging to the JAX/TPU runtime (``api/runtime.RuntimeJEPA``)
— weight loading, tying, and serialization are genuine transformers
machinery; only the compute path is JAX.

Loading works two ways, both offline:
  * ``import wavjepa_tpu.api.hf_transformers`` registers the classes with
    AutoConfig/AutoModel/AutoFeatureExtractor → plain
    ``AutoModel.from_pretrained(local_dir)``;
  * the export dir carries this file + ``auto_map`` in config.json →
    ``AutoModel.from_pretrained(local_dir, trust_remote_code=True)`` without
    importing this package first (requires ``wavjepa_tpu`` importable).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping, Optional

import numpy as np

from transformers import PretrainedConfig, PreTrainedModel
from transformers.feature_extraction_utils import BatchFeature, FeatureExtractionMixin

_CONFIG_FIELDS = (
    "conv_spec",
    "in_channels",
    "extractor",
    "extractor_mode",
    "conv_bias",
    "share_weights_over_channels",
    "encoder_layers",
    "encoder_dim",
    "encoder_heads",
    "decoder_layers",
    "decoder_dim",
    "decoder_heads",
    "mlp_ratio",
    "layer_norm_eps",
    "size",
    "sample_rate",
    "process_seconds",
    "average_top_k_layers",
    "pos_embed",
)


class WavJEPATransformersConfig(PretrainedConfig):
    """PretrainedConfig mirror of models.jepa.JEPAConfig (the reference's
    Hydra extractor/trainer groups, wavjepa_configs.py:28-63).

    ``param_shapes`` records the reference-format state-dict layout of the
    exported weights so ``from_pretrained`` can instantiate exact parameter
    tensors before loading — no shape inference at load time."""

    model_type = "wavjepa_tpu"

    def __init__(
        self,
        conv_spec: Any = None,
        in_channels: int = 1,
        extractor: str = "conv",
        extractor_mode: str = "default",
        conv_bias: bool = False,
        share_weights_over_channels: bool = False,
        encoder_layers: int = 12,
        encoder_dim: int = 768,
        encoder_heads: int = 12,
        decoder_layers: int = 12,
        decoder_dim: int = 384,
        decoder_heads: int = 12,
        mlp_ratio: float = 4.0,
        layer_norm_eps: float = 1e-6,
        size: str = "base",
        sample_rate: int = 16000,
        process_seconds: float = 2.01,
        average_top_k_layers: int = 8,
        pos_embed: str = "time",
        param_shapes: Optional[dict] = None,
        **kwargs,
    ):
        self.conv_spec = conv_spec  # list of [out, kernel, stride]; None → default
        self.in_channels = in_channels
        self.extractor = extractor
        self.extractor_mode = extractor_mode
        self.conv_bias = conv_bias
        self.share_weights_over_channels = share_weights_over_channels
        self.encoder_layers = encoder_layers
        self.encoder_dim = encoder_dim
        self.encoder_heads = encoder_heads
        self.decoder_layers = decoder_layers
        self.decoder_dim = decoder_dim
        self.decoder_heads = decoder_heads
        self.mlp_ratio = mlp_ratio
        self.layer_norm_eps = layer_norm_eps
        self.size = size
        self.sample_rate = sample_rate
        self.process_seconds = process_seconds
        self.average_top_k_layers = average_top_k_layers
        self.pos_embed = pos_embed
        self.param_shapes = dict(param_shapes or {})
        super().__init__(**kwargs)

    def to_jepa_config(self):
        from wavjepa_tpu.models.jepa import JEPAConfig

        kwargs = {f: getattr(self, f) for f in _CONFIG_FIELDS}
        if kwargs["conv_spec"] is None:
            kwargs.pop("conv_spec")
        else:
            kwargs["conv_spec"] = tuple(tuple(s) for s in kwargs["conv_spec"])
        return JEPAConfig(**kwargs)

    @classmethod
    def from_jepa_config(cls, cfg, **kwargs) -> "WavJEPATransformersConfig":
        vals = {f: getattr(cfg, f) for f in _CONFIG_FIELDS}
        vals["conv_spec"] = [list(s) for s in cfg.conv_spec]
        vals.update(kwargs)
        return cls(**vals)


def _assign_parameter(root, dotted: str, param) -> None:
    """Install ``param`` at a dotted path, creating bare nn.Module nodes so
    state_dict keys reproduce the reference layout exactly (numeric segments
    like ``encoder.layers.0`` become child-module names, as in torch
    ModuleList)."""
    import torch.nn as nn

    mod = root
    parts = dotted.split(".")
    for seg in parts[:-1]:
        child = mod._modules.get(seg)
        if child is None:
            child = nn.Module()
            mod.add_module(seg, child)
        mod = child
    mod.register_parameter(parts[-1], param)


class WavJEPATransformersModel(PreTrainedModel):
    """AutoModel-loadable WavJEPA whose forward runs the JAX/TPU runtime.

    ``forward(input_values)`` → ``(embeddings, timestamps_ms)`` — the tuple
    contract of the published Hub model (hear_configs/
    WavJEPA_huggingface.py:28-39 consumes it positionally)."""

    config_class = WavJEPATransformersConfig
    main_input_name = "input_values"
    base_model_prefix = "wavjepa"

    def __init__(self, config: WavJEPATransformersConfig):
        import torch
        import torch.nn as nn

        super().__init__(config)
        if not config.param_shapes:
            raise ValueError(
                "WavJEPATransformersConfig.param_shapes is empty — export "
                "with api.hf_transformers.export_transformers_pretrained"
            )
        for name, shape in config.param_shapes.items():
            _assign_parameter(
                self, name, nn.Parameter(torch.zeros(*shape), requires_grad=False)
            )
        self._runtime_cache = None

    # -- JAX bridge -------------------------------------------------------
    def invalidate_runtime(self) -> None:
        """Drop the cached JAX runtime (call after mutating weights)."""
        self._runtime_cache = None

    def _runtime(self):
        if self._runtime_cache is None:
            from wavjepa_tpu.api.convert import convert_jepa_state_dict
            from wavjepa_tpu.api.runtime import RuntimeJEPA

            cfg = self.config.to_jepa_config()
            params, _ = convert_jepa_state_dict(
                dict(self.state_dict()),
                encoder_layers=cfg.encoder_layers,
                decoder_layers=cfg.decoder_layers,
                conv_layers=len(cfg.conv_spec),
                in_channels=cfg.in_channels,
                mode=cfg.extractor_mode,
                conv_bias=cfg.conv_bias,
                channel_wise=(cfg.extractor == "conv_channel"),
                share_weights=cfg.share_weights_over_channels,
                # the flax module tree declares decoder params in setup even
                # on the encoder-only represent path, so import them too
                with_decoder=True,
            )
            self._runtime_cache = RuntimeJEPA(cfg, params)
        return self._runtime_cache

    def forward(self, input_values, sampling_rate: Optional[int] = None):
        import torch

        if sampling_rate is not None and sampling_rate != self.config.sample_rate:
            raise ValueError(
                f"model expects {self.config.sample_rate} Hz, got {sampling_rate}"
            )
        arr = np.asarray(
            input_values.detach().cpu().numpy()
            if hasattr(input_values, "detach")
            else input_values,
            np.float32,
        )
        emb, ts = self._runtime().get_timestamp_embeddings(arr)
        # np.array copies → writable (jax exports read-only buffers)
        return torch.as_tensor(np.array(emb)), torch.as_tensor(np.array(ts))


class WavJEPATransformersFeatureExtractor(FeatureExtractionMixin):
    """AutoFeatureExtractor analog: channel adaptation + −14 dBFS RMS
    normalization + batching (reference hear_api/feature_helper.py:27-88),
    returning a BatchFeature with ``input_values``."""

    def __init__(self, sampling_rate: int = 16000, in_channels: int = 1, **kwargs):
        self.sampling_rate = sampling_rate
        self.in_channels = in_channels
        super().__init__(**kwargs)

    def __call__(self, audio, sampling_rate: Optional[int] = None, return_tensors=None):
        from wavjepa_tpu.api.hf import WavJEPAFeatureExtractor as _Impl

        arr = _Impl(self.sampling_rate, self.in_channels)(audio, sampling_rate)
        return BatchFeature({"input_values": arr}, tensor_type=return_tensors)


# --------------------------------------------------------------- export


def export_transformers_pretrained(
    save_dir: str | Path,
    cfg,
    params: Mapping,
    teacher_encoder: Optional[Mapping] = None,
) -> Path:
    """Write a local dir that offline ``AutoModel.from_pretrained`` loads.

    Contents: config.json (+auto_map), model.safetensors in the REFERENCE
    state-dict layout (convert.py export — the same file is importable as a
    reference checkpoint), preprocessor_config.json, and this module copied
    in for the trust_remote_code path."""
    import shutil

    import torch

    from wavjepa_tpu.api.convert import export_jepa_state_dict

    save_dir = Path(save_dir)
    # model_config=cfg emits the frozen positional tables the reference
    # layout stores (so reference-side strict=False loads can't silently
    # substitute the wrong table for binaural-trained Nat models)
    sd = export_jepa_state_dict(params, teacher_encoder, model_config=cfg)
    tensors = {
        k: torch.as_tensor(np.array(v, np.float32))  # np.array copies → writable
        for k, v in sd.items()
    }
    hf_cfg = WavJEPATransformersConfig.from_jepa_config(
        cfg, param_shapes={k: list(v.shape) for k, v in tensors.items()}
    )
    hf_cfg.auto_map = {
        "AutoConfig": "modeling_wavjepa_tpu.WavJEPATransformersConfig",
        "AutoModel": "modeling_wavjepa_tpu.WavJEPATransformersModel",
        "AutoFeatureExtractor": "modeling_wavjepa_tpu.WavJEPATransformersFeatureExtractor",
    }
    model = WavJEPATransformersModel(hf_cfg)
    missing, unexpected = model.load_state_dict(tensors, strict=True)
    assert not missing and not unexpected, (missing, unexpected)
    model.save_pretrained(save_dir)
    WavJEPATransformersFeatureExtractor(
        sampling_rate=cfg.sample_rate, in_channels=cfg.in_channels
    ).save_pretrained(save_dir)
    shutil.copyfile(__file__, save_dir / "modeling_wavjepa_tpu.py")
    return save_dir


def register_auto_classes() -> None:
    """Idempotently register with AutoConfig/AutoModel/AutoFeatureExtractor
    so plain from_pretrained (no trust_remote_code) resolves locally."""
    from transformers import AutoConfig, AutoFeatureExtractor, AutoModel

    try:
        AutoConfig.register("wavjepa_tpu", WavJEPATransformersConfig)
    except ValueError:
        pass  # already registered (re-import)
    try:
        AutoModel.register(WavJEPATransformersConfig, WavJEPATransformersModel)
    except ValueError:
        pass
    try:
        AutoFeatureExtractor.register(
            WavJEPATransformersConfig, WavJEPATransformersFeatureExtractor
        )
    except ValueError:
        pass


if not __name__.startswith("transformers_modules"):
    # registering under the dynamic-module copy would collide with (or
    # shadow) the canonical registration; trust_remote_code resolves classes
    # through auto_map instead.
    register_auto_classes()


def _main(argv=None) -> int:
    """CLI: export an orbax/torch checkpoint as a transformers dir.

    python -m wavjepa_tpu.api.hf_transformers CKPT OUT_DIR [size]
    CKPT: orbax checkpoint dir (TrainState) or reference .ckpt/.pt file;
    "" initializes random weights (smoke/testing)."""
    import argparse

    parser = argparse.ArgumentParser(description=_main.__doc__)
    parser.add_argument("ckpt")
    parser.add_argument("out_dir")
    parser.add_argument("--size", default="base", choices=["base", "large"])
    parser.add_argument("--in-channels", type=int, default=1)
    parser.add_argument("--channel-wise", action="store_true")
    args = parser.parse_args(argv)

    from wavjepa_tpu.api.runtime import load_model
    from wavjepa_tpu.models.jepa import JEPAConfig

    cfg = JEPAConfig(
        size=args.size,
        in_channels=args.in_channels,
        extractor="conv_channel" if args.channel_wise else "conv",
        pos_embed="binaural" if args.channel_wise else "time",
    )
    runtime = load_model(args.ckpt, config=cfg)
    out = export_transformers_pretrained(args.out_dir, cfg, runtime.params)
    print(f"exported transformers dir: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
