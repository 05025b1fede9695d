"""X-ARES encoder-contract wrapper for WavJEPA.

The X-ARES harness (`python -m xares.run <encoder.py> <task.py>`, consumed
by /root/reference/run_xares.sh:42) imports an encoder module exposing a
``torch.nn.Module`` subclass with:

    sampling_rate : int     input rate the harness resamples audio to
    output_dim    : int     embedding dimension
    hop_size_in_ms: float   frame hop of the output sequence
    forward(audio: torch.Tensor (B, T) float32) -> torch.Tensor
        (B, n_frames, output_dim) frame-level embeddings

This wraps the TPU runtime (api/runtime.RuntimeJEPA: batched 2.01-s-window
chunked inference on device) behind that torch-facing contract: torch in,
torch out, JAX inside. WavJEPA frames are 10 ms @ 16 kHz
(/root/reference/README.md:43, conv spec stride 160).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import torch

from wavjepa_tpu.api.runtime import RuntimeJEPA, load_model


class WavJEPAEncoder(torch.nn.Module):
    """xares-contract encoder over the WavJEPA TPU runtime.

    Build from a checkpoint path (orbax dir or reference torch .ckpt; the
    ``WAVJEPA_CKPT`` env var is the zero-arg path used when `xares.run`
    instantiates the class without arguments), or wrap an existing runtime.
    """

    def __init__(
        self,
        ckpt_path: Optional[str] = None,
        runtime: Optional[RuntimeJEPA] = None,
    ):
        super().__init__()
        if runtime is None:
            ckpt_path = ckpt_path if ckpt_path is not None else os.environ.get(
                "WAVJEPA_CKPT", ""
            )
            runtime = load_model(ckpt_path)
        self.runtime = runtime
        self.sampling_rate = int(runtime.sample_rate)
        self.output_dim = int(runtime.timestamp_embedding_size)
        # conv stride 160 samples @ 16 kHz → 10 ms hop
        samples_per_frame = runtime.unit_frames / runtime.output_steps
        self.hop_size_in_ms = 1000.0 * samples_per_frame / self.sampling_rate

    @torch.inference_mode()
    def forward(self, audio: torch.Tensor) -> torch.Tensor:
        """(B, T) or (T,) float waveform at ``sampling_rate`` →
        (B, n_frames, output_dim) float32 frame embeddings."""
        if audio.dim() == 1:
            audio = audio[None]
        if audio.dim() != 2:
            raise ValueError(f"expected (B, T) audio, got shape {tuple(audio.shape)}")
        wav = audio.detach().cpu().float().numpy()
        emb, _ts = self.runtime.get_timestamp_embeddings(wav)
        # copy: the runtime may hand back a read-only buffer, which
        # torch.from_numpy warns about (undefined behavior on write)
        return torch.from_numpy(np.array(emb, np.float32, copy=True))
