"""HuggingFace-style inference entry point (parity with the
labhamlet/wavjepa-base Hub remote code consumed at
/root/reference/hear_configs/WavJEPA_huggingface.py:19-39 and
README.md:72-108):

    extractor = WavJEPAFeatureExtractor()
    model = WavJEPAForAudioEmbeddings.from_pretrained(ckpt)
    inputs = extractor(audio_16k)                    # (1, 160000)
    embeddings, timestamps = model(inputs)           # (1, S, 768), (1, S) ms

wavjepa-nat-base parity: pass in_channels=2/channel_wise=True and feed
(1, 2, 160000) binaural input (README.md:93-108).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from wavjepa_tpu.api.feature_helper import prepare_batch
from wavjepa_tpu.api.runtime import RuntimeJEPA, load_model


class WavJEPAFeatureExtractor:
    """AutoFeatureExtractor analog: channel adaptation + −14 dBFS RMS
    normalization + batching (hear_api/feature_helper.py:27-88)."""

    def __init__(self, sampling_rate: int = 16000, in_channels: int = 1):
        self.sampling_rate = sampling_rate
        self.in_channels = in_channels

    def __call__(self, audio, sampling_rate: Optional[int] = None) -> np.ndarray:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            from wavjepa_tpu.data.resample import resample_np

            audio = np.asarray(audio, np.float32)
            if audio.ndim == 1:
                audio = audio[None]
            audio = resample_np(audio, sampling_rate, self.sampling_rate)
        arr = np.asarray(audio, np.float32)
        if arr.ndim == 1:
            arr = arr[None]
        if arr.ndim not in (2, 3):  # (B, T) or (B, C, T)
            raise ValueError(f"unsupported audio input shape {arr.shape}")
        return prepare_batch(list(arr), self.in_channels)


class WavJEPAForAudioEmbeddings:
    """AutoModel analog over the HEAR runtime: input_values → (embeddings,
    timestamps)."""

    def __init__(self, runtime: RuntimeJEPA):
        self.runtime = runtime
        self.config = runtime.config

    @classmethod
    def from_pretrained(
        cls,
        checkpoint_path: str = "",
        in_channels: int = 1,
        channel_wise: bool = False,
        model_size: str = "base",
    ) -> "WavJEPAForAudioEmbeddings":
        return cls(
            load_model(
                checkpoint_path,
                in_channels=in_channels,
                channel_wise=channel_wise,
                model_size=model_size,
            )
        )

    def __call__(self, input_values) -> tuple[np.ndarray, np.ndarray]:
        return self.runtime.get_timestamp_embeddings(input_values)
