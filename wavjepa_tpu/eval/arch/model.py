"""ARCH embedding-model contract + the WavJEPA implementation.

Re-implements the reference's Model ABC
(/root/reference/ARCH/arch_eval/models/model.py:5-68) and its WavJEPA wrapper
(/root/reference/ARCH/configs/wavjepa_wrapper.py:55-157): −14 dBFS RMS
normalization, zero-pad to a multiple of the 2.01-s unit window, per-chunk
context-encoder representation with padded tokens dropped, mean-pool for the
clip embedding / concatenated frames for token embeddings.
"""

from __future__ import annotations

import numpy as np


class Model:
    """Embedding-model contract for ARCH evaluators."""

    def __init__(self, model=None, **kwargs):
        self.model = model
        for key, value in kwargs.items():
            setattr(self, key, value)

    def get_embeddings(self, audio: np.ndarray, **kwargs) -> np.ndarray:
        """Whole-clip embedding → (embedding_size,)."""
        raise NotImplementedError

    def get_token_embeddings(self, audio: np.ndarray, **kwargs) -> np.ndarray:
        """Per-frame embeddings → (n_frames, embedding_size)."""
        raise NotImplementedError

    def get_classification_embedding_size(self) -> int:
        raise NotImplementedError

    def get_token_embedding_size(self) -> int:
        raise NotImplementedError

    def get_sampling_rate(self) -> int:
        raise NotImplementedError


class WavJEPAModel(Model):
    """ARCH Model over a wavjepa_tpu HEAR runtime (api/runtime.py)."""

    def __init__(self, runtime):
        super().__init__(model=runtime)
        self.runtime = runtime

    @classmethod
    def from_checkpoint(cls, ckpt_path: str = "", **kwargs) -> "WavJEPAModel":
        from wavjepa_tpu.api.runtime import load_model

        return cls(load_model(ckpt_path, **kwargs))

    def _normalize(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        rms = np.sqrt(np.mean(np.square(audio)))
        if rms > 0:
            audio = audio * 10.0 ** ((-14.0 - 20.0 * np.log10(rms)) / 20.0)
        return audio

    def get_token_embeddings(self, audio: np.ndarray, **kwargs) -> np.ndarray:
        audio = self._normalize(audio)
        emb, _ = self.runtime.get_timestamp_embeddings(audio)
        return emb[0]

    def get_embeddings(self, audio: np.ndarray, **kwargs) -> np.ndarray:
        return self.get_token_embeddings(audio).mean(axis=0)

    def get_batch_embeddings(self, audios, mode: str = "linear"):
        """Batched path used by ClassificationDataset precompute: one device
        call per batch of equal-length clips."""
        batch = np.stack([self._normalize(a)[0] for a in audios])
        emb, _ = self.runtime.get_timestamp_embeddings(batch)
        if mode == "attention-pooling":
            return list(emb)
        return list(emb.mean(axis=1))

    def get_classification_embedding_size(self) -> int:
        return self.runtime.scene_embedding_size

    def get_token_embedding_size(self) -> int:
        return self.runtime.timestamp_embedding_size

    def get_sampling_rate(self) -> int:
        return self.runtime.sample_rate


class HFWrapperModel(WavJEPAModel):
    """ARCH Model over the HF-parity surface (counterpart of the reference's
    w2v2/HF wrapper, ARCH/configs/w2v2_wrapper.py): same embeddings, loaded
    through WavJEPAForAudioEmbeddings.from_pretrained."""

    @classmethod
    def from_pretrained(cls, checkpoint_path: str = "", **kwargs) -> "HFWrapperModel":
        from wavjepa_tpu.api.hf import WavJEPAForAudioEmbeddings

        hf = WavJEPAForAudioEmbeddings.from_pretrained(checkpoint_path, **kwargs)
        return cls(hf.runtime)
