"""HEAR model module backed by the HF-parity surface.

Counterpart of /root/reference/hear_configs/WavJEPA_huggingface.py:19-39
(scene embedding = time-mean of the model output). Useful when the
checkpoint is distributed in the Hub layout rather than as a training
checkpoint.
"""

import numpy as np

from wavjepa_tpu.api.hf import WavJEPAForAudioEmbeddings


def load_model(model_file_path: str = "", **kwargs):
    model = WavJEPAForAudioEmbeddings.from_pretrained(
        model_file_path,
        in_channels=kwargs.get("in_channels", 1),
        channel_wise=kwargs.get("channel_wise", False),
        model_size=kwargs.get("model_size", "base"),
    )
    model.sample_rate = model.runtime.sample_rate
    model.scene_embedding_size = model.runtime.scene_embedding_size
    model.timestamp_embedding_size = model.runtime.timestamp_embedding_size
    return model


def get_timestamp_embeddings(audio, model):
    return model(np.asarray(audio, np.float32))


def get_scene_embeddings(audio, model):
    emb, _ = model(np.asarray(audio, np.float32))
    return emb.mean(axis=1)
