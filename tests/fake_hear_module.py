"""A minimal HEAR-API module used by the eval-harness tests: embeddings are
simple spectral features of the waveform, so probe tasks built on distinct
tones are linearly separable."""

import numpy as np

SR = 1000
EMB_DIM = 8
HOP_MS = 100.0


class FakeModel:
    sample_rate = SR
    scene_embedding_size = EMB_DIM
    timestamp_embedding_size = EMB_DIM


def load_model(model_file_path: str = "", **kwargs):
    return FakeModel()


def _frame_embeddings(audio: np.ndarray):
    """(B, T) → (B, S, E) goertzel-ish band energies per 100 ms frame."""
    b, t = audio.shape
    hop = int(SR * HOP_MS / 1000)
    n_frames = max(1, t // hop)
    frames = audio[:, : n_frames * hop].reshape(b, n_frames, hop)
    spec = np.abs(np.fft.rfft(frames, axis=-1))[:, :, : EMB_DIM * 4]
    emb = spec.reshape(b, n_frames, EMB_DIM, -1).mean(-1)
    return emb.astype(np.float32)


def get_timestamp_embeddings(audio, model):
    audio = np.asarray(audio, np.float32)
    emb = _frame_embeddings(audio)
    n_frames = emb.shape[1]
    ts = (np.arange(n_frames) * HOP_MS + HOP_MS / 2).astype(np.float64)
    return emb, np.tile(ts[None], (audio.shape[0], 1))


def get_scene_embeddings(audio, model):
    emb, _ = get_timestamp_embeddings(audio, model)
    return emb.mean(axis=1)
