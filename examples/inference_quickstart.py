#!/usr/bin/env python
"""Minimal inference walkthrough: waveform → HEAR embeddings → HF surface.

Run: python examples/inference_quickstart.py [checkpoint]
(no checkpoint → random weights, shapes/latency still representative).
"""

import sys
from pathlib import Path

import numpy as np

# runnable from anywhere: put the repo root (this file's parent's parent)
# on sys.path when wavjepa_tpu isn't installed
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else ""

    # --- HEAR API (hear-eval-kit compatible) ---
    from wavjepa_tpu.api.runtime import (
        get_scene_embeddings,
        get_timestamp_embeddings,
        load_model,
    )

    model = load_model(ckpt)
    clip = np.random.default_rng(0).standard_normal((1, 160000)).astype(np.float32)
    emb, ts = get_timestamp_embeddings(clip, model)
    print(f"timestamp embeddings: {emb.shape}, first ts {ts[0, :3]} ms")
    scene = get_scene_embeddings(clip, model)
    print(f"scene embedding: {scene.shape}")

    # --- HF-parity surface (labhamlet/wavjepa-base contract) ---
    from wavjepa_tpu.api.hf import WavJEPAFeatureExtractor, WavJEPAForAudioEmbeddings

    hf = WavJEPAForAudioEmbeddings(model)
    inputs = WavJEPAFeatureExtractor()(clip[0])
    emb2, ts2 = hf(inputs)
    print(f"HF surface: {emb2.shape} embeddings, {ts2.shape} timestamps")


if __name__ == "__main__":
    main()
