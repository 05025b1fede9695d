"""WavJEPA-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for waveform
joint-embedding predictive architectures.

Re-designed from scratch with the capabilities of the reference WavJEPA
framework (labhamlet/wavjepa): self-supervised audio representation learning
on raw waveforms with block masking and an EMA teacher, multi-channel
naturalistic-scene pretraining (WavJEPA-Nat), denoising distillation, a HEAR
inference API, and downstream evaluation harnesses.

Everything on the compute path is built TPU-first:
  * static shapes end-to-end (masking is a fixed-shape, key-driven sampler
    that runs *inside* the jitted train step instead of in CPU workers),
  * bf16 matmuls on the MXU with f32 accumulation and f32 norms/EMA,
  * one fused XLA graph per train step (crop gather, instance norm, mask
    sampling, student/teacher forward, loss, AdamW, EMA),
  * data parallelism via `jax.sharding.Mesh` + NamedSharding (ICI
    collectives inserted by XLA), multi-host ready,
  * Pallas kernels for the hot ops (fused attention over 200-token
    sequences with per-sample key-padding masks).
"""

__version__ = "0.1.0"

from wavjepa_tpu.models.jepa import JEPA, JEPAConfig  # noqa: F401
