"""Pallas fused self-attention for short sequences (TPU).

The WavJEPA workload is thousands of independent 200-token sequences
(B·heads up to 12k per step) with per-sample key-padding masks. XLA
materializes the (B, H, T, T) f32 logits and saves them for backward —
measured 2.34 GB *per decoder layer* at the reference batch size (see
bench OOM analysis in models/jepa.py). This kernel:

  * computes scores → mask → softmax → PV in ONE VMEM-resident program per
    (batch·head); at T=200 the whole f32 score tile is 160 kB — far under
    the 16 MB VMEM budget, so no streaming/online-softmax machinery is
    needed (classic flash attention solves a long-T problem we don't have);
  * defines a custom VJP whose backward *recomputes* the probabilities in a
    second kernel, so the only residuals are q, k, v, mask — O(B·H·T·d)
    instead of O(B·H·T²);
  * runs matmuls on the MXU with f32 accumulation, softmax in f32, and
    returns activations in the input dtype (bf16 in training).

Used by ops/transformer.py when `attn_impl="pallas"` (auto-selected on TPU
backends); the einsum path remains for CPU tests and as a fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (T, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, T)
    masked = mask_ref[0, 0, :]  # (T,) bool, True = ignore key
    s = jnp.where(masked[None, :], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    # recompute probabilities (cheaper than storing T×T per layer)
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    masked = mask_ref[0, 0, :]
    s = jnp.where(masked[None, :], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)  # (T, T)

    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, T)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax jvp
    dq = scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(bh: int, heads: int, t: int, d: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv_spec = pl.BlockSpec(
        (1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # mask is passed as (B, 1, T) so the trailing block dims (1, T) satisfy
    # the TPU tiling rule (block dims must divide 8/128 or equal the array's)
    mask_spec = pl.BlockSpec(
        (1, 1, t), lambda i: (i // heads, 0, 0), memory_space=pltpu.VMEM
    )
    return qkv_spec, mask_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, mask, interpret=False):
    """Fused masked self-attention.

    q, k, v: (B, H, T, d); mask: (B, T) bool, True = masked-out key.
    Returns (B, H, T, d) in q's dtype.
    """
    out, _ = _fwd(q, k, v, mask, interpret)
    return out


def _fwd(q, k, v, mask, interpret):
    from jax.experimental import pallas as pl

    b, h, t, d = q.shape
    scale = 1.0 / (d**0.5)
    qkv_spec, mask_spec = _specs(b * h, h, t, d)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(
        q.reshape(b * h, t, d),
        k.reshape(b * h, t, d),
        v.reshape(b * h, t, d),
        mask[:, None, :],
    )
    return out.reshape(b, h, t, d), (q, k, v, mask)


def _bwd(interpret, residuals, g):
    from jax.experimental import pallas as pl

    q, k, v, mask = residuals
    b, h, t, d = q.shape
    scale = 1.0 / (d**0.5)
    qkv_spec, mask_spec = _specs(b * h, h, t, d)
    kernel = functools.partial(_bwd_kernel, scale=scale)
    shape = jax.ShapeDtypeStruct((b * h, t, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(
        q.reshape(b * h, t, d),
        k.reshape(b * h, t, d),
        v.reshape(b * h, t, d),
        mask[:, None, :],
        g.reshape(b * h, t, d),
    )
    return (
        dq.reshape(b, h, t, d),
        dk.reshape(b, h, t, d),
        dv.reshape(b, h, t, d),
        None,
    )


flash_attention.defvjp(_fwd, _bwd)
