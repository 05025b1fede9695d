"""Pallas fused self-attention for short sequences (TPU).

The WavJEPA workload is thousands of independent 200-token sequences with
per-sample key-padding masks. XLA materializes the (B, H, T, T) f32 logits
and saves them for backward — measured 2.34 GB *per decoder layer* at the
reference batch size (see bench OOM analysis in models/jepa.py). This kernel:

  * processes ONE BATCH ELEMENT per program with all H heads batched inside
    (head-batched dot_general) — at T=200, H=12 the f32 score block is
    12·200·200·4 B ≈ 1.9 MB, comfortably VMEM-resident. Packing heads keeps
    per-program work large enough to amortize pipeline overhead (a per-
    (batch·head) grid measured ~2.5× slower at head_dim 32);
  * computes scores → mask → softmax → PV without ever writing the score
    tile to HBM; no online-softmax machinery is needed at this T (classic
    flash attention solves a long-T problem this workload doesn't have);
  * defines a custom VJP whose backward *recomputes* the probabilities, so
    the only residuals are q, k, v, mask — O(B·H·T·d) instead of O(B·H·T²);
  * runs matmuls on the MXU with f32 accumulation and f32 softmax, returning
    activations in the input dtype (bf16 in training).

Used by ops/transformer.py when `attn_impl="pallas"` (auto-selected on TPU
backends); the einsum path remains for CPU tests and as a fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)

# head-batched dims for (H, T, d) operands
_SCORE_DIMS = (((2,), (2,)), ((0,), (0,)))  # q·kᵀ over d, batched over H
_PV_DIMS = (((2,), (1,)), ((0,), (0,)))  # p·v over keys, batched over H


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # operands stay in their input dtype (bf16 in training): the MXU runs
    # bf16×bf16→f32 at full rate, while f32×f32 runs ~8× slower. Scale is
    # applied to the f32 accumulator, not the inputs.
    q = q_ref[0]  # (H, T, d)
    k = k_ref[0]
    v = v_ref[0]
    s = scale * jax.lax.dot_general(
        q, k, _SCORE_DIMS, preferred_element_type=jnp.float32
    )  # (H, T, T) f32
    masked = mask_ref[0, 0, :]  # (T,) bool, True = ignore key
    s = jnp.where(masked[None, None, :], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, _PV_DIMS, preferred_element_type=jnp.float32
    )  # (H, T, d)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # recompute probabilities (cheaper than storing T×T per layer)
    s = scale * jax.lax.dot_general(
        q, k, _SCORE_DIMS, preferred_element_type=jnp.float32
    )
    masked = mask_ref[0, 0, :]
    s = jnp.where(masked[None, None, :], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)  # (H, T, T)

    # dv[h] = pᵀ[h] @ do[h]; dp[h] = do[h] @ vᵀ[h] — bf16 operands, f32 accum
    p_lo = p.astype(q.dtype)
    dv = jax.lax.dot_general(
        p_lo, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H, T_k, d)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H, T, T) f32
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp, f32
    ds_lo = ds.astype(q.dtype)
    dq = scale * jax.lax.dot_general(
        ds_lo, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = scale * jax.lax.dot_general(
        ds_lo, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _head_chunk(h: int, t: int, budget_bytes: int = 8 * 2**20) -> int:
    """Heads per program such that the f32 score intermediates (~4 live
    (hc, T, T) arrays in the backward) stay well under the ~16 MB VMEM
    scoped limit."""
    hc = h
    while hc > 1 and 4 * hc * t * t * 4 > budget_bytes:
        hc //= 2
    return hc


def _specs(hc: int, t: int, d: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv_spec = pl.BlockSpec(
        (1, hc, t, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    # mask is passed as (B, 1, T) so the trailing block dims (1, T) satisfy
    # the TPU tiling rule (block dims must divide 8/128 or equal the array's)
    mask_spec = pl.BlockSpec(
        (1, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
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
    hc = _head_chunk(h, t)
    qkv_spec, mask_spec = _specs(hc, t, d)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // hc),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v, mask[:, None, :])
    return out, (q, k, v, mask)


def _bwd(interpret, residuals, g):
    from jax.experimental import pallas as pl

    q, k, v, mask = residuals
    b, h, t, d = q.shape
    scale = 1.0 / (d**0.5)
    hc = _head_chunk(h, t, budget_bytes=4 * 2**20)
    qkv_spec, mask_spec = _specs(hc, t, d)
    kernel = functools.partial(_bwd_kernel, scale=scale)
    shape = jax.ShapeDtypeStruct((b, h, t, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h // hc),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, mask[:, None, :], g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
