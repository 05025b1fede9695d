"""Projection-fused attention block: QKV proj → heads → softmax(QKᵀ)V → out
proj in ONE Pallas kernel (TPU), with a custom VJP whose backward is a second
fused kernel that recomputes the probabilities.

Why (VERDICT r2 #1a / PERF.md): at the packed WavJEPA shapes (decoder
T=128 d=384, encoder T=88-96 d=768, teacher T=200 d=768; 12 heads of 32/64)
the attention core is at the per-(batch·head) MXU-issue floor — no kernel
beats XLA's batched einsum on the core alone (measured round 1-2). What a
kernel CAN delete is everything AROUND the core: the profiled ~53 ms/step of
head-split/merge layout copies, the HBM round-trips of qkv/probs/attn-out
between XLA fusions, and the per-op dispatch — by keeping the whole block
(x → qkv → per-head attention → out-projection) VMEM-resident per batch row.

Design:
  * per-head weight layout: Wqkv is passed as (H, D, 3·hd) — column blocks
    [Wq_h | Wk_h | Wv_h] — and Wo as (H, hd, D) row blocks, so the kernel
    never transposes or re-lays-out activations: every op is a plain 2-D
    matmul + lane-dim slice of a fresh VMEM value. The relayout from the
    flax (D, 3D)/(D, D) parameters happens once per step in XLA (a few µs).
  * one batch row per program, heads unrolled (H·4 small matmuls back-to-back
    from VMEM — the MXU-issue floor without any memory stalls between).
  * f32 accumulation on the MXU (bf16 operands), f32 softmax, f32 out
    accumulator; activations returned in the input dtype.
  * backward recomputes qkv/probs from (x, weights) — residuals are just the
    kernel inputs, O(B·T·D) — and accumulates weight grads in f32 output
    blocks that persist across the sequential grid (constant index_map).
  * key-padding masks (packed-slot validity) enter as a (B, T) bool array,
    applied as −inf before the softmax, exactly like ops/flash_attention.py.

Used by ops/transformer.py via ``attn_impl="fused_block"``. Falls back to
interpret mode on CPU (tests/test_fused_attention_block.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# -0.7*f32max, not -inf/-f32max: a fully-masked row (possible under the
# speech masker) must yield uniform weights, not NaNs (see
# ops/transformer.py:key_padding_bias)
NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, mask_ref, o_ref,
                *, heads: int, head_dim: int, scale: float):
    x = x_ref[0]  # (T, D) bf16
    t, d = x.shape
    masked = mask_ref[0, 0, :]  # (T,) bool, True = ignore key
    acc = jnp.zeros((t, d), jnp.float32)
    for h in range(heads):
        qkv_h = (
            jax.lax.dot(x, wqkv_ref[h], preferred_element_type=jnp.float32)
            + bqkv_ref[h].astype(jnp.float32)
        ).astype(x.dtype)  # (T, 3·hd)
        q_h = qkv_h[:, :head_dim]
        k_h = qkv_h[:, head_dim : 2 * head_dim]
        v_h = qkv_h[:, 2 * head_dim :]
        s = scale * jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, T) f32
        s = jnp.where(masked[None, :], NEG_BIG, s)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o_h = jax.lax.dot(p, v_h, preferred_element_type=jnp.float32).astype(x.dtype)
        acc = acc + jax.lax.dot(o_h, wo_ref[h], preferred_element_type=jnp.float32)
    o_ref[0] = (acc + bo_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, mask_ref, g_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                *, heads: int, head_dim: int, scale: float):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros(dwqkv_ref.shape, dwqkv_ref.dtype)
        dbqkv_ref[...] = jnp.zeros(dbqkv_ref.shape, dbqkv_ref.dtype)
        dwo_ref[...] = jnp.zeros(dwo_ref.shape, dwo_ref.dtype)
        dbo_ref[...] = jnp.zeros(dbo_ref.shape, dbo_ref.dtype)

    x = x_ref[0]  # (T, D)
    t, d = x.shape
    masked = mask_ref[0, 0, :]
    g = g_ref[0]  # (T, D) upstream cotangent
    g_lo = g.astype(x.dtype)
    dx_acc = jnp.zeros((t, d), jnp.float32)
    dbo_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    for h in range(heads):
        # --- recompute forward intermediates for this head ---
        qkv_h = (
            jax.lax.dot(x, wqkv_ref[h], preferred_element_type=jnp.float32)
            + bqkv_ref[h].astype(jnp.float32)
        ).astype(x.dtype)
        q_h = qkv_h[:, :head_dim]
        k_h = qkv_h[:, head_dim : 2 * head_dim]
        v_h = qkv_h[:, 2 * head_dim :]
        s = scale * jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(masked[None, :], NEG_BIG, s)
        p = jax.nn.softmax(s, axis=-1)  # (T, T) f32
        p_lo = p.astype(x.dtype)
        o_h = jax.lax.dot(p_lo, v_h, preferred_element_type=jnp.float32).astype(
            x.dtype
        )

        # --- out-projection grads: out += o_h @ Wo_h ---
        dwo_ref[h] += jax.lax.dot_general(
            o_h, g_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (hd, D)
        do_h = jax.lax.dot_general(
            g_lo, wo_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (T, hd)

        # --- attention core grads (recompute-style, as flash bwd) ---
        dv_h = jax.lax.dot_general(
            p_lo, do_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, hd)
        dp = jax.lax.dot_general(
            do_h, v_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, T)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_lo = ds.astype(x.dtype)
        dq_h = scale * jax.lax.dot(
            ds_lo, k_h, preferred_element_type=jnp.float32
        )  # (T, hd)
        dk_h = scale * jax.lax.dot_general(
            ds_lo, q_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, hd)

        # --- input-projection grads ---
        dqkv_h = jnp.concatenate(
            [dq_h, dk_h, dv_h], axis=1
        ).astype(x.dtype)  # (T, 3·hd)
        dbqkv_ref[h] += jnp.sum(
            dqkv_h.astype(jnp.float32), axis=0, keepdims=True
        )
        dwqkv_ref[h] += jax.lax.dot_general(
            x, dqkv_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (D, 3·hd)
        dx_acc = dx_acc + jax.lax.dot_general(
            dqkv_h, wqkv_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, D)
    dx_ref[0] = dx_acc.astype(dx_ref.dtype)


def _specs(heads, t, d, hd):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def const(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return {
        "x": x_spec,
        "wqkv": const(heads, d, 3 * hd),
        "bqkv": const(heads, 1, 3 * hd),
        "wo": const(heads, hd, d),
        "bo": const(1, d),
        "mask": mask_spec,
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_attention_block(x, wqkv, bqkv, wo, bo, mask, interpret=False):
    """x: (B, T, D); wqkv: (H, D, 3·hd); bqkv: (H, 1, 3·hd); wo: (H, hd, D);
    bo: (1, D); mask: (B, T) bool (True = masked-out key).
    Returns (B, T, D) = OutProj(MHSA(QKVProj(x))) in x's dtype."""
    out, _ = _fwd(x, wqkv, bqkv, wo, bo, mask, interpret)
    return out


def _fwd(x, wqkv, bqkv, wo, bo, mask, interpret):
    from jax.experimental import pallas as pl

    b, t, d = x.shape
    heads, _, hd3 = wqkv.shape
    hd = hd3 // 3
    specs = _specs(heads, t, d, hd)
    kernel = functools.partial(
        _fwd_kernel, heads=heads, head_dim=hd, scale=1.0 / (hd**0.5)
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[specs["x"], specs["wqkv"], specs["bqkv"], specs["wo"],
                  specs["bo"], specs["mask"]],
        out_specs=specs["x"],
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv, wo, bo, mask[:, None, :])
    return out, (x, wqkv, bqkv, wo, bo, mask)


def _bwd(interpret, residuals, g):
    from jax.experimental import pallas as pl

    x, wqkv, bqkv, wo, bo, mask = residuals
    b, t, d = x.shape
    heads, _, hd3 = wqkv.shape
    hd = hd3 // 3
    specs = _specs(heads, t, d, hd)
    kernel = functools.partial(
        _bwd_kernel, heads=heads, head_dim=hd, scale=1.0 / (hd**0.5)
    )
    dx, dwqkv, dbqkv, dwo, dbo = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[specs["x"], specs["wqkv"], specs["bqkv"], specs["wo"],
                  specs["mask"], specs["x"]],
        out_specs=(specs["x"], specs["wqkv"], specs["bqkv"], specs["wo"],
                   specs["bo"]),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct(bqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct(wo.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        interpret=interpret,
    )(x, wqkv, bqkv, wo, mask[:, None, :], g)
    return (
        dx,
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwo.astype(wo.dtype),
        dbo.astype(bo.dtype),
        None,
    )


fused_attention_block.defvjp(_fwd, _bwd)


def pack_weights(in_proj_kernel, in_proj_bias, out_proj_kernel, heads: int):
    """flax (D, 3D) packed-QKV kernel + (3D,) bias + (D, D) out kernel →
    the kernel's per-head layouts ((H, D, 3·hd), (H, 1, 3·hd), (H, hd, D)).
    Pure reshapes/transposes — XLA folds them into the surrounding step."""
    d = in_proj_kernel.shape[0]
    hd = d // heads
    wq, wk, wv = jnp.split(in_proj_kernel, 3, axis=1)  # (D, D) each

    def heads_of(w):  # (D, D) → (H, D, hd)
        return w.reshape(d, heads, hd).transpose(1, 0, 2)

    wqkv = jnp.concatenate(
        [heads_of(wq), heads_of(wk), heads_of(wv)], axis=-1
    )  # (H, D, 3·hd)
    bq, bk, bv = jnp.split(in_proj_bias, 3)

    def bias_of(bias):  # (D,) → (H, 1, hd)
        return bias.reshape(heads, 1, hd)

    bqkv = jnp.concatenate([bias_of(bq), bias_of(bk), bias_of(bv)], axis=-1)
    wo = out_proj_kernel.reshape(heads, hd, d)
    return wqkv, bqkv, wo
