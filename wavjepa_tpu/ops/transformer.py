"""Transformer encoder stack (flax.linen), numerics-compatible with the
reference's PyTorch post-norm ``nn.TransformerEncoderLayer`` /
``nn.TransformerEncoder`` (used at /root/reference/wavjepa/jepa.py:126-130 with
batch_first=True, norm_first=False, GELU(exact), eps=1e-6, dropout=0).

Design notes (TPU-first):
  * Static shapes: per-sample key-padding masks are additive bias tensors, so
    varying context sets never change tensor shapes.
  * Mixed precision follows flax convention: params stay ``param_dtype``
    (f32), compute runs in ``dtype`` (bf16 on TPU) with f32 LayerNorm and f32
    softmax for stability; matmuls accumulate in f32 on the MXU via
    ``preferred_element_type``.
  * Attention is one fused einsum pair at seq-len 200; a Pallas
    flash-attention kernel can be slotted in via ``attn_impl='pallas'`` once
    sequences grow (the full 200x200 score tile already fits VMEM).
  * QKV projections are stored packed — one (D, 3D) matmul — mirroring
    torch's ``in_proj_weight`` packing, which both maximizes MXU utilization
    and makes checkpoint conversion a transpose.
"""

from __future__ import annotations

from typing import Optional

from jax.ad_checkpoint import checkpoint_name

import jax
import jax.numpy as jnp
from flax import linen as nn


def resolve_attn_impl(impl: str) -> str:
    """'auto' → 'einsum'.

    Measured on v5e (full base model, batch 256 crops, remat on), full train
    step: einsum with bf16-stored logits 1622 ms; jax.nn SDPA 1767 ms (keeps
    f32 logits internally); head-packed Pallas kernel 2471 ms — at T=200 /
    head_dim 32-64 the workload is small-matmul latency/traffic-bound, where
    XLA's batched-dot pipelining plus bf16 logits is the best found. The
    Pallas kernel (ops/flash_attention.py) remains for long-sequence
    inference (e.g. whole-clip T=999), where the (B, H, T, T) logits XLA
    materializes stop fitting HBM; select it with attn_impl='pallas'."""
    if impl != "auto":
        return impl
    return "einsum"


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.float32,
    layout: str = "bhtd",
) -> jax.Array:
    """Multi-head attention core. q,k,v in the given layout ("bhtd" =
    (B, H, T, hd), "bthd" = (B, T, H, hd) — measured identical step time on
    v5e at the packed bench config: XLA re-lays-out inside the fusions
    either way, so the layout choice is free). bias broadcastable to
    (B, H, T, T), added to logits (use -inf/large-negative to mask keys).

    Logits are STORED in the io dtype (bf16 in training) — same as torch
    autocast, where the QK^T matmul emits bf16 and softmax upcasts — which
    halves the (B, H, T, T) HBM traffic. The MXU still accumulates in f32;
    softmax math runs in f32 (the upcast fuses into the softmax pass);
    the −0.7·f32max mask bias stays finite in bf16 (see key_padding_bias).
    (Measured: forcing bf16 materialization of the logits with an
    optimization_barrier before the f32 softmax is 1.5% SLOWER.)
    """
    qk_sub, av_sub = {
        "bhtd": ("bhqd,bhkd->bhqk", "bhqk,bhkd->bhqd"),
        "bthd": ("bqhd,bkhd->bhqk", "bhqk,bkhd->bqhd"),
    }[layout]
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(head_dim).astype(q.dtype)
    logits = jnp.einsum(qk_sub, q * scale, k)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    # named so a remat policy can keep the probabilities as residuals: the
    # backward then skips the logits+softmax recompute entirely (see
    # TransformerEncoder.remat_save_probs), at (B·H·T·T) bf16 of memory
    weights = checkpoint_name(weights, "attn_probs")
    return jnp.einsum(
        av_sub, weights, v, preferred_element_type=jnp.float32
    ).astype(dtype)


def key_padding_bias(
    key_padding_mask: jax.Array, dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """(B, T) bool mask (True = ignore that key) → (B, 1, 1, T) additive bias.

    Uses −0.7·f32max (the TPU flash-attention convention) rather than −inf or
    −f32max: it stays FINITE after the cast to bf16 logits (−f32max rounds to
    −inf in bf16, which would turn a fully-masked row — possible under the
    speech masker's small-run filtering — into softmax NaNs that poison the
    whole gradient), while exp(−0.7·f32max − m) still underflows to exactly 0
    for every masked key, so results are unchanged. A fully-masked row yields
    uniform weights; inference padding rows are discarded by callers.
    """
    neg = jnp.asarray(-0.7 * jnp.finfo(jnp.float32).max, dtype=dtype)
    return jnp.where(key_padding_mask[:, None, None, :], neg, jnp.zeros((), dtype))


class _DenseParams(nn.Module):
    """Declares kernel/bias with nn.Dense's exact param tree (name, shapes,
    default initializers) WITHOUT computing x @ kernel — the fused-block
    kernel consumes the raw weights (per-head relayout) instead of the Dense
    forward, but checkpoints must stay interchangeable with the einsum path."""

    features_in: int
    features_out: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features_out,), self.param_dtype
        )
        return kernel, bias


class MultiHeadSelfAttention(nn.Module):
    """Packed-QKV multi-head self-attention matching torch MHA numerics.

    attn_impl:
      * "einsum" — two einsums + f32 softmax (XLA fuses; used on CPU)
      * "pallas" — fused VMEM-resident attention core with
        recompute-in-backward (ops/flash_attention.py); requires TPU
      * "fused_block" — ONE Pallas kernel for QKV proj → attention → out
        proj (ops/fused_attention_block.py), deleting the head-layout
        copies and inter-fusion HBM traffic; interpret-mode on CPU
    """

    embed_dim: int
    num_heads: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        d, h = self.embed_dim, self.num_heads
        head_dim = d // h
        if self.attn_impl == "fused_block":
            from wavjepa_tpu.ops.fused_attention_block import (
                fused_attention_block,
                pack_weights,
            )

            assert self.use_bias, "fused_block assumes biased projections"
            ipk, ipb = _DenseParams(d, 3 * d, self.param_dtype, name="in_proj")()
            opk, opb = _DenseParams(d, d, self.param_dtype, name="out_proj")()
            wqkv, bqkv, wo = pack_weights(
                ipk.astype(self.dtype), ipb.astype(self.dtype),
                opk.astype(self.dtype), h,
            )
            mask = (
                key_padding_mask
                if key_padding_mask is not None
                else jnp.zeros((x.shape[0], x.shape[1]), bool)
            )
            return fused_attention_block(
                x.astype(self.dtype), wqkv, bqkv, wo,
                opb[None].astype(self.dtype), mask,
                # interpret on CPU hosts only; the tunneled TPU backend
                # reports platform "axon", which compiles Pallas natively
                jax.default_backend() == "cpu",
            )
        qkv = nn.Dense(
            3 * d,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="in_proj",
        )(x)
        b, t, _ = qkv.shape
        q, k, v = (a.reshape(b, t, h, head_dim) for a in jnp.split(qkv, 3, -1))
        if self.attn_impl == "sdpa":
            valid = (
                ~key_padding_mask[:, None, None, :]
                if key_padding_mask is not None
                else None
            )
            out = jax.nn.dot_product_attention(
                q, k, v, mask=valid, implementation="xla"
            )
        elif self.attn_impl == "einsum_bthd":
            out = dot_product_attention(
                q, k, v, bias=bias, dtype=self.dtype, layout="bthd"
            )
        elif self.attn_impl == "pallas":
            from wavjepa_tpu.ops.flash_attention import flash_attention

            mask = (
                key_padding_mask
                if key_padding_mask is not None
                else jnp.zeros((b, t), bool)
            )
            out = flash_attention(
                *(a.transpose(0, 2, 1, 3) for a in (q, k, v)), mask
            ).transpose(0, 2, 1, 3)
        else:
            out = dot_product_attention(
                *(a.transpose(0, 2, 1, 3) for a in (q, k, v)),
                bias=bias,
                dtype=self.dtype,
            ).transpose(0, 2, 1, 3)
        return nn.Dense(
            d,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="out_proj",
        )(out.reshape(b, t, d))


class LayerNorm32(nn.Module):
    """LayerNorm computed in f32 regardless of activation dtype (eps 1e-6 to
    match the reference's TransformerLayerCFG, wavjepa_configs.py:38)."""

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), self.param_dtype)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(orig_dtype if self.dtype is None else self.dtype)


class TransformerEncoderLayer(nn.Module):
    """Post-norm block: x = LN1(x + SA(x)); x = LN2(x + MLP(x)).

    Exact-GELU MLP, matching torch's ``activation=nn.GELU()`` default
    (approximate='none').
    """

    embed_dim: int
    num_heads: int
    mlp_dim: int
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        attn = MultiHeadSelfAttention(
            self.embed_dim,
            self.num_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            name="self_attn",
        )(x, bias=bias, key_padding_mask=key_padding_mask)
        # named for the remat policy: saving attention outputs lets the
        # backward replay skip re-running attention forward entirely — the
        # Pallas kernel's custom VJP already recomputes its own probabilities
        # from (q, k, v), so storing the (B, T, D) output is all that's
        # needed (1.9 GB decoder-wide vs 28 GB for T x T residuals).
        attn = checkpoint_name(attn, "attn_out")
        x = LayerNorm32(
            eps=self.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm1",
        )(x + attn)
        h = nn.Dense(
            self.mlp_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear1"
        )(x)
        # exact GELU in the compute dtype — torch autocast bf16 runs GELU in
        # bf16 too (only norms/softmax are f32-exempt), and the f32 upcast
        # would double the largest MLP temporaries on TPU
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear2"
        )(h)
        x = LayerNorm32(
            eps=self.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm2",
        )(x + h)
        return x


class TransformerEncoder(nn.Module):
    """Stack of post-norm layers + final LayerNorm (torch ``norm=`` argument).

    ``__call__`` returns the normed output; ``layer_outputs`` additionally
    returns every layer's (pre-final-norm) output, which the JEPA teacher
    averages over its top-k layers (reference jepa.py:255-270 iterates raw
    layers and never applies the final norm nor the padding mask).
    """

    num_layers: int
    embed_dim: int
    num_heads: int
    mlp_dim: int
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # additionally keep the (B, H, T, T) attention probabilities as remat
    # residuals — backward skips the logits+softmax replay (~100 ms/step at
    # the packed bench config) for B·H·T·T bf16 extra HBM
    remat_save_probs: bool = False
    attn_impl: str = "einsum"

    def setup(self):
        layer = TransformerEncoderLayer
        if self.remat:
            names = ("attn_out", "attn_probs") if self.remat_save_probs else (
                "attn_out",
            )
            layer = nn.remat(
                TransformerEncoderLayer,
                policy=jax.checkpoint_policies.save_only_these_names(*names),
            )
        self.layers = [
            layer(
                self.embed_dim,
                self.num_heads,
                self.mlp_dim,
                layer_norm_eps=self.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attn_impl=self.attn_impl,
                name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = LayerNorm32(
            eps=self.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm",
        )

    def __call__(
        self,
        x: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        bias = (
            key_padding_bias(key_padding_mask, dtype=jnp.float32)
            if key_padding_mask is not None and self.attn_impl not in ("pallas", "sdpa", "fused_block")
            else None
        )
        for layer in self.layers:
            x = layer(x, bias=bias, key_padding_mask=key_padding_mask)
        return self.norm(x)

    def layer_outputs(
        self,
        x: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
    ) -> list[jax.Array]:
        """All per-layer outputs (no final norm), for teacher target making."""
        bias = (
            key_padding_bias(key_padding_mask, dtype=jnp.float32)
            if key_padding_mask is not None and self.attn_impl not in ("pallas", "sdpa", "fused_block")
            else None
        )
        outs = []
        for layer in self.layers:
            x = layer(x, bias=bias, key_padding_mask=key_padding_mask)
            outs.append(x)
        return outs
