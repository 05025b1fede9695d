"""Interpret-mode correctness of the projection-fused attention block kernel
(ops/fused_attention_block.py) against the einsum reference path: forward
values and every gradient (x, Wqkv, bqkv, Wo, bo) under a masked loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavjepa_tpu.ops.fused_attention_block import (
    fused_attention_block,
    pack_weights,
)


def einsum_reference(x, in_proj_k, in_proj_b, out_proj_k, out_proj_b, mask, heads):
    """The exact math of ops/transformer.py MultiHeadSelfAttention (einsum
    path, f32 softmax, -0.7*f32max mask bias)."""
    b, t, d = x.shape
    hd = d // heads
    qkv = x @ in_proj_k + in_proj_b
    q, k, v = jnp.split(qkv, 3, -1)
    q = q.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    scale = 1.0 / (hd**0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    neg = -0.7 * jnp.finfo(jnp.float32).max
    logits = jnp.where(mask[:, None, None, :], neg, logits)
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return o @ out_proj_k + out_proj_b


@pytest.mark.parametrize("b,t,d,heads", [(3, 16, 32, 4), (2, 24, 48, 3)])
def test_forward_matches_einsum(b, t, d, heads):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.3
    ipk = jnp.asarray(rng.standard_normal((d, 3 * d)), jnp.float32) * 0.1
    ipb = jnp.asarray(rng.standard_normal((3 * d,)), jnp.float32) * 0.1
    opk = jnp.asarray(rng.standard_normal((d, d)), jnp.float32) * 0.1
    opb = jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.1
    mask = jnp.asarray(rng.random((b, t)) < 0.3)

    ref = einsum_reference(x, ipk, ipb, opk, opb, mask, heads)
    wqkv, bqkv, wo = pack_weights(ipk, ipb, opk, heads)
    got = fused_attention_block(x, wqkv, bqkv, wo, opb[None], mask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_einsum():
    b, t, d, heads = 2, 16, 32, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.3
    ipk = jnp.asarray(rng.standard_normal((d, 3 * d)), jnp.float32) * 0.1
    ipb = jnp.asarray(rng.standard_normal((3 * d,)), jnp.float32) * 0.1
    opk = jnp.asarray(rng.standard_normal((d, d)), jnp.float32) * 0.1
    opb = jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.1
    mask = jnp.asarray(rng.random((b, t)) < 0.25)
    # weight the loss so the cotangent isn't uniform
    wloss = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)

    def loss_ref(x, ipk, ipb, opk, opb):
        return jnp.sum(wloss * einsum_reference(x, ipk, ipb, opk, opb, mask, heads))

    def loss_fused(x, ipk, ipb, opk, opb):
        wqkv, bqkv, wo = pack_weights(ipk, ipb, opk, heads)
        return jnp.sum(
            wloss * fused_attention_block(x, wqkv, bqkv, wo, opb[None], mask, True)
        )

    ref_val, ref_grads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, ipk, ipb, opk, opb
    )
    got_val, got_grads = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, ipk, ipb, opk, opb
    )
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-5)
    for name, gr, gg in zip(
        ("dx", "d_in_proj_k", "d_in_proj_b", "d_out_proj_k", "d_out_proj_b"),
        ref_grads,
        got_grads,
    ):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gr), rtol=5e-5, atol=5e-5, err_msg=name
        )


def test_fully_masked_row_stays_finite():
    """A row whose keys are ALL masked must yield finite output (uniform
    weights), matching key_padding_bias's -0.7*f32max convention."""
    b, t, d, heads = 1, 8, 16, 2
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    ipk = jnp.asarray(rng.standard_normal((d, 3 * d)), jnp.float32) * 0.1
    ipb = jnp.zeros((3 * d,), jnp.float32)
    opk = jnp.asarray(rng.standard_normal((d, d)), jnp.float32) * 0.1
    opb = jnp.zeros((d,), jnp.float32)
    mask = jnp.ones((b, t), bool)
    wqkv, bqkv, wo = pack_weights(ipk, ipb, opk, heads)
    out = fused_attention_block(x, wqkv, bqkv, wo, opb[None], mask, True)
    assert np.isfinite(np.asarray(out)).all()


def test_jepa_attn_impl_decoder_override_parity():
    """JEPAConfig.attn_impl_decoder='fused_block' (decoder-only override,
    the measured-useful deployment: 1.50x fwd at the packed decoder shape)
    must reproduce the all-einsum student_forward on identical params."""
    import dataclasses

    from wavjepa_tpu.masking import TimeInverseMaskConfig, time_inverse_block_masks
    from wavjepa_tpu.models.jepa import JEPA, JEPAConfig

    base = JEPAConfig(
        conv_spec=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        encoder_layers=2,
        encoder_dim=64,
        encoder_heads=4,
        decoder_layers=2,
        decoder_dim=32,
        decoder_heads=4,
        sample_rate=16000,
        process_seconds=0.201,
        average_top_k_layers=2,
        remat=False,
        attn_impl="einsum",
    )
    ref_model = JEPA(base)
    fused_model = JEPA(dataclasses.replace(base, attn_impl_decoder="fused_block"))
    params = ref_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, base.target_length)))[
        "params"
    ]
    rng = np.random.default_rng(7)
    audio = jnp.asarray(
        rng.normal(size=(2, 1, base.target_length)).astype(np.float32)
    )
    ctx, tgt, vis = time_inverse_block_masks(
        jax.random.PRNGKey(1),
        batch_size=2,
        n_times=base.total_patches,
        cfg=TimeInverseMaskConfig(),
    )
    feats = ref_model.apply({"params": params}, audio, method="encode_features")
    ref = ref_model.apply({"params": params}, feats, ctx, vis, method="student_forward")
    got = fused_model.apply(
        {"params": params}, feats, ctx, vis, method="student_forward"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_transformer_encoder_fused_block_parity():
    """Full TransformerEncoder: attn_impl='fused_block' must match the
    einsum path on identical params (CPU interpret mode auto-selected)."""
    from wavjepa_tpu.ops.transformer import TransformerEncoder

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 32)), jnp.float32) * 0.3
    mask = jnp.asarray(rng.random((2, 16)) < 0.25)
    kwargs = dict(num_layers=2, embed_dim=32, num_heads=4, mlp_dim=64)
    ref_mod = TransformerEncoder(**kwargs, attn_impl="einsum")
    fused_mod = TransformerEncoder(**kwargs, attn_impl="fused_block")
    params = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
    # identical param trees: fused declares the same in/out_proj kernels
    fused_params = fused_mod.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fused_params
    )
    ref = ref_mod.apply({"params": params}, x, key_padding_mask=mask)
    got = fused_mod.apply({"params": params}, x, key_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
