"""Pallas fused attention vs the einsum reference — forward and gradients
(interpret mode on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavjepa_tpu.ops.flash_attention import flash_attention
from wavjepa_tpu.ops.transformer import dot_product_attention, key_padding_bias


@pytest.mark.parametrize("head_dim", [32, 64])
def test_flash_attention_forward_matches_einsum(head_dim):
    rng = np.random.default_rng(0)
    b, h, t = 2, 3, 40
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, head_dim)), jnp.float32)
        for _ in range(3)
    )
    mask = jnp.asarray(rng.random((b, t)) < 0.3)

    out = flash_attention(q, k, v, mask, True)
    ref = dot_product_attention(q, k, v, bias=key_padding_bias(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_attention_grads_match_einsum():
    rng = np.random.default_rng(1)
    b, h, t, d = 2, 2, 24, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(3)
    )
    mask = jnp.asarray(rng.random((b, t)) < 0.25)
    g = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, True) * g)

    def loss_ref(q, k, v):
        return jnp.sum(
            dot_product_attention(q, k, v, bias=key_padding_bias(mask)) * g
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3)


def test_flash_attention_no_mask_is_plain_attention():
    rng = np.random.default_rng(2)
    b, h, t, d = 1, 2, 16, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(3)
    )
    mask = jnp.zeros((b, t), bool)
    out = flash_attention(q, k, v, mask, True)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
