"""VERDICT r4 #8: put a measured number on the attention-logit wall.

The 5.4 TF/s batched-small-matmul logits op (12288 × (200·32)@(32·200),
bf16) bounds SSL at 47% MFU and Nat at 39%. This script measures, on the
real chip, every lever that could move it and the structural floor that
says whether it is worth moving:

  1. the logits einsum alone, and the AV einsum alone, at the shipped
     decoder shape (B=1024, H=12, T=200, d=32);
  2. the full XLA attention core (logits → softmax → AV) fwd and fwd+bwd —
     what the training step actually pays per decoder call;
  3. the head-batched Pallas fused core (ops/flash_attention.py) fwd and
     fwd+bwd — the "grouped kernel amortizing issue overhead" candidate,
     which also deletes the (B,H,T,T) HBM round-trip entirely;
  4. "fewer, fatter" cross-batch matmuls: group G batch elements, stack
     their keys along N → one (200, 32)@(32, G·200) matmul per group
     member computes G× the FLOPs (only the diagonal blocks are useful)
     but presents the MXU with a G×-fatter N. Useful-rate = achieved/G.
     Swept over G ∈ {2, 4, 8};
  5. head-dim zero-padding d=32 → 64/128: pure diagnostic — if time is
     flat, the op is issue/bandwidth-bound, not FLOP-bound.

Bandwidth arithmetic this tests against (v5e: 819 GB/s HBM, 197 bf16
TF/s): the logits op reads Q+K (157 MB) and writes bf16 logits (983 MB) —
arithmetic intensity ~24 FLOP/B, 10× below the ~240 FLOP/B compute-bound
balance point. A perfect-BW logits op is therefore capped at ~19.7 TF/s;
the question is how much of the 5.4 → 19.7 gap is recoverable and what
that is worth at the step level.

Reference workload: 12-head d=32/64 SDPA at T=200/400
(/root/reference/wavjepa/jepa.py:422-440).

Run on the TPU: python scripts/profile_logit_wall.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from scripts._timing import timeit

import os

B = int(os.environ.get("B", "1024"))  # tiny B for CPU smoke runs
H, T, D = 12, 200, 32
DTYPE = jnp.bfloat16


def tf_s(flops, dt):
    return flops / dt / 1e12


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, T, D), DTYPE)
    k = jax.random.normal(kk, (B, H, T, D), DTYPE)
    v = jax.random.normal(kv, (B, H, T, D), DTYPE)

    logit_flops = 2 * B * H * T * D * T  # 31.5 GFLOP
    core_flops = 2 * logit_flops  # + the AV matmul (same shape)

    print(f"shape B={B} H={H} T={T} d={D} bf16; logits {logit_flops/1e9:.1f} GFLOP")

    # -- 1. the two einsums alone ------------------------------------------
    dt = timeit(
        "logits einsum bhqd,bhkd->bhqk",
        lambda c, q, k: jnp.einsum("bhqd,bhkd->bhqk", q + c.astype(DTYPE), k),
        (q, k),
    )
    print(f"    -> {tf_s(logit_flops, dt):.1f} TF/s")

    p = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32), axis=-1
    ).astype(DTYPE)
    p = jax.block_until_ready(p)
    dt = timeit(
        "AV einsum bhqk,bhkd->bhqd",
        lambda c, p, v: jnp.einsum("bhqk,bhkd->bhqd", p + c.astype(DTYPE), v),
        (p, v),
    )
    print(f"    -> {tf_s(logit_flops, dt):.1f} TF/s")

    # -- 2. the full XLA core, fwd and fwd+bwd ------------------------------
    def xla_core(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (1.0 / D**0.5)
        w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(DTYPE)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    dt = timeit(
        "XLA core fwd (logits+softmax+AV)",
        lambda c, q, k, v: xla_core(q + c.astype(DTYPE), k, v),
        (q, k, v),
    )
    print(f"    -> {tf_s(core_flops, dt):.1f} TF/s")

    def core_loss(q, k, v):
        return jnp.sum(jnp.square(xla_core(q, k, v).astype(jnp.float32)))

    grad_core = jax.grad(core_loss, argnums=(0, 1, 2))
    dt = timeit(
        "XLA core fwd+bwd",
        # returning the grads themselves keeps the backward alive (r2 trap)
        lambda c, q, k, v: grad_core(q + c.astype(DTYPE), k, v),
        (q, k, v),
    )
    print(f"    -> {tf_s(3.5 * core_flops, dt):.1f} TF/s (fwd+bwd ~3.5x fwd FLOPs)")

    # -- 3. the head-batched Pallas fused core ------------------------------
    from wavjepa_tpu.ops.flash_attention import flash_attention

    mask = jnp.zeros((B, T), bool)
    dt = timeit(
        "pallas fused core fwd",
        lambda c, q, k, v: flash_attention(q + c.astype(DTYPE), k, v, mask),
        (q, k, v),
    )
    print(f"    -> {tf_s(core_flops, dt):.1f} TF/s")

    def pallas_loss(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, mask).astype(jnp.float32)))

    grad_pallas = jax.grad(pallas_loss, argnums=(0, 1, 2))
    dt = timeit(
        "pallas fused core fwd+bwd",
        lambda c, q, k, v: grad_pallas(q + c.astype(DTYPE), k, v),
        (q, k, v),
    )
    print(f"    -> {tf_s(3.5 * core_flops, dt):.1f} TF/s")

    # -- 4. fewer, fatter: cross-batch key stacking -------------------------
    for g in (2, 4, 8):
        # (B/g, H, g*T, d) @ (B/g, H, d, g*T): each query block sees the g
        # stacked key blocks of its group — g x the FLOPs (only the diagonal
        # blocks are useful) but g x fatter M and N for the MXU.
        kg = (
            k.reshape(B // g, g, H, T, D)
            .transpose(0, 2, 4, 1, 3)  # (B/g, H, d, g, T)
            .reshape(B // g, H, D, g * T)
        )
        qh = q.reshape(B // g, g, H, T, D).transpose(0, 2, 1, 3, 4).reshape(
            B // g, H, g * T, D
        )
        dt = timeit(
            f"fat logits G={g} ({g*T}x{D}x{g*T})",
            lambda c, qh, kg: jnp.einsum(
                "bhqd,bhdk->bhqk", qh + c.astype(DTYPE), kg
            ),
            (qh, kg),
        )
        achieved = tf_s(g * logit_flops, dt)
        print(
            f"    -> raw {achieved:.1f} TF/s, USEFUL {achieved/g:.1f} TF/s"
            f" ({g}x block-diagonal waste)"
        )

    # -- 5. head-dim padding diagnostic -------------------------------------
    for d_pad in (64, 128):
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, d_pad - D)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, d_pad - D)))
        dt = timeit(
            f"logits einsum d padded to {d_pad}",
            lambda c, qp, kp: jnp.einsum(
                "bhqd,bhkd->bhqk", qp + c.astype(DTYPE), kp
            ),
            (qp, kp),
        )
        print(
            f"    -> useful {tf_s(logit_flops, dt):.1f} TF/s"
            f" (flat time = issue/BW-bound, not FLOP-bound)"
        )


if __name__ == "__main__":
    main()
