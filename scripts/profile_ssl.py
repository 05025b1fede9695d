"""Re-profile the shipped accum-16 SSL step (VERDICT r3 #4): per-phase op
budget of the CURRENT 500 ms graph + accum-sweep shape explanation.
Hoist-proof chained loops; closures via host fetch."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from wavjepa_tpu.models.jepa import JEPA
from wavjepa_tpu.train.config import Config
from wavjepa_tpu.train.state import TrainState
from wavjepa_tpu.train.step import (
    OptimizerConfig, jepa_loss_fn, make_jepa_train_step, make_optimizer,
)
from wavjepa_tpu.masking import TimeInverseMaskConfig, time_inverse_block_masks
from wavjepa_tpu.ops.audio import instance_normalize, random_crops

cfg = Config()
cfg.trainer.batch_size = 32
model_cfg = cfg.build_model_config()
accum = cfg.resolved_accum_steps()
print("accum:", accum, "pack:", model_cfg.pack_encoder, model_cfg.pack_decoder,
      "remat c/e/d:", model_cfg.remat_conv, model_cfg.remat_encoder,
      model_cfg.remat_decoder, flush=True)
model = JEPA(model_cfg)
params = model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, 1, model_cfg.target_length))
)["params"]
tx, sched = make_optimizer(cfg.optimizer)
state = TrainState.create(params, tx)

B, S = 32, 8
audio = jnp.asarray(
    np.random.default_rng(0).standard_normal((B, 1, 160000)), jnp.float32)

from scripts._timing import timeit, time_steps

# materialize crops + masks once (256 crops)
def prep(x):
    crops = random_crops(jax.random.PRNGKey(0), x, model_cfg.target_length, S)
    crops = instance_normalize(crops, axis=(-2, -1))
    b, s, c, l = crops.shape
    return crops.reshape(b * s, c, l).astype(model_cfg.dtype)
crops = jax.jit(prep)(audio)
mcfg = TimeInverseMaskConfig()
ctx, tgt, vis = jax.jit(lambda k: time_inverse_block_masks(
    k, batch_size=B * S, n_times=model_cfg.total_patches, in_channels=1,
    cfg=mcfg))(jax.random.PRNGKey(1))
# canonicalize for packing like the step does
if model_cfg.pack_encoder is not None:
    over = jnp.cumsum(~ctx, axis=-1) > model_cfg.pack_encoder
    ctx = ctx | over
    vis = jnp.logical_xor(ctx[:, None, :], tgt)
print("crops:", crops.shape, flush=True)

# per-microbatch grads at mb sizes (accum 8/16/32 -> mb 32/16/8).
# Params/teacher are jit ARGUMENTS (closures inline them as HLO constants
# and the remote AOT helper rejects the oversized request with HTTP 413).
def grad_at(mb):
    def fn(c, p0, teacher, crops_mb, ctx_mb, tgt_mb, vis_mb):
        def num_fn(p):
            num, den = jepa_loss_fn(
                model, p, teacher, crops_mb + c, ctx_mb, tgt_mb,
                vis_mb, return_terms=True)
            return num, den
        (num, den), g = jax.value_and_grad(num_fn, has_aux=True)(p0)
        return g  # return the grad tree (DCE-proof)
    return timeit(
        f"fwd+bwd microbatch (mb={mb})", fn,
        (state.params, state.teacher_encoder,
         crops[:mb], ctx[:mb], tgt[:mb], vis[:mb]))

t_mb = {}
for mb in (8, 16, 32):
    t_mb[mb] = grad_at(mb)

# teacher+student fwd only at mb=16 (what part of mb cost is fwd?)
def fwd_fn(c, p, teacher, crops_mb, ctx_mb, tgt_mb, vis_mb):
    num, den = jepa_loss_fn(
        model, p, teacher, crops_mb + c, ctx_mb,
        tgt_mb, vis_mb, return_terms=True)
    return num
timeit("fwd only (mb=16, incl teacher)", fwd_fn,
       (state.params, state.teacher_encoder,
        crops[:16], ctx[:16], tgt[:16], vis[:16]))

# optimizer + EMA cost (full param tree)
from wavjepa_tpu.train.state import ema_update
def opt_fn(c, g, opt_state, p0, teacher0):
    g = jax.tree.map(lambda x: x + c.astype(x.dtype), g)
    updates, opt_state = tx.update(g, opt_state, p0)
    p = jax.tree.map(lambda a, b: a + b, p0, updates)
    t = ema_update(teacher0, p["encoder"], 0.999)
    return (p, t)
grads0 = jax.tree.map(jnp.zeros_like, state.params)
t_opt = timeit("AdamW update + EMA (full tree)", opt_fn,
               (grads0, state.opt_state, state.params, state.teacher_encoder))

# grad accumulation overhead: tree add of full param tree x accum
def acc_fn(c, g):
    acc = jax.tree.map(jnp.zeros_like, g)
    def body(carry, _):
        return jax.tree.map(lambda a, b: a + b + c.astype(a.dtype), carry, g), None
    out, _ = jax.lax.scan(body, acc, None, length=16)
    return out
t_acc = timeit("16x grad-tree accumulate (isolated)", acc_fn, (grads0,))

# full steps at accum 8/16/32
for a in (8, 16, 32):
    st = make_jepa_train_step(
        model, tx, sched, nr_samples_per_audio=S, masker_cfg=mcfg,
        ema_cfg=cfg.ema, accum_steps=a, donate=False)
    dt, _ = time_steps(st, state, audio, jax.random.PRNGKey(1), n=5)
    mb = 256 // a
    pred = t_mb.get(mb)
    extra = f" vs {a}x mb({mb}) = {pred*a*1e3:.0f} ms + opt {t_opt*1e3:.0f}" if pred else ""
    print(f"FULL STEP accum={a:2d}: {dt*1e3:8.1f} ms{extra}", flush=True)
