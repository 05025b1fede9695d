"""Nat step phase breakdown (VERDICT r3 #3): time each phase of the 32-clip
binaural Nat step with hoist-proof chained loops (perturb input with a
scalar from the previous output), closed by host fetches."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from wavjepa_tpu.models.jepa import JEPA
from wavjepa_tpu.train.config import load_config
from wavjepa_tpu.train.denoise_loop import synthetic_denoise_batches
from wavjepa_tpu.train.state import TrainState
from wavjepa_tpu.train.step import (
    NatSceneConfig, make_jepa_train_step, make_optimizer,
)
from wavjepa_tpu.ops.scenes import generate_scene
from wavjepa_tpu.data.resample import resample_jax
from wavjepa_tpu.ops.audio import instance_normalize, random_crops

cfg = load_config("configs/nat_binaural.yaml")
B = 32
cfg.trainer.batch_size = B
model_cfg = cfg.build_model_config()
model = JEPA(model_cfg)
params = model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, 2, model_cfg.target_length))
)["params"]
tx, sched = make_optimizer(cfg.optimizer)
state = TrainState.create(params, tx)
masker_fn, masker_cfg = cfg.masker.build()
scene_cfg = NatSceneConfig(with_rir=True, with_noise=True, n_channels=2)
accum = cfg.resolved_accum_steps()
print("accum:", accum, "pack:", model_cfg.pack_encoder, model_cfg.pack_decoder,
      "remat c/e/d:", model_cfg.remat_conv, model_cfg.remat_encoder, model_cfg.remat_decoder)

batch = next(synthetic_denoise_batches(
    B, scene_len=int(32000 * 10.0), rir_len=64000, n_channels=2, seed=0))
batch = {k: jnp.asarray(v) for k, v in batch.items()}

from scripts._timing import timeit, time_steps

# 1. scene synthesis at 32k
def scene_fn(c, b):
    return generate_scene(
        b["audio"] + c, b["source_rir"], b["noise"], b["noise_rirs"],
        b["noise_start"], b["noise_length"], b["snr"],
        with_rir=True, with_noise=True, n_channels=2)
t_scene = timeit("scene fftconvolve+mix @32k", scene_fn, (batch,))

# 2. resample 32k->16k of the (B,2,320k) scene
scene_out = jax.jit(lambda b: scene_fn(jnp.float32(0), b))(batch)
t_rs = timeit("resample 32k->16k (B,2,320k)", lambda c, x: resample_jax(x + c, 32000, 16000), (scene_out,))

# 3. crops + instance norm + cast
audio16 = jax.jit(lambda x: resample_jax(x, 32000, 16000))(scene_out)
def crop_fn(c, x):
    crops = random_crops(jax.random.PRNGKey(0), x + c, model_cfg.target_length, 8)
    crops = instance_normalize(crops, axis=(-2, -1))
    b, s, ch, l = crops.shape
    return crops.reshape(b * s, ch, l).astype(model_cfg.dtype)
t_crop = timeit("crops+norm+cast", crop_fn, (audio16,))

crops = jax.jit(lambda x: crop_fn(jnp.float32(0), x))(audio16)
print("crops shape:", crops.shape)

# 4. conv frontend fwd (per-channel CNN) on one microbatch and full batch.
# Params are jit ARGUMENTS, not closures (closures inline the 111M tree as
# HLO constants -> remote AOT helper HTTP 413).
mb = crops.shape[0] // accum
def conv_fn(c, p, x):
    return model.apply({"params": p}, x + c, method=lambda m, x: m.extract_audio(x))
try:
    t_conv_mb = timeit(f"conv frontend fwd (mb={mb})", conv_fn, (params, crops[:mb]))
except Exception as e:
    print("conv fwd phase unavailable:", e)

# 5. student full fwd (encode+student) per microbatch via loss fn? use encode_features
def enc_fn(c, p, x):
    return model.apply({"params": p}, x + c, method="encode_features")
t_enc_mb = timeit(f"encode_features fwd (mb={mb})", enc_fn, (params, crops[:mb]))

# 6. teacher fwd per microbatch
feats = jax.jit(lambda p, x: enc_fn(jnp.float32(0), p, x))(params, crops[:mb])
def teacher_fn(c, p, teacher, f):
    tp = dict(p); tp["encoder"] = teacher
    return model.apply({"params": tp}, f + c, method="teacher_forward")
t_teach_mb = timeit(f"teacher fwd (mb={mb})", teacher_fn,
                    (params, state.teacher_encoder, feats))

# 6b. student fwd+bwd per microbatch (masks exactly as the step builds them)
from wavjepa_tpu.train.step import jepa_loss_fn

ctx, tgt, vis = jax.jit(lambda k: masker_fn(
    k, batch_size=crops.shape[0], n_times=model_cfg.total_patches,
    in_channels=model_cfg.in_channels, cfg=masker_cfg))(jax.random.PRNGKey(2))
if model_cfg.pack_encoder is not None:
    chans = model_cfg.in_channels if masker_cfg.channel_based_masking else 1
    if chans > 1:
        v = (~ctx).reshape(ctx.shape[0], chans, -1)
        over = (jnp.cumsum(v, axis=-1) > model_cfg.pack_encoder // chans).reshape(ctx.shape)
    else:
        over = jnp.cumsum(~ctx, axis=-1) > model_cfg.pack_encoder
    ctx = ctx | over
    vis = jnp.logical_xor(ctx[:, None, :], tgt)

def grad_fn(c, p, teacher, mcrops, mctx, mtgt, mvis):
    def num_fn(pp):
        num, den = jepa_loss_fn(
            model, pp, teacher, mcrops + c, mctx, mtgt, mvis, return_terms=True)
        return num
    return jax.grad(num_fn)(p)

t_grad_mb = timeit(f"fwd+bwd microbatch (mb={mb})", grad_fn,
                   (params, state.teacher_encoder,
                    crops[:mb], ctx[:mb], tgt[:mb], vis[:mb]))

# 7. full train step
step = make_jepa_train_step(
    model, tx, sched, nr_samples_per_audio=8, masker=masker_fn,
    masker_cfg=masker_cfg, ema_cfg=cfg.ema, scene_cfg=scene_cfg,
    accum_steps=accum, donate=False)
t_step, _ = time_steps(step, state, batch, jax.random.PRNGKey(1), n=6)
print(f"{'FULL STEP':40s} {t_step*1e3:8.1f} ms   ({B/t_step:.2f} clips/s/chip)")
print(f"scene+resample+crop fixed cost: {(t_scene+t_rs+t_crop)*1e3:.1f} ms "
      f"({(t_scene+t_rs+t_crop)/t_step*100:.1f}% of step)")
print(f"per-microbatch fwd x accum: enc {t_enc_mb*accum*1e3:.1f} "
      f"teach {t_teach_mb*accum*1e3:.1f} fwd+bwd {t_grad_mb*accum*1e3:.1f}")
print(f"floor sum: fixed {(t_scene+t_rs+t_crop)*1e3:.1f} + "
      f"{accum}x fwd+bwd {t_grad_mb*accum*1e3:.1f} = "
      f"{(t_scene+t_rs+t_crop+t_grad_mb*accum)*1e3:.1f} vs step {t_step*1e3:.1f}")
