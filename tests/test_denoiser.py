"""Denoiser distillation: loss math, warm start, fused step smoke + learning,
data pipeline shapes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavjepa_tpu.models.denoiser import (
    DenoiserConfig,
    DenoiserStudent,
    denoiser_distillation_loss,
    student_params_from_jepa,
)
from wavjepa_tpu.models.jepa import JEPA, JEPAConfig
from wavjepa_tpu.train.denoise_loop import synthetic_denoise_batches
from wavjepa_tpu.train.denoise_step import (
    DenoiseOptimizerConfig,
    DenoiseTrainState,
    make_denoise_optimizer,
    make_denoise_train_step,
)

TINY = JEPAConfig(
    conv_spec=((16, 10, 5), (16, 3, 2)),
    encoder_layers=2,
    encoder_dim=32,
    encoder_heads=4,
    decoder_layers=1,
    decoder_dim=16,
    decoder_heads=4,
    sample_rate=1600,
    process_seconds=0.201,
    average_top_k_layers=2,
)


def _dcfg():
    return DenoiserConfig(
        jepa=TINY, alpha=0.3, original_sr=3200, nr_samples_per_audio=2,
        target_seconds=1.0,
    )


def test_distillation_loss_blend():
    a = jnp.ones((2, 5, 4))
    b = jnp.zeros((2, 5, 4))
    loss, parts = denoiser_distillation_loss(a, b, b, alpha=0.25)
    # clean loss = 1, noisy loss = 0 → 0.25
    assert float(parts["loss_clean"]) == pytest.approx(1.0)
    assert float(parts["loss_denoise_dereverb"]) == pytest.approx(0.0)
    assert float(loss) == pytest.approx(0.25)


def test_student_warm_start_matches_teacher_representation():
    """A student warm-started from JEPA params must reproduce the teacher's
    `represent` output exactly (same encoder path, same numerics)."""
    teacher = JEPA(TINY)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, TINY.target_length)),
        jnp.float32,
    )
    tparams = teacher.init(jax.random.PRNGKey(0), audio)["params"]
    student = DenoiserStudent(TINY)
    sparams = student_params_from_jepa(tparams)
    out_t = teacher.apply({"params": tparams}, audio, method="represent")
    out_s = student.apply({"params": sparams}, audio)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_s), atol=1e-6)


def test_student_warm_start_does_not_alias_teacher_buffers():
    """student_params_from_jepa must return fresh buffers: the denoise step
    donates the student state while the teacher tree rides alongside as a
    non-donated argument, and aliased donation is a runtime InvalidArgument
    on the TPU backend (regression: r3 denoise bench failure)."""
    teacher = JEPA(TINY)
    tparams = teacher.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, TINY.target_length))
    )["params"]
    sparams = student_params_from_jepa(tparams)

    def buf(x):  # device buffer address — id() can't see XLA-level sharing
        try:
            return x.unsafe_buffer_pointer()
        except Exception:
            return id(x)

    t_bufs = {buf(x) for x in jax.tree.leaves(tparams)}
    for leaf in jax.tree.leaves(sparams):
        assert buf(leaf) not in t_bufs, "warm-start leaf aliases teacher tree"


def test_denoise_step_runs_and_learns():
    dcfg = _dcfg()
    teacher = JEPA(TINY)
    student = DenoiserStudent(TINY)
    audio0 = jnp.zeros((1, 1, TINY.target_length))
    tparams = teacher.init(jax.random.PRNGKey(0), audio0)["params"]
    sparams = jax.tree.map(jnp.copy, student_params_from_jepa(tparams))

    opt = DenoiseOptimizerConfig(lr=1e-3, warmup_steps=2, total_steps=50)
    tx, sched = make_denoise_optimizer(opt)
    state = DenoiseTrainState.create(sparams, tx)
    step = make_denoise_train_step(
        student, teacher, dcfg, tx, sched, with_rir=True, with_noise=True,
        donate=False,
    )

    batches = synthetic_denoise_batches(
        2, scene_len=dcfg.scene_length, rir_len=320, max_noise=2, seed=0
    )
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        state, metrics = step(state, tparams, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 5
    # noisy-vs-clean distillation loss should move (training is happening);
    # warm-started student ⇒ loss_clean starts at ~0 and stays small
    assert float(metrics["loss_clean"]) < float(metrics["loss_denoise_dereverb"]) + 1.0


def test_denoise_accum_matches_single_pass():
    """accum_steps microbatching is exact for the denoiser's uniform-count
    MSE: same loss and same updated params as the single-pass step."""
    dcfg = _dcfg()
    teacher = JEPA(TINY)
    student = DenoiserStudent(TINY)
    audio0 = jnp.zeros((1, 1, TINY.target_length))
    tparams = teacher.init(jax.random.PRNGKey(0), audio0)["params"]
    sparams = student_params_from_jepa(tparams)
    tx, sched = make_denoise_optimizer(
        DenoiseOptimizerConfig(lr=1e-3, warmup_steps=1, total_steps=50)
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in next(
            iter(
                synthetic_denoise_batches(
                    2, scene_len=dcfg.scene_length, rir_len=320, seed=4
                )
            )
        ).items()
    }

    def run(accum):
        state = DenoiseTrainState.create(jax.tree.map(jnp.copy, sparams), tx)
        step = make_denoise_train_step(
            student, teacher, dcfg, tx, sched,
            with_rir=True, with_noise=True, donate=False, accum_steps=accum,
        )
        for _ in range(2):
            state, metrics = step(state, tparams, batch, jax.random.PRNGKey(5))
        return state, metrics

    s1, m1 = run(1)
    s2, m2 = run(2)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m2["loss_clean"]), float(m1["loss_clean"]), rtol=1e-5, atol=1e-7
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_alpha_zero_detach_is_exact():
    """At alpha=0.0 the clean-view gradient term is 0.0 * (finite) == 0.0
    exactly, so detaching the clean student forward (denoise_step.py) must
    not change the gradients — only delete the clean backward pass."""
    student = DenoiserStudent(TINY)
    rng = np.random.default_rng(7)
    clean = jnp.asarray(rng.standard_normal((2, 1, TINY.target_length)), jnp.float32)
    noisy = jnp.asarray(rng.standard_normal((2, 1, TINY.target_length)), jnp.float32)
    params = student.init(jax.random.PRNGKey(1), clean)["params"]
    targets = jax.lax.stop_gradient(student.apply({"params": params}, clean))

    def loss_plain(p):  # reference formula: clean view differentiated
        out_clean = student.apply({"params": p}, clean)
        out_noisy = student.apply({"params": p}, noisy)
        return denoiser_distillation_loss(out_clean, out_noisy, targets, 0.0)[0]

    def loss_detached(p):  # the optimization applied in denoise_step.py
        out_clean = student.apply({"params": jax.lax.stop_gradient(p)}, clean)
        out_noisy = student.apply({"params": p}, noisy)
        return denoiser_distillation_loss(out_clean, out_noisy, targets, 0.0)[0]

    g_plain = jax.grad(loss_plain)(params)
    g_det = jax.grad(loss_detached)(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_det)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )


def test_log_clean_loss_off_same_training():
    """log_clean_loss=False at alpha=0 skips the clean student forward:
    updated params and loss must match the default step exactly; only the
    loss_clean diagnostic becomes 0."""
    teacher = JEPA(TINY)
    student = DenoiserStudent(TINY)
    audio0 = jnp.zeros((1, 1, TINY.target_length))
    tparams = teacher.init(jax.random.PRNGKey(0), audio0)["params"]
    # fresh (NOT warm-started) student so loss_clean > 0 — warm start makes
    # student(clean) == teacher.represent(clean) exactly at step 0
    sparams = student.init(jax.random.PRNGKey(9), audio0)["params"]
    tx, sched = make_denoise_optimizer(
        DenoiseOptimizerConfig(lr=1e-3, warmup_steps=1, total_steps=50)
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in next(
            iter(
                synthetic_denoise_batches(
                    2, scene_len=_dcfg().scene_length, rir_len=320, seed=11
                )
            )
        ).items()
    }

    def run(log_clean):
        dcfg = dataclasses.replace(_dcfg(), alpha=0.0, log_clean_loss=log_clean)
        state = DenoiseTrainState.create(jax.tree.map(jnp.copy, sparams), tx)
        step = make_denoise_train_step(
            student, teacher, dcfg, tx, sched,
            with_rir=True, with_noise=True, donate=False,
        )
        state, metrics = step(state, tparams, batch, jax.random.PRNGKey(3))
        return state, metrics

    s_on, m_on = run(True)
    s_off, m_off = run(False)
    assert float(m_on["loss_clean"]) > 0.0
    assert float(m_off["loss_clean"]) == 0.0
    np.testing.assert_allclose(float(m_off["loss"]), float(m_on["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_on.params), jax.tree.leaves(s_off.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)


def test_denoise_step_noise_only_and_rir_only():
    dcfg = _dcfg()
    teacher = JEPA(TINY)
    student = DenoiserStudent(TINY)
    audio0 = jnp.zeros((1, 1, TINY.target_length))
    tparams = teacher.init(jax.random.PRNGKey(0), audio0)["params"]
    sparams = student_params_from_jepa(tparams)
    tx, sched = make_denoise_optimizer(
        DenoiseOptimizerConfig(warmup_steps=2, total_steps=10)
    )
    for with_rir, with_noise in [(False, True), (True, False)]:
        state = DenoiseTrainState.create(jax.tree.map(jnp.copy, sparams), tx)
        step = make_denoise_train_step(
            student, teacher, dcfg, tx, sched,
            with_rir=with_rir, with_noise=with_noise, donate=False,
        )
        batch = {
            k: jnp.asarray(v)
            for k, v in next(
                iter(
                    synthetic_denoise_batches(
                        2, scene_len=dcfg.scene_length, rir_len=320,
                        with_rir=with_rir, with_noise=with_noise,
                    )
                )
            ).items()
        }
        state, metrics = step(state, tparams, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))


def test_fade_noise_and_sample_assembly():
    from wavjepa_tpu.data.denoise_pipeline import fade_noise

    rng = np.random.default_rng(0)
    sr = 1000
    # long noise → cropped to clip length, faded out at the end
    long_noise = np.ones((3 * sr,), np.float32)
    out = fade_noise(long_noise, 2 * sr, sr, rng)
    assert out.shape == (2 * sr,)
    assert out[-1] == pytest.approx(0.0, abs=1e-6)
    # short noise → fade-in and fade-out applied
    short = np.ones((sr,), np.float32)
    out = fade_noise(short, 2 * sr, sr, rng)
    assert out.shape == (sr,)
    assert out[0] == pytest.approx(0.0, abs=1e-6)
    assert out[-1] == pytest.approx(0.0, abs=1e-6)
    assert out[sr // 2] == pytest.approx(1.0)


def test_effective_scene_flags_consistency():
    """Step flags must match what the data source will actually emit
    (real-data runs without rir/noise shard dirs must disable those paths)."""
    from wavjepa_tpu.train.config import load_config
    from wavjepa_tpu.train.denoise_loop import effective_scene_flags

    cfg = load_config(None)
    cfg.data.synthetic = True
    assert effective_scene_flags(cfg) == (True, True)

    cfg = load_config(None)
    cfg.data.data_dirs = "shards-{000..001}.tar"  # real data, no rir/noise dirs
    assert effective_scene_flags(cfg) == (False, False)

    cfg.data.rir_dir = "rirs.tar"
    assert effective_scene_flags(cfg) == (True, False)
    cfg.data.noise_dir = "noise.tar"
    assert effective_scene_flags(cfg) == (True, True)
    cfg.data.with_noise = False
    assert effective_scene_flags(cfg) == (True, False)


def _tiny_denoise_setup(donate=False, with_rir=True, with_noise=True):
    dcfg = _dcfg()
    teacher = JEPA(TINY)
    student = DenoiserStudent(TINY)
    audio0 = jnp.zeros((1, 1, TINY.target_length))
    tparams = teacher.init(jax.random.PRNGKey(0), audio0)["params"]
    sparams = student_params_from_jepa(tparams)
    tx, sched = make_denoise_optimizer(
        DenoiseOptimizerConfig(warmup_steps=2, total_steps=10)
    )
    state = DenoiseTrainState.create(jax.tree.map(jnp.copy, sparams), tx)
    step = make_denoise_train_step(
        student, teacher, dcfg, tx, sched,
        with_rir=with_rir, with_noise=with_noise, donate=donate,
    )
    return dcfg, tparams, state, step


class TestRIRBankAndWire:
    """The denoise/Nat ingest wire fixes (VERDICT r4 #1): device-resident
    RIR bank (ship once + per-clip indices) and int16 audio/noise wire."""

    def test_rir_bank_matches_inline(self):
        """bank+rir_index must be EXACTLY the inline source_rir/noise_rirs
        step: the gather reproduces the same f32 rows, everything after is
        the identical program."""
        dcfg, tparams, state, step = _tiny_denoise_setup()
        batch = {
            k: jnp.asarray(v)
            for k, v in next(
                iter(
                    synthetic_denoise_batches(
                        3, scene_len=dcfg.scene_length, rir_len=320, max_noise=2,
                        seed=3,
                    )
                )
            ).items()
        }
        # bank with 5 rows; rows 4,0,2 hold the batch's three RIR stacks
        rng = np.random.default_rng(9)
        n, c, l = 5, 1, 320
        bank = {
            "source_rir": rng.standard_normal((n, c, l)).astype(np.float32),
            "noise_rirs": rng.standard_normal((n, 2, c, l)).astype(np.float32),
        }
        idx = np.asarray([4, 0, 2], np.int32)
        bank["source_rir"][idx] = np.asarray(batch["source_rir"])
        bank["noise_rirs"][idx] = np.asarray(batch["noise_rirs"])
        banked = {
            k: v for k, v in batch.items() if k not in ("source_rir", "noise_rirs")
        }
        banked["rir_index"] = jnp.asarray(idx)
        bank = {k: jnp.asarray(v) for k, v in bank.items()}

        _, m_inline = step(state, tparams, batch, jax.random.PRNGKey(5))
        _, m_banked = step(state, tparams, banked, jax.random.PRNGKey(5), bank)
        assert float(m_inline["loss"]) == float(m_banked["loss"])

    def test_int16_wire_close_to_f32(self):
        """int16-quantized audio AND noise must train to the same loss:
        the audio peak gain cancels in the per-crop instance norm, the noise
        gain cancels in the segmental-SNR renormalization (add_noise scales
        the bed from the actual energies); the residual is -96 dBFS
        quantization noise."""
        from wavjepa_tpu.data.pipeline import quantize_clip_int16

        dcfg, tparams, state, step = _tiny_denoise_setup()
        batch = {
            k: jnp.asarray(v)
            for k, v in next(
                iter(
                    synthetic_denoise_batches(
                        3, scene_len=dcfg.scene_length, rir_len=320, max_noise=2,
                        seed=4,
                    )
                )
            ).items()
        }
        wired = dict(batch)
        wired["audio"] = jnp.asarray(
            np.stack([quantize_clip_int16(c) for c in np.asarray(batch["audio"])])
        )
        wired["noise"] = jnp.asarray(
            np.stack([quantize_clip_int16(c) for c in np.asarray(batch["noise"])])
        )
        assert wired["audio"].dtype == jnp.int16
        _, m32 = step(state, tparams, batch, jax.random.PRNGKey(6))
        _, m16 = step(state, tparams, wired, jax.random.PRNGKey(6))
        np.testing.assert_allclose(
            float(m16["loss"]), float(m32["loss"]), rtol=2e-3
        )

    def test_update_rir_bank_scatter(self):
        from wavjepa_tpu.ops.scenes import update_rir_bank

        rng = np.random.default_rng(1)
        bank = {
            "source_rir": jnp.asarray(rng.standard_normal((4, 1, 8)), jnp.float32),
            "noise_rirs": jnp.asarray(rng.standard_normal((4, 2, 1, 8)), jnp.float32),
        }
        before = jax.tree.map(np.asarray, bank)
        rows = {
            "source_rir": jnp.ones((2, 1, 8), jnp.float32),
            "noise_rirs": jnp.full((2, 2, 1, 8), 2.0, jnp.float32),
        }
        slots = jnp.asarray([3, 1], jnp.int32)
        new = update_rir_bank(
            bank, {"source_rir": slots, "noise_rirs": slots}, rows
        )
        got = jax.tree.map(np.asarray, new)
        np.testing.assert_array_equal(got["source_rir"][3], np.ones((1, 8)))
        np.testing.assert_array_equal(got["source_rir"][1], np.ones((1, 8)))
        np.testing.assert_array_equal(got["source_rir"][0], before["source_rir"][0])
        np.testing.assert_array_equal(got["noise_rirs"][2], before["noise_rirs"][2])
        np.testing.assert_array_equal(
            got["noise_rirs"][3], np.full((2, 1, 8), 2.0)
        )

    def test_update_bank_partial_keys_and_int16_rows(self):
        """A refresh may touch only one bank (its own ring slots); int16
        noise rows are dequantized on device (gain cancels in the SNR mix)."""
        from wavjepa_tpu.ops.scenes import update_rir_bank

        bank = {
            "source_rir": jnp.zeros((3, 1, 4), jnp.float32),
            "noise": jnp.zeros((2, 6), jnp.float32),
        }
        rows16 = np.asarray([[32767, -16384, 0, 1, 0, 0]], np.int16)
        new = update_rir_bank(
            bank,
            {"noise": jnp.asarray([1], jnp.int32)},
            {"noise": jnp.asarray(rows16)},
        )
        got = jax.tree.map(np.asarray, new)
        np.testing.assert_array_equal(got["source_rir"], np.zeros((3, 1, 4)))
        np.testing.assert_allclose(
            got["noise"][1], rows16[0].astype(np.float32) / 32767.0
        )
        np.testing.assert_array_equal(got["noise"][0], np.zeros(6))

    def test_place_noise_from_bank_matches_host(self):
        """Device placement of a faded bank row must reproduce the host's
        placed buffer exactly (the row is the fade_noise output left-aligned;
        placement is a pure shift; zeros wrap harmlessly)."""
        from wavjepa_tpu.data.denoise_pipeline import fade_noise
        from wavjepa_tpu.ops.scenes import place_noise_from_bank

        rng = np.random.default_rng(5)
        sr, clip_len = 1000, 2000
        raw = rng.standard_normal(1200).astype(np.float32)
        faded = fade_noise(raw, clip_len, sr, rng)
        n_len = faded.shape[-1]
        row = np.zeros((clip_len,), np.float32)
        row[:n_len] = faded
        start = 317
        host_placed = np.zeros((clip_len,), np.float32)
        host_placed[start : start + n_len] = faded

        rows = jnp.asarray(np.stack([np.zeros_like(row), row]))
        got = place_noise_from_bank(
            rows, jnp.asarray([1], jnp.int32), jnp.asarray([start], jnp.int32)
        )
        np.testing.assert_array_equal(np.asarray(got[0]), host_placed)

    def test_noise_bank_step_matches_inline(self):
        """noise_index + on-device placement must reproduce the inline
        placed-noise step exactly (same f32 row content)."""
        dcfg, tparams, state, step = _tiny_denoise_setup()
        batch = {
            k: jnp.asarray(v)
            for k, v in next(
                iter(
                    synthetic_denoise_batches(
                        2, scene_len=dcfg.scene_length, rir_len=320, max_noise=2,
                        seed=8,
                    )
                )
            ).items()
        }
        # bank rows = the batch's placed noise shifted back to the left edge
        # (synthetic batches place at start=0 with full length, so the rows
        # ARE the buffers and start=0)
        bank = {"noise": batch["noise"]}
        banked = {k: v for k, v in batch.items() if k != "noise"}
        banked["noise_index"] = jnp.asarray([0, 1], jnp.int32)
        _, m_inline = step(state, tparams, batch, jax.random.PRNGKey(9))
        _, m_banked = step(state, tparams, banked, jax.random.PRNGKey(9), bank)
        assert float(m_inline["loss"]) == float(m_banked["loss"])
