"""Auxiliary API surfaces: HF-style feature extractor, heaRIR eval-time
augmenter, multi-device command sharding."""

import json

import numpy as np
import pytest

from wavjepa_tpu.api.hearir import Augmenter, NoiseIterator, SceneIterator
from wavjepa_tpu.api.hf import WavJEPAFeatureExtractor
from wavjepa_tpu.eval.multidevice import run_commands


def test_feature_extractor_shapes_and_normalization():
    fx = WavJEPAFeatureExtractor()
    audio = 0.3 * np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    batch = fx(audio)
    assert batch.shape == (1, 1, 16000)
    rms = np.sqrt(np.mean(batch**2))
    target = 10 ** (-14.0 / 20.0)
    assert rms == pytest.approx(target, rel=1e-3)
    # stereo in, mono model → averaged
    stereo = np.stack([audio, audio])
    assert fx(stereo[None]).shape == (1, 1, 16000)
    # binaural extractor keeps channels
    fx2 = WavJEPAFeatureExtractor(in_channels=2)
    assert fx2(stereo[None]).shape == (1, 2, 16000)


def _write_scene_spec(tmp_path, channels=2, n_noise=2):
    rng = np.random.default_rng(0)
    rirs = []
    for i in range(1 + n_noise):
        rir = np.zeros((channels, 400), np.float32)
        rir[:, 0] = 1.0
        rir[:, 1:50] = 0.02 * rng.standard_normal((channels, 49))
        p = tmp_path / f"rir_{i}.npy"
        np.save(p, rir)
        rirs.append(str(p))
    spec = {
        "sampled_regions": [
            {
                "region": {
                    "scene": {
                        "source": {"rir": {"binaural_rir_path": rirs[0]}},
                        "noise": [
                            {"rir": {"binaural_rir_path": r}} for r in rirs[1:]
                        ],
                    }
                }
            }
        ]
    }
    spec_path = tmp_path / "scene.json"
    spec_path.write_text(json.dumps(spec))
    return str(spec_path)


def test_scene_iterator_and_augmenter(tmp_path):
    spec = _write_scene_spec(tmp_path)
    it = SceneIterator([spec], rir_type="binaural", sr=1000, rir_seconds=0.5)
    source_rir, noise_rirs, meta = next(it)
    assert source_rir.shape == (2, 500)
    assert len(noise_rirs) == 2

    rng = np.random.default_rng(1)
    audio = rng.standard_normal(2000).astype(np.float32)
    noise = rng.standard_normal(2000).astype(np.float32)

    aug = Augmenter(it, sr=1000, snr=0.0)
    out = aug.augment(audio, noise)
    assert out.shape == (2, 2000)
    assert np.all(np.isfinite(out))
    # no scene iterator → pass-through
    aug2 = Augmenter(None, sr=1000, snr=None)
    np.testing.assert_allclose(aug2.augment(audio)[0], audio)


def test_noise_iterator(tmp_path):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for i in range(3):
        wavfile.write(
            tmp_path / f"n{i}.wav", 1000,
            (0.1 * rng.standard_normal(500) * 32000).astype(np.int16),
        )
    it = NoiseIterator(str(tmp_path), sr=1000)
    noise = next(it)
    assert noise.ndim == 1 and noise.shape[0] == 500


def test_multidevice_run_commands(tmp_path):
    cmds = [
        f"echo dev-$TPU_VISIBLE_CHIPS > {tmp_path}/out_{i}.txt" for i in range(4)
    ]
    codes = run_commands(cmds, num_devices=2)
    assert codes == [0, 0, 0, 0]
    devices = [
        (tmp_path / f"out_{i}.txt").read_text().strip() for i in range(4)
    ]
    # every command got a valid exclusive device from the 2-device free-list
    assert all(d in ("dev-0", "dev-1") for d in devices)


class TestAugmenterSceneParity:
    """Eval-time Augmenter reproduces the reference scene pipeline
    (heaRIR generate_scenes.py): noise fades, random placement of a shorter
    bed, full-signal SNR scaling. Verified with delta RIRs so the
    convolutions are identities and each stage is directly observable."""

    def _aug(self, snr, noise_len_s=None, audio_len_s=2.0, sr=1000, seed=3):
        import numpy as np

        from wavjepa_tpu.api.hearir import Augmenter

        class OneScene:
            def __next__(self):
                delta = np.zeros((1, 8), np.float32)
                delta[0, 0] = 1.0
                return delta, [delta], {}

        rng = np.random.default_rng(0)
        audio = rng.standard_normal(int(sr * audio_len_s)).astype(np.float32)
        noise = (
            rng.standard_normal(int(sr * noise_len_s)).astype(np.float32)
            if noise_len_s
            else None
        )
        aug = Augmenter(OneScene(), sr=sr, snr=snr, seed=seed)
        out = aug.augment(audio, noise)[0]
        return audio, noise, out, sr

    def test_snr_is_exact_with_delta_rirs(self):
        import numpy as np

        audio, noise, out, sr = self._aug(snr=5.0, noise_len_s=2.0)
        bed = out - audio  # delta RIRs → wet == audio, bed = scaled noise
        measured_snr = 10 * np.log10(np.sum(audio**2) / np.sum(bed**2))
        assert abs(measured_snr - 5.0) < 1e-3

    def test_shorter_noise_is_faded_and_placed(self):
        import numpy as np

        audio, noise, out, sr = self._aug(snr=0.0, noise_len_s=0.5)
        bed = out - audio
        # threshold relative to the bed peak: the delta-RIR convolutions are
        # exact only up to fft roundoff (~1e-7 of the signal scale)
        support = np.flatnonzero(np.abs(bed) > 1e-3 * np.abs(bed).max())
        assert support.size > 0
        start, end = support[0], support[-1] + 1
        # contiguous support of the noise's length, inside the clip
        assert end - start <= int(0.5 * sr)
        assert 0 <= start and end <= audio.size
        # fade-in: bed amplitude near the placement start is attenuated
        # relative to the bed center (linear 0.2 s ramp)
        n_fade = int(0.2 * sr)
        head = np.abs(bed[start : start + n_fade // 4]).mean()
        mid = np.abs(bed[start + n_fade : end - n_fade]).mean()
        assert head < 0.5 * mid

    def test_long_noise_truncated_with_fadeout(self):
        import numpy as np

        audio, noise, out, sr = self._aug(snr=0.0, noise_len_s=3.0)
        bed = out - audio
        # truncated-from-start noise covers the clip; tail is faded out
        tail = np.abs(bed[-int(0.05 * sr):]).mean()
        mid = np.abs(bed[audio.size // 2 : audio.size // 2 + 100]).mean()
        assert tail < 0.3 * mid

    def test_no_noise_is_pure_convolution(self):
        import numpy as np

        audio, _, out, sr = self._aug(snr=None)
        np.testing.assert_allclose(out, audio, atol=1e-6)


# --------------------------------------------------------- padding-mask parity


def _reference_calculate_padding_mask():
    """Extract the reference's calculate_padding_mask via AST so we run the
    ACTUAL reference code (/root/reference/hear_api/runtime.py:19-35) without
    importing its module (whose top-level imports need wavjepa/torchaudio)."""
    import ast

    import torch

    src = open("/root/reference/hear_api/runtime.py").read()
    tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "calculate_padding_mask"
    )
    ns = {"torch": torch}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "ref_runtime", "exec"), ns)
    return ns["calculate_padding_mask"]


class TestChunkPaddingReferenceParity:
    """VERDICT r2 #4: duration sweep of the output-step padding math against
    the reference's own integer-second formula (runtime.py:19-35, called at
    runtime.py:118-126 with process_seconds = target_length // sample_rate)."""

    SR = 16000
    UNIT = int(2.01 * SR)  # 32160 (reference runtime.py:81)
    STEPS = 200

    def _reference(self, cur_frames: int):
        import types

        import torch

        fn = _reference_calculate_padding_mask()
        pad_frames = self.UNIT - (cur_frames % self.UNIT)
        padded_len = cur_frames + pad_frames
        mask, cut_off = fn(
            pad_frames=pad_frames,
            total_frames=padded_len,
            sr=self.SR,
            output_steps=self.STEPS,
            process_seconds=self.UNIT // self.SR,
            model=types.SimpleNamespace(device=torch.device("cpu")),
            B=1,
        )
        return pad_frames, padded_len // self.UNIT, cut_off, mask

    @pytest.mark.parametrize(
        "seconds",
        [
            0.3, 0.5, 1.0, 1.5, 2.0, 2.01, 2.5, 3.0, 4.0, 4.02, 5.0, 6.03,
            7.77, 8.04, 10.0, 12.06, 15.0, 20.0, 20.1, 25.0, 30.0, 30.15,
        ],
    )
    def test_duration_sweep(self, seconds):
        from wavjepa_tpu.api.runtime import chunk_padding

        cur = int(seconds * self.SR)
        ref_pad, ref_chunks, ref_cut, ref_mask = self._reference(cur)
        pad, chunks, cut, total = chunk_padding(cur, self.UNIT, self.SR, self.STEPS)
        assert (pad, chunks) == (ref_pad, ref_chunks)
        assert cut == ref_cut
        # the reference mask is True exactly on the trimmed rows
        assert int((~ref_mask[0]).sum()) == ref_cut

    def test_sample_offsets_around_multiples(self):
        """±1-sample edges around window multiples (where int() truncation
        bites) must agree exactly."""
        from wavjepa_tpu.api.runtime import chunk_padding

        for base in (self.UNIT, 2 * self.UNIT, 5 * self.UNIT):
            for off in (-1, 0, 1):
                cur = base + off
                _, _, ref_cut, _ = self._reference(cur)
                _, _, cut, _ = chunk_padding(cur, self.UNIT, self.SR, self.STEPS)
                assert cut == ref_cut, f"cur={cur}"

    def test_runtime_rows_match_formula(self):
        """End-to-end: a tiny integer-window-seconds runtime must emit
        exactly cut_off rows and matching timestamps."""
        import jax

        from wavjepa_tpu.api.runtime import RuntimeJEPA, chunk_padding
        from wavjepa_tpu.models.jepa import JEPA, JEPAConfig

        cfg = JEPAConfig(
            conv_spec=((16, 10, 5), (16, 3, 2)),
            encoder_layers=1,
            encoder_dim=32,
            encoder_heads=4,
            decoder_layers=1,
            decoder_dim=16,
            decoder_heads=4,
            sample_rate=1600,
            process_seconds=2.01,
            average_top_k_layers=1,
        )
        model = JEPA(cfg)
        params = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 1, cfg.target_length), np.float32)
        )["params"]
        rt = RuntimeJEPA(cfg, params)
        rng = np.random.default_rng(1)
        for seconds in (1.0, 2.01, 3.3):
            cur = int(seconds * cfg.sample_rate)
            clip = rng.standard_normal((1, cur)).astype(np.float32)
            emb, ts = rt.get_timestamp_embeddings(clip)
            _, _, cut, _ = chunk_padding(
                cur, rt.unit_frames, cfg.sample_rate, rt.output_steps
            )
            assert emb.shape[1] == cut
            assert ts.shape == (1, cut)
            # timestamps: uniform grid over the true clip duration
            # (reference get_timestamps, runtime.py:149-156); note the true
            # duration is cur/sr, not `seconds` (int() truncation above)
            step = cur / cfg.sample_rate / cut * 1000.0
            np.testing.assert_allclose(ts[0], step * np.arange(cut), rtol=1e-6)


class TestWholeClipAttnImplSelection:
    """load_model resolves attn_impl='auto' → 'pallas' for long-T
    (whole-clip) inference on accelerator backends only (api/runtime.py):
    the fused Pallas core keeps the (B, H, T, T) score block VMEM-resident;
    CPU hosts and the windowed T=200 contract keep the einsum path."""

    def _tiny(self, process_seconds):
        from wavjepa_tpu.models.jepa import JEPAConfig

        return JEPAConfig(
            conv_spec=((16, 10, 5), (16, 3, 2)),
            encoder_layers=1,
            encoder_dim=32,
            encoder_heads=4,
            decoder_layers=1,
            decoder_dim=16,
            decoder_heads=4,
            sample_rate=1600,
            process_seconds=process_seconds,
            average_top_k_layers=1,
        )

    def test_cpu_keeps_einsum_even_for_long_windows(self):
        from wavjepa_tpu.api.runtime import load_model

        cfg = self._tiny(3.3)  # 528 tokens ≥ the 512 threshold
        assert cfg.total_patches >= 512
        rt = load_model("", config=cfg)
        assert rt.config.attn_impl == "auto"  # resolves to einsum downstream

    def test_tpu_backend_selects_pallas_for_long_windows(self):
        from wavjepa_tpu.api.runtime import _select_whole_clip_attn

        cfg = _select_whole_clip_attn(self._tiny(3.3), backend="axon")
        assert cfg.attn_impl == "pallas"

    def test_tpu_backend_keeps_einsum_for_windowed_contract(self):
        from wavjepa_tpu.api.runtime import _select_whole_clip_attn

        cfg = _select_whole_clip_attn(self._tiny(0.201), backend="axon")
        assert cfg.attn_impl == "auto"  # 32 tokens: windowed contract

    def test_explicit_attn_impl_is_honored(self):
        import dataclasses as dc

        from wavjepa_tpu.api.runtime import _select_whole_clip_attn

        cfg = _select_whole_clip_attn(
            dc.replace(self._tiny(3.3), attn_impl="einsum"), backend="axon"
        )
        assert cfg.attn_impl == "einsum"
