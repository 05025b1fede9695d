"""Parity against the reference's OWN code, imported directly.

Unlike test_jepa_parity.py (which rebuilds the reference computation from
torch primitives), this imports /root/reference/wavjepa/jepa.py itself —
stubbing only the packages absent from this image (pytorch_lightning,
torchaudio, data_modules) — constructs the real full-scale base JEPA
(111 M params), converts its state_dict through api/convert, and asserts
our static-shape JAX model reproduces its numbers:

  * get_audio_representation (jepa.py:456-467) on a (1, 1, 32160) window
  * full forward() (jepa.py:365-419): loss + preds + targets

This is the test VERDICT.md round 1 asked for: it fails if any convention
(eps, norm order, GELU flavor, instance-norm axes, mask semantics) drifts
from the actual reference implementation.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest
import torch
from torch import nn

import jax.numpy as jnp

from wavjepa_tpu.api.convert import convert_jepa_state_dict
from wavjepa_tpu.models.jepa import JEPA, JEPAConfig, masked_prediction_loss

REFERENCE_ROOT = "/root/reference"


def _install_stubs():
    """Stub the reference's deps that are not in this image. Only interface
    shims — no behavior is borrowed."""
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(nn.Module):
            def save_hyperparameters(self, *args, ignore=()):
                import inspect

                loc = dict(inspect.currentframe().f_back.f_locals)
                loc.pop("self", None)
                loc.update(loc.pop("kwargs", {}) or {})
                self._hparams_ns = types.SimpleNamespace(
                    **{k: v for k, v in loc.items() if not k.startswith("_")}
                )

            @property
            def hparams(self):
                return self._hparams_ns

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        # a real ModuleSpec so importlib.util.find_spec (used by
        # transformers' capability probing) doesn't choke on the stub
        ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", loader=None)
        ta.functional = types.ModuleType("torchaudio.functional")
        ta.transforms = types.ModuleType("torchaudio.transforms")
        sys.modules["torchaudio"] = ta
    if "data_modules" not in sys.modules:
        dm = types.ModuleType("data_modules")
        sm = types.ModuleType("data_modules.scene_module")
        sm.generate_scenes_batch = types.ModuleType(
            "data_modules.scene_module.generate_scenes_batch"
        )
        df = types.ModuleType("data_modules.dataset_functions")
        df.pad_or_truncate_batch = lambda *a, **k: None
        dm.scene_module = sm
        dm.dataset_functions = df
        sys.modules["data_modules"] = dm
        sys.modules["data_modules.scene_module"] = sm
        sys.modules["data_modules.dataset_functions"] = df


def _import_reference_jepa():
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import wavjepa.jepa as ref_jepa  # noqa: the reference's own module
    from wavjepa.extractors.audio_feature_extractor import ConvFeatureExtractor
    from wavjepa.types import TransformerEncoderCFG, TransformerLayerCFG

    return ref_jepa, ConvFeatureExtractor, TransformerLayerCFG, TransformerEncoderCFG


SPEC = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 2, 2))
TOPK = 8


@pytest.fixture(scope="module")
def models():
    try:
        ref_jepa, RefConv, LayerCFG, EncCFG = _import_reference_jepa()
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference import failed: {e!r}")
    torch.manual_seed(0)
    extractor = RefConv(
        conv_layers_spec=[list(s) for s in SPEC],
        in_channels=1,
        mode="default",
        conv_bias=False,
        depthwise=False,
    )
    tmodel = ref_jepa.JEPA(
        feature_extractor=extractor,
        transformer_encoder_layers_cfg=LayerCFG.create(),
        transformer_encoder_cfg=EncCFG.create(),
        transformer_decoder_layers_cfg=LayerCFG.create(d_model=384),
        transformer_decoder_cfg=EncCFG.create(),
        decoder_embedding_dim=384,
        process_audio_seconds=2.01,
        average_top_k_layers=TOPK,
    ).eval()

    params, _teacher = convert_jepa_state_dict(
        tmodel.state_dict(), encoder_layers=12, decoder_layers=12, conv_layers=len(SPEC)
    )
    cfg = JEPAConfig(average_top_k_layers=TOPK)
    jmodel = JEPA(cfg)
    return tmodel, jmodel, {"params": params}, cfg


def test_reference_audio_representation_parity(models):
    """(1, 1, 32160) → 200×768, vs reference get_audio_representation."""
    tmodel, jmodel, variables, cfg = models
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, 1, cfg.target_length)).astype(np.float32)
    with torch.no_grad():
        ty = tmodel.get_audio_representation(torch.from_numpy(audio), None).numpy()
    jy = np.asarray(
        jmodel.apply(variables, jnp.asarray(audio), method="represent")
    )
    assert ty.shape == (1, 200, 768)
    np.testing.assert_allclose(jy, ty, atol=2e-3, rtol=1e-3)


def test_reference_forward_parity(models):
    """Full training forward: loss / preds / targets vs the reference's own
    forward() with its dynamic-shape gather/scatter (jepa.py:365-419)."""
    tmodel, jmodel, variables, cfg = models
    rng = np.random.default_rng(1)
    b, n, t = 2, 4, cfg.total_patches
    audio = rng.normal(size=(b, 1, cfg.target_length)).astype(np.float32)
    ctx = rng.random((b, t)) < 0.6  # True = masked (not context)
    ctx[:, :4] = False  # guarantee some context
    tgt = (rng.random((b, n, t)) < 0.3) & ctx[:, None, :]
    tgt[:, :, -1] = True  # guarantee nonempty target sets
    vis = ctx[:, None, :] ^ tgt  # True = hidden from the decoder

    with torch.no_grad():
        out = tmodel.forward(
            torch.from_numpy(audio),
            torch.from_numpy(ctx),
            torch.from_numpy(tgt),
            torch.from_numpy(vis),
        )
    t_loss = float(out["loss"])
    t_preds = out["preds"].reshape(b, n, t, -1).numpy()
    t_targets = out["targets"].numpy()

    feats = jmodel.apply(variables, jnp.asarray(audio), method="encode_features")
    j_preds = jmodel.apply(
        variables, feats, jnp.asarray(ctx), jnp.asarray(vis), method="student_forward"
    )
    j_targets = jmodel.apply(variables, feats, method="teacher_forward")
    j_loss = float(
        masked_prediction_loss(j_preds, j_targets, jnp.asarray(tgt))
    )

    np.testing.assert_allclose(np.asarray(j_targets), t_targets, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_preds), t_preds, atol=2e-3, rtol=1e-3)
    assert abs(j_loss - t_loss) < 1e-4 * max(1.0, abs(t_loss))
