"""Orbax checkpointing + reference-format torch checkpoint import.

TPU equivalent of the reference's Lightning ModelCheckpoint (every 25 k
steps, keep-all, save_last — /root/reference/train.py:146-154) plus the
`*._orig_mod`-aware torch-weight loaders every reference consumer carries
(hear_api/runtime.py:63-77, denoise.py:195-209). Resume works for the SSL
path too (a gap in the reference, which only wires ckpt_path for denoise).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str | Path, keep: int = 0, every: int = 1):
        directory = Path(directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if keep == 0 else keep,
            save_interval_steps=every,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore the full saved pytree without a structural template —
        used by inference consumers that only need the `params` subtree of a
        TrainState checkpoint (e.g. api/runtime.load_model)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(step)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


MODEL_CONFIG_NAME = "model_config.json"


def write_model_config(run_dir: str | Path, model_config) -> Path:
    """Persist the JEPAConfig next to a run's checkpoints.

    The reference never writes its Hydra model config with the weights, so
    every loader must re-specify architecture flags by hand — and a wrong
    guess (e.g. Nat's `pos_embed`) corrupts embeddings silently because the
    positional table is derived, not stored in `params`. The sidecar makes
    `api/runtime.load_model(run_dir_or_ckpt)` reconstruct the exact model.
    """
    import json

    from wavjepa_tpu.models.jepa import jepa_config_to_dict

    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    out = run_dir / MODEL_CONFIG_NAME
    out.write_text(json.dumps(jepa_config_to_dict(model_config), indent=1))
    return out


def read_model_config(path: str | Path):
    """Find and load a model_config.json sidecar for a checkpoint path.

    Accepts the run dir, its ckpt/ dir, or a specific ckpt/<step> dir and
    walks up (3 levels) looking for the sidecar. Returns a JEPAConfig or
    None when no sidecar exists (pre-sidecar checkpoints)."""
    import json

    from wavjepa_tpu.models.jepa import jepa_config_from_dict

    p = Path(path).absolute()
    for candidate in (p, *list(p.parents)[:3]):
        f = candidate / MODEL_CONFIG_NAME
        if f.is_file():
            return jepa_config_from_dict(json.loads(f.read_text()))
    return None


def import_torch_jepa(
    path: str,
    model_config,
    ckpt: Optional[dict] = None,
) -> tuple[dict, Optional[dict]]:
    """Load a reference-format torch JEPA checkpoint into flax params.

    Returns (params, teacher_encoder_params-or-None), as numpy trees matching
    models.jepa.JEPA's parameter structure for ``model_config``. Pass a
    preloaded ``ckpt`` dict to skip re-reading the file (api/runtime.load_model
    already loads it once for pos-embed detection).
    """
    from wavjepa_tpu.api.convert import convert_jepa_state_dict, load_torch_checkpoint

    if ckpt is None:
        ckpt = load_torch_checkpoint(path)
    return convert_jepa_state_dict(
        ckpt,
        encoder_layers=model_config.encoder_layers,
        decoder_layers=model_config.decoder_layers,
        conv_layers=len(model_config.conv_spec),
        mode=model_config.extractor_mode,
        conv_bias=model_config.conv_bias,
        channel_wise=model_config.extractor == "conv_channel",
        in_channels=model_config.in_channels,
        share_weights=model_config.share_weights_over_channels,
    )


def as_host_tree(tree):
    """Device → host numpy pytree (for export)."""
    return jax.tree.map(lambda x: jax.device_get(x), tree)
