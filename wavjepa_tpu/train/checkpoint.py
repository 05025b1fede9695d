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


def import_torch_jepa(
    path: str,
    model_config,
) -> tuple[dict, Optional[dict]]:
    """Load a reference-format torch JEPA checkpoint into flax params.

    Returns (params, teacher_encoder_params-or-None), as numpy trees matching
    models.jepa.JEPA's parameter structure for ``model_config``.
    """
    from wavjepa_tpu.api.convert import convert_jepa_state_dict, load_torch_checkpoint

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
