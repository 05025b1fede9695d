"""Aux utilities: profiling hooks, metric logging, config overrides."""

import json

import numpy as np
import pytest

from wavjepa_tpu.train.config import apply_overrides, load_config
from wavjepa_tpu.utils.metrics import MetricLogger, Throughput
from wavjepa_tpu.utils.profiling import device_memory_stats, timed


def test_timed_block_measures():
    with timed("block", sync=False, verbose=False) as t:
        sum(range(10000))
    assert t.elapsed_ms is not None and t.elapsed_ms >= 0.0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # CPU devices may expose nothing


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), use_tensorboard=False)
    logger.log(1, {"loss": 0.5})
    logger.log(2, {"loss": 0.25})
    logger.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert json.loads(lines[-1]) == {"step": 2, "loss": 0.25}


def test_throughput_counters():
    th = Throughput(clips_per_step=32, n_chips=4)
    th.start()
    out = th.step()
    assert out["clips_per_sec"] > 0
    assert out["clips_per_sec_per_chip"] == pytest.approx(out["clips_per_sec"] / 4)


def test_config_overrides_nested_and_frozen():
    cfg = load_config(None)
    cfg = apply_overrides(
        cfg,
        [
            "trainer.batch_size=64",
            "optimizer.lr=0.001",  # frozen dataclass rebuild
            "masker.name=speech-masker",
            "data.mixing_weights=[0.5, 0.5]",
        ],
    )
    assert cfg.trainer.batch_size == 64
    assert cfg.optimizer.lr == pytest.approx(1e-3)
    assert cfg.masker.name == "speech-masker"
    assert cfg.data.mixing_weights == [0.5, 0.5]
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["no-equals-sign"])


def test_run_identity_stable():
    cfg = load_config(None)
    ident = cfg.run_identity()
    assert "Data=AudioSet" in ident and "ModelSize=base" in ident


def test_explicit_keys_tracks_yaml_and_cli(tmp_path):
    """ADVICE r2: consumers that layer defaults (denoise.py) must see exactly
    the keys the user set — from the YAML file AND CLI overrides — so a user
    who explicitly asks for the SSL-default values keeps them."""
    p = tmp_path / "c.yaml"
    p.write_text("optimizer:\n  warmup_steps: 100000\ntrainer:\n  steps: 7\n")
    cfg = load_config(str(p))
    assert "optimizer.warmup_steps" in cfg.explicit_keys
    assert "trainer.steps" in cfg.explicit_keys
    assert "optimizer.total_steps" not in cfg.explicit_keys
    cfg = apply_overrides(cfg, ["optimizer.total_steps=375000"])
    assert "optimizer.total_steps" in cfg.explicit_keys
    # bookkeeping never leaks into serialized config
    from wavjepa_tpu.train.config import config_to_dict

    assert "explicit_keys" not in config_to_dict(cfg)


def test_accum_auto_resolution():
    """accum_steps=0 (auto) engages microbatching + decoder-remat-off only
    at the reference-scale crop batch; explicit values pass through and an
    explicit remat_decoder survives."""
    cfg = load_config(None)  # 32 clips x 8 crops = 256
    assert cfg.resolved_accum_steps() > 1
    assert cfg.build_model_config().remat_decoder is False

    small = apply_overrides(load_config(None), ["trainer.batch_size=2"])
    assert small.resolved_accum_steps() == 1
    # None remat_decoder then follows the global remat default (True)
    assert small.build_model_config().remat_decoder is None

    explicit = apply_overrides(
        load_config(None), ["trainer.accum_steps=2", "trainer.remat_decoder=true"]
    )
    assert explicit.resolved_accum_steps() == 2
    assert explicit.build_model_config().remat_decoder is True


def test_denoise_accum_auto_resolution():
    """Denoise auto accumulation picks 4 (the measured optimum, not SSL's
    16) at >=128-crop batches, turns remat fully off alongside it, never
    packs, and yields to explicit trainer.remat / accum_steps settings."""
    cfg = load_config(None)  # 32 clips x 8 crops = 256 crops
    assert cfg.resolved_denoise_accum_steps() == 4
    m = cfg.build_denoise_model_config()
    assert m.remat is False and m.pack_encoder is None

    small = apply_overrides(load_config(None), ["trainer.batch_size=2"])
    assert small.resolved_denoise_accum_steps() == 1
    assert small.build_denoise_model_config().remat is True

    explicit = apply_overrides(
        load_config(None), ["trainer.remat=true", "trainer.accum_steps=2"]
    )
    assert explicit.resolved_denoise_accum_steps() == 2
    assert explicit.build_denoise_model_config().remat is True


def test_optional_coercion_dispatches_on_declared_type():
    """ADVICE r2: '=1'/'=0' on an Optional[bool] field becomes a bool, while
    'null' clears it — dispatch is on the DECLARED type, not the current
    value (which is None and carries no type)."""
    cfg = load_config(None)
    cfg = apply_overrides(cfg, ["trainer.remat_encoder=0"])
    assert cfg.trainer.remat_encoder is False
    cfg = apply_overrides(cfg, ["trainer.remat_encoder=true"])
    assert cfg.trainer.remat_encoder is True
    cfg = apply_overrides(cfg, ["trainer.remat_encoder=null"])
    assert cfg.trainer.remat_encoder is None


def test_prefetch_to_device_preserves_order_and_shards():
    import jax
    import numpy as np

    from wavjepa_tpu.parallel.mesh import make_mesh
    from wavjepa_tpu.train.loop import prefetch_to_device

    mesh = make_mesh()
    batches = [np.full((len(jax.devices()), 3), i, np.float32) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b)[0, 0]) == float(i)
    # dict batches (Nat/denoise) shard per-leaf
    dicts = [{"a": np.ones((len(jax.devices()), 2), np.float32) * i} for i in range(3)]
    out = list(prefetch_to_device(iter(dicts), mesh, size=2))
    assert len(out) == 3 and float(np.asarray(out[2]["a"])[0, 0]) == 2.0
