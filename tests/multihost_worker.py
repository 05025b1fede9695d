"""Worker body for the 2-process multi-host smoke test (run by
tests/test_multihost.py, one subprocess per simulated host).

Exercises parallel/mesh.initialize_multihost → a global mesh spanning both
processes → a cross-process collective (global sum through GSPMD) → a tiny
JEPA forward on the sharded batch. This is the local stand-in for a real
DCN multi-host bring-up (SURVEY §7: multi-host DP as the TPU-native
extension; VERDICT r1 item 9)."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> int:
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    from wavjepa_tpu.parallel.mesh import (
        DATA_AXIS,
        initialize_multihost,
        make_mesh,
    )

    initialize_multihost(coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    n = len(jax.devices())
    assert n == 2 * len(jax.local_devices())

    mesh = make_mesh()
    # global batch sharded over the data axis: each process contributes its
    # local half; the jitted sum needs a cross-host collective
    local = np.full((len(jax.local_devices()), 4), 1.0 + pid, np.float32)
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    garr = jax.make_array_from_process_local_data(sharding, local, (n, 4))
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(garr)
    expect = 4 * (len(jax.local_devices())) * (1.0 + 2.0)
    got = float(jax.device_get(total))
    assert abs(got - expect) < 1e-6, (got, expect)

    # tiny model forward over the global mesh
    from wavjepa_tpu.models.jepa import JEPA, JEPAConfig

    cfg = JEPAConfig(
        conv_spec=((8, 10, 5), (8, 3, 2)),
        encoder_layers=1,
        encoder_dim=16,
        encoder_heads=2,
        decoder_layers=1,
        decoder_dim=8,
        decoder_heads=2,
        sample_rate=1600,
        process_seconds=0.201,
        average_top_k_layers=1,
        remat=False,  # remat tracing is the slow part of init on a loaded CPU
    )
    model = JEPA(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, cfg.target_length)))[
        "params"
    ]
    local_audio = np.random.default_rng(pid).normal(
        size=(len(jax.local_devices()), 1, cfg.target_length)
    ).astype(np.float32)
    audio = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS, None, None)),
        local_audio,
        (n, 1, cfg.target_length),
    )
    rep = jax.jit(
        lambda p, a: model.apply({"params": p}, a, method="represent").mean(),
        out_shardings=NamedSharding(mesh, P()),
    )(params, audio)
    assert np.isfinite(float(jax.device_get(rep)))

    # sharded orbax save/restore across BOTH processes (VERDICT r2 #6):
    # the cross-host-sharded batch round-trips through the repo's own
    # CheckpointManager; every process must see its exact local shards back
    if len(sys.argv) > 3:
        from wavjepa_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(sys.argv[3])
        assert mgr.save(0, {"audio": audio}, force=True)
        mgr.wait()
        restored = mgr.restore({"audio": audio})
        got = restored["audio"]
        assert got.sharding.is_equivalent_to(audio.sharding, audio.ndim)
        for s_ref, s_got in zip(
            audio.addressable_shards, got.addressable_shards
        ):
            np.testing.assert_array_equal(
                np.asarray(s_got.data), np.asarray(s_ref.data)
            )
        mgr.close()
        print(f"[host {pid}] sharded ckpt roundtrip ok", flush=True)

    print(f"[host {pid}] multihost smoke ok", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
