"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding tests run without TPU hardware (the analog of the reference's
'multi-node without a cluster' gap — SURVEY.md §4).

Note: the environment's axon TPU plugin force-registers itself at
interpreter startup and overrides JAX_PLATFORMS, so the platform must be
pinned via jax.config *after* importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
