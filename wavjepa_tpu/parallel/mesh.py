"""Device mesh and sharding helpers.

The reference scales with single-node DDP over NCCL
(/root/reference/train.py:174-179); the TPU-native equivalent is a single
jitted program over a `jax.sharding.Mesh` whose batch axis is sharded across
chips — XLA inserts the gradient all-reduce on ICI. Multi-host runs extend
the same mesh over DCN via `jax.distributed.initialize` (see
`initialize_multihost`); nothing else changes.

Axes:
  data  — batch-dim data parallelism (the only axis the 111 M-param base
          model needs; gradients all-reduce over ICI)
  model — optional tensor-parallel axis for the "large" (~300 M) encoder;
          param/activation rules live in `param_sharding_rules`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data mesh by default; 2-D (data, model) when model_parallel > 1.

    Uses `mesh_utils.create_device_mesh` so the data axis rides contiguous
    ICI links on real TPU topologies.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    shape = (n // model_parallel, model_parallel)
    try:
        dev_mesh = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_mesh = np.asarray(devices).reshape(shape)
    return Mesh(dev_mesh, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host array (or pytree of them) batch-sharded on the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )


def param_sharding_rules(params, mesh: Mesh):
    """NamedSharding tree for tensor parallelism over the `model` axis.

    Megatron-style column/row split of each transformer block, expressed as
    GSPMD shardings (XLA inserts the all-reduces):
      * in_proj / linear1 kernels: split the OUTPUT features (column)
      * out_proj / linear2 kernels: split the INPUT features (row)
      * biases of column-split layers: split; everything else replicated
        (conv frontend, norms, mappers, mask token — tiny next to the blocks).

    The base (111 M) model trains pure-DP; these rules exist for the "large"
    (~300 M) variant and are exercised by the multichip dry-run.
    """

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _tp_rule(path, mesh), params
    )


def _tp_rule(path, mesh: Mesh) -> NamedSharding:
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    is_kernel = names and names[-1] == "kernel"
    is_bias = names and names[-1] == "bias"
    if "in_proj" in joined or "linear1" in joined:
        if is_kernel:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if is_bias:
            return NamedSharding(mesh, P(MODEL_AXIS))
    if ("out_proj" in joined or "linear2" in joined) and is_kernel:
        return NamedSharding(mesh, P(MODEL_AXIS, None))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Place a parameter tree on the mesh according to the TP rules."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, param_sharding_rules(params, mesh)
    )


def shard_train_state(state, mesh: Mesh):
    """TP placement for a whole TrainState (params + EMA teacher + optimizer
    moments + step counter). The Megatron rules key on tree-path names, and
    optax moment trees (mu/nu) carry the parameter path as a suffix, so one
    path-based rule pass shards params, teacher, and moments consistently;
    scalars (step, count) come out replicated."""
    shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: _tp_rule(path, mesh), state
    )
    return jax.tree.map(jax.device_put, state, shardings)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host (DCN) bring-up: call once per host before building the
    mesh. No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
