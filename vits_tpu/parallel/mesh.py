"""Device mesh + sharding for data-parallel (and optionally model-parallel)
training and serving.

The reference scales with one-process-per-GPU DDP over NCCL
(train.py:29-50,116-118) and rank-strided data sampling (data_utils.py:231).
TPU-native equivalent: ONE jitted train step over a `jax.sharding.Mesh`; the
batch is sharded over the `data` axis, parameters/optimizer state are
replicated (or sharded over `model` for the wide decoder stages), and XLA
GSPMD inserts the gradient all-reduces over ICI — there is no user-visible
communication code. Multi-host runs the same program after
`jax.distributed.initialize()`; each process feeds its local batch shard.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host-global batch dict with the batch dim sharded over `data`."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def make_sharded_train_step(train_step, mesh: Mesh):
    """jit the train step with explicit input/output shardings: state
    replicated, batch sharded over `data`, scalars replicated."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, bsh, rep, rep, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def local_batch_to_global(mesh: Mesh, local_batch: dict) -> dict:
    """Multi-host: assemble global sharded arrays from per-process local
    shards (the bucket sampler already rank-strides by jax.process_index())."""
    sh = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(sh, v)
            for k, v in local_batch.items()}
