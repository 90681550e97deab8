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

    # bind the trailing lr_p default so in_shardings (which must match the
    # number of args actually passed) always sees 7 positional args
    def step7(state, batch, rng, lr_g, lr_d, align_noise, lr_p):
        return train_step(state, batch, rng, lr_g, lr_d, align_noise, lr_p)

    jitted = jax.jit(
        step7,
        in_shardings=(rep, bsh, rep, rep, rep, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )

    def call(state, batch, rng, lr_g, lr_d, align_noise, lr_p=1e-4):
        return jitted(state, batch, rng, lr_g, lr_d, align_noise, lr_p)

    return call


def generator_param_specs(params, mesh: Mesh, min_channels: int = 128):
    """Tensor-parallel sharding spec tree for the synthesizer params: the wide
    HiFi-GAN decoder kernels are sharded channel-wise over the `model` axis
    (BASELINE north star — decoder sharded when it exceeds one chip); XLA
    GSPMD propagates activations and inserts the collectives. Everything else
    stays replicated.

    Kernels (K, C_in, C_out): C_out sharded when divisible by the axis size
    and >= min_channels; matching biases likewise. Adjacent layers with
    conflicting layouts get resharded automatically — correctness is
    GSPMD-guaranteed, layout choice is a perf knob.
    """
    size = mesh.shape["model"]

    def rec(tree, in_dec):
        if isinstance(tree, dict):
            return {k: rec(v, in_dec or k == "dec") for k, v in tree.items()}
        shape = tree.shape
        if (in_dec and size > 1 and len(shape) >= 2
                and shape[-1] % size == 0 and shape[-1] >= min_channels):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), "model"))
        return NamedSharding(mesh, P())

    return rec(params, False)


def shard_generator_params(mesh: Mesh, params):
    specs = generator_param_specs(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, specs)


def make_tp_infer(synth, mesh: Mesh, phase: str = "p2"):
    """jit infer_p1/p2 with decoder-sharded params and replicated inputs."""
    rep = replicated(mesh)
    if phase == "p1":
        fn = lambda p, x, m, e, s: synth.infer_p1(p, x, e, s, x_mask=m)
    else:
        fn = lambda p, a, m, s, g, n, ym: synth.infer_p2(p, a, m, s, g, n, y_mask=ym)

    def wrapper(params, *args):
        specs = generator_param_specs(params, mesh)
        return jax.jit(fn, in_shardings=(specs,) + (rep,) * len(args),
                       out_shardings=rep)(params, *args)

    return wrapper


def local_batch_to_global(mesh: Mesh, local_batch: dict) -> dict:
    """Multi-host: assemble global sharded arrays from per-process local
    shards (the bucket sampler already rank-strides by jax.process_index())."""
    sh = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(sh, v)
            for k, v in local_batch.items()}
