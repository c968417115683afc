"""Device mesh + sharding helpers.

Replaces the reference's tf.distribute strategy selection (utils/device.py:3-13
for inference, kecam imagenet/train_func.py:12-41 for training) with the JAX
equivalents: one global ``Mesh`` with a ``data`` axis (data parallel — the only
parallelism the reference has, SURVEY.md §2.6) plus an optional ``model`` axis
for tensor-parallel experiments on the biggest backbones. Collectives are XLA
(psum/all_gather over ICI), inserted by the compiler from sharding
annotations — never hand-rolled NCCL/MPI.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over all local devices.

    parity role: utils/device.py get_device() — but returns a Mesh instead of
    a Strategy; replica count == mesh size on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def num_replicas(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data axis (per-replica split of model.predict)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host array on device, batch dim split over the data axis."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (weights) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
