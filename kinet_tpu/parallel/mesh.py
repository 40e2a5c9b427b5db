"""Device mesh + sharding helpers.

The reference scales with NCCL DistributedDataParallel (reference:
src/train.py:89-91, util/misc.py:515-538). TPU-native equivalent: a
`jax.sharding.Mesh` with a `data` axis (DP) and a `model` axis (reserved
for TP of the backbone/transformer at larger scales); the train step is
jit-compiled with NamedSharding annotations so XLA inserts the gradient
all-reduce (psum) over ICI automatically — no explicit collectives.

Multi-host: `jax.distributed.initialize()` + the same mesh over all
processes ≙ the reference's env:// / SLURM rendezvous (misc.py:516-527).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(tree, mesh: Mesh):
    """Place every array with a leading batch axis onto the data axis."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
