"""Device mesh + sharding layout for MINTIME-TPU.

Replaces the reference's ``torch.nn.DataParallel`` single-process replication
(train.py:294-296; SURVEY.md §2.5/§5.8) with SPMD over a
``jax.sharding.Mesh``:

* ``data`` axis — batch dimension of every input tensor is sharded here;
  XLA inserts the gradient all-reduce over ICI automatically.
* ``model`` axis (optional, size 1 by default) — reserved for tensor
  parallelism of the attention heads / FFN should the model ever outgrow a
  chip (≈25M params today, so it never needs >1).

Multi-host pods: call ``jax.distributed.initialize()`` before
:func:`make_mesh`; ``jax.devices()`` then spans all hosts and the same code
scales over DCN with no model change.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Sequence[jax.Device] | None = None, model_parallel: int = 1
) -> Mesh:
    """A (data, model) mesh over all (or the given) devices.

    ``model_parallel=1`` (default) gives pure data parallelism, the
    TPU-native replacement for the reference's DataParallel.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if devs.size % model_parallel:
        raise ValueError(
            f"{devs.size} devices not divisible by model_parallel={model_parallel}"
        )
    grid = devs.reshape(devs.size // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded on ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
