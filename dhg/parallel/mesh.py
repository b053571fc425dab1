"""Device mesh construction and canonical shardings.

The reference is single-device (utils/nn.py:12-16; no torch.distributed
anywhere). Here parallelism is first-class SPMD over a 2-D
Mesh(('data', 'model')):

  * 'data'  — batch axis; gradients are psum'd by XLA over ICI;
  * 'model' — tensor axis; large FFN hiddens and attention heads are sharded
    across it (see dhg.parallel.sharding), giving a real tp seam even though
    a ~10M-param model doesn't need it — the point is the design scales.

On one chip the mesh is (1, 1) and everything below is a no-op.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices=None, model_parallel: int = 1, data_parallel: int | None = None
) -> Mesh:
    """Build a Mesh(('data','model')) over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    grid = np.asarray(devices[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
