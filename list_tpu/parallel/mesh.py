"""Device mesh construction and sharding specs.

The reference's only parallelism is intra-process ``torch.nn.DataParallel``
(train.py:126) plus a serial 32-chunk query loop at inference
(executors.py:191-224).  TPU-native replacement (SURVEY.md §2.7):

- training: 1-D (or 2-D) mesh with a ``data`` axis — batch sharded, params
  replicated, batch-norm statistics globally reduced by XLA collectives over
  ICI (an intentional sync-BN upgrade over DataParallel's per-replica stats).
- inference: the dense SDF grid is embarrassingly parallel given replicated
  image/voxel features — the ``query`` axis shards the N dimension of the
  query tensor across devices.

No hand-written communication: shardings are declared with
``jax.sharding.NamedSharding`` and XLA emits the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
QUERY_AXIS = 'query'


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a device mesh.

    - no shape / 1 element: 1-D ('data',) over all devices.
    - 2 elements (d, q): 2-D ('data', 'query') mesh.
    """
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    mesh_shape = tuple(int(s) for s in mesh_shape)
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f'mesh shape {mesh_shape} needs {n} devices, have '
                         f'{len(devices)}')
    devs = np.asarray(devices[:n])
    if len(mesh_shape) == 1:
        return Mesh(devs.reshape(mesh_shape), (DATA_AXIS,))
    if len(mesh_shape) == 2:
        return Mesh(devs.reshape(mesh_shape), (DATA_AXIS, QUERY_AXIS))
    raise ValueError(f'Unsupported mesh rank: {mesh_shape}')


def auto_mesh(batch_size: int, devices=None) -> Mesh:
    """1-D data mesh over the largest device count that divides
    ``batch_size`` (so small test/bench batches still shard cleanly)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh((n,), devices=devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def query_sharding(mesh: Mesh) -> NamedSharding:
    """Shard queries (B, N, ...) over the query axis (falls back to the data
    axis on a 1-D mesh)."""
    axis = QUERY_AXIS if QUERY_AXIS in mesh.axis_names else DATA_AXIS
    return NamedSharding(mesh, P(None, axis))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch dict with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_batch_stacked(mesh: Mesh, batch: dict) -> dict:
    """Device-put a K-step stacked batch dict (arrays are (K, B, ...)):
    axis 0 is the scan (step) axis, axis 1 the data-parallel batch axis."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
