"""Multi-host (multi-process) runtime entry.

The reference's comm backend is single-process ``torch.nn.DataParallel``
(reference train.py:126); its only cross-machine scaling is manual test-set
sharding via ``--chunk_s/--chunk_l`` slices (reference test.py:108-113).
The TPU-native equivalent (SURVEY.md §2.7/§5) is JAX's multi-controller
runtime: every host runs the same program, ``jax.distributed.initialize``
wires them into one coordinator, and ``jax.devices()`` becomes the GLOBAL
device list — the existing ``parallel.mesh.make_mesh`` then spans hosts and
XLA routes collectives over ICI/DCN with no code changes.

Usage (one command per host):

    COORDINATOR_ADDRESS=host0:9911 NUM_PROCESSES=4 PROCESS_ID=$i \
        python train.py ... --multihost 1

Evaluation sweeps shard the test list per process with
``shard_datalist`` (process_index-strided, the parallel analog of the
reference's contiguous chunk_s/chunk_l slices); each host writes its own
CSV chunk exactly like a manual chunk run, and ``evaluation/evaluate_gather``
merges them.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Join the multi-controller runtime; returns this process's index.

    Arguments default from the standard environment variables
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID — the names JAX's own
    cluster autodetection uses).  On managed TPU pods (GKE/Cloud TPU) all
    three may be omitted: ``jax.distributed.initialize()`` autodetects.
    Safe to call twice (second call is a no-op), and a no-op for an
    explicit single-process run (num_processes == 1 with no coordinator).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_index()
    coordinator_address = (coordinator_address
                           or os.environ.get('COORDINATOR_ADDRESS'))
    if num_processes is None:
        num_processes = int(os.environ.get('NUM_PROCESSES', 0)) or None
    if process_id is None:
        pid = os.environ.get('PROCESS_ID')
        process_id = int(pid) if pid is not None else None
    if coordinator_address is None and num_processes == 1:
        _INITIALIZED = True
        return 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True
    return jax.process_index()


def maybe_initialize(config) -> int:
    """Driver hook: join the runtime when ``--multihost 1``; otherwise a
    no-op returning 0 (single-controller)."""
    if not int(getattr(config, 'multihost', 0)):
        return 0
    return initialize(
        coordinator_address=(getattr(config, 'coordinator_address', '')
                             or None),
        num_processes=int(getattr(config, 'num_processes_dist', 0)) or None,
        process_id=(int(config.process_id)
                    if int(getattr(config, 'process_id', -1)) >= 0 else None))


def process_info() -> tuple:
    return jax.process_index(), jax.process_count()


def shard_datalist(datalist: Sequence, process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> list:
    """Strided per-process slice of an eval/test list.

    Strided (``datalist[i::n]``) rather than contiguous so category blocks —
    the reference test lists are sorted by category — spread evenly across
    hosts (the contiguous manual analog is --chunk_s/--chunk_l, reference
    test.py:108-113).
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if process_count <= 1:
        return list(datalist)
    return list(datalist)[process_index::process_count]


def sync_global_devices(tag: str = 'barrier') -> None:
    """Cross-process barrier (checkpoint write ordering, CSV gather)."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)
