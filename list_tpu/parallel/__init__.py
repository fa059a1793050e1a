"""Mesh + sharding layer (pjit data parallelism, query sharding)."""

from list_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, QUERY_AXIS, make_mesh, auto_mesh, replicated, batch_sharding,
    query_sharding, shard_batch, shard_batch_stacked, replicate_tree,
    pad_to_multiple)
