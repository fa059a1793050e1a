"""Sharding/mesh tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from list_tpu.parallel import (DATA_AXIS, QUERY_AXIS, auto_mesh,
                               batch_sharding, make_mesh, query_sharding,
                               shard_batch)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == 'cpu'


def test_make_mesh_1d_2d():
    m1 = make_mesh()
    assert m1.axis_names == (DATA_AXIS,)
    assert m1.devices.size == 8
    m2 = make_mesh((4, 2))
    assert m2.axis_names == (DATA_AXIS, QUERY_AXIS)
    assert m2.shape[DATA_AXIS] == 4 and m2.shape[QUERY_AXIS] == 2


def test_auto_mesh_divisibility():
    assert auto_mesh(8).devices.size == 8
    assert auto_mesh(2).devices.size == 2
    assert auto_mesh(3).devices.size == 3
    assert auto_mesh(5).devices.size == 5
    assert auto_mesh(1).devices.size == 1


def test_shard_batch_spreads_data():
    mesh = make_mesh()
    batch = {'x': np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = shard_batch(mesh, batch)
    x = sharded['x']
    assert x.sharding.is_equivalent_to(batch_sharding(mesh), 2)
    np.testing.assert_array_equal(np.asarray(x), batch['x'])


def test_query_sharded_computation_matches_single():
    """A jitted reduction over query-sharded input equals the unsharded one."""
    mesh = make_mesh()
    x = np.random.RandomState(0).randn(1, 64, 8).astype(np.float32)

    @jax.jit
    def f(a):
        return jnp.sum(a * a, axis=-1)

    ref = f(jnp.asarray(x))
    sharded = jax.device_put(jnp.asarray(x), query_sharding(mesh))
    out = f(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_dryrun_multichip_entry():
    """The driver-facing multi-chip validation must pass on 8 devices."""
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_graft_entry_compiles():
    from __graft_entry__ import entry
    fn, args = entry()
    # trace-level check only (full 128^3 compile is the driver's job)
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (1, 4096)
