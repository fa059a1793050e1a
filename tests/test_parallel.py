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
    """The driver-facing multi-chip validation (2x2 data x query mesh).

    Runs in a subprocess with 4 virtual devices: this host has ONE physical
    core, and XLA-CPU cross-device collectives abort on a 40 s rendezvous
    timeout when 8 starved device threads contend (the driver runs the real
    8-device check on its own host).
    """
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip; dryrun_multichip(4)'],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'dryrun_multichip(4) ok' in out.stdout


def test_graft_entry_compiles():
    from __graft_entry__ import entry
    fn, args = entry()
    # trace-level check only (full 128^3 compile is the driver's job)
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (1, 4096)


def test_dense_grid_sharded_matches_single():
    """Query-axis sharding of the dense-grid decode (shard_map over x-slabs,
    SURVEY §2.7 'query-chunk parallelism at scale') is bit-equal to the
    single-device scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from list_tpu.models import LIST
    from list_tpu.ops.dense_grid import dense_grid_sdf
    from list_tpu.parallel import make_mesh, QUERY_AXIS

    R = 16
    model = LIST(vox_res=R, point_feat=(128, 8, 8, 3),
                 point_degree=(2, 2, 4),
                 im_enc_layers=(1, 1, 1, 1, 2, 4, 4, 4), h_dim=8, support=2)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                      jnp.float32)
    v = model.init(jax.random.PRNGKey(1), img, jnp.zeros((1, 8, 3)))
    enc = model.apply(v, img, method=model.encode)
    args = (v['params']['sdf_decoder'], enc['vox_feat'], enc['feat_l2'],
            enc['trans_mat'], R)
    a = np.asarray(dense_grid_sdf(*args, slab=4,
                                  compute_dtype=jnp.float32))
    mesh = make_mesh((2, 2))
    b = np.asarray(dense_grid_sdf(*args, slab=4, compute_dtype=jnp.float32,
                                  mesh=mesh, shard_axis=QUERY_AXIS))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_fused_sampler_data_sharded_matches_single():
    """--fuse_sample_gathers under data-parallel SPMD: the shared flat
    buffer's batch-offset index math (off + b*M + flat) must survive the
    partitioner when the batch axis is sharded."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from list_tpu.ops.sampling import (pack_channels_last,
                                       sample_multiscale_packed)
    from list_tpu.parallel import auto_mesh, batch_sharding

    rng = np.random.RandomState(7)
    packed, metas = [], []
    for res, c in ((8, 1), (4, 4), (2, 8)):
        f = jnp.asarray(rng.randn(2, res, res, res, c).astype(np.float32))
        p_, m_ = pack_channels_last(f)
        packed.append(p_)
        metas.append(m_)
    p = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 33, 3)).astype(np.float32))

    fn = jax.jit(lambda pk, q: sample_multiscale_packed(
        pk, metas, q, fuse_group=2))
    a = np.asarray(fn(packed, p))

    mesh = auto_mesh(2)
    sh = batch_sharding(mesh)
    packed_s = [jax.device_put(x, sh) for x in packed]
    p_s = jax.device_put(p, sh)
    b = np.asarray(fn(packed_s, p_s))
    np.testing.assert_allclose(b, a, atol=1e-6, rtol=1e-6)


def test_predict_grid_band_sharded_matches_single():
    """Executor-level multi-device predict with the band wire (the r5
    default --fetch_mode): the sharded dense decode + in-jit band encode
    must reconstruct the same grid classes/mesh values as a single-device
    grid-mode predict."""
    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.ops.band import BandGrid, fetch_grid_f32
    from list_tpu.train.executors import LISTExecutor

    cfg = default_config(vox_res=16, img_res=32, sample_point_density=128,
                         point_feat=[128, 8, 8, 3], point_degree=[2, 2, 4],
                         im_enc_layers=[1, 1, 1, 1, 2, 4, 4, 4],
                         sdf_scale=10.0, test_pointnum=1024,
                         train_batch_size=1)
    model = LIST(vox_res=16, point_feat=tuple(cfg.point_feat),
                 point_degree=tuple(cfg.point_degree),
                 im_enc_layers=tuple(cfg.im_enc_layers), h_dim=8, support=2)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)

    ex1 = LISTExecutor(cfg, model, mesh=make_mesh((1,)))
    ex1.init_state({'rgb_image': img})
    full = ex1.predict_grid(img, fetch_dtype='bfloat16', fetch_mode='grid')

    ex2 = LISTExecutor(cfg, model, mesh=make_mesh((2, 2)))
    ex2.state = jax.device_put(
        ex1.state, jax.sharding.NamedSharding(ex2.mesh, P()))
    dev = ex2.predict_grid(img, fetch_dtype='bfloat16', fetch_mode='band',
                           device_out=True)
    assert isinstance(dev, BandGrid)
    band = fetch_grid_f32(dev)
    np.testing.assert_array_equal(band > 0, full > 0)
    from list_tpu.ops.band import _mixed_cube_mask
    mask = _mixed_cube_mask(full > 0)
    np.testing.assert_array_equal(band[mask], full[mask])
