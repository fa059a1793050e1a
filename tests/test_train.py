"""Training-stack tests: executors, optimizer parity, checkpoints,
warm-start freezing, and a CoarseNet overfit smoke test (CPU, tiny config).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from list_tpu.config import default_config
from list_tpu.data import SyntheticSDFDataset, collate
from list_tpu.models import CoarseNet, LIST
from list_tpu.train import (CoarseNetExecutor, LISTExecutor, checkpoints,
                            total_loss)
from list_tpu.train.state import make_optimizer


def tiny_cfg(**kw):
    base = dict(vox_res=16, img_res=32, sample_point_density=128,
                coarse_point_density=500, train_batch_size=2,
                point_feat=[128, 8, 8, 3], point_degree=[2, 2, 4],
                im_enc_layers=[1, 1, 1, 1, 2, 4, 4, 4], sdf_scale=10.0,
                test_pointnum=1024, lr=1e-3)
    base.update(kw)
    return default_config(**base)


def make_batch(cfg, n_shapes=2):
    ds = SyntheticSDFDataset(cfg, 'train', n_shapes=n_shapes)
    return collate([ds[i] for i in range(cfg.train_batch_size)]), ds


def test_total_loss_ignores_diagnostics():
    d = {'a': jnp.asarray(1.0), 'ignore_b': jnp.asarray(100.0),
         'c': jnp.asarray(2.0)}
    assert float(total_loss(d)) == 3.0


def test_optimizer_matches_torch_adam(rng):
    """One optimizer step vs torch.optim.Adam with coupled weight decay."""
    import torch
    w0 = rng.randn(4, 3).astype(np.float32)
    g = rng.randn(4, 3).astype(np.float32)
    lr, wd = 1e-3, 1e-2

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=lr, betas=(0.9, 0.999), weight_decay=wd)
    tw.grad = torch.tensor(g.copy())
    opt.step()

    tx = make_optimizer(lr, weight_decay=wd)
    params = {'w': jnp.asarray(w0)}
    opt_state = tx.init(params)
    updates, _ = tx.update({'w': jnp.asarray(g)}, opt_state, params)
    new_w = np.asarray(params['w'] + updates['w'])
    np.testing.assert_allclose(new_w, tw.detach().numpy(), atol=1e-6)


def test_frozen_prefixes_zero_updates(rng):
    tx = make_optimizer(1e-3, frozen_prefixes=('enc',))
    params = {'enc': {'w': jnp.ones((2,))}, 'dec': {'w': jnp.ones((2,))}}
    opt_state = tx.init(params)
    grads = {'enc': {'w': jnp.ones((2,))}, 'dec': {'w': jnp.ones((2,))}}
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates['enc']['w']).sum()) == 0.0
    assert float(jnp.abs(updates['dec']['w']).sum()) > 0.0


@pytest.fixture(scope='module')
def coarse_exec():
    cfg = tiny_cfg(lr=1e-4)  # reference lr; 1e-3 oscillates with chamfer*1000
    model = CoarseNet(point_feat=tuple(cfg.point_feat),
                      point_degree=tuple(cfg.point_degree), support=2)
    ex = CoarseNetExecutor(cfg, model)
    batch, ds = make_batch(cfg)
    batch = {'rgb_image': batch['rgb_image'], 'pc': batch['pc'][:, :500]}
    ex.init_state(batch)
    return ex, batch


def test_coarsenet_overfit_smoke(coarse_exec):
    ex, batch = coarse_exec
    losses = []
    for _ in range(10):
        _, loss = ex.train(batch)
        losses.append(float(loss['chamfer_loss']))
    assert losses[-1] < losses[0] / 2, f'loss did not decrease: {losses}'
    assert np.isfinite(losses).all()


def test_coarsenet_test_and_save(coarse_exec, tmp_path):
    ex, batch = coarse_exec
    pred, score = ex.test({'rgb_image': batch['rgb_image'][:1],
                           'pc': batch['pc'][:1]}, eval_pred=True)
    assert pred.shape[0] == 1 and pred.shape[2] == 3
    assert 'chamfer_l2' in score
    ex.save(None, pred, str(tmp_path / 'shape'))
    assert os.path.exists(tmp_path / 'shape_pred.obj')


@pytest.fixture(scope='module')
def list_exec():
    cfg = tiny_cfg()
    model = LIST(vox_res=cfg.vox_res, point_feat=tuple(cfg.point_feat),
                 point_degree=tuple(cfg.point_degree),
                 im_enc_layers=tuple(cfg.im_enc_layers), h_dim=8, support=2)
    ex = LISTExecutor(cfg, model)
    batch, ds = make_batch(cfg)
    ex.init_state(batch)
    return ex, batch, ds


def test_list_train_step(list_exec):
    ex, batch, _ = list_exec
    _, losses = ex.train(batch)
    for key in ('occ_loss', 'sdf_loss', 'ignore_sdf_accuracy'):
        assert key in losses
    assert np.isfinite(float(losses['occ_loss']))
    assert np.isfinite(float(losses['sdf_loss']))
    # second step: loss finite and state advanced
    _, losses2 = ex.train(batch)
    assert int(ex.state.step) == 2


def test_sort_queries_loss_parity():
    """--sort_queries permutes (points, values) jointly inside the train
    step; every loss is a permutation-invariant reduction over queries, so
    losses must match the unsorted step up to fp reordering."""
    results = {}
    for sort in (0, 1):
        cfg = tiny_cfg(sort_queries=sort)
        model = LIST(vox_res=cfg.vox_res, point_feat=tuple(cfg.point_feat),
                     point_degree=tuple(cfg.point_degree),
                     im_enc_layers=tuple(cfg.im_enc_layers), h_dim=8,
                     support=2)
        ex = LISTExecutor(cfg, model)
        batch, _ = make_batch(cfg)
        ex.init_state(batch)
        _, losses = ex.train(batch)
        results[sort] = {k: float(v) for k, v in losses.items()}
    for k in results[0]:
        np.testing.assert_allclose(results[1][k], results[0][k], rtol=2e-5,
                                   err_msg=f'loss {k} diverged under sorting')


def test_remat_save_samples_loss_parity():
    """--remat_save_samples changes only WHAT the decode remat saves
    (jax.checkpoint policy) — losses and the updated state must be
    identical to full remat."""
    results = {}
    for save in (0, 1, 2):
        cfg = tiny_cfg(remat=1, remat_decode=1, train_query_chunks=2,
                       remat_save_samples=save)
        model = LIST.from_config(cfg)
        model = model.clone(point_feat=tuple(cfg.point_feat),
                            point_degree=tuple(cfg.point_degree),
                            im_enc_layers=tuple(cfg.im_enc_layers),
                            h_dim=8, support=2)
        ex = LISTExecutor(cfg, model)
        batch, _ = make_batch(cfg)
        ex.init_state(batch)
        _, losses = ex.train(batch)
        results[save] = {k: float(v) for k, v in losses.items()}
    for save in (1, 2):
        for k in results[0]:
            np.testing.assert_allclose(
                results[save][k], results[0][k], rtol=1e-6,
                err_msg=f'loss {k} diverged under remat_save_samples={save}')


def test_steps_per_dispatch_parity():
    """--steps_per_dispatch (train_multi): K lax.scan'd steps in ONE
    program must match K single-step dispatches — same per-step losses,
    same final params (the scan body IS _train_step_fn; only dispatch
    count changes).  VERDICT r4 next-round #1."""
    cfg = tiny_cfg()
    ds = SyntheticSDFDataset(cfg, 'train', n_shapes=4)
    b1 = collate([ds[0], ds[1]])
    b2 = collate([ds[2], ds[3]])

    def build():
        model = LIST(vox_res=cfg.vox_res, point_feat=tuple(cfg.point_feat),
                     point_degree=tuple(cfg.point_degree),
                     im_enc_layers=tuple(cfg.im_enc_layers), h_dim=8,
                     support=2)
        ex = LISTExecutor(cfg, model)
        ex.init_state(b1)
        return ex

    ex_single = build()
    _, l1 = ex_single.train(b1)
    l1 = {k: float(v) for k, v in l1.items()}
    _, l2 = ex_single.train(b2)
    l2 = {k: float(v) for k, v in l2.items()}

    ex_multi = build()
    _, stacked = ex_multi.train_multi([b1, b2])
    stacked = {k: np.asarray(v) for k, v in stacked.items()}

    for k in l1:
        assert stacked[k].shape == (2,)
        # step 1 runs from the identical initial state: near-exact (only
        # program-level fusion/reassociation differs) — this pins the
        # batch ORDER and the carry threading.
        np.testing.assert_allclose(stacked[k][0], l1[k], rtol=2e-5,
                                   err_msg=f'step-1 loss {k}')
        # step 2 amplifies step-1's low-order fp drift through the bf16
        # feature packing + Adam; measured ~4e-4 relative on CPU.  A
        # semantic bug (wrong batch, skipped step) would be orders larger.
        np.testing.assert_allclose(stacked[k][1], l2[k], rtol=5e-3,
                                   err_msg=f'step-2 loss {k}')
    assert int(ex_multi.state.step) == 2
    p_s = jax.tree.leaves(jax.tree.map(np.asarray, ex_single.state.params))
    p_m = jax.tree.leaves(jax.tree.map(np.asarray, ex_multi.state.params))
    for a, b in zip(p_s, p_m):
        # Adam normalizes each update to ~lr: where a gradient component
        # is near zero, cross-program last-ulp drift can flip its SIGN and
        # the two paths step +-lr apart (measured: 0.4% of elements, max
        # 3.3e-3 after 2 steps at lr=1e-3).  Bound at the 2-step Adam
        # movement scale — structural bugs (wrong/skipped batch) move
        # far more than 4*lr.
        np.testing.assert_allclose(a, b, atol=4e-3)


def test_step_losses_ragged_tail():
    """_step_losses: 5 batches at K=2 -> two multi dispatches + one single
    tail step, losses yielded per step in order."""
    from types import SimpleNamespace

    from list_tpu.train.trainer import _step_losses

    calls = []

    class Stub:
        def train(self, batch=None, calc_loss=True):
            calls.append(('single', [batch]))
            return None, {'l': jnp.asarray(float(batch))}

        def train_multi(self, batches):
            calls.append(('multi', list(batches)))
            return None, {'l': jnp.asarray([float(b) for b in batches])}

    cfg = SimpleNamespace(steps_per_dispatch=2, checkify=False)
    out = list(_step_losses(Stub(), cfg, iter(range(5))))
    assert [o['l'] for o in out] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert [c[0] for c in calls] == ['multi', 'multi', 'single']


def test_list_inference_mesh(list_exec, tmp_path):
    ex, batch, ds = list_exec
    td = ds.get_testdata('synthetic', '0', 0)
    pred, score = ex.test(td, eval_pred=False)
    mesh, grid = pred
    assert grid.shape == (16, 16, 16)
    ex.save(td, pred, str(tmp_path / 'shape'))
    assert os.path.exists(tmp_path / 'shape_pred.obj')


def test_predict_grid_odd_resolution_falls_back():
    """vox_res with no slab divisor (15): the dense x-slab scan cannot run
    (it asserts R % slab == 0, ADVICE r2 #1), so predict_grid must fall
    back to the chunked gather decoder and still produce the full grid."""
    cfg = tiny_cfg(vox_res=15)
    model = LIST(vox_res=15, point_feat=tuple(cfg.point_feat),
                 point_degree=tuple(cfg.point_degree),
                 im_enc_layers=tuple(cfg.im_enc_layers), h_dim=8, support=2)
    ex = LISTExecutor(cfg, model)
    batch, _ = make_batch(cfg)
    ex.init_state(batch)
    img = batch['rgb_image'][:1]
    g = ex.predict_grid(img, fetch_dtype='float32')  # fast=None: auto
    assert g.shape == (15, 15, 15)
    assert np.isfinite(g).all()
    # identical to the explicit chunked path (same code path taken)
    g2 = ex.predict_grid(img, fast=False, fetch_dtype='float32')
    np.testing.assert_array_equal(g, g2)


def test_predict_grid_bf16_fetch(list_exec):
    """--fetch_dtype bfloat16 (the default) halves host-link bytes; the
    grid must round-trip within bf16 tolerance of the f32 fetch and keep
    full relative precision near the zero crossing (what marching cubes
    interpolates)."""
    ex, batch, ds = list_exec
    img = batch['rgb_image'][:1]
    f32 = ex.predict_grid(img, fetch_dtype='float32', fetch_mode='grid')
    assert f32.dtype == np.float32
    dev = ex.predict_grid(img, device_out=True, fetch_dtype='bfloat16',
                          fetch_mode='grid')
    assert dev.dtype == jnp.bfloat16
    b = np.asarray(dev).astype(np.float32)
    host = ex.predict_grid(img, fetch_dtype='bfloat16', fetch_mode='grid')
    assert host.dtype == np.float32
    np.testing.assert_array_equal(host, b)
    # bf16 relative error is <= 2^-8; values are O(1) after /sdf_scale
    assert np.abs(b - f32).max() <= np.abs(f32).max() * 2.0 ** -8 + 1e-6
    near = np.abs(f32) < 0.05  # near the iso-surface
    if near.any():
        assert np.abs(b[near] - f32[near]).max() <= \
            np.abs(f32[near]).max() * 2.0 ** -8 + 1e-7


def test_predict_grid_band_mode(list_exec):
    """--fetch_mode band (the default): identical vertex classes
    everywhere, exact values on the mixed-cube band, and the extracted
    mesh bitwise equal to the full-grid fetch (VERDICT r4 #3)."""
    from list_tpu.ops.band import BandGrid, fetch_grid_f32
    from list_tpu.utils.meshing import generate_mesh

    ex, batch, ds = list_exec
    img = batch['rgb_image'][:1]
    full = ex.predict_grid(img, fetch_dtype='bfloat16', fetch_mode='grid')
    band = ex.predict_grid(img, fetch_dtype='bfloat16', fetch_mode='band')
    np.testing.assert_array_equal(full > 0, band > 0)
    from list_tpu.ops.band import _mixed_cube_mask
    mask = _mixed_cube_mask(full > 0)
    np.testing.assert_array_equal(band[mask], full[mask])
    mf = generate_mesh(full, ex.bb_min, ex.bb_max, as_trimesh_obj=True)
    mb = generate_mesh(band, ex.bb_min, ex.bb_max, as_trimesh_obj=True)
    np.testing.assert_array_equal(np.asarray(mf.vertices),
                                  np.asarray(mb.vertices))
    np.testing.assert_array_equal(np.asarray(mf.faces),
                                  np.asarray(mb.faces))
    # device_out returns a BandGrid whose fetch matches the host path
    dev = ex.predict_grid(img, fetch_dtype='bfloat16', fetch_mode='band',
                          device_out=True)
    assert isinstance(dev, BandGrid)
    np.testing.assert_array_equal(fetch_grid_f32(dev), band)
    # batch path wraps BandGrids too
    devs = ex.predict_grid_batch(img, device_out=True,
                                 fetch_dtype='bfloat16', fetch_mode='band')
    assert isinstance(devs[0], BandGrid)
    np.testing.assert_array_equal(fetch_grid_f32(devs[0]), band)


def test_checkpoint_roundtrip(list_exec, tmp_path):
    ex, batch, _ = list_exec
    path = str(tmp_path / 'ck.ckpt')
    checkpoints.save_checkpoint(4, ex.state, 1.25, path)
    # perturb, then restore
    old_params = jax.tree.map(np.asarray, ex.state.params)
    state2 = ex.state.replace(
        params=jax.tree.map(lambda x: x + 1.0, ex.state.params))
    epoch, restored, bestloss = checkpoints.load_checkpoint(path, state2)
    assert epoch == 5 and bestloss == 1.25
    restored_params = jax.tree.map(np.asarray, restored.params)
    jax.tree.map(np.testing.assert_array_equal, old_params, restored_params)


def test_submodule_checkpoint(list_exec, tmp_path):
    """best_IME/best_PD split + partial restore (warm-start path)."""
    ex, batch, _ = list_exec
    p_ime = str(tmp_path / 'best_IME_test.ckpt')
    checkpoints.save_submodule(3, ex.state, 'im_encoder', p_ime)
    # zero out both encoders, restore into each
    zeroed = ex.state.replace(params=jax.tree.map(jnp.zeros_like,
                                                  ex.state.params))
    st = checkpoints.load_submodule(p_ime, zeroed, 'im_encoder')
    st = checkpoints.load_submodule(p_ime, st, 'im_encoder2')
    orig = jax.tree.map(np.asarray, ex.state.params['im_encoder'])
    jax.tree.map(np.testing.assert_array_equal, orig,
                 jax.tree.map(np.asarray, st.params['im_encoder']))
    jax.tree.map(np.testing.assert_array_equal, orig,
                 jax.tree.map(np.asarray, st.params['im_encoder2']))
    # untouched submodule stays zero
    assert float(jax.tree.reduce(
        lambda a, b: a + float(np.abs(b).sum()),
        st.params['sdf_decoder'], 0.0)) == 0.0


def test_dense_plan_selection(monkeypatch):
    """Head/slab auto-selection invariants (r3 on-chip A/Bs):
    - TPU single-device R<=128 -> single slab (slab=R) + split-parts
      fused head (use_pallas=2); the XLA head is never paired with
      slab=R (that program crashes the remote TPU compiler).
    - CPU always gets the XLA head (no Mosaic CPU lowering).
    - multi-device: slab count must split across the sharded axis.
    - no divisor (odd resolutions) -> slab None (chunked fallback)."""
    from types import SimpleNamespace
    from list_tpu.train import executors as ex_mod

    def plan(vox_res, ndev=1, use_pallas=-1):
        fake = SimpleNamespace(vox_res=vox_res,
                               config=SimpleNamespace(use_pallas=use_pallas))
        return LISTExecutor._dense_plan(fake, ndev)

    # CPU platform (the test env): XLA head everywhere
    assert plan(128) == (64, 0, 1)
    assert plan(256) == (8, 0, 2)
    assert plan(15) == (None, 0, 1)
    assert plan(128, ndev=8) == (16, 0, 2)  # 128/16 = 8 slabs split 8 ways
    assert plan(128, use_pallas=2) == (64, 0, 1)  # no Mosaic on CPU

    # TPU platform: fake the device list
    fake_dev = SimpleNamespace(platform='tpu')
    monkeypatch.setattr(ex_mod.jax, 'devices', lambda *a: [fake_dev])
    assert plan(128) == (128, 2, 1)          # single-slab fused head
    assert plan(64) == (64, 2, 1)
    assert plan(120) == (120, 2, 1)          # 120^3 divisible by 512
    # tile gate: 127^3 has no power-of-two tile, so the fused head can't
    # engage — must NOT hand dense_grid an XLA slab-127 program
    assert plan(127) == (None, 0, 1)
    assert plan(15) == (None, 0, 1)          # ragged small R: chunked
    assert plan(128, use_pallas=2) == (128, 2, 1)
    assert plan(128, use_pallas=0) == (64, 0, 1)   # never slab=R with XLA
    assert plan(128, use_pallas=1) == (64, 1, 1)
    assert plan(128, ndev=2) == (64, 0, 1)   # sharded scan: XLA head
    assert plan(192) == (64, 0, 1)           # multi-slab: XLA head wins
    assert plan(256) == (8, 0, 2)
    assert plan(15) == (None, 0, 1)


def test_fc0_dmajor_parity():
    """--fc0_dmajor: tap-minor sampling + fc_0 kernel-row permutation must
    reproduce the reference-layout step — identical param tree/init, same
    losses up to matmul reassociation (the fc_0 contraction sums the same
    products in a permuted order)."""
    results = {}
    for dm in (0, 1):
        cfg = tiny_cfg(fc0_dmajor=dm)
        model = LIST.from_config(cfg)
        model = model.clone(point_feat=tuple(cfg.point_feat),
                            point_degree=tuple(cfg.point_degree),
                            im_enc_layers=tuple(cfg.im_enc_layers),
                            h_dim=8, support=2)
        ex = LISTExecutor(cfg, model)
        batch, _ = make_batch(cfg)
        ex.init_state(batch)
        if dm == 0:
            p0 = jax.tree.map(np.asarray, ex.state.params)
        else:
            # identical param trees + identical init draws (same paths)
            p1 = jax.tree.map(np.asarray, ex.state.params)
            jax.tree.map(np.testing.assert_array_equal, p0, p1)
        _, losses = ex.train(batch)
        results[dm] = {k: float(v) for k, v in losses.items()}
    for k in results[0]:
        np.testing.assert_allclose(results[1][k], results[0][k], rtol=2e-5,
                                   err_msg=f'loss {k} diverged under dmajor')
