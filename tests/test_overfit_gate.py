"""Trained-reconstruction quality gate (CPU, deterministic).

The module/parity suites prove every layer matches the reference
numerically, but none of them proves the system LEARNS: a silent sign
flip, a mis-scaled loss, or a broken gradient path would pass all of
them.  This gate overfits the full LIST model on ONE analytic sphere for
a few hundred steps — the minimal version of the reference's training
loop (reference train.py:63-115) — then runs the production decode ->
marching-cubes path (reference executors.py:176-243) and asserts the
extracted mesh's volumetric IoU against the analytic ground truth.

Fails if ANY part of train_step -> dense decode -> mesh extraction ->
containment eval silently degrades.  (The e2e driver tests in
test_e2e.py intentionally tolerate empty meshes after 1 epoch on 2
shapes; THIS test is the quality gate.)
"""

import numpy as np

from list_tpu.config import default_config
from list_tpu.data.synthetic import sphere_sdf
from list_tpu.eval.metrics import implicit_waterproofing
from list_tpu.models import LIST
from list_tpu.train.executors import LISTExecutor
from list_tpu.utils.meshing import generate_mesh

RADIUS = 0.35
STEPS = 600
N_QUERY = 2048


def _make_batch(rng, image, occ, pool_pts, pool_sdf):
    idx = rng.integers(0, len(pool_pts), N_QUERY)
    return {'rgb_image': image,
            'points': pool_pts[None, idx],
            'values': pool_sdf[None, idx],
            'occ': occ}


def test_overfit_sphere_iou_gate():
    cfg = default_config(
        vox_res=32, img_res=32, sample_point_density=N_QUERY,
        point_feat=[128, 8, 8, 3], point_degree=[2, 2, 4],
        im_enc_layers=[1, 1, 1, 1, 2, 4, 4, 4], sdf_scale=10.0,
        test_pointnum=4096, lr=3e-3, train_batch_size=1)
    model = LIST(vox_res=cfg.vox_res, point_feat=tuple(cfg.point_feat),
                 point_degree=tuple(cfg.point_degree),
                 im_enc_layers=tuple(cfg.im_enc_layers), h_dim=64,
                 support=2, im_filters=(8, 8, 8, 8, 8))
    ex = LISTExecutor(cfg, model)

    rng = np.random.default_rng(0)
    # analytic sphere: image is a flat disc render stand-in (the decoder
    # leans on the xyz + voxel path to memorize one shape); query pool
    # mixes near-surface and uniform points with EXACT sdf values.
    u = np.linspace(-0.6, 0.6, cfg.img_res)
    px, py = np.meshgrid(u, u, indexing='xy')
    disc = (px ** 2 + py ** 2 < RADIUS ** 2).astype(np.float32)
    image = np.stack([disc] * 3, -1)[None]

    n_pool = 32768
    dirs = rng.standard_normal((n_pool // 2, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    near = dirs * (RADIUS + 0.03 * rng.standard_normal((n_pool // 2, 1)))
    unif = rng.uniform(-0.5, 0.5, (n_pool // 2, 3))
    pool_pts = np.concatenate([near, unif]).astype(np.float32)
    pool_sdf = sphere_sdf(pool_pts, (0, 0, 0), RADIUS).astype(np.float32)

    # GT occupancy at vox_res for the occupancy loss
    r = cfg.vox_res
    x = (np.arange(r) + 0.5) / r - 0.5
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    occ = (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) < RADIUS
           ).astype(np.float32)[None]

    ex.init_state(_make_batch(rng, image, occ, pool_pts, pool_sdf))
    first = last = None
    for step in range(STEPS):
        _, losses = ex.train(_make_batch(rng, image, occ, pool_pts,
                                         pool_sdf))
        if step == 0:
            first = {k: float(v) for k, v in losses.items()}
        last = {k: float(v) for k, v in losses.items()}
    assert np.isfinite(last['sdf_loss'])
    assert last['sdf_loss'] < 0.5 * first['sdf_loss'], (first, last)

    grid = np.asarray(ex.predict_grid(image), np.float32)
    # renorm='exact': the reference's global-scalar renorm quirk
    # (utils.py:176-177, preserved as the sweep default for parity) maps a
    # small centered isosurface onto a non-centered blob — measured IoU
    # 0.508 even for an ANALYTIC sphere grid vs 0.921 exact.  The gate
    # asserts geometry, so it uses the exact grid-coordinate mapping.
    mesh = generate_mesh(grid.reshape(r, r, r), cfg.bb_min, cfg.bb_max,
                         as_trimesh_obj=True, renorm='exact')
    assert len(mesh.vertices) > 10, 'trained model produced an empty mesh'

    pts = rng.uniform(-0.5, 0.5, (100000, 3))
    gt_in = sphere_sdf(pts, (0, 0, 0), RADIUS) < 0
    pred_in, _ = implicit_waterproofing(mesh, pts)
    pred_in = pred_in.astype(bool)
    inter = np.logical_and(gt_in, pred_in).sum()
    union = np.logical_or(gt_in, pred_in).sum()
    iou = inter / max(union, 1)
    print(f'overfit gate: iou={iou:.3f} sdf_loss {first["sdf_loss"]:.3f}'
          f' -> {last["sdf_loss"]:.3f}')
    # tuned trajectory (1-core CPU, ~10 min): iou 0.39 @ 200 steps,
    # 0.79 @ 400, 0.987 @ 600 — 0.7 leaves seed/rounding margin
    assert iou > 0.7, f'trained reconstruction IoU too low: {iou:.3f}'
