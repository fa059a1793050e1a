"""On-chip overfit + reconstruction gate for the PRODUCTION config
(VERDICT r4 #5): train the DEFAULT 128^3 LIST model (full ResNet18 x2,
batch 4, 32,768 queries/step, collapse auto, bf16 packing, Pallas stencil
convs — exactly the bench train config) on ONE analytic sphere on the
real TPU, then run the production decode -> band fetch -> marching cubes
-> containment IoU path.  Proves the production feature set LEARNS, not
just runs (the CPU gate in tests/test_overfit_gate.py covers a tiny
config only).  Reference purpose: network/executors.py:176-243.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/overfit_chip.py \
      [steps=400] [lr=1e-3] [k=4]

Writes the loss curve + IoU to stdout; capture to docs/overfit_chip_r5.txt.
"""
import sys
import time

import numpy as np

RADIUS = 0.35


def main():
    import jax

    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from list_tpu.config import default_config
    from list_tpu.data.synthetic import sphere_sdf
    from list_tpu.eval.metrics import implicit_waterproofing
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor
    from list_tpu.utils.meshing import generate_mesh

    kv = dict(a.split('=') for a in sys.argv[1:])
    steps = int(kv.get('steps', 400))
    lr = float(kv.get('lr', 1e-3))
    K = int(kv.get('k', 4))

    bsz, nq = 4, 32768
    cfg = default_config(sdf_scale=10.0, vox_res=128, train_batch_size=bsz,
                         sample_point_density=nq, sample_distribution=[1.0],
                         remat_decode=0, train_query_chunks=2, lr=lr,
                         steps_per_dispatch=K)
    model = LIST.from_config(cfg)
    ex = LISTExecutor(cfg, model)
    print(f'devices={jax.devices()} steps={steps} lr={lr} K={K}', flush=True)

    rng = np.random.default_rng(0)
    u = np.linspace(-0.6, 0.6, 224)
    px, py = np.meshgrid(u, u, indexing='xy')
    disc = (px ** 2 + py ** 2 < RADIUS ** 2).astype(np.float32)
    image = np.stack([disc] * 3, -1)[None]
    images = np.repeat(image, bsz, axis=0)

    n_pool = 1 << 18
    dirs = rng.standard_normal((n_pool // 2, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    near = dirs * (RADIUS + 0.03 * rng.standard_normal((n_pool // 2, 1)))
    unif = rng.uniform(-0.5, 0.5, (n_pool // 2, 3))
    pool_pts = np.concatenate([near, unif]).astype(np.float32)
    pool_sdf = sphere_sdf(pool_pts, (0, 0, 0), RADIUS).astype(np.float32)

    r = cfg.vox_res
    x = (np.arange(r) + 0.5) / r - 0.5
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    occ = np.broadcast_to(
        (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) < RADIUS).astype(np.float32),
        (bsz, r, r, r)).copy()

    def make_batch():
        idx = rng.integers(0, n_pool, (bsz, nq))
        return {'rgb_image': images, 'points': pool_pts[idx],
                'values': pool_sdf[idx], 'occ': occ}

    ex.init_state(make_batch())
    t0 = time.time()
    done = 0
    curve = []
    while done < steps:
        if K > 1 and steps - done >= K:
            _, losses = ex.train_multi(
                [make_batch() for _ in range(K)])
            done += K
            sdf = float(np.asarray(losses['sdf_loss'])[-1])
            occl = float(np.asarray(losses['occ_loss'])[-1])
        else:
            _, losses = ex.train(make_batch())
            done += 1
            sdf = float(np.asarray(losses['sdf_loss']))
            occl = float(np.asarray(losses['occ_loss']))
        if done <= K or done % 40 == 0 or done >= steps:
            el = time.time() - t0
            curve.append((done, sdf, occl))
            print(f'step {done:4d}: sdf_loss {sdf:.4f} occ_loss {occl:.4f} '
                  f'({el:.0f}s, {el / max(done, 1):.2f} s/step incl. '
                  f'compile)', flush=True)
        assert np.isfinite(sdf), f'non-finite sdf_loss at step {done}'

    # production inference path: dense decode + band fetch + MC
    grid = np.asarray(ex.predict_grid(image), np.float32)
    mesh = generate_mesh(grid, cfg.bb_min, cfg.bb_max, as_trimesh_obj=True,
                         renorm='exact')
    print(f'mesh: {len(mesh.vertices)} vertices, {len(mesh.faces)} faces',
          flush=True)
    assert len(mesh.vertices) > 10, 'empty mesh after overfit'
    pts = rng.uniform(-0.5, 0.5, (200000, 3))
    gt_in = sphere_sdf(pts, (0, 0, 0), RADIUS) < 0
    pred_in, _ = implicit_waterproofing(mesh, pts)
    inter = np.logical_and(gt_in, pred_in.astype(bool)).sum()
    union = np.logical_or(gt_in, pred_in.astype(bool)).sum()
    iou = inter / max(union, 1)
    print(f'RESULT iou={iou:.4f} steps={steps} lr={lr} '
          f'sdf_loss {curve[0][1]:.4f} -> {curve[-1][1]:.4f} '
          f'occ_loss {curve[0][2]:.4f} -> {curve[-1][2]:.4f}', flush=True)
    if iou > 0.7:
        print('GATE PASS (iou > 0.7)', flush=True)
    else:
        print('GATE FAIL (iou <= 0.7)', flush=True)


if __name__ == '__main__':
    main()
