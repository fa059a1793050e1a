"""Pre-compile the production program set into the persistent JAX cache.

First train-step compile is 330-1234 s wall on this harness and the cache
key is stable across same-code processes (tools/probe_cache_key.py), so a
fresh checkout pays the full cost exactly once — this tool front-loads it
so the first real bench/train/sweep run is predictable.

Programs warmed (the bench.py set):
  - batch-4 train step (2 chunks, no decode remat)        [--b8 adds batch 8]
  - jitted model/optimizer init
  - fused single-dispatch dense predict at 128^3 (slab=R Pallas head)
  - batched predict (--infer_batch 4 group)               [--batched]
  - 256^3 dense decode                                    [--r256]
  - reference-style chunked decode fallback               [--chunked]

Run: env PYTHONPATH=/root/repo:/root/.axon_site python tools/warm_cache.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b8', action='store_true',
                    help='also compile the batch-8 train step (remat + '
                         'fused gathers + saved samples; ~20 min cold)')
    ap.add_argument('--r256', action='store_true')
    ap.add_argument('--batched', action='store_true')
    ap.add_argument('--chunked', action='store_true')
    ap.add_argument('--skip_train', action='store_true')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor

    rng = np.random.RandomState(0)

    def stamp(label, t0):
        print(f'warm: {label} in {time.time() - t0:.1f} s', flush=True)

    sizes = [] if args.skip_train else ([4, 8] if args.b8 else [4])
    for bsz in sizes:
        t0 = time.time()
        cfg = default_config(
            sdf_scale=10.0, vox_res=128, train_batch_size=bsz,
            sample_point_density=32768, sample_distribution=[1.0],
            remat_decode=0 if bsz <= 4 else -1,
            train_query_chunks=2 if bsz <= 4 else 4,
            fuse_sample_gathers=0 if bsz <= 4 else 1,
            remat_save_samples=0 if bsz <= 4 else 1)
        ex = LISTExecutor(cfg, LIST.from_config(cfg))
        batch = {
            'rgb_image': rng.rand(bsz, 224, 224, 3).astype(np.float32),
            'points': rng.uniform(-0.5, 0.5, (bsz, 32768, 3)
                                  ).astype(np.float32),
            'values': (rng.randn(bsz, 32768) * 0.05).astype(np.float32),
            'occ': (rng.rand(bsz, 128, 128, 128) > 0.99).astype(np.float32),
        }
        ex.init_state(batch)
        _, losses = ex.train(batch)
        assert np.isfinite(float(np.asarray(losses['sdf_loss'])))
        stamp(f'train step (batch {bsz})', t0)
        if bsz <= 4:
            # --steps_per_dispatch multi program (bench K=4 default)
            from list_tpu.parallel.mesh import shard_batch_stacked
            t0 = time.time()
            K = 4
            stacked = shard_batch_stacked(
                ex.mesh, {k: np.broadcast_to(v[None], (K,) + v.shape)
                          for k, v in ex._train_keys(batch).items()})
            _, ml = ex.train_multi_device(stacked)
            assert np.isfinite(np.asarray(ml['sdf_loss'])).all()
            stamp(f'train multi K={K} (batch {bsz})', t0)
        del ex, batch, losses

    t0 = time.time()
    cfg = default_config(sdf_scale=10.0, test_pointnum=65536, vox_res=128)
    ex = LISTExecutor(cfg, LIST.from_config(cfg))
    img = rng.rand(1, 224, 224, 3).astype(np.float32)
    ex.init_state({'rgb_image': img})
    _ = np.asarray(ex.predict_grid(img))
    stamp('fused dense predict 128^3', t0)

    if args.batched:
        t0 = time.time()
        imgs = rng.rand(4, 224, 224, 3).astype(np.float32)
        _ = [np.asarray(g) for g in ex.predict_grid_batch(imgs)]
        stamp('batched predict (4)', t0)
    if args.chunked:
        t0 = time.time()
        _ = np.asarray(ex.predict_grid(img, fast=False))
        stamp('chunked predict 128^3', t0)
    del ex
    if args.r256:
        t0 = time.time()
        cfg = default_config(sdf_scale=10.0, test_pointnum=65536,
                             vox_res=256)
        ex = LISTExecutor(cfg, LIST.from_config(cfg))
        ex.init_state({'rgb_image': img})
        _ = np.asarray(ex.predict_grid(img))
        stamp('dense predict 256^3', t0)
    print('warm_cache done', flush=True)


if __name__ == '__main__':
    main()
