"""On-chip A/B of --collapse_samples on the production train step.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site \
      python tools/ab_train_collapse.py [batch] [variant ...]
variants default to: none 0,2,3,5   (batch default 4; bench batch-4 config)
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.parallel.mesh import shard_batch
    from list_tpu.train.executors import LISTExecutor

    args = sys.argv[1:]
    bsz = int(args[0]) if args else 4
    variants = args[1:] or ['none', '0,2,3,5']
    rng = np.random.RandomState(0)
    batch_np = {
        'rgb_image': rng.rand(bsz, 224, 224, 3).astype(np.float32),
        'points': rng.uniform(-0.5, 0.5, (bsz, 32768, 3)).astype(np.float32),
        'values': (rng.randn(bsz, 32768) * 0.05).astype(np.float32),
        'occ': (rng.rand(bsz, 128, 128, 128) > 0.99).astype(np.float32),
    }
    print(f'devices={jax.devices()} batch={bsz} variants={variants}',
          flush=True)
    for spec in variants:
        try:
            _run_variant(spec, bsz, batch_np)
        except Exception as e:
            print(f'collapse={spec}: FAILED {type(e).__name__}: '
                  f'{str(e)[:300]}', flush=True)
        import gc
        gc.collect()


def _run_variant(spec, bsz, batch_np):
    import jax
    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.parallel.mesh import shard_batch
    from list_tpu.train.executors import LISTExecutor

    # variant syntax: "<collapse_spec>[@<train_query_chunks>]"
    chunks = None
    if '@' in spec:
        spec, chunks = spec.split('@')
        chunks = int(chunks)
    if True:
        cfg = default_config(
            sdf_scale=10.0, vox_res=128, train_batch_size=bsz,
            sample_point_density=32768, sample_distribution=[1.0],
            remat_decode=0 if bsz <= 4 else -1,
            train_query_chunks=chunks if chunks else int(os.environ.get(
                'AB_CHUNKS', 2 if bsz <= 4 else 4)),
            fuse_sample_gathers=0 if bsz <= 4 else 1,
            remat_save_samples=0 if bsz <= 4 else 1,
            collapse_samples=spec)
        model = LIST.from_config(cfg)
        ex = LISTExecutor(cfg, model)
        ex.init_state(batch_np)
        t0 = time.time()
        _, losses = ex.train(batch_np)
        _ = float(np.asarray(losses['sdf_loss']))
        compile_s = time.time() - t0
        rtts = []
        for i in range(3):
            t0 = time.time()
            _ = float(np.asarray(jax.numpy.float32(i) + 1.0))
            rtts.append(time.time() - t0)
        rtt = float(np.median(rtts))
        batch = shard_batch(ex.mesh, batch_np)
        n = 4
        t0 = time.time()
        for _ in range(n):
            _, losses = ex.train(batch)
        sdf = float(np.asarray(losses['sdf_loss']))
        step = max(time.time() - t0 - rtt, 1e-9) / n
        assert np.isfinite(sdf), sdf
        print(f'collapse={spec}: step {step:.3f} s (compile {compile_s:.1f},'
              f' rtt {rtt:.2f}, sdf_loss {sdf:.4f})', flush=True)
        del ex, model, batch, losses


if __name__ == '__main__':
    main()
