#!/usr/bin/env python3
"""Device-trace ONE --steps_per_dispatch K train dispatch (bench batch-4
config) — the r5 wall (0.948 s/step) now EQUALS the device step, so the
next train lever must come from inside this program; the trace sizes its
composition.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/prof_train_multi.py [K] [batch] [trace_dir]
then:  python tools/parse_xplane.py /tmp/jaxprof_multi 40
"""
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.parallel.mesh import shard_batch_stacked
    from list_tpu.train.executors import LISTExecutor

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else '/tmp/jaxprof_multi'
    cfg = default_config(sdf_scale=10.0, vox_res=128, train_batch_size=bsz,
                         sample_point_density=32768,
                         sample_distribution=[1.0],
                         remat_decode=0 if bsz <= 4 else -1,
                         train_query_chunks=2 if bsz <= 4 else 4,
                         fuse_sample_gathers=0 if bsz <= 4 else 1,
                         remat_save_samples=0 if bsz <= 4 else 1)
    model = LIST.from_config(cfg)
    ex = LISTExecutor(cfg, model)
    rng = np.random.RandomState(0)
    batch = {
        'rgb_image': rng.rand(bsz, 224, 224, 3).astype(np.float32),
        'points': rng.uniform(-0.5, 0.5, (bsz, 32768, 3)).astype(np.float32),
        'values': (rng.randn(bsz, 32768) * 0.05).astype(np.float32),
        'occ': (rng.rand(bsz, 128, 128, 128) > 0.99).astype(np.float32),
    }
    ex.init_state(batch)
    stacked = shard_batch_stacked(
        ex.mesh, {k: np.broadcast_to(v[None], (K,) + v.shape)
                  for k, v in ex._train_keys(batch).items()})
    t0 = time.time()
    _, ml = ex.train_multi_device(stacked)
    np.asarray(ml['sdf_loss'][-1])
    print(f'compile+K steps: {time.time() - t0:.1f}s', flush=True)
    t0 = time.time()
    _, ml = ex.train_multi_device(stacked)
    np.asarray(ml['sdf_loss'][-1])
    print(f'warm dispatch ({K} steps): {time.time() - t0:.2f}s '
          f'= {(time.time() - t0) / K:.3f} s/step', flush=True)
    with jax.profiler.trace(trace_dir):
        _, ml = ex.train_multi_device(stacked)
        np.asarray(ml['sdf_loss'][-1])
    print(f'trace written to {trace_dir} (divide op totals by K={K})',
          flush=True)


if __name__ == '__main__':
    main()
