#!/usr/bin/env python3
"""Device-trace one batch-N train step (default the batch-8 reference
recipe) and dump the top ops with tools/parse_xplane.py.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site AB_BATCH=8 \
         python tools/prof_train.py /tmp/jaxprof_b8
"""
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.parallel.mesh import shard_batch
    from list_tpu.train.executors import LISTExecutor

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/jaxprof_b8'
    bsz = int(os.environ.get('AB_BATCH', '8'))
    fuse = int(os.environ.get('AB_FUSE', '1'))
    cfg = default_config(sdf_scale=10.0, vox_res=128,
                         train_batch_size=bsz,
                         sample_point_density=32768,
                         sample_distribution=[1.0],
                         remat_decode=0 if bsz <= 4 else -1,
                         train_query_chunks=2 if bsz <= 4 else 4,
                         fuse_sample_gathers=fuse)
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
    t0 = time.time()
    _, losses = ex.train(batch)
    np.asarray(losses['sdf_loss'])
    print(f'compile+step: {time.time() - t0:.1f}s', flush=True)

    batch = shard_batch(ex.mesh, batch)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            _, losses = ex.train(batch)
        np.asarray(losses['sdf_loss'])
    print(f'trace written to {trace_dir}', flush=True)


if __name__ == '__main__':
    main()
