#!/usr/bin/env python3
"""HBM occupancy of the batch-N train step: device memory_stats plus the
top live arrays by bytes (what could be traded for a selective-remat
policy that saves the decode's gathered stacks)."""
import collections
import json
import os

import numpy as np


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor

    bsz = int(os.environ.get('AB_BATCH', '8'))
    cfg = default_config(sdf_scale=10.0, vox_res=128,
                         train_batch_size=bsz,
                         sample_point_density=32768,
                         sample_distribution=[1.0],
                         remat_decode=0 if bsz <= 4 else -1,
                         train_query_chunks=2 if bsz <= 4 else 4,
                         fuse_sample_gathers=0 if bsz <= 4 else 1)
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
    _, losses = ex.train(batch)
    np.asarray(losses['sdf_loss'])

    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        print(json.dumps({k: v for k, v in stats.items()
                          if 'bytes' in k}), flush=True)
    except Exception as e:
        print(f'memory_stats unavailable: {e}', flush=True)

    by_shape = collections.Counter()
    for a in jax.live_arrays():
        key = f'{a.dtype}{list(a.shape)}'
        by_shape[key] += a.nbytes
    total = sum(by_shape.values())
    print(f'live arrays total: {total / 1e9:.3f} GB', flush=True)
    for k, b in by_shape.most_common(25):
        print(f'{b / 1e6:10.1f} MB  {k}')


if __name__ == '__main__':
    main()
