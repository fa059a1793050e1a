#!/usr/bin/env python3
"""On-chip A/B: --fuse_sample_gathers variants on the batch-4 train step
(fuse values from argv, default 0 vs 1).

Same measurement protocol as bench.py's train section: amortized over 4
chained steps with one terminal fetch, relay RTT subtracted.
"""
import json
import sys
import time

import numpy as np


def _fetch(x):
    return np.asarray(x)


def measure(fuse, rng):
    import os

    import jax
    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor
    from list_tpu.parallel.mesh import shard_batch

    bsz = int(os.environ.get('AB_BATCH', '4'))
    cfg = default_config(sdf_scale=10.0, vox_res=128,
                         train_batch_size=bsz,
                         sample_point_density=32768,
                         sample_distribution=[1.0],
                         # bench.py's per-batch-size choices: batch 8 needs
                         # remat'd chunks=4 (chunks=2 crashes the compiler)
                         remat_decode=0 if bsz <= 4 else -1,
                         train_query_chunks=2 if bsz <= 4 else 4,
                         sort_queries=int(os.environ.get('AB_SORT', '0')),
                         remat_save_samples=int(
                             os.environ.get('AB_SAVE', '0')),
                         fuse_sample_gathers=fuse)
    model = LIST.from_config(cfg)
    ex = LISTExecutor(cfg, model)
    batch = {
        'rgb_image': rng.rand(bsz, 224, 224, 3).astype(np.float32),
        'points': rng.uniform(-0.5, 0.5, (bsz, 32768, 3)).astype(np.float32),
        'values': (rng.randn(bsz, 32768) * 0.05).astype(np.float32),
        'occ': (rng.rand(bsz, 128, 128, 128) > 0.99).astype(np.float32),
    }
    ex.init_state(batch)
    t0 = time.time()
    _, losses = ex.train(batch)
    _fetch(losses['sdf_loss'])
    compile_s = time.time() - t0

    import jax.numpy as jnp
    rtts = []
    for i in range(3):
        t0 = time.time()
        _fetch(jnp.float32(i) + 1.0)
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))

    batch = shard_batch(ex.mesh, batch)
    out = {'fuse': fuse, 'batch': bsz,
           'save_samples': int(os.environ.get('AB_SAVE', '0')),
           'sort': int(os.environ.get('AB_SORT', '0')),
           'compile_s': round(compile_s, 1), 'rtt_s': round(rtt, 3)}
    steps = []
    for rep in range(3):
        n_steps = 4
        t0 = time.time()
        for _ in range(n_steps):
            _, losses = ex.train(batch)
        _fetch(losses['sdf_loss'])
        steps.append(max(time.time() - t0 - rtt, 1e-9) / n_steps)
    out['step_s_reps'] = [round(s, 3) for s in steps]
    out['step_s'] = round(float(np.median(steps)), 3)
    host = {k: float(_fetch(v)) for k, v in losses.items()}
    out['finite'] = bool(all(np.isfinite(v) for v in host.values()))
    del ex, model, batch, losses
    import gc
    gc.collect()
    return out


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    rng = np.random.RandomState(0)
    results = []
    fuses = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
             else [0, 1])
    for fuse in fuses:
        try:
            r = measure(fuse, rng)
        except Exception as e:
            r = {'fuse': fuse, 'error': f'{type(e).__name__}: {e}'[:300]}
        print(json.dumps(r), flush=True)
        results.append(r)
    with open('/tmp/ab_fuse_results.json', 'w') as f:
        json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()
