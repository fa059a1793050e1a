#!/usr/bin/env python3
"""Probe the train-step compile cache end-to-end on the TPU chip.

CLAUDE.md (r3) records that same-code reruns produced DIFFERENT train_step
cache keys (the axon sidechannel keys on blake3(mlir||options)), so every
bench run paid the full ~270 s compile.  tools/mlir_fingerprint.py now
shows the lowered module is byte-stable across processes at the exact
bench config (vox 128, batch 4, chunks 2) — this tool closes the loop by
actually compiling in two fresh subprocesses and comparing walls: a
working cache makes the second compile ~100x cheaper.

Usage: python tools/probe_train_cache.py            # runs both children
       python tools/probe_train_cache.py --child    # one compile + time
"""
import json
import os
import subprocess
import sys
import time


def child():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    jax.config.update('jax_explain_cache_misses', True)
    import numpy as np

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor

    bsz = 4
    # EXACTLY bench.py's batch-4 train config (so a warm cache carries
    # over to the driver's bench run)
    cfg = default_config(sdf_scale=10.0, vox_res=128,
                         train_batch_size=bsz,
                         remat_decode=0, train_query_chunks=2,
                         fuse_sample_gathers=0, remat_save_samples=0)
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
    # EXACTLY bench.py's call (shard_batch to the 1-device mesh inside
    # ex.train) so the compile-cache entry this warms is the one the
    # driver's bench run looks up.
    t0 = time.time()
    _, losses = ex.train(batch)
    np.asarray(losses['sdf_loss'])
    t_first = time.time() - t0
    print(json.dumps({'first_step_s': round(t_first, 1)}), flush=True)


def main():
    if '--child' in sys.argv:
        return child()
    env = dict(os.environ)
    env['PYTHONPATH'] = '/root/repo:/root/.axon_site'
    for i in range(2):
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--child'],
            env=env, capture_output=True, text=True, timeout=3000)
        tail = [ln for ln in out.stdout.splitlines() if ln.startswith('{')]
        print(f'run {i}: wall={time.time() - t0:.1f}s '
              f'{tail[-1] if tail else out.stderr[-500:]}', flush=True)


if __name__ == '__main__':
    sys.exit(main())
