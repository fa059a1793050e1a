#!/usr/bin/env python3
"""Split the train-step "compile wall" into its host/remote parts.

probe_train_cache.py measured first_step_s = 263 s cold / 145 s warm —
the persistent cache (.jax_cache, 81 MB train_step entry) is HITTING, so
the residual 145 s is something other than XLA compile.  This tool times
each stage separately in one fresh process:

  init_state_s  — param init (compiles small init fns)
  trace_lower_s — jax trace + StableHLO lowering (pure host CPU work)
  compile_s     — lowered.compile(): cache lookup + (miss) remote XLA
                  compile + executable load
  step_s        — one executed step after compile

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/probe_compile_breakdown.py
"""
import json
import os
import sys
import time


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import numpy as np

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor
    from list_tpu.parallel import shard_batch

    bsz = 4
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
    out = {}
    t0 = time.time()
    ex.init_state(batch)
    out['init_state_s'] = round(time.time() - t0, 1)

    sb = shard_batch(ex.mesh, {k: batch[k] for k in
                               ('rgb_image', 'points', 'values', 'occ')})
    t0 = time.time()
    lowered = ex._train_step.lower(ex.state, sb)
    out['trace_lower_s'] = round(time.time() - t0, 1)

    t0 = time.time()
    compiled = lowered.compile()
    out['compile_s'] = round(time.time() - t0, 1)

    t0 = time.time()
    state2, losses = compiled(ex.state, sb)
    np.asarray(losses['sdf_loss'])
    out['step_s'] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    sys.exit(main())
