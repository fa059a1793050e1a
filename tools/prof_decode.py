#!/usr/bin/env python3
"""Profile the dense-grid decode on the TPU chip; also time slab/unroll
variants and stage ablations to localize the remaining 0.21 s.
"""
import json
import sys
import time

import numpy as np


def _fetch(x):
    return np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor
    from list_tpu.ops.dense_grid import dense_grid_sdf

    rng = np.random.RandomState(0)
    cfg = default_config(sdf_scale=10.0, test_pointnum=65536, vox_res=128)
    model = LIST.from_config(cfg)
    ex = LISTExecutor(cfg, model)
    img = rng.rand(1, 224, 224, 3).astype(np.float32)
    ex.init_state({'rgb_image': img})
    jimg = jnp.asarray(img)
    enc = ex._encode(ex.state, jimg)
    dargs = (ex.state.params['sdf_decoder'], enc['vox_feat'],
             enc['feat_l2'], enc['trans_mat'], 128)

    def t(fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(float(np.median(ts)), 4)

    out = {}
    for slab in (8, 16, 32):
        for unroll in (1, 2):
            key = f'slab{slab}_u{unroll}'
            try:
                out[key] = t(lambda: _fetch(dense_grid_sdf(
                    *dargs, slab=slab, scan_unroll=unroll)[0, 0, 0]))
            except Exception as e:
                out[key] = f'fail {e}'[:80]
            print(key, out[key], flush=True)

    # profiler trace of the best config
    import jax.profiler
    try:
        jax.profiler.start_trace('/tmp/jaxprof')
        for _ in range(3):
            _fetch(dense_grid_sdf(*dargs, slab=16, scan_unroll=2)[0, 0, 0])
        jax.profiler.stop_trace()
        out['trace'] = 'ok'
    except Exception as e:
        out['trace'] = f'fail: {e}'[:200]
    print(json.dumps(out), flush=True)
    with open('/tmp/prof_decode.json', 'w') as f:
        json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
