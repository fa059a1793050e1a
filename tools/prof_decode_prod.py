#!/usr/bin/env python3
"""Device-trace the PRODUCTION 128^3 dense decode (slab=64, use_pallas=2)
and dump the top ops — localizes the gap between the measured 0.21 s and
the ~0.05 s byte/FLOP roofline of the current algorithm.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/prof_decode_prod.py [slab] [use_pallas]
then: python tools/parse_xplane.py /tmp/jaxprof_decode 40
"""
import json
import sys
import time

import numpy as np


def _fetch(x):
    return np.asarray(x)


def main():
    slab = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    use_pallas = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pc = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
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
    enc = ex._encode(ex.state, jnp.asarray(img))
    dargs = (ex.state.params['sdf_decoder'], enc['vox_feat'],
             enc['feat_l2'], enc['trans_mat'], 128)
    kw = dict(slab=slab, scan_unroll=1, use_pallas=use_pallas,
              percep_collapse=pc)

    _fetch(dense_grid_sdf(*dargs, **kw)[0, 0, 0])  # compile
    ts = []
    for _ in range(5):
        t0 = time.time()
        _fetch(dense_grid_sdf(*dargs, **kw)[0, 0, 0])
        ts.append(time.time() - t0)
    print('decode_s median', round(float(np.median(ts)), 4), flush=True)

    import jax.profiler
    jax.profiler.start_trace('/tmp/jaxprof_decode')
    for _ in range(3):
        _fetch(dense_grid_sdf(*dargs, **kw)[0, 0, 0])
    jax.profiler.stop_trace()
    print(json.dumps({'decode_s': round(float(np.median(ts)), 4),
                      'slab': slab, 'use_pallas': use_pallas,
                      'percep_collapse': pc}), flush=True)


if __name__ == '__main__':
    main()
