#!/usr/bin/env python3
"""On-chip A/B of dense-grid decode variants.

Each argv item is `slab,unroll,coarse_proj` (e.g. `64,1,16`).  Default
sweep targets the two r3 hypotheses at the production slab=64:
  - full unroll (2 slabs): lets XLA interleave slab 1's percep gathers
    with slab 0's tap einsums (lax.scan serializes iterations);
  - coarse_proj=32: at slab=16 the 8x full-window Ucat reads made it a
    loss (0.26 vs 0.21); at slab=64 only 2 windows are read, while 448 of
    791 fc_0 stack columns disappear.
Timing through a one-element device fetch (relay fence), median of 5.
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
    enc = ex._encode(ex.state, jnp.asarray(img))
    dargs = (ex.state.params['sdf_decoder'], enc['vox_feat'],
             enc['feat_l2'], enc['trans_mat'], 128)

    def t(fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(float(np.median(ts)), 4), [round(x, 4) for x in ts]

    variants = (sys.argv[1:] if len(sys.argv) > 1 else
                ['64,1,16', '64,2,16', '64,1,32', '64,2,32', '32,2,32'])
    out = {}
    ref = None
    for v in variants:
        fields = [int(x) for x in v.split(',')]
        slab, unroll, cp = fields[:3]
        # optional 4th field: coarse_outside (-1 = auto/None)
        co = None if len(fields) < 4 or fields[3] < 0 else bool(fields[3])
        # optional 5th field: use_pallas mode (0 XLA, 1 t-major kernel,
        # 2 fused structured-stack head)
        up = fields[4] if len(fields) > 4 else 0
        # optional 6th field: hoist_variants (-1 = auto/None)
        hv = None if len(fields) < 6 or fields[5] < 0 else bool(fields[5])
        # optional 7th field: percep_collapse (r5: one collapsed 2048-ch
        # row per query instead of 4 corner rows)
        pc = bool(fields[6]) if len(fields) > 6 else False
        key = (f'slab{slab}_u{unroll}_cp{cp}'
               f'_co{-1 if co is None else int(co)}_p{up}'
               f'_hv{-1 if hv is None else int(hv)}_pc{int(pc)}')
        try:
            g = dense_grid_sdf(*dargs, slab=slab, scan_unroll=unroll,
                               coarse_proj=cp, coarse_outside=co,
                               use_pallas=up, hoist_variants=hv,
                               percep_collapse=pc)
            if ref is None:
                ref = np.asarray(g)
            else:
                # variants must agree (all are exact reformulations)
                d = float(np.max(np.abs(np.asarray(g) - ref)))
                out[key + '_maxdiff'] = d
            med, reps = t(lambda: _fetch(dense_grid_sdf(
                *dargs, slab=slab, scan_unroll=unroll,
                coarse_proj=cp, coarse_outside=co,
                use_pallas=up, hoist_variants=hv,
                percep_collapse=pc)[0, 0, 0]))
            out[key] = med
            out[key + '_reps'] = reps
        except Exception as e:
            out[key] = f'fail {e}'[:120]
        print(key, out[key], flush=True)
    print(json.dumps(out), flush=True)
    with open('/tmp/ab_decode.json', 'w') as f:
        json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
