#!/usr/bin/env python3
"""On-chip A/B of the 256^3 dense decode head/slab choice.

The 128^3 sweep flipped the production default to the XLA head (slab 64),
but 256^3 runs 32+ slabs where the in-scan coarse path rereads the full
Ucat window per slab and the Pallas head's VMEM-resident tail may still
win (r1 note: 3.8 s at pallas/slab-4 vs 13.9 s measured for XLA/slab-8 in
BENCH r3).  Device-only timing (one-element fetch fence), median of 3.

Usage: python tools/ab_decode256.py [slab,pallas ...]   (default sweep)
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
             enc['feat_l2'], enc['trans_mat'], 256)

    def t(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(float(np.median(ts)), 3), [round(x, 3) for x in ts]

    variants = (sys.argv[1:] if len(sys.argv) > 1 else
                ['8,0', '4,0', '4,1', '8,1'])
    out = {}
    for v in variants:
        fields = [int(x) for x in v.split(',')]
        slab, pal = fields[:2]
        # optional 3rd field: hoist_variants (-1 = auto/None; at 256^3 the
        # hoisted Vcats are ~6.4 GB bf16 — HBM-fit is part of the A/B)
        hv = None if len(fields) < 3 or fields[2] < 0 else bool(fields[2])
        key = f's{slab}_p{pal}_hv{-1 if hv is None else int(hv)}'
        try:
            med, reps = t(lambda: _fetch(dense_grid_sdf(
                *dargs, slab=slab, use_pallas=pal, hoist_variants=hv,
                scan_unroll=1)[0, 0, 0]))
            out[key] = med
            out[key + '_reps'] = reps
        except Exception as e:
            out[key] = f'fail {e}'[:150]
        print(key, out[key], flush=True)
    print(json.dumps(out), flush=True)
    with open('/tmp/ab_decode256.json', 'w') as f:
        json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
