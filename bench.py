#!/usr/bin/env python3
"""Headline benchmark: dense-grid SDF-query throughput on one TPU chip.

Measures the reference's hot loop (SURVEY.md §3.5 hot-loop #1): the full LIST
inference path — encoders once, then the dense 128^3 grid (2,097,152 query
points) through PerceptualPooling + the 3610-d SDF decoder — exactly the
workload of `network/executors.py:176-243` (32 chunks x 65,536 points on the
reference GPU).

Prints ONE JSON line:
  {"metric": "sdf_queries_per_sec", "value": N, "unit": "queries/s",
   "vs_baseline": N / REFERENCE_BASELINE_QPS}

REFERENCE_BASELINE_QPS is the reference implementation's measured throughput
on its target GPU.  The repo records no timing numbers (BASELINE.md), so we
use 1.0e6 queries/s — a charitable estimate for the reference's per-mesh
path on a V100 (2.1M queries over ~2s incl. 64 host<->device crossings).
BASELINE.json's target of >=10x therefore means vs_baseline >= 10.
"""

import json
import time

import numpy as np

REFERENCE_BASELINE_QPS = 1.0e6


def main():
    import jax
    import jax.numpy as jnp

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor

    cfg = default_config(sdf_scale=10.0, test_pointnum=65536, vox_res=128)
    model = LIST.from_config(cfg)
    ex = LISTExecutor(cfg, model)

    rng = np.random.RandomState(0)
    img = rng.rand(1, 224, 224, 3).astype(np.float32)
    init_batch = {'rgb_image': img}
    ex.init_state(init_batch)

    n_queries = cfg.vox_res ** 3

    # Warmup (compile)
    t0 = time.time()
    grid = ex.predict_grid(img)
    compile_time = time.time() - t0
    assert grid.shape == (cfg.vox_res,) * 3
    assert np.isfinite(grid).all()

    # Timed runs (end-to-end per image: encode + all query chunks + host copy)
    times = []
    for _ in range(3):
        t0 = time.time()
        grid = ex.predict_grid(img)
        times.append(time.time() - t0)
    sec_per_mesh = float(np.median(times))
    qps = n_queries / sec_per_mesh

    print(json.dumps({
        'metric': 'sdf_queries_per_sec',
        'value': round(qps, 1),
        'unit': 'queries/s',
        'vs_baseline': round(qps / REFERENCE_BASELINE_QPS, 3),
        'extras': {
            'sec_per_mesh_128': round(sec_per_mesh, 4),
            'compile_s': round(compile_time, 1),
            'n_queries': n_queries,
            'device': str(jax.devices()[0]),
        },
    }))


if __name__ == '__main__':
    main()
