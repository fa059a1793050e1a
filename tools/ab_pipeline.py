#!/usr/bin/env python3
"""A/B the pipelined inference sweep: np-image dispatch vs pre-staged
device images.

bench.py's pipelined trial dispatches `predict_grid(np_img)` back-to-back;
each dispatch converts the 602 KB image host->device through the axon
relay on the main thread.  Device decode is ~0.21 s/mesh while the best
measured pipelined number is ~0.25 — this tool isolates how much of the
~30-40 ms/mesh gap is the in-loop upload + dispatch serialization by
staging the images on device BEFORE the timer (what a production input
prefetcher does anyway).

Measured (v5e, r3): NO staging win — best trials np_dispatch 0.2212 /
staged 0.3254 s/mesh with per-trial spread 0.22-0.44 either way; the best
np_dispatch trial matches device-only encode+decode (0.221 s), so the
upload is already fully overlapped by the fetch pool and the residual
pipelined-vs-device gap is relay/chip weather, not dispatch serialization.
bench.py therefore reports sec_per_mesh_128_device as the noise-free
companion metric instead of adopting staged dispatch.
"""
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor

    rng = np.random.RandomState(0)
    cfg = default_config(sdf_scale=10.0, test_pointnum=65536, vox_res=128,
                         fetch_dtype='bfloat16')
    model = LIST.from_config(cfg)
    ex = LISTExecutor(cfg, model)
    imgs = [rng.rand(1, 224, 224, 3).astype(np.float32) for _ in range(8)]
    ex.init_state({'rgb_image': imgs[0]})
    # compile + warm
    from list_tpu.ops.band import fetch_grid_f32
    g = ex.predict_grid(imgs[0], device_out=True)
    fetch_grid_f32(g)

    out = {}
    n_meshes = 8
    with ThreadPoolExecutor(max_workers=5) as pool:
        pool.submit(lambda: None).result()

        def trial(stage):
            # staged: images already on device (input prefetcher model);
            # the upload happens outside the timed window.
            srcs = ([jax.device_put(im) for im in imgs] if stage else imgs)
            if stage:
                jax.block_until_ready(srcs)
            t0 = time.time()
            from list_tpu.ops.band import fetch_grid_f32
            futs = [pool.submit(
                fetch_grid_f32,
                ex.predict_grid(srcs[i], device_out=True))
                for i in range(n_meshes)]
            grids = [f.result() for f in futs]
            dt = (time.time() - t0) / n_meshes
            assert all(np.isfinite(x).all() for x in grids)
            return dt

        for key, stage in (('np_dispatch', False), ('staged', True),
                           ('np_dispatch2', False), ('staged2', True)):
            ts = [trial(stage) for _ in range(3)]
            out[key] = round(min(ts), 4)
            out[key + '_trials'] = [round(t, 4) for t in ts]
            print(key, out[key], flush=True)
    print(json.dumps(out), flush=True)
    with open('/tmp/ab_pipeline.json', 'w') as f:
        json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
