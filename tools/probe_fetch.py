#!/usr/bin/env python3
"""Probe: do concurrent np.asarray fetches through the axon relay scale?

Creates N independent device arrays (4 MB bf16 each, like a 128^3 grid on
the bf16 wire) and times fetching all of them with 1, 2, 4, 8 worker
threads.  If the relay parallelizes per-stream, aggregate bandwidth rises
with workers and the infer pipeline should raise its fetch-worker count.
"""
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 8
    key = jax.random.PRNGKey(0)
    grids = [jax.random.normal(jax.random.fold_in(key, i),
                               (128, 128, 128)).astype(jnp.bfloat16)
             for i in range(n)]
    for g in grids:
        g.block_until_ready()
    out = {}
    for workers in (1, 2, 4, 8):
        # fresh arrays each time (np.asarray caches the host copy)
        gs = [g + float(i) for i, g in enumerate(grids)]
        for g in gs:
            g.block_until_ready()
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(np.asarray, gs))
        dt = time.time() - t0
        mb = n * 128 ** 3 * 2 / 1e6
        out[f'w{workers}'] = {'total_s': round(dt, 3),
                              'mb_per_s': round(mb / dt, 1),
                              'per_fetch_s': round(dt / n, 3)}
        print(json.dumps({f'workers={workers}': out[f'w{workers}']}),
              flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
