#!/usr/bin/env python3
"""Is the train-step compile-cache key stable across fresh processes?

.jax_cache accumulated multiple 81 MB jit__train_step_fn entries on the
SAME day (10:41 / 11:15 / 11:26, then 19:47 / 19:53) — every bench or
driver run pays a ~100 s remote XLA compile if the key drifts.  The key is
blake2/sha over (computation MLIR, jaxlib version, backend version, XLA
flags, serialized compile options, accelerator config, compression,
custom hook) — see jax._src.cache_key.get.

This probe intercepts jax._src.compiler.compile_or_get_cached at compile
entry (monkeypatch), computes the cache key with per-component DEBUG
logging, prints everything, and aborts BEFORE the expensive compile.  Two
fresh subprocess runs then reveal exactly which component drifts (the
component hashes are logged by jax._src.cache_key at DEBUG level).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/probe_cache_key.py            # two children + verdict
    python tools/probe_cache_key.py --child    # one key extraction
"""
import json
import logging
import os
import subprocess
import sys
import time


class _Abort(Exception):
    pass


def child():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import numpy as np

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor
    from list_tpu.parallel import shard_batch

    # capture per-component hashes from jax._src.cache_key's DEBUG logs
    records = []
    h = logging.Handler()
    h.emit = lambda rec: records.append(rec.getMessage())
    ck_logger = logging.getLogger('jax._src.cache_key')
    ck_logger.addHandler(h)
    ck_logger.setLevel(logging.DEBUG)

    import jax._src.cache_key as cache_key_mod
    import jax._src.compiler as compiler_mod

    captured = {}
    real = compiler_mod.compile_or_get_cached

    def hook(backend, computation, devices, compile_options,
             host_callbacks, executable_devices, pgle_profiler=None):
        key = cache_key_mod.get(computation, devices, compile_options,
                                backend)
        captured['key'] = key
        captured['module_hash_lines'] = list(records)
        # dump the module text for diffing if the computation drifts
        dump = os.environ.get('CACHE_KEY_DUMP')
        if dump:
            with open(dump, 'w') as f:
                f.write(str(computation))
        raise _Abort

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
    # init_state compiles small programs through the hook too — let those
    # through (only abort on the train step, recognizable by module name)
    def selective_hook(backend, computation, devices, compile_options,
                       host_callbacks, executable_devices,
                       pgle_profiler=None):
        from jaxlib.mlir import ir
        name = ir.StringAttr(
            computation.operation.attributes['sym_name']).value
        if 'train_step' not in name:
            return real(backend, computation, devices, compile_options,
                        host_callbacks, executable_devices, pgle_profiler)
        records.clear()
        return hook(backend, computation, devices, compile_options,
                    host_callbacks, executable_devices, pgle_profiler)

    compiler_mod.compile_or_get_cached = selective_hook

    ex.init_state(batch)
    sb = shard_batch(ex.mesh, {k: batch[k] for k in
                               ('rgb_image', 'points', 'values', 'occ')})
    try:
        ex._train_step.lower(ex.state, sb).compile()
    except _Abort:
        pass
    assert 'key' in captured, 'hook never saw the train step'
    print(json.dumps(captured), flush=True)


def main():
    if '--child' in sys.argv:
        return child()
    env = dict(os.environ)
    env.setdefault('PYTHONPATH', '/root/repo:/root/.axon_site')
    results = []
    for i in range(2):
        dump = f'/tmp/cache_key_module_{i}.mlir'
        env['CACHE_KEY_DUMP'] = dump
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--child'],
            env=env, capture_output=True, text=True, timeout=3000)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith('{')]
        if not line:
            print(f'run {i} FAILED:\n{out.stderr[-2000:]}')
            return 1
        rec = json.loads(line[-1])
        results.append(rec)
        print(f'run {i}: wall={time.time() - t0:.1f}s key={rec["key"]}',
              flush=True)
    if results[0]['key'] == results[1]['key']:
        print('KEY STABLE across fresh processes')
        return 0
    print('KEY DRIFTS — per-component hash lines:')
    for i, rec in enumerate(results):
        print(f'--- run {i} ---')
        for ln in rec['module_hash_lines']:
            print(' ', ln)
    a, b = '/tmp/cache_key_module_0.mlir', '/tmp/cache_key_module_1.mlir'
    rc = subprocess.run(['cmp', '-s', a, b]).returncode
    print(f'module text identical: {rc == 0}'
          f'{"" if rc == 0 else f" — diff {a} {b}"}')
    return 2


if __name__ == '__main__':
    sys.exit(main())
