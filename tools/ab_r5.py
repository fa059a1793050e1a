"""Round-5 on-chip train-step A/Bs (one session = one chip weather sample):

1. --steps_per_dispatch: K lax.scan'd steps per device program vs the
   single-step dispatch chain (VERDICT r4 #1 — the post-halo trace showed
   0.25-0.65 s/step of host/dispatch gap).
2. --collapse_select: bf16 0/1-select extraction vs the f32-weight einsum
   (r5 lead #1 — must be A/B'd IN-STEP; the isolated probe measured the
   select form slower but could not reproduce the layout copies).
3. batch-8 --train_query_chunks re-probe with collapse on (VERDICT r4 #4 —
   the chunks=2 compiler crash predates the collapse sampler).

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_r5.py \
      <batch> <variant> [variant ...]

A variant is a semicolon list of overrides (or 'base'):
  k=4          steps per dispatch to ALSO measure (multi program)
  sel=1        --collapse_select 1
  chunks=2     --train_query_chunks 2
  collapse=..  --collapse_samples spec (default auto)
  fuse=/save=/rd=   fuse_sample_gathers / remat_save_samples / remat_decode

e.g.  python tools/ab_r5.py 4 base k=4 sel=1 'sel=1;k=4'
      python tools/ab_r5.py 8 chunks=4 chunks=2 chunks=1
"""
import gc
import sys
import time

import numpy as np


def parse_variant(spec: str):
    ov = {}
    if spec != 'base':
        for tok in spec.split(';'):
            k, v = tok.split('=')
            ov[k] = v
    return ov


def run_variant(spec: str, bsz: int, batch_np):
    import jax

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.parallel.mesh import shard_batch, shard_batch_stacked
    from list_tpu.train.executors import LISTExecutor

    ov = parse_variant(spec)
    K = int(ov.pop('k', 0))
    cfg = default_config(
        sdf_scale=10.0, vox_res=128, train_batch_size=bsz,
        sample_point_density=32768, sample_distribution=[1.0],
        remat_decode=int(ov.pop('rd', 0 if bsz <= 4 else -1)),
        train_query_chunks=int(ov.pop('chunks', 2 if bsz <= 4 else 4)),
        fuse_sample_gathers=int(ov.pop('fuse', 0 if bsz <= 4 else 1)),
        remat_save_samples=int(ov.pop('save', 0 if bsz <= 4 else 1)),
        collapse_samples=ov.pop('collapse', 'auto'),
        collapse_select=int(ov.pop('sel', 0)),
        fc0_dmajor=int(ov.pop('dmajor', 0)))
    assert not ov, f'unknown overrides: {ov}'
    model = LIST.from_config(cfg)
    ex = LISTExecutor(cfg, model)
    ex.init_state(batch_np)

    t0 = time.time()
    _, losses = ex.train(batch_np)
    sdf = float(np.asarray(losses['sdf_loss']))
    compile_s = time.time() - t0
    rtts = []
    for i in range(3):
        t0 = time.time()
        _ = float(np.asarray(jax.numpy.float32(i) + 1.0))
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))
    # pre-put THROUGH _train_keys: it converts binary occ to uint8, and a
    # raw-f32 pre-put would be a different program signature — a full
    # recompile inside the timed loop (measured: "36.6 s/step")
    batch = shard_batch(ex.mesh, ex._train_keys(batch_np))
    n = 4
    t0 = time.time()
    for _ in range(n):
        _, losses = ex.train(batch)
    sdf = float(np.asarray(losses['sdf_loss']))
    step1 = max(time.time() - t0 - rtt, 1e-9) / n
    assert np.isfinite(sdf), sdf
    line = (f'[{spec} b{bsz}] single: {step1:.3f} s/step '
            f'(compile {compile_s:.0f}s, rtt {rtt:.2f}, sdf {sdf:.4f})')
    if K > 1:
        kept = ex._train_keys(batch_np)  # incl. uint8 occ packing
        stacked = shard_batch_stacked(
            ex.mesh, {k: np.broadcast_to(v[None], (K,) + v.shape)
                      for k, v in kept.items()})
        t0 = time.time()
        _, ml = ex.train_multi_device(stacked)
        sdfk = float(np.asarray(ml['sdf_loss'][-1]))
        mcompile = time.time() - t0
        nd = 2
        t0 = time.time()
        for _ in range(nd):
            _, ml = ex.train_multi_device(stacked)
        sdfk = float(np.asarray(ml['sdf_loss'][-1]))
        stepk = max(time.time() - t0 - rtt, 1e-9) / (nd * K)
        assert np.isfinite(sdfk), sdfk
        line += (f' | k={K}: {stepk:.3f} s/step '
                 f'(compile {mcompile:.0f}s, sdf {sdfk:.4f})')
    print(line, flush=True)


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    args = sys.argv[1:]
    bsz = int(args[0])
    variants = args[1:] or ['base']
    rng = np.random.RandomState(0)
    batch_np = {
        'rgb_image': rng.rand(bsz, 224, 224, 3).astype(np.float32),
        'points': rng.uniform(-0.5, 0.5, (bsz, 32768, 3)).astype(np.float32),
        'values': (rng.randn(bsz, 32768) * 0.05).astype(np.float32),
        'occ': (rng.rand(bsz, 128, 128, 128) > 0.99).astype(np.float32),
    }
    print(f'devices={jax.devices()} batch={bsz} variants={variants}',
          flush=True)
    for spec in variants:
        try:
            run_variant(spec, bsz, batch_np)
        except Exception as e:
            print(f'[{spec} b{bsz}] FAILED {type(e).__name__}: '
                  f'{str(e)[:300]}', flush=True)
        gc.collect()


if __name__ == '__main__':
    main()
