#!/usr/bin/env python3
"""Diagnose the train-step compile-cache misses: is the lowered MLIR stable?

The axon sidechannel compile cache keys on blake3(mlir || options); CLAUDE.md
records that same-code reruns produced DIFFERENT train_step keys, so every
bench run pays the full ~270 s remote compile.  This tool lowers the exact
bench.py train step in THIS process and prints a content hash of the
StableHLO text (plus a dump path for diffing), so two subprocess invocations
reveal whether (and where) the module text drifts run-to-run.

Usage:
  python tools/mlir_fingerprint.py [--vox_res 32] [--batch 4] [--dump PATH]

Lowering happens on the CPU backend (no TPU needed): trace-order
nondeterminism in OUR code shows up identically in the CPU-lowered module.
"""
import argparse
import hashlib
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--vox_res', type=int, default=32)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--nq', type=int, default=1024)
    ap.add_argument('--dump', default='')
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass
    import numpy as np

    from list_tpu.config import default_config
    from list_tpu.models import LIST
    from list_tpu.train.executors import LISTExecutor

    bsz = args.batch
    cfg = default_config(sdf_scale=10.0, vox_res=args.vox_res,
                         train_batch_size=bsz,
                         sample_point_density=args.nq,
                         sample_distribution=[1.0],
                         remat_decode=0 if bsz <= 4 else -1,
                         train_query_chunks=2 if bsz <= 4 else 4,
                         fuse_sample_gathers=0 if bsz <= 4 else 1)
    model = LIST.from_config(cfg)
    ex = LISTExecutor(cfg, model)
    rng = np.random.RandomState(0)
    R = args.vox_res
    batch = {
        'rgb_image': rng.rand(bsz, 224, 224, 3).astype(np.float32),
        'points': rng.uniform(-0.5, 0.5, (bsz, args.nq, 3)).astype(
            np.float32),
        'values': (rng.randn(bsz, args.nq) * 0.05).astype(np.float32),
        'occ': (rng.rand(bsz, R, R, R) > 0.99).astype(np.float32),
    }
    ex.init_state(batch)
    lowered = ex._train_step.lower(ex.state, batch)
    text = lowered.as_text()
    h = hashlib.sha256(text.encode()).hexdigest()
    print(f'mlir_sha256={h} lines={text.count(chr(10))} '
          f'hashseed={os.environ.get("PYTHONHASHSEED", "-")}')
    if args.dump:
        with open(args.dump, 'w') as f:
            f.write(text)


if __name__ == '__main__':
    sys.exit(main())
