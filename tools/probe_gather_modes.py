"""On-chip A/B of gather strategies for the train-step sampler.

The train step is gather-ISSUE-latency bound (~34M row-indices/s,
BASELINE.md roofline): the jnp.take fleet issues one row-DMA per corner
index — 8 corners x 7 taps x 6 scales per query.  But a query's 7
displacement taps cluster within +-delta*(res-1)/2 voxels, and each tap
displaces only ONE axis, so per query and scale THREE small contiguous
bricks cover every tap's corners:

  A (2, 2, sx)  - center + x-taps (z, y stay at the center corners)
  B (2, sy, 2)  - y-taps
  C (sz, 2, 2)  - z-taps

One ``lax.gather`` with multi-dim ``slice_sizes`` fetches each brick in a
single issue -> 18 brick-DMAs per query instead of 336 row-DMAs, at
similar total bytes.  The tap values are then extracted from the bricks
with tiny one-hot einsums (VPU/MXU work, no further gathers).

This probe measures raw fwd / fwd+bwd rates of the current flat take vs
the 3-brick slice-gather at the production packed-scale geometries
(train batch 4, one query chunk: N = 8111).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_gather_modes.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 4            # train batch
NQ = 8111        # queries per chunk (32441 / 4 chunks, ceil'd)
NP = 7 * NQ      # displaced taps (take path gathers per tap-corner)
REPS = 6


def timed(fn, *args):
    out = fn(*args)          # compile + warm
    jax.block_until_ready(out)
    _ = float(np.asarray(out))   # real device-to-host fetch (relay!)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.time() - t0) / REPS


# (name, D, H, XR, bricks [(sz, sy, sx), ...], probe_take)
SCALES = [
    ('s0_1ch@128', 128, 128, 1, [(2, 2, 1), (2, 12, 1), (12, 2, 1)], False),
    ('s1_16ch@128', 128, 128, 16, [(2, 2, 3), (2, 12, 2), (12, 2, 2)], True),
    ('s2_32ch@64', 64, 64, 16, [(2, 2, 3), (2, 8, 2), (8, 2, 2)], False),
    ('s3_64ch@32', 32, 32, 16, [(2, 2, 4), (2, 6, 2), (6, 2, 2)], True),
    ('s4_128ch@16', 16, 16, 16, [(2, 2, 4), (2, 4, 2), (4, 2, 2)], False),
    ('s5_128ch@8', 8, 8, 8, [(2, 2, 4), (2, 4, 2), (4, 2, 2)], True),
]

DN3 = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
    start_index_map=(0, 1, 2))


def take_fwd(vol, idx):
    # vol: (B, M, 128) flat packed rows; idx: (B, 8, NP) row ids
    Bm, M, _ = vol.shape
    g = (jnp.arange(Bm, dtype=idx.dtype)[:, None, None] * M + idx)
    rows = jnp.take(vol.reshape(Bm * M, 128), g.reshape(-1), axis=0,
                    mode='clip')
    return jnp.sum(rows.astype(jnp.float32))


def bricks_fwd(vol4, starts, bricks):
    # vol4: (B, D, H, XR, 128); starts: (B, NQ, 3) per-query brick origins
    total = 0.0
    for sz, sy, sx in bricks:
        def one(v, s, ss=(sz, sy, sx, 128)):
            return jax.lax.gather(v, s, DN3, slice_sizes=ss,
                                  mode=jax.lax.GatherScatterMode.CLIP)
        out = jax.vmap(one)(vol4, starts)
        total = total + jnp.sum(out.astype(jnp.float32))
    return total


def main():
    rng = np.random.default_rng(0)
    print(f'devices: {jax.devices()}  B={B} NQ={NQ} NP={NP}', flush=True)
    for name, D, H, XR, bricks, probe_take in SCALES:
        M = D * H * XR
        vol = jnp.asarray(rng.standard_normal((B, M, 128)), jnp.bfloat16)
        vol4 = vol.reshape(B, D, H, XR, 128)
        starts = jnp.asarray(
            np.stack([rng.integers(0, D, (B, NQ)),
                      rng.integers(0, H, (B, NQ)),
                      rng.integers(0, XR, (B, NQ))], -1), jnp.int32)
        rows_b = sum(sz * sy * sx for sz, sy, sx in bricks)
        jb = jax.jit(functools.partial(bricks_fwd, bricks=bricks))
        gb = jax.jit(lambda v, s, bk=tuple(bricks): jax.grad(
            lambda vv: bricks_fwd(vv, s, bk))(v).sum().astype(jnp.float32))
        t_b = timed(jb, vol4, starts)
        t_bg = timed(gb, vol4, starts)
        line = (f'{name}: brick fwd {t_b*1e3:8.2f} ms '
                f'({B*NQ*3/t_b/1e6:5.2f}M DMAs/s, '
                f'{B*NQ*rows_b*256/t_b/1e9:6.1f} GB/s, '
                f'{rows_b} rows/q) | f+b {t_bg*1e3:8.2f} ms')
        if probe_take:
            idx = jnp.asarray(rng.integers(0, M, (B, 8, NP)), jnp.int32)
            jt = jax.jit(take_fwd)
            gt = jax.jit(lambda v, i: jax.grad(
                lambda vv: take_fwd(vv, i))(v).sum().astype(jnp.float32))
            t_t = timed(jt, vol, idx)
            t_tg = timed(gt, vol, idx)
            line += (f' | take fwd {t_t*1e3:8.2f} ms '
                     f'({B*8*NP/t_t/1e6:6.1f}M idx/s) '
                     f'f+b {t_tg*1e3:8.2f} ms')
        print(line, flush=True)

    # percep: 4-corner bilinear on (137, 137, 512) f32 maps, 4 views/item
    HW, C = 137 * 137, 512
    vol = jnp.asarray(rng.standard_normal((4 * B, HW, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, HW, (4 * B, 4, NQ)), jnp.int32)
    vol3 = vol.reshape(4 * B, 137, 137, C)
    starts = jnp.asarray(np.stack([rng.integers(0, 137, (4 * B, NQ)),
                                   rng.integers(0, 137, (4 * B, NQ))], -1),
                         jnp.int32)
    dn2 = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def ptake(v, i):
        M = v.shape[1]
        g = (jnp.arange(v.shape[0], dtype=i.dtype)[:, None, None] * M + i)
        return jnp.sum(jnp.take(v.reshape(-1, C), g.reshape(-1), axis=0,
                                mode='clip'))

    def pbrick(v, s):
        def one(vv, ss):
            return jax.lax.gather(vv, ss, dn2, slice_sizes=(2, 2, C),
                                  mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.sum(jax.vmap(one)(v, s))

    t_pt = timed(jax.jit(ptake), vol, idx)
    print(f'percep: take fwd {t_pt*1e3:8.2f} ms '
          f'({4*B*4*NQ/t_pt/1e6:6.1f}M idx/s)', flush=True)
    try:
        # measured 2026-08-20: this 2D (2,2,512) slice-gather ABORTS the
        # v5e backend ('TPU backend error (Aborted)') — kept behind a
        # guard as the documented negative result.
        t_pb = timed(jax.jit(pbrick), vol3, starts)
        print(f'percep: brick(2,2) fwd {t_pb*1e3:8.2f} ms '
              f'({4*B*NQ/t_pb/1e6:5.2f}M DMAs/s)', flush=True)
    except Exception as e:
        print(f'percep brick(2,2): FAILED {type(e).__name__}: '
              f'{str(e)[:120]}', flush=True)


if __name__ == '__main__':
    main()
