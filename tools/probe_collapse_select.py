"""Probe round-5 lead #1: the collapsed-sampler extraction einsum.

The post-halo trace shows ~0.07 s/step of f32 layout-transposing copies
feeding the extraction einsum (`vals.astype(f32)` operands get re-laid
out).  Candidate fix: do the x-SELECT with 0/1 one-hots in bf16 (exact —
0/1 times bf16 values with f32 accumulation) and only run the small lerp
combination in f32, so the wide gathered stack never materializes in f32.

This probes both formulations at production geometry (halo s1 and full
s3), fwd and fwd+bwd, WITHOUT touching the production sampler.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_collapse_select.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, NQ = 4, 16384          # bench batch-4 chunk (chunks=2)
NP = 7 * NQ
REPS = 6


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(out))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.time() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    print(f'devices={jax.devices()} B={B} NP={NP}', flush=True)
    HI = jax.lax.Precision.HIGHEST

    # ---- halo s1 geometry: rows (B, NP, 4, gh*C) with gh=8, C=16 -------
    gh, C = 8, 16
    vals = jnp.asarray(rng.standard_normal((B, 4, NP, gh * C)), jnp.bfloat16)
    off0 = jnp.asarray(rng.integers(0, gh - 1, (B, NP)), jnp.int32)
    wx = jnp.asarray(rng.random((B, NP)), jnp.float32)
    wq = jnp.asarray(rng.random((B, 4, NP)), jnp.float32)

    def cur(vals, off0, wx, wq):
        v = vals.reshape(B, 4, NP, gh, C)
        ux = (jax.nn.one_hot(off0, gh, dtype=jnp.float32)
              * (1 - wx[..., None])
              + jax.nn.one_hot(off0 + 1, gh, dtype=jnp.float32)
              * wx[..., None])
        w = wq[..., None] * ux[:, None]
        out = jnp.einsum('bknx,bknxc->bnc', w, v.astype(jnp.float32),
                         precision=HI)
        return jnp.sum(out)

    def sel(vals, off0, wx, wq):
        v = vals.reshape(B, 4, NP, gh, C)
        oh0 = jax.nn.one_hot(off0, gh, dtype=jnp.bfloat16)
        oh1 = jax.nn.one_hot(off0 + 1, gh, dtype=jnp.bfloat16)
        s0 = jnp.einsum('bnx,bknxc->bknc', oh0, v,
                        preferred_element_type=jnp.float32)
        s1 = jnp.einsum('bnx,bknxc->bknc', oh1, v,
                        preferred_element_type=jnp.float32)
        lerp = s0 * (1 - wx[:, None, :, None]) + s1 * wx[:, None, :, None]
        return jnp.sum(jnp.sum(lerp * wq[..., None], axis=1))

    for name, fn in (('cur(f32-weight-einsum)', cur),
                     ('sel(bf16-select+f32-lerp)', sel)):
        jf = jax.jit(fn)
        gf = jax.jit(lambda v, o, w, q, f=fn: jax.grad(
            lambda vv: f(vv, o, w, q))(v).astype(
                jnp.float32).sum())
        t = timed(jf, vals, off0, wx, wq)
        tg = timed(gf, vals, off0, wx, wq)
        print(f'halo-s1 {name}: fwd {t*1e3:7.2f} ms  f+b {tg*1e3:7.2f} ms',
              flush=True)

    # numerics check (CPU-independent): same inputs, compare
    a = jax.jit(cur)(vals, off0, wx, wq)
    b = jax.jit(sel)(vals, off0, wx, wq)
    print(f'value delta: {abs(float(np.asarray(a)) - float(np.asarray(b))) / max(abs(float(np.asarray(a))), 1):.2e}',
          flush=True)


if __name__ == '__main__':
    main()
