"""On-chip probe: corner-collapsed volumes for the train sampler.

probe_gather_modes.py showed the flat take runs 116-222M rows/s in
isolation (4-7x the effective in-step rate) and that slice-gather bricks
lose on backward.  The remaining lever is fewer gathered ROWS.  Corner
collapsing attacks that exactly: pre-replicate the z+1 / y+1 neighbor
planes into the row (4 quads) and window x with overlap (stride gh-1,
width gh) so BOTH x corners always share a row -> ONE row-read per tap
yields all 8 trilinear corners: 7 row-reads per query per scale instead
of 56, at ~4x volume memory, built once per step with reshape/slice/
concat only (a stack-of-windows build materializes a 6.7x-padded
cotangent in backward and OOMs 16 GB at the 16ch@128^3 scale — probed).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_corner_collapse.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 4
NQ = 8111
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


SCALES = [
    ('s0_1ch@128', 128, 128, 128, 1),
    ('s1_16ch@128', 128, 128, 128, 16),
    ('s2_32ch@64', 64, 64, 64, 32),
    ('s3_64ch@32', 32, 32, 32, 64),
    ('s4_128ch@16', 16, 16, 16, 128),
    ('s5_128ch@8', 8, 8, 8, 128),
]


def pack_g(W, C):
    g = 1
    while g * 2 * C <= 128 and W % (g * 2) == 0:
        g *= 2
    return g


def collapse(vol, gh):
    """vol: (B, D, H, W, C) -> (B, D, H, XR, 4*gh*C).

    Row r of the x axis covers columns [r*(gh-1), r*(gh-1)+gh-1] (overlap
    1), and the 4 quads are (dz, dy) in {(0,0), (0,1), (1,0), (1,1)} with
    +1 shifts edge-clamped (matching border-mode corner clipping).  Built
    from reshape/strided-slice/concat only: every intermediate keeps a
    wide minor dimension, so both the build and its transpose (the
    un-collapse grad accumulation) stay layout-friendly.
    """
    Bb, D, H, W, C = vol.shape

    def sh_y(v):
        return jnp.concatenate([v[:, :, 1:], v[:, :, -1:]], axis=2)

    def sh_z(v):
        return jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)

    if gh >= W:
        XR = 1

        def windows(v):
            return v.reshape(Bb, D, H, 1, W * C)
    else:
        s = gh - 1
        XR = -(-(W - 1) // s)
        L = XR * s + 1
        pad = L - W

        def windows(v):
            if pad:
                v = jnp.concatenate(
                    [v, jnp.broadcast_to(v[..., -1:, :],
                                         (Bb, D, H, pad, C))], axis=3)
            main = v[..., :XR * s, :].reshape(Bb, D, H, XR, s * C)
            last = v[..., s::s, :].reshape(Bb, D, H, XR, C)
            return jnp.concatenate([main, last], axis=-1)

    quads = [vol, sh_y(vol), sh_z(vol), sh_z(sh_y(vol))]
    return jnp.concatenate([windows(q) for q in quads], axis=-1)


def take_fwd(vol, idx):
    Bm, M, L = vol.shape
    g = (jnp.arange(Bm, dtype=idx.dtype)[:, None, None] * M + idx)
    rows = jnp.take(vol.reshape(Bm * M, L), g.reshape(-1), axis=0,
                    mode='clip')
    return jnp.sum(rows.astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    print(f'devices: {jax.devices()}  B={B} NQ={NQ}', flush=True)
    for name, D, H, W, C in SCALES:
        g = pack_g(W, C)
        M = D * H * W // g
        gh = W if W * C <= 128 else max(g, 2)
        vol = jnp.asarray(rng.standard_normal((B, M, g * C)), jnp.bfloat16)
        vol5 = vol.reshape(B, D, H, W, C)
        idx8 = jnp.asarray(rng.integers(0, M, (B, 8, NP)), jnp.int32)

        jc = jax.jit(functools.partial(collapse, gh=gh))
        v4 = jc(vol5)
        XR4, L4 = v4.shape[3], v4.shape[4]
        M4 = D * H * XR4
        v4f = jnp.reshape(v4, (B, M4, L4))
        idx1 = jnp.asarray(rng.integers(0, M4, (B, 1, NP)), jnp.int32)

        t_build = timed(jax.jit(lambda v: jnp.sum(
            jc(v).astype(jnp.float32))), vol5)
        t8 = timed(jax.jit(take_fwd), vol, idx8)
        t1 = timed(jax.jit(take_fwd), v4f, idx1)
        g8 = jax.jit(lambda v, i: jax.grad(
            lambda vv: take_fwd(vv, i))(v).sum().astype(jnp.float32))
        g1 = jax.jit(lambda v, i: jax.grad(
            lambda vv: take_fwd(jc(vv).reshape(B, M4, L4), i)
        )(v).sum().astype(jnp.float32))
        t8g = timed(g8, vol, idx8)
        t1g = timed(g1, vol5, idx1)
        mb = B * M4 * L4 * 2 / 1e6
        print(f'{name}: g={g} gh={gh} XR4={XR4} L4={L4} v4={mb:7.1f} MB '
              f'build {t_build*1e3:6.2f} ms | take8 fwd {t8*1e3:7.2f} '
              f'f+b {t8g*1e3:7.2f} | take1 fwd {t1*1e3:7.2f} '
              f'f+b(incl uncollapse) {t1g*1e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
