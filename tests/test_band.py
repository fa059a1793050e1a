"""Iso-band wire codec tests (--fetch_mode band, ops/band.py).

The contract: the band-reconstructed grid extracts the IDENTICAL mesh to
the full-grid fetch — marching cubes reads only vertex classes (grid > 0)
plus exact values on vertices of mixed cubes, and the band ships both.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from list_tpu.ops.band import (BandGrid, band_cap, band_decode, band_encode,
                               fetch_grid_f32)
from list_tpu.utils.meshing import generate_mesh


def _bumpy_sphere(R, r=0.33):
    ax = np.linspace(-0.5, 0.5, R, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
    g = np.sqrt(X * X + Y * Y + Z * Z) - r
    return (g + 0.03 * np.sin(9 * X) * np.cos(7 * Y + 3 * Z)).astype(
        np.float32)


@pytest.mark.parametrize('wire_dtype', ['bfloat16', 'float32'])
def test_band_roundtrip_mesh_parity(wire_dtype):
    R = 32
    g = _bumpy_sphere(R)
    wt = jnp.bfloat16 if wire_dtype == 'bfloat16' else jnp.float32
    wire = jnp.asarray(g, wt)
    full = np.asarray(wire).astype(np.float32)

    buf = np.asarray(band_encode(wire))
    assert buf.dtype == np.uint32
    cap = band_cap(R ** 3)
    expect_words = R ** 3 // 32 + (cap // 2 if wire_dtype == 'bfloat16'
                                   else cap) + 1
    assert buf.shape == (expect_words,)

    rec = band_decode(buf, R, wire_dtype)
    assert rec is not None and rec.dtype == np.float32
    # classes identical everywhere; exact values on the whole mixed band
    np.testing.assert_array_equal(rec > 0, full > 0)
    from list_tpu.ops.band import _mixed_cube_mask
    mask = _mixed_cube_mask(full > 0)
    assert mask.any()
    np.testing.assert_array_equal(rec[mask], full[mask])

    mf = generate_mesh(full, -0.5, 0.5, as_trimesh_obj=True)
    mb = generate_mesh(rec, -0.5, 0.5, as_trimesh_obj=True)
    assert len(mf.vertices) > 10
    np.testing.assert_array_equal(np.asarray(mf.vertices),
                                  np.asarray(mb.vertices))
    np.testing.assert_array_equal(np.asarray(mf.faces),
                                  np.asarray(mb.faces))


def test_band_overflow_falls_back():
    """White-noise grid: nearly every cube is mixed -> count > cap ->
    band_decode returns None and BandGrid falls back to the full fetch."""
    R = 16
    rng = np.random.default_rng(0)
    g = rng.standard_normal((R, R, R)).astype(np.float32)
    wire = jnp.asarray(g, jnp.bfloat16)
    buf = np.asarray(band_encode(wire))
    count = int(buf[-1])
    assert count > band_cap(R ** 3)
    assert band_decode(buf, R, 'bfloat16') is None
    bg = BandGrid(jnp.asarray(buf), wire, R, 'bfloat16')
    np.testing.assert_array_equal(bg.to_numpy(),
                                  np.asarray(wire).astype(np.float32))


def test_fetch_grid_f32_passthrough():
    g = jnp.asarray(_bumpy_sphere(8), jnp.bfloat16)
    out = fetch_grid_f32(g)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, np.asarray(g).astype(np.float32))
