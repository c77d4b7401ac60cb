"""Trilinear TSDF interpolation (batched, masked, TPU-friendly gathers).

Reference semantics: core/util.py:102-137 ``interpolate_tsdf`` — floor/ceil
corner gather, lerp over x then y then z, and *None* when the query is
outside ``[0, res-1]³``. The TPU version is shape-static: it returns a
``(value, valid)`` pair instead of None, with clamped (safe) gathers for
out-of-bounds positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trilinear(volume: jax.Array, pos: jax.Array):
    """Trilinearly interpolate ``volume`` (X,Y,Z) at ``pos`` (...,3).

    Returns ``(values (...,), valid (...,) bool)``. ``valid`` is False when
    any coordinate is < 0 or > res-1 (reference core/util.py:107-108); the
    value at invalid positions is computed from clamped indices and must be
    masked by the caller.
    """
    rx, ry, rz = volume.shape
    res = jnp.array([rx - 1, ry - 1, rz - 1], dtype=pos.dtype)
    valid = jnp.all((pos >= 0.0) & (pos <= res), axis=-1)

    p = jnp.clip(pos, 0.0, res)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.array([rx - 1, ry - 1, rz - 1], jnp.int32))

    flat = volume.reshape(-1)

    def gather(ix, iy, iz):
        lin = (ix * ry + iy) * rz + iz
        return jnp.take(flat, lin.reshape(-1), axis=0).reshape(lin.shape)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    xd, yd, zd = frac[..., 0], frac[..., 1], frac[..., 2]

    c000 = gather(x0, y0, z0)
    c100 = gather(x1, y0, z0)
    c010 = gather(x0, y1, z0)
    c110 = gather(x1, y1, z0)
    c001 = gather(x0, y0, z1)
    c101 = gather(x1, y0, z1)
    c011 = gather(x0, y1, z1)
    c111 = gather(x1, y1, z1)

    c00 = c000 * (1 - xd) + c100 * xd
    c01 = c010 * (1 - xd) + c110 * xd
    c10 = c001 * (1 - xd) + c101 * xd
    c11 = c011 * (1 - xd) + c111 * xd
    c0 = c00 * (1 - yd) + c01 * yd
    c1 = c10 * (1 - yd) + c11 * yd
    return c0 * (1 - zd) + c1 * zd, valid


def bilinear(image: jax.Array, px: jax.Array, py: jax.Array):
    """Bilinearly sample ``image`` (H,W) at column ``px``, row ``py``.

    Matches the reference OpenCL ``interpolation`` helper
    (core/fusion_dm.py:605-622): x = floor(px), corners (y,x), (y,x+1),
    (y+1,x), (y+1,x+1). Caller must guarantee 0 <= px < W-1, 0 <= py < H-1
    (we clamp for gather safety; validity is the caller's mask).
    """
    h, w = image.shape
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 2)
    wx = jnp.clip(px - x0.astype(px.dtype), 0.0, 1.0)
    wy = jnp.clip(py - y0.astype(py.dtype), 0.0, 1.0)
    flat = image.reshape(-1)

    def gather(iy, ix):
        lin = iy * w + ix
        return jnp.take(flat, lin.reshape(-1), axis=0).reshape(lin.shape)

    up = gather(y0, x0) * (1 - wx) + gather(y0, x0 + 1) * wx
    bot = gather(y0 + 1, x0) * (1 - wx) + gather(y0 + 1, x0 + 1) * wx
    return up * (1 - wy) + bot * wy
