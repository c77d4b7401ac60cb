"""Synthetic test fixtures (replaces skimage.draw.ellipsoid and the
gitignored data/ directory of the reference)."""

import numpy as np


def ellipsoid_levelset(a, b, c, offset=(0.0, 0.0, 0.0)):
    """Level-set volume of an ellipsoid, like skimage.draw.ellipsoid(...,
    levelset=True): shape (2a+3, 2b+3, 2c+3), values x²/a²+y²/b²+z²/c²−1
    centered in the box (optionally shifted by ``offset`` voxels)."""
    shape = (int(2 * a + 3), int(2 * b + 3), int(2 * c + 3))
    g = [np.arange(s, dtype=np.float64) - (s - 1) / 2.0 for s in shape]
    x, y, z = np.meshgrid(*g, indexing="ij")
    x = x - offset[0]
    y = y - offset[1]
    z = z - offset[2]
    return ((x / a) ** 2 + (y / b) ** 2 + (z / c) ** 2 - 1.0).astype(np.float32)


def sphere_levelset(res, center, radius):
    g = np.arange(res, dtype=np.float64)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (
        np.sqrt(
            (x - center[0]) ** 2 + (y - center[1]) ** 2 + (z - center[2]) ** 2
        )
        - radius
    ).astype(np.float32)


def synthetic_depth_sphere(h, w, K, center, radius, lw=None):
    """Negative-depth map of a sphere under pinhole K and extrinsic lw
    (3x4). Zero where the ray misses (the reference's no-measurement
    value)."""
    Kinv = np.linalg.inv(K)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    rays = np.stack([xx, yy, np.ones_like(xx)], -1) @ Kinv.T  # (h,w,3)
    c = np.asarray(center, dtype=np.float64)
    if lw is not None:
        R, t = lw[:, :3], lw[:, 3]
        c = R @ c + t
    A = np.sum(rays * rays, -1)
    B = -2.0 * rays @ c
    C = c @ c - radius * radius
    disc = B * B - 4 * A * C
    tpar = np.where(disc > 0, (-B - np.sqrt(np.maximum(disc, 0))) / (2 * A), 0.0)
    tpar = np.where(tpar > 0, tpar, 0.0)
    return (-tpar).astype(np.float32)


def bumpy_levelset(res, center, radius, amp, freq, phase=0.0):
    """Sphere with angular bumps — deformable-body stand-in (the bench's
    geometry, bench.py:bumpy_sdf)."""
    g = np.arange(res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    dx, dy, dz = x - center[0], y - center[1], z - center[2]
    r = np.sqrt(dx * dx + dy * dy + dz * dz) + 1e-6
    theta = np.arccos(np.clip(dz / r, -1, 1))
    phi = np.arctan2(dy, dx)
    bump = amp * np.sin(freq * theta + phase) * np.cos(freq * phi + phase)
    return (r - (radius + bump)).astype(np.float32)
