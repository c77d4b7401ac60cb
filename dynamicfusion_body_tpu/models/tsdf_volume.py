"""Canonical TSDF volume state (immutable pytree) and projective depth fusion.

Reference semantics: the authoritative OpenCL kernel ``fuse_depth``
(core/fusion_dm.py:630-673) — per voxel: project through ``proj = K·lw·IND``,
bilinearly sample the (negative-valued) depth map, convert to a signed
distance along the camera ray via row 2 of K⁻¹, truncate, and apply the
weighted running average with the ``WMAX`` clamp. Sign convention follows
the GPU kernel (SURVEY §2.4 flags the CPU variant as inconsistent).

TPU design: the per-voxel loop becomes one fused XLA computation over the
full (R,R,R) grid — the projection is affine in the voxel index so u,v,w are
broadcasted iota arithmetic; the only gather is the 4-tap bilinear depth
lookup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.interp import trilinear


@struct.dataclass
class TsdfVolume:
    """values: signed distances (R,R,R); weights: accumulation weights
    (R,R,R); ind: 4x4 grid-index→world matrix (reference ``_IND``,
    core/fusion_dm.py:70,136-141)."""

    values: jax.Array
    weights: jax.Array
    ind: jax.Array

    @classmethod
    def create(cls, res: int, tdist: float, ind: jax.Array | None = None):
        if ind is None:
            ind = jnp.eye(4, dtype=jnp.float32)
        return cls(
            values=jnp.full((res, res, res), abs(tdist), dtype=jnp.float32),
            weights=jnp.zeros((res, res, res), dtype=jnp.float32),
            ind=ind,
        )

    @property
    def res(self) -> int:
        return self.values.shape[0]

    def grid_to_world(self, pts: jax.Array) -> jax.Array:
        """Voxel-index coords (...,3) → world coords via ``ind``."""
        return (
            jnp.einsum("ij,...j->...i", self.ind[:3, :3], pts,
                       precision=jax.lax.Precision.HIGHEST) + self.ind[:3, 3]
        )

    def world_to_grid(self, pts: jax.Array) -> jax.Array:
        inv = jnp.linalg.inv(self.ind)
        return jnp.einsum("ij,...j->...i", inv[:3, :3], pts,
                          precision=jax.lax.Precision.HIGHEST) + inv[:3, 3]


def fuse_depth(
    values: jax.Array,
    weights: jax.Array,
    depth: jax.Array,
    proj: jax.Array,
    kinv: jax.Array,
    tdist: float,
    wmax: float = 100.0,
    x_offset=0,
):
    """One projective TSDF update from one depth map (XLA path).

    values/weights: (R,R,R); depth: (H,W) negative-depth map; proj: (3,4)
    = K·lw·IND; kinv: (3,3); x_offset: global x index of this block's
    first plane (used by the sharded path — each device owns an x-slab).
    Functional spec: reference OpenCL kernel core/fusion_dm.py:630-673
    (verified against a NumPy transcription in tests/test_fusion_kernels.py).
    """
    rx, ry, rz = values.shape
    h, w = depth.shape
    f32 = jnp.float32
    xs = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 0) + x_offset
    ys = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 1)
    zs = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 2)

    u = proj[0, 0] * xs + proj[0, 1] * ys + proj[0, 2] * zs + proj[0, 3]
    v = proj[1, 0] * xs + proj[1, 1] * ys + proj[1, 2] * zs + proj[1, 3]
    pw = proj[2, 0] * xs + proj[2, 1] * ys + proj[2, 2] * zs + proj[2, 3]

    px = u / pw
    py = v / pw
    inb = (px >= 0.0) & (py >= 0.0) & (px < w - 1) & (py < h - 1)

    # Clamped bilinear sample (invalid lanes masked by ``inb``).
    pxc = jnp.where(inb, px, 0.0)
    pyc = jnp.where(inb, py, 0.0)
    x0 = jnp.floor(pxc).astype(jnp.int32)
    y0 = jnp.floor(pyc).astype(jnp.int32)
    wx = pxc - x0.astype(f32)
    wy = pyc - y0.astype(f32)
    dflat = depth.reshape(-1)

    def g(iy, ix):
        lin = (iy * w + ix).reshape(-1)
        return jnp.take(dflat, lin, axis=0).reshape(x0.shape)

    up = g(y0, x0) * (1 - wx) + g(y0, x0 + 1) * wx
    bot = g(y0 + 1, x0) * (1 - wx) + g(y0 + 1, x0 + 1) * wx
    pz = -(up * (1 - wy) + bot * wy)

    # Signed distance along the camera principal axis; invalid/too-close
    # depth carves free space at -tdist (GPU kernel lines 650-659).
    behind = pz <= tdist
    dz_open = -(
        kinv[2, 0] * (px * pz - u) + kinv[2, 1] * (py * pz - v) + kinv[2, 2] * (pz - pw)
    )
    dz = jnp.where(behind, -tdist, dz_open)

    upd = inb & (dz < tdist)
    wi = 1.0
    new_w = jnp.minimum(wi + weights, wmax)
    new_vals = ((new_w - wi) * values + wi * jnp.maximum(-tdist, dz)) / new_w
    return (
        jnp.where(upd, new_vals, values),
        jnp.where(upd, new_w, weights),
    )


def update_tsdf_rigid(
    values: jax.Array,
    weights: jax.Array,
    live: jax.Array,
    lw_dq: jax.Array,
    tdist: float,
    wmax: float = 100.0,
    x_offset=0,
):
    """Rigid TSDF-to-TSDF fusion: warp each canonical voxel center by the
    global DQ, trilerp the live TSDF, running-average update.

    Reference FusionDM.updateTSDF (core/fusion_dm.py:300-316): skip when the
    sample is out of volume or <= -tdist; wi = 1. ``x_offset`` is the
    global x index of this block's first plane (sharded path — each
    device owns an x-slab of the canonical volume).
    """
    from ..ops.dualquat import dq_transform_point

    rx, ry, rz = values.shape
    f32 = jnp.float32
    xs = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 0) + x_offset
    ys = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 1)
    zs = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 2)
    pos = jnp.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
    warped = dq_transform_point(lw_dq, pos)
    tsdf_l, valid = trilinear(live, warped)
    tsdf_l = tsdf_l.reshape(values.shape)
    valid = valid.reshape(values.shape)

    upd = valid & (tsdf_l > -tdist)
    wi = 1.0
    new_w = weights + wi
    new_vals = (values * weights + jnp.minimum(tdist, tsdf_l) * wi) / new_w
    return (
        jnp.where(upd, new_vals, values),
        jnp.where(upd, jnp.minimum(new_w, wmax), weights),
    )
