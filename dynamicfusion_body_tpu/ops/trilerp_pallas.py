"""Pallas TPU kernel: brick-local trilinear volume sampling.

The non-rigid TSDF update must trilerp the live volume at 16.7M warped
voxel positions per frame. XLA lowers that to elementwise gathers from a
67 MB HBM table at ~0.1 G/s (≈1.1 s/frame) — 200× off the bandwidth
roof. This kernel exploits the warp's locality: the 512 warped samples of
one 8³ canonical brick land inside a small axis-aligned region of the
live volume, so per brick we

1. DMA a (Bx=16, By=24, Z) slab from HBM into VMEM at the brick's warped
   minimum corner. TPU memrefs tile their last two dims (8,128), so the
   y-offset is 8-aligned (hence By = 16+8 margin) and the lane (z) axis is
   DMA'd full-width;
2. interpolate in-register with SEPARABLE one-hot contractions — per x
   slice an MXU matmul (V,By)·(By,Z) folds the two y-taps, the two x-taps
   fold into the slice loop, and the final two z-taps are an elementwise
   (V,Z) mul-reduce. No per-element gathers anywhere.

Out-of-volume samples are invalid per the reference semantics
(core/util.py:107-108). Samples whose brick deforms beyond the box margin
(> ~7 voxels of differential warp across one 8³ brick) are also marked
invalid — callers with wilder warps should shrink bricks.

Requires z ≡ 0 (mod 128); callers fall back to the XLA gather path for
other shapes (models/warp_field.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BX = 16
BY = 24


def _kernel(live_ref, wx_ref, wy_ref, wz_ref, vals_ref, valid_ref,
            boxes, sems, *, group, R):
    rx, ry, rz = R
    V = wx_ref.shape[1]

    def in_volume(g):
        wx = wx_ref[g, :]
        wy = wy_ref[g, :]
        wz = wz_ref[g, :]
        return (
            (wx >= 0.0) & (wx <= rx - 1.0)
            & (wy >= 0.0) & (wy <= ry - 1.0)
            & (wz >= 0.0) & (wz <= rz - 1.0)
        )

    def box_min(g, invol):
        # min over VALID samples only: out-of-volume samples are masked by
        # ``invol`` regardless, so they must not drag the box away from the
        # in-volume samples of the brick. y is 8-aligned for the DMA tiling.
        big = jnp.float32(1e9)
        mxf = jnp.min(jnp.where(invol, wx_ref[g, :], big))
        myf = jnp.min(jnp.where(invol, wy_ref[g, :], big))
        mx = jnp.clip(jnp.floor(mxf).astype(jnp.int32) - 1, 0, rx - BX)
        my = jnp.clip(
            ((jnp.floor(myf).astype(jnp.int32) - 1) // 8) * 8, 0, ry - BY
        )
        # ry - BY is a multiple of 8 by the shape gate, so the clip
        # preserves divisibility; tell Mosaic so the DMA slice is legal.
        my = pl.multiple_of(my, 8)
        return mx, my

    def dma(g, mx, my):
        return pltpu.make_async_copy(
            live_ref.at[pl.ds(mx, BX), pl.ds(my, BY), :],
            boxes.at[g],
            sems.at[g],
        )

    mins = []
    invols = []
    for g in range(group):
        invol = in_volume(g)
        invols.append(invol)
        mx, my = box_min(g, invol)
        mins.append((mx, my))
        dma(g, mx, my).start()

    iota_z = jax.lax.broadcasted_iota(jnp.int32, (V, rz), 1)
    # (V, BX·BY) fused xy one-hot: row index decomposes as x·BY + y
    iota_xy = jax.lax.broadcasted_iota(jnp.int32, (V, BX * BY), 1)
    x_of = iota_xy // BY
    y_of = iota_xy % BY

    def taps(local, size, axis_of):
        """Two-tap lerp weights of ``local`` (V,) spread over (V, BX·BY)
        via the decomposed axis index ``axis_of``."""
        lc = jnp.clip(local, 0.0, size - 1.0)
        i0 = jnp.floor(jnp.clip(lc, 0.0, size - 2.0)).astype(jnp.int32)
        f = jnp.clip(lc - i0.astype(jnp.float32), 0.0, 1.0)
        i0c = i0[:, None]
        fc = f[:, None]
        return jnp.where(axis_of == i0c, 1.0 - fc, 0.0) + jnp.where(
            axis_of == i0c + 1, fc, 0.0
        )

    def onehot_z(local):
        lc = jnp.clip(local, 0.0, rz - 1.0)
        i0 = jnp.floor(jnp.clip(lc, 0.0, rz - 2.0)).astype(jnp.int32)
        f = jnp.clip(lc - i0.astype(jnp.float32), 0.0, 1.0)
        i0c = i0[:, None]
        fc = f[:, None]
        return jnp.where(iota_z == i0c, 1.0 - fc, 0.0) + jnp.where(
            iota_z == i0c + 1, fc, 0.0
        )

    for g in range(group):
        mx, my = mins[g]
        dma(g, mx, my).wait()
        wx = wx_ref[g, :]
        wy = wy_ref[g, :]
        wz = wz_ref[g, :]
        invol = invols[g]
        lx = jnp.clip(wx, 0.0, rx - 1.0) - mx.astype(jnp.float32)
        ly = jnp.clip(wy, 0.0, ry - 1.0) - my.astype(jnp.float32)
        lz = jnp.clip(wz, 0.0, rz - 1.0)
        inbox = (lx >= 0.0) & (lx <= BX - 1.0) & (ly >= 0.0) & (ly <= BY - 1.0)
        # fused xy interpolation as ONE (V, BX·BY)·(BX·BY, Z) MXU matmul
        # (K = BX·BY = 384 = 3 full 128-lanes passes → high utilization);
        # the final two z-taps are an elementwise mul-reduce.
        Wxy = taps(lx, BX, x_of) * taps(ly, BY, y_of)
        Wz = onehot_z(lz)

        # Precision: subtract the box's central z-profile before the bf16
        # matmul — the residual is bounded by the box xy-radius (TSDF is
        # 1-Lipschitz), so bf16 keeps absolute error ≲0.1 voxel regardless
        # of the volume's value scale; the profile is added back exactly
        # (interpolation weights sum to 1). Split the residual into
        # hi+lo bf16 for another ~256× error reduction at 2 passes.
        cz = boxes[g, BX // 2, BY // 2, :]  # (rz,)
        box2 = boxes[g].reshape(BX * BY, rz)
        resid = box2 - cz[None, :]
        r_hi = resid.astype(jnp.bfloat16)
        r_lo = (resid - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        w_hi = Wxy.astype(jnp.bfloat16)
        w_lo = (Wxy - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t = (
            jnp.dot(w_hi, r_hi, preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, r_lo, preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, r_hi, preferred_element_type=jnp.float32)
        )
        t = t + cz[None, :]
        out = jnp.sum(t * Wz, axis=1)
        vals_ref[g, :] = out
        valid_ref[g, :] = (invol & inbox).astype(jnp.float32)


@partial(jax.jit, static_argnames=("group", "interpret"))
def trilerp_bricks(
    live: jax.Array,
    wx: jax.Array,
    wy: jax.Array,
    wz: jax.Array,
    group: int = 8,
    interpret: bool = False,
):
    """Sample ``live`` (rx,ry,rz) at per-brick warped coords.

    wx/wy/wz: (NB, V) — V samples per brick, spatially coherent per row.
    Returns (vals (NB,V) f32, valid (NB,V) bool).
    """
    NB, V = wx.shape
    assert NB % group == 0, (NB, group)
    grid = NB // group
    spec = pl.BlockSpec((group, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vals, valid = pl.pallas_call(
        partial(_kernel, group=group, R=live.shape),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # live stays in HBM
            spec, spec, spec,
        ],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((NB, V), jnp.float32),
            jax.ShapeDtypeStruct((NB, V), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((group, BX, BY, live.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((group,)),
        ],
        interpret=interpret,
    )(live, wx, wy, wz)
    return vals, valid > 0.5


def trilerp_bricks_supported(shape, brick: int) -> bool:
    """Shape gate for the Pallas path (z lane-tileable, margins fit)."""
    rx, ry, rz = shape
    return (
        rz % 128 == 0
        and rx >= BX
        and ry >= BY
        and (ry - BY) % 8 == 0
        and brick + 2 <= BX
    )
