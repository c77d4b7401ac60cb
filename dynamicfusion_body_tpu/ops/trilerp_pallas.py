"""Pallas TPU kernel: brick-local trilinear volume sampling.

The non-rigid TSDF update must trilerp the live volume at 16.7M warped
voxel positions per frame. XLA lowers that to elementwise gathers from a
67 MB HBM table at ~0.1 G/s (≈1.1 s/frame) — 200× off the bandwidth
roof. This kernel exploits the warp's locality: the 512 warped samples of
one 8³ canonical brick land inside a small axis-aligned region of the
live volume, so per brick we

1. DMA a (Bx=16, By=24, rz) slab of the live volume from HBM into VMEM
   at the brick's warped minimum (x, y) corner. TPU memrefs tile their
   last two dims (8,128), so the y offset is 8-aligned (margin sized
   accordingly) and the lane (z) axis is copied full-width — lane-dim
   slices would need 128-alignment. The compute loop then rotates the
   brick's ~10-voxel z-window down to [0, Bz=32) with a dynamic lane
   roll and statically slices it, so the contraction below never touches
   the other 224 z columns;
2. interpolate with one-hot contractions scheduled for the hardware:
   the per-axis two-tap tent weights are built as SMALL transposed
   matrices ((Bx,V), (By,V) — cheap VPU work) and expanded to the fused
   (Bx·By, V) xy weight matrix without VPU iota-compares over the big
   axis (v1 did that — measured as ~70% of kernel time): the x side is
   a static 0/1 selection matmul, the y side a pltpu.repeat tile. One
   elementwise multiply fuses them; one MXU matmul contracts the xy axis
   against the box window's (Bx·By, Bz) face. The final two z-taps are a
   (V, Bz) elementwise tent mul-reduce.

Numerics: the box window is split hi/lo into bf16 halves in-register
(box = hi + lo with |lo| ≤ 2⁻⁸|box|). ``precise=True`` expands the
weights in f32 at HIGHEST precision, splits them hi/lo, and runs three
MXU passes (w_hi·b_hi + w_hi·b_lo + w_lo·b_hi) — max error ~2⁻¹⁶·|live|,
matching the XLA gather path to ~1e-5 even on white-noise volumes. The
default fast path quantizes weights and window to bf16 and runs a single
pass — error ~2⁻⁸·|live|, far sub-voxel for real (Lipschitz) TSDF
volumes whose values are bounded by the truncation distance.

Out-of-volume samples are invalid per the reference semantics
(core/util.py:107-108). Samples whose brick deforms beyond the box margin
(> ~7 voxels of differential warp across one 8³ brick) are reported in a
separate ``escaped`` output — update_tsdf_nonrigid re-samples them exactly
through the XLA gather path, so extreme warps stay correct.

Requires z ≡ 0 (mod 8) and ≥ Bz; callers fall back to the XLA gather
path for other shapes (models/warp_field.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BX = 16
BY = 24
BZ = 32

_bf16 = jnp.bfloat16


def _kernel(live_ref, wx_ref, wy_ref, wz_ref,
            vals_ref, valid_ref, esc_ref, boxes, sems,
            *, group, R, precise, bz):
    rx, ry, rz = R
    V = wx_ref.shape[1]
    K = BX * BY
    f32 = jnp.float32

    def in_volume(g):
        wx = wx_ref[g, :]
        wy = wy_ref[g, :]
        wz = wz_ref[g, :]
        return (
            (wx >= 0.0) & (wx <= rx - 1.0)
            & (wy >= 0.0) & (wy <= ry - 1.0)
            & (wz >= 0.0) & (wz <= rz - 1.0)
        )

    # ---- ONE shared (x, y) box per grid step -----------------------------
    # The ``group`` bricks of a grid step are consecutive along z (brick
    # index order is z-fastest and nbz % group == 0 by the caller gate),
    # so their warped footprints share (x, y) to within the warp's local
    # drift: one DMA of the union box serves all of them. This is the
    # difference between 32768 and 4096 DMA issues per 256³ volume — the
    # per-issue overhead (~1.7 µs) dominated the byte cost. Samples that
    # drift outside the shared margins are reported as escaped and
    # re-sampled exactly by the caller. Mins are taken over VALID samples
    # only: out-of-volume samples are masked by ``invol`` regardless, so
    # they must not drag the box away from in-volume samples.
    big = jnp.float32(1e9)
    invols = [in_volume(g) for g in range(group)]
    mxf = jnp.min(jnp.stack(
        [jnp.min(jnp.where(invols[g], wx_ref[g, :], big))
         for g in range(group)]))
    myf = jnp.min(jnp.stack(
        [jnp.min(jnp.where(invols[g], wy_ref[g, :], big))
         for g in range(group)]))
    mx = jnp.clip(jnp.floor(mxf).astype(jnp.int32) - 1, 0, rx - BX)
    my = jnp.clip(
        ((jnp.floor(myf).astype(jnp.int32) - 1) // 8) * 8, 0, ry - BY
    )
    # ry - BY is a multiple of 8 by the shape gate, so the clip preserves
    # divisibility; tell Mosaic so the DMA slice is legal.
    my = pl.multiple_of(my, 8)
    pltpu.make_async_copy(
        live_ref.at[pl.ds(mx, BX), pl.ds(my, BY), :], boxes, sems,
    ).start()

    # per-brick z-window min: the z axis is DMA'd full-width (lane-dim
    # slices would need 128-alignment, far coarser than the ~10-voxel z
    # spread); the compute loop rotates each brick's window down to
    # [0, bz) in-register with pltpu.roll instead.
    mzs = []
    for g in range(group):
        mzf = jnp.min(jnp.where(invols[g], wz_ref[g, :], big))
        mzs.append(
            jnp.clip(jnp.floor(mzf).astype(jnp.int32) - 1, 0, rz - bz)
        )

    # Static 0/1 expansion matrix for the x side of the fused xy axis:
    # row kk decomposes as (x, y) = (kk // BY, kk % BY); the y side is a
    # pure tile (pltpu.repeat). Ex is built once per grid step.
    kk_x = jax.lax.broadcasted_iota(jnp.int32, (K, BX), 0) // BY
    ex = kk_x == jax.lax.broadcasted_iota(jnp.int32, (K, BX), 1)
    # precise mode expands in f32 at HIGHEST precision (bf16 taps would
    # floor its error at 2⁻⁹); fast mode uses a 1-pass bf16 matmul.
    dt = f32 if precise else _bf16
    exd = ex.astype(dt)
    xprec = jax.lax.Precision.HIGHEST if precise else None

    iota_bx = jax.lax.broadcasted_iota(jnp.int32, (BX, V), 0).astype(f32)
    iota_by = jax.lax.broadcasted_iota(jnp.int32, (BY, V), 0).astype(f32)
    iota_bz = jax.lax.broadcasted_iota(jnp.int32, (V, bz), 1).astype(f32)

    def zwindow(box2, mz):
        """(K, rz) f32 → the (K, bz) z-window starting at mz, via a
        dynamic lane rotation (lane-dim slicing would need 128-alignment;
        the rotate needs 32-bit data, hence f32 boxes)."""
        if rz <= bz:
            return box2
        return pltpu.roll(box2, rz - mz, 1)[:, :bz]

    pltpu.make_async_copy(
        live_ref.at[pl.ds(mx, BX), pl.ds(my, BY), :], boxes, sems,
    ).wait()
    box2 = boxes[...].reshape(K, rz)
    for g in range(group):
        mz = mzs[g]
        wx = wx_ref[g, :]
        wy = wy_ref[g, :]
        wz = wz_ref[g, :]
        invol = invols[g]
        lx = jnp.clip(wx, 0.0, rx - 1.0) - mx.astype(f32)
        ly = jnp.clip(wy, 0.0, ry - 1.0) - my.astype(f32)
        lz = jnp.clip(wz, 0.0, rz - 1.0) - mz.astype(f32)
        inbox = (
            (lx >= 0.0) & (lx <= BX - 1.0)
            & (ly >= 0.0) & (ly <= BY - 1.0)
            & (lz >= 0.0) & (lz <= bz - 1.0)
        )

        # transposed per-axis tent taps — (BX,V)/(BY,V) stay cheap on the
        # VPU. Their expansion to the fused-xy (K, V) axis is pure data
        # movement, exact in f32: row kk of the fused axis decomposes as
        # (x, y) = (kk // BY, kk % BY), so the x side is each tap row
        # repeated BY× and the y side is the tap block tiled BX×.
        txt = jnp.maximum(0.0, 1.0 - jnp.abs(iota_bx - lx[None, :]))
        tyt = jnp.maximum(0.0, 1.0 - jnp.abs(iota_by - ly[None, :]))
        xkv = jax.lax.dot(exd, txt.astype(dt), precision=xprec,
                          preferred_element_type=f32)    # (K, V) x-taps
        ykv = pltpu.repeat(tyt, BX, 0)                   # (K, V) y-taps
        wkv = xkv * ykv                                  # fused xy weights

        bwin = zwindow(box2, mz)                      # (K, bz) f32
        # hi/lo bf16 split on the NARROW window — (K, bz) is 12× smaller
        # than the full box, so the converts are off the critical path
        bh = bwin.astype(_bf16)
        # contract the xy axis on the MXU: (K,V)ᵀ·(K,bz) → (V,bz)
        dn = (((0,), (0,)), ((), ()))
        if precise:
            w_hi = wkv.astype(_bf16)
            w_lo = (wkv - w_hi.astype(f32)).astype(_bf16)
            bl = (bwin - bh.astype(f32)).astype(_bf16)
            t = (
                jax.lax.dot_general(w_hi, bh, dn,
                                    preferred_element_type=f32)
                + jax.lax.dot_general(w_hi, bl, dn,
                                      preferred_element_type=f32)
                + jax.lax.dot_general(w_lo, bh, dn,
                                      preferred_element_type=f32)
            )
        else:
            t = jax.lax.dot_general(wkv.astype(_bf16), bh, dn,
                                    preferred_element_type=f32)

        # final two z-taps: (V, bz) elementwise tent mul-reduce
        tz = jnp.maximum(0.0, 1.0 - jnp.abs(iota_bz - lz[:, None]))
        out = jnp.sum(t * tz, axis=1)
        vals_ref[g, :] = out
        valid_ref[g, :] = (invol & inbox).astype(f32)
        # in-volume samples whose brick warped beyond the VMEM box: the
        # caller re-samples these exactly (models/warp_field.py fixup)
        esc_ref[g, :] = (invol & jnp.logical_not(inbox)).astype(f32)


@partial(jax.jit, static_argnames=("group", "interpret", "precise"))
def trilerp_bricks(
    live: jax.Array,
    wx: jax.Array,
    wy: jax.Array,
    wz: jax.Array,
    group: int = 8,
    interpret: bool = False,
    precise: bool = False,
):
    """Sample ``live`` (rx,ry,rz) at per-brick warped coords.

    wx/wy/wz: (NB, V) — V samples per brick, spatially coherent per row.
    Each ``group`` of consecutive rows SHARES one VMEM box (one DMA):
    callers must order bricks so groups are z-consecutive runs (pass the
    brick-grid z extent's divisor as ``group``, or group=1 for unordered
    bricks — each brick then gets its own box).
    Returns (vals (NB,V) f32, valid (NB,V) bool, escaped (NB,V) bool) —
    ``escaped`` marks samples INSIDE the live volume that fell outside the
    shared VMEM box (valid is False for them); callers must re-sample
    them exactly (see models/warp_field.py) or count them dropped.

    ``precise=True`` runs the three-pass hi/lo weight path (error
    ~2⁻¹⁶·|live|, for white-noise test volumes); the default single-pass
    path has error ~2⁻⁸·|live| — far sub-voxel for real TSDF volumes.
    """
    NB, V = wx.shape
    assert NB % group == 0, (NB, group)
    bz = min(BZ, live.shape[2])
    grid = NB // group
    spec = pl.BlockSpec((group, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vals, valid, esc = pl.pallas_call(
        partial(_kernel, group=group, R=live.shape, precise=precise, bz=bz),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # live stays in HBM
            spec, spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((NB, V), jnp.float32),
            jax.ShapeDtypeStruct((NB, V), jnp.float32),
            jax.ShapeDtypeStruct((NB, V), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BX, BY, live.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(live, wx, wy, wz)
    return vals, valid > 0.5, esc > 0.5


def trilerp_bricks_supported(shape, brick: int) -> bool:
    """Shape gate for the Pallas path: y 8-tileable with the margin, z
    either small enough for a full window or 128-tileable (the z-window
    rotation needs clean lane tiling), margins fit the brick."""
    rx, ry, rz = shape
    bz = min(BZ, rz)
    return (
        rx >= BX
        and ry >= BY
        and (ry - BY) % 8 == 0
        and (rz <= BZ or rz % 128 == 0)
        and brick + 2 <= BX
        and brick + 2 <= bz
    )
