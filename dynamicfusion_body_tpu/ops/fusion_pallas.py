"""Pallas TPU kernel: multi-view projective depth fusion (brick layout).

The reference ingests a sequence of depth maps with one OpenCL dispatch
per map (core/fusion_dm.py:630-673): per voxel, project through
``proj = K·lw·IND``, bilinearly sample the (negative-valued) depth map,
convert to a signed distance along the camera ray, truncate, and apply
the weighted running average with the WMAX clamp. The XLA port of that
kernel (models/tsdf_volume.py fuse_depth) is gather-bound: 4 taps × 16.7M
voxels from a 1 MB HBM table ≈ 607 ms per map at 256³.

This kernel fuses ALL views in one pass over the volume:

* the volume lives in the same (NB, V) 8³-brick layout as the trilerp
  kernel (spatially coherent rows);
* every depth map is small enough to stay VMEM-resident for the whole
  grid (n_views × H × W f32 = 8 MB for 8 × 512²) — no per-brick DMA;
* per brick × view, the 512 projected samples land in a (BH, BW) window
  of the image: an 8-aligned y-slice of the resident map, x-rotated
  (pltpu.roll) down to lane 0. The bilinear sample is the quadratic form
  ty·D·tx;
* ALL views share ONE MXU matmul per brick: each view's hi/lo-split
  window and y-taps are stacked BLOCK-DIAGONALLY — lhs (n·3BH, V) taps,
  rhs (n·3BH, n·BW) with view v's window in rows [3BH·v, 3BH·(v+1)) and
  columns [BW·v, BW·(v+1)) and zeros elsewhere — so the contraction
  keeps views separate while filling full 128-lane tiles (per-view
  matmuls measured at dispatch overhead, ~8× slower). The three hi/lo
  precision passes (tyh·Dh + tyl·Dh + tyh·Dl, error ~2⁻¹⁶·|depth| —
  depths are metres-scale so bf16 alone would cost ~a voxel) ride the
  same stacking. The per-view x-tap mul-reduce is a second static
  segmented-sum matmul;
* views merge sequentially in-register with the reference's exact
  running-average/WMAX semantics — the volume is read and written once
  for the whole sequence instead of once per view.

The window size is a static parameter the caller sizes from the exact
per-view projection bounds (affine in the voxel index, so the min/max
image-pixels-per-voxel rate over the volume is computable on the host).
Samples whose brick still escapes the window (counted in ``escaped``)
are NOT fused — callers fall back to the XLA path when the count is
nonzero.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_bf16 = jnp.bfloat16


def _kernel(depth_ref, proj_ref, kinv_ref, vals_ref, wts_ref,
            out_v_ref, out_w_ref, esc_ref,
            *, group, n_views, vol_shape, brick, tdist, wmax, x_offset,
            bh, bw):
    f32 = jnp.float32
    V = vals_ref.shape[1]
    n, h, w = depth_ref.shape
    rx, ry, rz = vol_shape
    nby = ry // brick
    nbz = rz // brick
    KB = 3 * bh                     # stacked hi/lo pass rows per view

    # within-brick voxel offsets (x-major, z fastest), decoded
    # arithmetically — Mosaic can't shape-cast a (b,b,b) iota to (V,)
    vidx = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)[0]
    ox = (vidx // (brick * brick)).astype(f32)
    oy = ((vidx // brick) % brick).astype(f32)
    oz = (vidx % brick).astype(f32)

    iota_bh = jax.lax.broadcasted_iota(jnp.int32, (bh, V), 0).astype(f32)
    # x-tap tent support: column c of the (V, n·bw) fused axis belongs to
    # view c // bw at window offset c % bw
    iota_nw = jax.lax.broadcasted_iota(jnp.int32, (V, n * bw), 1)
    off_nw = (iota_nw % bw).astype(f32)
    # segmented per-view sum: (n·bw, n) 0/1 matrix
    seg = (
        (iota_nw[0][:, None] // bw)
        == jax.lax.broadcasted_iota(jnp.int32, (n * bw, n), 1)
    ).astype(_bf16)

    ps = [[proj_ref[v, j] for j in range(12)] for v in range(n_views)]
    k0 = kinv_ref[0, 0]
    k1 = kinv_ref[0, 1]
    k2 = kinv_ref[0, 2]

    i0 = pl.program_id(0)
    for g in range(group):
        b = i0 * group + g
        bx0 = (b // (nby * nbz)) * brick + x_offset
        by0 = ((b // nbz) % nby) * brick
        bz0 = (b % nbz) * brick
        xs = bx0.astype(f32) + ox
        ys = by0.astype(f32) + oy
        zs = bz0.astype(f32) + oz

        lhs_blocks = []
        rhs_blocks = []
        view_data = []
        esc = jnp.zeros((V,), f32)
        for view in range(n_views):
            p = ps[view]
            u = p[0] * xs + p[1] * ys + p[2] * zs + p[3]
            vv = p[4] * xs + p[5] * ys + p[6] * zs + p[7]
            pw = p[8] * xs + p[9] * ys + p[10] * zs + p[11]
            px = u / pw
            py = vv / pw
            inb = (px >= 0.0) & (py >= 0.0) & (px < w - 1) & (py < h - 1)
            pxc = jnp.where(inb, px, 0.0)
            pyc = jnp.where(inb, py, 0.0)

            big = jnp.float32(1e9)
            myf = jnp.min(jnp.where(inb, pyc, big))
            mxf = jnp.min(jnp.where(inb, pxc, big))
            my = jnp.clip(
                ((jnp.floor(myf).astype(jnp.int32) - 1) // 8) * 8,
                0, h - bh,
            )
            my = pl.multiple_of(my, 8)
            mx = jnp.clip(jnp.floor(mxf).astype(jnp.int32) - 1, 0, w - bw)

            ly = pyc - my.astype(f32)
            lx = pxc - mx.astype(f32)
            inwin = (
                (ly >= 0.0) & (ly <= bh - 1.0)
                & (lx >= 0.0) & (lx <= bw - 1.0)
            )
            # escaped: in-image but outside the window — counted, not
            # fused; the caller re-fuses through the XLA path
            esc = esc + (inb & ~inwin).astype(f32)

            # shift kept in [0, w) — a full-width rotate is UB territory
            dwin = pltpu.roll(
                depth_ref[view, pl.ds(my, bh), :], (w - mx) % w, 1
            )[:, :bw]                                    # (bh, bw) f32
            dh = dwin.astype(_bf16)
            dl = (dwin - dh.astype(f32)).astype(_bf16)

            tyv = jnp.maximum(0.0, 1.0 - jnp.abs(iota_bh - ly[None, :]))
            tyh = tyv.astype(_bf16)
            tyl = (tyv - tyh.astype(f32)).astype(_bf16)

            lhs_blocks.append(jnp.concatenate([tyh, tyl, tyh], axis=0))
            rhs_blocks.append(jnp.concatenate([dh, dh, dl], axis=0))
            view_data.append((u, vv, pw, px, py, lx, inb & inwin))

        # ONE matmul for all views: block-diagonal rhs keeps each view's
        # contraction separate; K = n·3BH and N = n·BW fill whole tiles
        lhs = jnp.concatenate(lhs_blocks, axis=0)        # (n·KB, V)
        zcol = jnp.zeros((KB, bw), _bf16)
        rhs = jnp.concatenate(
            [
                jnp.concatenate(
                    [rhs_blocks[v] if c == v else zcol
                     for c in range(n_views)],
                    axis=1,
                )
                for v in range(n_views)
            ],
            axis=0,
        )                                                # (n·KB, n·bw)
        t = jax.lax.dot_general(
            lhs, rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                                # (V, n·bw)

        # fused x-taps for every view's window, then a segmented per-view
        # sum as a second (static 0/1) matmul → (V, n) sampled depths
        lx_all = jnp.concatenate(
            [jnp.broadcast_to(view_data[v][5][:, None], (V, bw))
             for v in range(n_views)],
            axis=1,
        )
        tx_all = jnp.maximum(0.0, 1.0 - jnp.abs(off_nw - lx_all))
        # hi/lo split before the bf16 segmented sum — the summands are
        # metres-scale depths, and ``seg`` is 0/1 so placement is exact
        q = t * tx_all
        qh = q.astype(_bf16)
        ql = (q - qh.astype(f32)).astype(_bf16)
        pz_all = -(
            jax.lax.dot(qh, seg, preferred_element_type=f32)
            + jax.lax.dot(ql, seg, preferred_element_type=f32)
        )                                                # (V, n)

        # sequential reference merge over views (running average + WMAX)
        vals = vals_ref[g, :]
        wts = wts_ref[g, :]
        for view in range(n_views):
            u, vv, pw, px, py, _lx, ok = view_data[view]
            pz = pz_all[:, view]
            # signed distance along the camera principal axis; invalid/
            # too-close depth carves free space at -tdist (reference GPU
            # kernel lines 650-659)
            behind = pz <= tdist
            dz_open = -(
                k0 * (px * pz - u) + k1 * (py * pz - vv) + k2 * (pz - pw)
            )
            dz = jnp.where(behind, -tdist, dz_open)
            upd = ok & (dz < tdist)
            new_w = jnp.minimum(1.0 + wts, wmax)
            new_v = (
                (new_w - 1.0) * vals + jnp.maximum(-tdist, dz)
            ) / new_w
            vals = jnp.where(upd, new_v, vals)
            wts = jnp.where(upd, new_w, wts)

        out_v_ref[g, :] = vals
        out_w_ref[g, :] = wts
        esc_ref[g, :] = esc


@partial(
    jax.jit,
    static_argnames=(
        "vol_shape", "brick", "tdist", "wmax", "x_offset", "group",
        "window", "interpret",
    ),
)
def fuse_depth_multi_bricks(
    vals_b: jax.Array,
    wts_b: jax.Array,
    depths: jax.Array,
    projs: jax.Array,
    kinv_row2: jax.Array,
    vol_shape,
    brick: int = 8,
    tdist: float = 0.1,
    wmax: float = 100.0,
    x_offset: int = 0,
    group: int = 8,
    window: int = 32,
    interpret: bool = False,
):
    """Fuse ``n`` depth maps into a brick-layout TSDF in one pass.

    vals_b/wts_b: (NB, V) brick rows (x-major, z fastest);
    depths: (n, H, W) negative-depth maps; projs: (n, 3, 4) = K·lw·IND;
    kinv_row2: (3,) row 2 of K⁻¹; window: per-brick image window in px
    (multiple of 8 — size with ``fuse_window_for``). Returns
    (vals, wts, esc_count) — ``esc_count`` > 0 means some in-image
    samples fell outside the window; callers should re-fuse with the XLA
    path in that case.

    Functional spec: sequential models/tsdf_volume.py fuse_depth over the
    maps (itself oracle-tested against the reference OpenCL kernel,
    core/fusion_dm.py:630-673).
    """
    NB, V = vals_b.shape
    n, h, w = depths.shape
    assert NB % group == 0, (NB, group)
    assert window % 8 == 0
    spec = pl.BlockSpec((group, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out_v, out_w, esc = pl.pallas_call(
        partial(
            _kernel, group=group, n_views=n, vol_shape=vol_shape,
            brick=brick, tdist=tdist, wmax=wmax, x_offset=x_offset,
            bh=window, bw=window,
        ),
        grid=(NB // group,),
        in_specs=[
            full((n, h, w)),       # depth maps resident in VMEM
            full((n, 12)),
            full((1, 3)),
            spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((NB, V), jnp.float32),
            jax.ShapeDtypeStruct((NB, V), jnp.float32),
            jax.ShapeDtypeStruct((NB, V), jnp.float32),
        ),
        # the resident depth maps alone are n·H·W·4 bytes (8 MB for
        # 8×512²) — beyond the 16 MB default scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(depths, projs.reshape(n, 12), kinv_row2.reshape(1, 3),
      vals_b, wts_b)
    return out_v, out_w, jnp.sum(esc).astype(jnp.int32)


def fuse_window_for(vol_shape, projs, img_shape, brick: int):
    """Static window size (px) covering one brick's projected footprint.

    Exact host-side computation: px = u/pw is linear-fractional in the
    voxel index, so over each brick (a box) its extrema are at the
    brick's 8 corners — project every brick-corner lattice point per
    view (NumPy, ~35k points) and take the maximum clamped-to-image
    per-brick span. Returns the smallest multiple of 8 that fits the
    span plus tap/floor/8-alignment margins, or 0 when no static window
    ≤ 128 px works (the caller falls back to the XLA path).
    """
    rx, ry, rz = vol_shape
    h, w = img_shape
    projs = np.asarray(projs, dtype=np.float64)
    gx = np.arange(0, rx + 1, brick, dtype=np.float64)
    gy = np.arange(0, ry + 1, brick, dtype=np.float64)
    gz = np.arange(0, rz + 1, brick, dtype=np.float64)
    X, Y, Z = np.meshgrid(gx, gy, gz, indexing="ij")
    P = np.stack([X, Y, Z, np.ones_like(X)], axis=-1)

    def cellspan(a):
        """Per-cell max-min over the 8 corners (NaN corners skipped)."""
        mx, mn = a, a
        for ax in range(3):
            sl0 = [slice(None)] * 3
            sl1 = [slice(None)] * 3
            sl0[ax] = slice(None, -1)
            sl1[ax] = slice(1, None)
            mx = np.fmax(mx[tuple(sl0)], mx[tuple(sl1)])
            mn = np.fmin(mn[tuple(sl0)], mn[tuple(sl1)])
        d = mx - mn
        return 0.0 if np.isnan(d).all() else float(np.nanmax(d))

    span = 0.0
    for p in projs:
        pw = P @ p[2]
        safe = pw > 1e-6
        px = np.where(safe, np.clip((P @ p[0]) / np.where(safe, pw, 1.0),
                                    0, w), np.nan)
        py = np.where(safe, np.clip((P @ p[1]) / np.where(safe, pw, 1.0),
                                    0, h), np.nan)
        span = max(span, cellspan(px), cellspan(py))

    need = span + 2 + 1 + 8   # taps + floor margin + y-alignment slack
    win = int(-(-need // 8) * 8)
    if win < 32:
        win = 32
    return win if win <= 128 else 0


def fuse_depth_multi_supported(vol_shape, img_shape, brick: int) -> bool:
    """Shape gate: brick layout + resident maps + rotatable rows."""
    rx, ry, rz = vol_shape
    h, w = img_shape
    return (
        rx % brick == 0 and ry % brick == 0 and rz % brick == 0
        and h % 8 == 0 and w % 128 == 0
        and h >= 64 and w >= 64
    )
