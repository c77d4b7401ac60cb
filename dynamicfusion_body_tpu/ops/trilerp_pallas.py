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


def _in_volume(wx, wy, wz, R):
    rx, ry, rz = R
    return (
        (wx >= 0.0) & (wx <= rx - 1.0)
        & (wy >= 0.0) & (wy <= ry - 1.0)
        & (wz >= 0.0) & (wz <= rz - 1.0)
    )


def _box_mins(wxs, wys, wzs, invols, R, bz):
    """ONE shared (x, y) box per grid step, per-brick z-window mins.

    The ``group`` bricks of a grid step are consecutive along z (brick
    index order is z-fastest and nbz % group == 0 by the caller gate),
    so their warped footprints share (x, y) to within the warp's local
    drift: one DMA of the union box serves all of them. This is the
    difference between 32768 and 2048 DMA issues per 256³ volume — the
    per-issue overhead (~1.7 µs) dominated the byte cost. Samples that
    drift outside the shared margins are reported as escaped and
    re-sampled exactly by the caller. Mins are taken over VALID samples
    only: out-of-volume samples are masked by ``invol`` regardless, so
    they must not drag the box away from in-volume samples.

    The z axis is DMA'd full-width (lane-dim slices would need
    128-alignment, far coarser than the ~10-voxel z spread); the compute
    loop rotates each brick's window down to [0, bz) with pltpu.roll.
    """
    rx, ry, rz = R
    group = len(wxs)
    big = jnp.float32(1e9)
    mxf = jnp.min(jnp.stack(
        [jnp.min(jnp.where(invols[g], wxs[g], big)) for g in range(group)]
    ))
    myf = jnp.min(jnp.stack(
        [jnp.min(jnp.where(invols[g], wys[g], big)) for g in range(group)]
    ))
    mx = jnp.clip(jnp.floor(mxf).astype(jnp.int32) - 1, 0, rx - BX)
    my = jnp.clip(
        ((jnp.floor(myf).astype(jnp.int32) - 1) // 8) * 8, 0, ry - BY
    )
    # ry - BY is a multiple of 8 by the shape gate, so the clip preserves
    # divisibility; tell Mosaic so the DMA slice is legal.
    my = pl.multiple_of(my, 8)
    mzs = []
    for g in range(group):
        mzf = jnp.min(jnp.where(invols[g], wzs[g], big))
        mzs.append(
            jnp.clip(jnp.floor(mzf).astype(jnp.int32) - 1, 0, rz - bz)
        )
    return mx, my, mzs


def _interp_consts(V, bz, precise):
    """Per-grid-step constants for the brick interpolation."""
    f32 = jnp.float32
    K = BX * BY
    # Static 0/1 expansion matrix for the x side of the fused xy axis:
    # row kk decomposes as (x, y) = (kk // BY, kk % BY); the y side is a
    # pure tile (pltpu.repeat).
    kk_x = jax.lax.broadcasted_iota(jnp.int32, (K, BX), 0) // BY
    ex = kk_x == jax.lax.broadcasted_iota(jnp.int32, (K, BX), 1)
    # precise mode expands in f32 at HIGHEST precision (bf16 taps would
    # floor its error at 2⁻⁹); fast mode uses a 1-pass bf16 matmul.
    dt = f32 if precise else _bf16
    return dict(
        dt=dt,
        exd=ex.astype(dt),
        xprec=jax.lax.Precision.HIGHEST if precise else None,
        iota_bx=jax.lax.broadcasted_iota(jnp.int32, (BX, V), 0).astype(f32),
        iota_by=jax.lax.broadcasted_iota(jnp.int32, (BY, V), 0).astype(f32),
        iota_bz=jax.lax.broadcasted_iota(jnp.int32, (V, bz), 1).astype(f32),
    )


def _interp_one(box2, cst, wx, wy, wz, mx, my, mz, R, bz, precise):
    """Interpolate one brick against the shared (K, rz) box.

    Per-axis tent taps are built as SMALL transposed matrices ((BX,V),
    (BY,V) — cheap VPU work) and expanded to the fused-xy (K, V) weight
    matrix without VPU iota-compares over the big axis: a static 0/1
    matmul for x, a pltpu.repeat tile for y. One MXU matmul contracts
    the xy axis against the rotated (K, bz) z-window; the final two
    z-taps are a (V, bz) tent mul-reduce. Returns (sample, inbox).
    """
    rx, ry, rz = R
    f32 = jnp.float32
    K = BX * BY
    lx = jnp.clip(wx, 0.0, rx - 1.0) - mx.astype(f32)
    ly = jnp.clip(wy, 0.0, ry - 1.0) - my.astype(f32)
    lz = jnp.clip(wz, 0.0, rz - 1.0) - mz.astype(f32)
    inbox = (
        (lx >= 0.0) & (lx <= BX - 1.0)
        & (ly >= 0.0) & (ly <= BY - 1.0)
        & (lz >= 0.0) & (lz <= bz - 1.0)
    )

    dt = cst["dt"]
    txt = jnp.maximum(0.0, 1.0 - jnp.abs(cst["iota_bx"] - lx[None, :]))
    tyt = jnp.maximum(0.0, 1.0 - jnp.abs(cst["iota_by"] - ly[None, :]))
    xkv = jax.lax.dot(cst["exd"], txt.astype(dt), precision=cst["xprec"],
                      preferred_element_type=f32)    # (K, V) x-taps
    ykv = pltpu.repeat(tyt, BX, 0)                   # (K, V) y-taps
    wkv = xkv * ykv                                  # fused xy weights

    # z-window via dynamic lane rotation (lane-dim slicing would need
    # 128-alignment; the rotate needs 32-bit data, hence f32 boxes)
    # shift kept in [0, rz) — a full-width rotate is UB territory
    bwin = (box2 if rz <= bz
            else pltpu.roll(box2, (rz - mz) % rz, 1)[:, :bz])
    # hi/lo bf16 split on the NARROW window — (K, bz) is 12× smaller
    # than the full box, so the converts are off the critical path
    bh = bwin.astype(_bf16)
    dn = (((0,), (0,)), ((), ()))
    if precise:
        w_hi = wkv.astype(_bf16)
        w_lo = (wkv - w_hi.astype(f32)).astype(_bf16)
        bl = (bwin - bh.astype(f32)).astype(_bf16)
        t = (
            jax.lax.dot_general(w_hi, bh, dn, preferred_element_type=f32)
            + jax.lax.dot_general(w_hi, bl, dn, preferred_element_type=f32)
            + jax.lax.dot_general(w_lo, bh, dn, preferred_element_type=f32)
        )
    else:
        t = jax.lax.dot_general(wkv.astype(_bf16), bh, dn,
                                preferred_element_type=f32)

    tz = jnp.maximum(0.0, 1.0 - jnp.abs(cst["iota_bz"] - lz[:, None]))
    return jnp.sum(t * tz, axis=1), inbox


def _kernel(live_ref, wx_ref, wy_ref, wz_ref,
            vals_ref, valid_ref, esc_ref, boxes, sems,
            *, group, R, precise, bz):
    rx, ry, rz = R
    V = wx_ref.shape[1]
    K = BX * BY
    f32 = jnp.float32

    wxs = [wx_ref[g, :] for g in range(group)]
    wys = [wy_ref[g, :] for g in range(group)]
    wzs = [wz_ref[g, :] for g in range(group)]
    invols = [_in_volume(wxs[g], wys[g], wzs[g], R) for g in range(group)]
    mx, my, mzs = _box_mins(wxs, wys, wzs, invols, R, bz)
    copy = pltpu.make_async_copy(
        live_ref.at[pl.ds(mx, BX), pl.ds(my, BY), :], boxes, sems,
    )
    copy.start()
    cst = _interp_consts(V, bz, precise)
    copy.wait()
    box2 = boxes[...].reshape(K, rz)
    for g in range(group):
        out, inbox = _interp_one(
            box2, cst, wxs[g], wys[g], wzs[g], mx, my, mzs[g], R, bz,
            precise,
        )
        invol = invols[g]
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


# --------------------------------------------------------------------- #
# Fused per-voxel kNN → DQB warp → trilerp (the whole updateTSDF sample
# stage as one kernel; reference core/fusion.py:153-198)


def _warp_kernel(live_ref, nodes_ref, cand_ref, lw_ref, xoff_ref,
                 vals_ref, valid_ref, esc_ref, wi_ref,
                 wx_ref, wy_ref, wz_ref, boxes, sems,
                 *, group, R, precise, bz, k, brick, nby, nbz):
    from .compwise import dq_normalize8_c, dq_point_c

    rx, ry, rz = R
    f32 = jnp.float32
    V = brick ** 3
    C = cand_ref.shape[1]
    K = BX * BY
    big = jnp.float32(3.4e38)

    # within-brick offsets (x-major, z fastest), decoded arithmetically —
    # Mosaic can't shape-cast a (b,b,b) iota down to (V,)
    vidx = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)[0]
    ox = (vidx // (brick * brick)).astype(f32)
    oy = ((vidx // brick) % brick).astype(f32)
    oz = (vidx % brick).astype(f32)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, V), 0)
    lw = tuple(lw_ref[0, e] for e in range(8))

    # ---- pass 1: per-voxel exact top-k among the brick's candidates,
    # Gaussian DQB blend, sandwich warp (matches the XLA slab pass in
    # models/warp_field.py term for term; the blend reduction is an
    # unrolled f32 sum over C — exact, no bf16 matmul rounding)
    i0 = pl.program_id(0)
    x_offset = xoff_ref[0, 0]
    accs, poss, wis = [], [], []
    for g in range(group):
        b = i0 * group + g
        bx0 = (b // (nby * nbz)) * brick + x_offset
        by0 = ((b // nbz) % nby) * brick
        bz0 = (b % nbz) * brick
        pxv = bx0.astype(f32) + ox
        pyv = by0.astype(f32) + oy
        pzv = bz0.astype(f32) + oz

        # candidate node rows gathered IN-KERNEL from the VMEM-resident
        # (M, 16) node table via SMEM indices — an XLA row-gather of the
        # same (NB·C, 16) data measured 52 ms/frame at 256³
        cd = jnp.concatenate(
            [nodes_ref[pl.ds(cand_ref[g, c], 1), :] for c in range(C)],
            axis=0,
        )                                      # (C, 16) packed node data
        ncx = cd[:, 0:1]
        ncy = cd[:, 1:2]
        ncz = cd[:, 2:3]
        ncw = cd[:, 3:4]
        nact = cd[:, 4:5] > 0.5
        dx = pxv[None, :] - ncx
        dy = pyv[None, :] - ncy
        dz = pzv[None, :] - ncz
        d2 = dx * dx + dy * dy + dz * dz       # (C, V)
        d2 = jnp.where(nact, d2, big)

        wsel = jnp.zeros((C, V), f32)
        wi_sum = jnp.zeros((V,), f32)
        wi_cnt = jnp.zeros((V,), f32)
        for _ in range(k):
            bc = jnp.argmin(d2, axis=0)        # (V,) first-min tie-break
            chosen = iota_c == bc[None, :]
            best_d2 = jnp.min(d2, axis=0)
            dk = jnp.sqrt(jnp.minimum(best_d2, big))
            w_node = jnp.sum(jnp.where(chosen, ncw, 0.0), axis=0)
            a_node = jnp.any(chosen & nact, axis=0)
            finite = a_node & (best_d2 < 1e18)
            wk = jnp.where(
                finite, jnp.exp(-((dk / (2.0 * w_node)) ** 2)), 0.0
            )
            wsel = wsel + chosen * wk[None, :]
            wi_sum = wi_sum + jnp.where(finite, dk, 0.0)
            wi_cnt = wi_cnt + finite.astype(f32)
            d2 = jnp.where(chosen, big, d2)

        # DQB blend: exact f32 sum over the C candidates per component
        accs.append(tuple(
            jnp.sum(cd[:, 5 + e:6 + e] * wsel, axis=0) for e in range(8)
        ))
        poss.append((pxv, pyv, pzv))
        wis.append(wi_sum / jnp.maximum(wi_cnt, 1.0))

    # normalize + sandwich the whole group's blends at once on (G, V)
    # arrays — the same ~200 VPU ops on per-brick (V,) vectors ran at a
    # single sublane (1/8 utilization)
    acc2 = tuple(
        jnp.stack([accs[g][e] for g in range(group)]) for e in range(8)
    )
    se3 = dq_normalize8_c(acc2)
    p2 = tuple(
        jnp.stack([poss[g][c] for g in range(group)]) for c in range(3)
    )
    wx2, wy2, wz2 = dq_point_c(se3, p2)
    wx2, wy2, wz2 = dq_point_c(lw, (wx2, wy2, wz2))
    wxs = [wx2[g] for g in range(group)]
    wys = [wy2[g] for g in range(group)]
    wzs = [wz2[g] for g in range(group)]
    invols = [_in_volume(wxs[g], wys[g], wzs[g], R) for g in range(group)]

    # ---- pass 2: shared-box DMA + interpolation (see _kernel)
    mx, my, mzs = _box_mins(wxs, wys, wzs, invols, R, bz)
    copy = pltpu.make_async_copy(
        live_ref.at[pl.ds(mx, BX), pl.ds(my, BY), :], boxes, sems,
    )
    copy.start()
    cst = _interp_consts(V, bz, precise)
    copy.wait()
    box2 = boxes[...].reshape(K, rz)
    for g in range(group):
        out, inbox = _interp_one(
            box2, cst, wxs[g], wys[g], wzs[g], mx, my, mzs[g], R, bz,
            precise,
        )
        invol = invols[g]
        vals_ref[g, :] = out
        valid_ref[g, :] = (invol & inbox).astype(f32)
        esc_ref[g, :] = (invol & jnp.logical_not(inbox)).astype(f32)
        wi_ref[g, :] = wis[g]
        wx_ref[g, :] = wxs[g]
        wy_ref[g, :] = wys[g]
        wz_ref[g, :] = wzs[g]


def _mip_class(mn_ref, mx_ref, wx, wy, wz, invol, R):
    """Per-brick live-space uniformity certificate.

    ``mn_ref``/``mx_ref`` hold per-live-brick min/max over the brick's 8³
    voxels PLUS a one-voxel high-side halo (window [8b, 8b+8] inclusive),
    laid out (nlx·nly, nlz). A sample p with taps [floor p, floor p+1]
    is therefore fully covered by the mip entry of brick floor(p)//8.

    Returns (covered, all_min, all_max): ``covered`` is True iff every
    in-volume sample's tap window lies inside the reduced 3×3×3 mip
    window (brick bbox spans ≤ 3 live bricks per axis — large warps fall
    back to the full interpolation path), in which case all taps of all
    in-volume samples are within [all_min, all_max]. Exactness downstream:
      all_max <= -tdist  → every trilerp result <= -tdist (convex
                           combination) → the running-average update
                           skips these voxels (core/fusion.py:180-186);
      all_min == all_max → every trilerp result is EXACTLY that constant
                           (convex combination of equal taps) — the far
                           field of a truncated live TSDF (+tdist).
    """
    f32 = jnp.float32
    big = jnp.float32(1e9)
    nlx = R[0] // 8
    nly = R[1] // 8
    nlz = R[2] // 8

    def _rng(w, n):
        lo = jnp.min(jnp.where(invol, w, big))
        hi = jnp.max(jnp.where(invol, w, -big))
        blo = jnp.clip(jnp.floor(lo).astype(jnp.int32) // 8, 0, n - 1)
        bhi = jnp.clip(jnp.floor(hi).astype(jnp.int32) // 8, 0, n - 1)
        return blo, bhi

    xlo, xhi = _rng(wx, nlx)
    ylo, yhi = _rng(wy, nly)
    zlo, zhi = _rng(wz, nlz)
    covered = (
        (xhi - xlo <= 2) & (yhi - ylo <= 2) & (zhi - zlo <= 2)
    )
    cx = jnp.minimum(xlo, nlx - 3) if nlx >= 3 else jnp.int32(0)
    cy = jnp.minimum(ylo, nly - 3) if nly >= 3 else jnp.int32(0)

    # gather the 3×3 row block (full z line each), mask to the true range
    zi = jax.lax.broadcasted_iota(jnp.int32, (3, nlz), 1)
    zmask = (zi >= zlo) & (zi <= zhi)
    all_min = big
    all_max = -big
    for i in range(3):
        xi = cx + i
        xin = (xi >= xlo) & (xi <= xhi)
        row0 = xi * nly + cy
        mnw = mn_ref[pl.ds(row0, 3), :]        # (3, nlz)
        mxw = mx_ref[pl.ds(row0, 3), :]
        yi = cy + jax.lax.broadcasted_iota(jnp.int32, (3, nlz), 0)
        ymask = (yi >= ylo) & (yi <= yhi)
        m = zmask & ymask & xin
        all_min = jnp.minimum(all_min, jnp.min(jnp.where(m, mnw, big)))
        all_max = jnp.maximum(all_max, jnp.max(jnp.where(m, mxw, -big)))
    return covered, all_min, all_max


def _warp_kernel_cached(live_ref, nodes_ref, cand_ref, sel_ref, selw_ref,
                        lw_ref, xoff_ref, mn_ref, mx_ref,
                        vals_ref, valid_ref, esc_ref,
                        wx_ref, wy_ref, wz_ref, boxes, sems,
                        *, group, R, precise, bz, k, brick, nby, nbz,
                        tdist, use_mip):
    """_warp_kernel with the per-voxel kNN stage REPLACED by the
    build_warp_cache selection (models/warp_field.py): the top-k slots
    and Gaussian weights are node-dq-independent, so the per-frame work
    is blend + normalize + sandwich + trilerp. ``wi`` lives in the cache
    and never enters the kernel.

    With ``use_mip`` the per-brick live-space certificate (_mip_class)
    short-circuits the interpolation: bricks whose warped footprint
    provably lands in a uniform region of the live volume (saturated
    +tdist far field, <= -tdist interior) emit the exact constant and
    skip the tent/matmul work; the group's window DMA is skipped when
    every brick short-circuits."""
    from .compwise import dq_normalize8_c, dq_point_c

    rx, ry, rz = R
    f32 = jnp.float32
    V = sel_ref.shape[1]
    C = cand_ref.shape[1]
    K = BX * BY

    vidx = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)[0]
    ox = (vidx // (brick * brick)).astype(f32)
    oy = ((vidx // brick) % brick).astype(f32)
    oz = (vidx % brick).astype(f32)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, V), 0)
    lw = tuple(lw_ref[0, e] for e in range(8))

    i0 = pl.program_id(0)
    x_offset = xoff_ref[0, 0]
    accs, poss = [], []
    for g in range(group):
        b = i0 * group + g
        bx0 = (b // (nby * nbz)) * brick + x_offset
        by0 = ((b // nbz) % nby) * brick
        bz0 = (b % nbz) * brick
        pxv = bx0.astype(f32) + ox
        pyv = by0.astype(f32) + oy
        pzv = bz0.astype(f32) + oz

        cd = jnp.concatenate(
            [nodes_ref[pl.ds(cand_ref[g, c], 1), :] for c in range(C)],
            axis=0,
        )                                      # (C, 16) packed node data
        sel = sel_ref[g, :]                    # (V,) packed slots
        wsel = jnp.zeros((C, V), f32)
        for j in range(k):
            slot = (sel >> (5 * j)) & 31
            wsel = wsel + jnp.where(
                iota_c == slot[None, :], selw_ref[g, j, :][None, :], 0.0
            )
        accs.append(tuple(
            jnp.sum(cd[:, 5 + e:6 + e] * wsel, axis=0) for e in range(8)
        ))
        poss.append((pxv, pyv, pzv))

    acc2 = tuple(
        jnp.stack([accs[g][e] for g in range(group)]) for e in range(8)
    )
    se3 = dq_normalize8_c(acc2)
    p2 = tuple(
        jnp.stack([poss[g][c] for g in range(group)]) for c in range(3)
    )
    wx2, wy2, wz2 = dq_point_c(se3, p2)
    wx2, wy2, wz2 = dq_point_c(lw, (wx2, wy2, wz2))
    wxs = [wx2[g] for g in range(group)]
    wys = [wy2[g] for g in range(group)]
    wzs = [wz2[g] for g in range(group)]
    invols = [_in_volume(wxs[g], wys[g], wzs[g], R) for g in range(group)]

    # ---- per-brick uniformity certificates --------------------------------
    if use_mip:
        shorts = []  # (short_circuit, const_val) per brick
        any_full = jnp.bool_(False)
        for g in range(group):
            has_v = jnp.max(invols[g].astype(jnp.int32)) > 0
            cov, amin, amax = _mip_class(
                mn_ref, mx_ref, wxs[g], wys[g], wzs[g], invols[g], R,
            )
            is_skip = cov & (amax <= -tdist)
            is_const = cov & (amin == amax)
            short = jnp.logical_not(has_v) | is_skip | is_const
            # skip-class emits -tdist (update-test `> -tdist` rejects it,
            # matching the reference's strict skip); const emits the value
            cval = jnp.where(is_skip, -tdist, amin)
            shorts.append((short, cval))
            any_full = any_full | jnp.logical_not(short)
    else:
        shorts = [(jnp.bool_(False), jnp.float32(0.0))] * group
        any_full = jnp.bool_(True)

    mx, my, mzs = _box_mins(wxs, wys, wzs, invols, R, bz)

    @pl.when(any_full)
    def _dma():
        copy = pltpu.make_async_copy(
            live_ref.at[pl.ds(mx, BX), pl.ds(my, BY), :], boxes, sems,
        )
        copy.start()
        copy.wait()

    cst = _interp_consts(V, bz, precise)
    for g in range(group):
        invol = invols[g]
        short, cval = shorts[g]
        wx_ref[g, :] = wxs[g]
        wy_ref[g, :] = wys[g]
        wz_ref[g, :] = wzs[g]

        @pl.when(short)
        def _short(g=g, invol=invol, cval=cval):
            vals_ref[g, :] = jnp.zeros((V,), f32) + cval
            valid_ref[g, :] = invol.astype(f32)
            esc_ref[g, :] = jnp.zeros((V,), f32)

        @pl.when(jnp.logical_not(short))
        def _full(g=g, invol=invol):
            box2 = boxes[...].reshape(K, rz)
            out, inbox = _interp_one(
                box2, cst, wxs[g], wys[g], wzs[g], mx, my, mzs[g], R, bz,
                precise,
            )
            vals_ref[g, :] = out
            valid_ref[g, :] = (invol & inbox).astype(f32)
            esc_ref[g, :] = (invol & jnp.logical_not(inbox)).astype(f32)


def _axis_windowred(v, axis, red):
    """Windowed reduction [8b, 8b+8] (inclusive, edge-clamped) along one
    axis: the 8-block reduction combined with the next block's first
    plane — separable, so three passes replace the overlapping-window
    reduce_window (whose XLA TPU lowering re-reads each voxel ~2.7x)."""
    n = v.shape[axis]
    nb = n // 8
    shp = v.shape[:axis] + (nb, 8) + v.shape[axis + 1:]
    blk = red(v.reshape(shp), axis=axis + 1)
    nxt_idx = jnp.minimum(jnp.arange(nb) * 8 + 8, n - 1)
    nxt = jnp.take(v, nxt_idx, axis=axis)
    return (jnp.minimum if red is jnp.min else jnp.maximum)(blk, nxt)


def live_brick_mip(live: jax.Array):
    """Per-live-brick min/max over the brick's 8³ voxels PLUS a one-voxel
    high-side halo (window [8b, 8b+8] inclusive — covers both taps of any
    sample whose floor lands in the brick). Returns (mn, mx), each
    (nlx·nly, nlz) f32, the layout _mip_class expects."""
    rx, ry, rz = live.shape
    mn = mx = live
    for a in (2, 1, 0):
        mn = _axis_windowred(mn, a, jnp.min)
        mx = _axis_windowred(mx, a, jnp.max)
    nlx, nly, nlz = rx // 8, ry // 8, rz // 8
    return mn.reshape(nlx * nly, nlz), mx.reshape(nlx * nly, nlz)


def mip_skip_supported(shape) -> bool:
    """The 3×3×3 mip window logic needs at least 3 live bricks per axis
    and 8-divisible extents."""
    return all(s % 8 == 0 and s >= 24 for s in shape)


@partial(
    jax.jit,
    static_argnames=(
        "vol_shape", "brick", "group", "interpret", "precise", "tdist",
    ),
)
def warp_trilerp_bricks_cached(
    live: jax.Array,
    node_table: jax.Array,
    cand_idx: jax.Array,
    sel: jax.Array,
    selw: jax.Array,
    lw_dq: jax.Array,
    vol_shape,
    brick: int = 8,
    x_offset=0,
    group: int = 8,
    interpret: bool = False,
    precise: bool = False,
    tdist: float | None = None,
    live_mip=None,
):
    """``warp_trilerp_bricks`` with the kNN stage from a
    ``build_warp_cache`` result: sel (NB, V) int32 packed slots, selw
    (NB, k, V) f32 Gaussian weights. Returns
    (vals, valid, escaped, wx, wy, wz) — no wi (it lives in the cache).

    When ``tdist`` and ``live_mip`` (from live_brick_mip) are given,
    bricks whose warped footprint provably lands in a uniform region of
    the live volume skip the interpolation entirely (exact constants —
    see _mip_class)."""
    rx, ry, rz = vol_shape
    NB, C = cand_idx.shape
    V = brick ** 3
    k = selw.shape[1]
    bz = min(BZ, rz)
    assert NB % group == 0, (NB, group)
    grid = NB // group
    use_mip = tdist is not None and live_mip is not None
    if use_mip:
        mn, mx = live_mip
    else:
        mn = jnp.zeros((3, 8), jnp.float32)
        mx = jnp.zeros((3, 8), jnp.float32)
    spec = pl.BlockSpec((group, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct((NB, V), jnp.float32)
    xoff = jnp.asarray(x_offset, jnp.int32).reshape(1, 1)
    vals, valid, esc, wx, wy, wz = pl.pallas_call(
        partial(
            _warp_kernel_cached, group=group, R=vol_shape, precise=precise,
            bz=bz, k=k, brick=brick,
            nby=ry // brick, nbz=rz // brick,
            tdist=0.0 if tdist is None else float(tdist), use_mip=use_mip,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # live stays in HBM
            pl.BlockSpec(node_table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, C), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, k, V), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mn.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mx.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(spec,) * 6,
        out_shape=(sds,) * 6,
        scratch_shapes=[
            pltpu.VMEM((BX, BY, rz), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(live, node_table, cand_idx, sel, selw, lw_dq.reshape(1, 8), xoff,
      mn, mx)
    return vals, valid > 0.5, esc > 0.5, wx, wy, wz


@partial(
    jax.jit,
    static_argnames=(
        "vol_shape", "brick", "k", "group", "interpret", "precise",
    ),
)
def warp_trilerp_bricks(
    live: jax.Array,
    node_table: jax.Array,
    cand_idx: jax.Array,
    lw_dq: jax.Array,
    vol_shape,
    brick: int = 8,
    k: int = 3,
    x_offset=0,
    group: int = 8,
    interpret: bool = False,
    precise: bool = False,
):
    """Fused updateTSDF sample stage: per-brick candidate kNN → DQB warp
    → brick-local trilerp, one kernel pass over the volume.

    live: (rx,ry,rz); node_table: (M, 16) packed node rows
    [pos₃ | dg_w | active | dq₈ | pad₃] — VMEM-resident for the whole
    grid; cand_idx: (NB, C) int32 per-brick candidate node ids (from
    brick_candidates, models/warp_field.py); lw_dq: (8,) global DQ.

    Returns (vals, valid, escaped, wi, wx, wy, wz), all (NB, V) — the
    coords/wi feed the caller's escape fixup and running-average merge,
    which stay outside the kernel (models/warp_field.py).
    """
    rx, ry, rz = vol_shape
    NB, C = cand_idx.shape
    V = brick ** 3
    bz = min(BZ, rz)
    assert NB % group == 0, (NB, group)
    grid = NB // group
    spec = pl.BlockSpec((group, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct((NB, V), jnp.float32)
    xoff = jnp.asarray(x_offset, jnp.int32).reshape(1, 1)
    vals, valid, esc, wi, wx, wy, wz = pl.pallas_call(
        partial(
            _warp_kernel, group=group, R=vol_shape, precise=precise,
            bz=bz, k=k, brick=brick,
            nby=ry // brick, nbz=rz // brick,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # live stays in HBM
            pl.BlockSpec(node_table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, C), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(spec,) * 7,
        out_shape=(sds,) * 7,
        scratch_shapes=[
            pltpu.VMEM((BX, BY, rz), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(live, node_table, cand_idx, lw_dq.reshape(1, 8), xoff)
    return vals, valid > 0.5, esc > 0.5, wi, wx, wy, wz
