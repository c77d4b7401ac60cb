"""Pallas TPU kernel: fused marching-cubes front-end.

The dense MC front-end (ops/marching_cubes.py) derives three per-edge
crossing masks and a per-cell case byte from the volume. In XLA that is
eleven shifted strided slices of the 67 MB volume (8 for the case bits,
3 for the crossings) — measured 35 ms at 256³ for the case construction
alone, because every shifted read materializes its own misaligned copy
(docs/tpu_kernel_notes.md; a 2×2×2 conv lowering measured even worse,
68 ms). The quantities are all functions of a one-voxel neighborhood, so
this kernel reads the volume ONCE per x-slab into VMEM and emits
everything in a single pass, bit-packed into one int32 lattice:

    bits 0..7   cell case byte (corner b = (dx,dy,dz) = bit b of the
                reference corner order, marching_cubes.py:293-298);
                0 at dead cells (i==X-1 | j==Y-1 | k==Z-1)
    bit 8/9/10  axis-x/y/z edge-crossing flag, 0 on the padded last
                plane of its axis — exactly axis_cross()'s layout

so HBM traffic is read-67 + write-67 MB at streaming speed instead of
11 strided copies, and the downstream `_Ranks`/emission machinery
consumes bit-slices of it unchanged (bit-identical mesh output —
asserted in tests/test_marching_cubes.py).

The x-slab halo (cells/edges at the slab's last plane need plane
x_slab+1) rides a second 1-plane block of the same operand with a
clamped index map — no overlapping BlockSpecs needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mc_frontend_supported(shape) -> bool:
    """Lane dim 128-tileable, sublane dim 8-tileable, slab divides x."""
    X, Y, Z = shape
    return Z % 128 == 0 and Y % 8 == 0 and X % _slab(shape) == 0 and X >= 2


def _slab(shape) -> int:
    """x planes per grid step, sized so the slab working set stays a few
    MB of VMEM (v + inside + temporaries + out ≈ 6 slab-sized arrays)."""
    _, Y, Z = shape
    return max(1, min(8, (1 << 21) // (Y * Z)))


def _shift1(a, axis):
    """a shifted by +1 along ``axis`` with clamp padding (the padded row
    only feeds lattice positions masked dead downstream)."""
    n = a.shape[axis]
    lo = [slice(None)] * a.ndim
    hi = [slice(None)] * a.ndim
    lo[axis] = slice(1, n)
    hi[axis] = slice(n - 1, n)
    return jnp.concatenate([a[tuple(lo)], a[tuple(hi)]], axis=axis)


def _kernel(lev_ref, v_ref, vh_ref, out_ref, *, xb, X):
    lev = lev_ref[0]
    i32 = jnp.int32
    ins = (v_ref[...] < lev).astype(i32)           # (xb, Y, Z)
    insh = (vh_ref[...] < lev).astype(i32)         # (1, Y, Z) plane x+xb
    ins9 = jnp.concatenate([ins, insh], axis=0)    # (xb+1, Y, Z)

    _, Y, Z = v_ref.shape
    gx = jax.lax.broadcasted_iota(i32, (xb, Y, Z), 0) + pl.program_id(0) * xb
    gy = jax.lax.broadcasted_iota(i32, (xb, Y, Z), 1)
    gz = jax.lax.broadcasted_iota(i32, (xb, Y, Z), 2)
    vx = (gx < X - 1).astype(i32)
    vy = (gy < Y - 1).astype(i32)
    vz = (gz < Z - 1).astype(i32)

    # case byte: corner bit b at (dx,dy,dz); accumulate the 8 shifted
    # views of the (xb+1)-plane inside lattice
    ins9_y = _shift1(ins9, 1)
    ins9_z = _shift1(ins9, 2)
    ins9_yz = _shift1(ins9_y, 2)
    planes = {(0, 0): ins9, (1, 0): ins9_y, (0, 1): ins9_z, (1, 1): ins9_yz}
    case = jnp.zeros((xb, Y, Z), i32)
    for b in range(8):
        dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
        corner = planes[(dy, dz)][dx:dx + xb]
        case = case + (corner << b)
    case = case * (vx * vy * vz)

    cross_x = (ins ^ ins9[1:xb + 1]) * vx
    cross_y = (ins ^ _shift1(ins, 1)) * vy
    cross_z = (ins ^ _shift1(ins, 2)) * vz
    out_ref[...] = case | (cross_x << 8) | (cross_y << 9) | (cross_z << 10)


@partial(jax.jit, static_argnames=("interpret",))
def mc_case_cross(vol: jax.Array, level, interpret: bool = False):
    """(X,Y,Z) f32 volume → (X,Y,Z) int32 fused case/crossing lattice
    (bit layout in the module docstring). Callers gate on
    ``mc_frontend_supported(vol.shape)``."""
    X, Y, Z = vol.shape
    xb = _slab(vol.shape)
    grid = X // xb
    lev = jnp.reshape(jnp.asarray(level, jnp.float32), (1,))
    out = pl.pallas_call(
        partial(_kernel, xb=xb, X=X),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((xb, Y, Z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # the slab's +1-plane halo: plane (i+1)*xb, clamped at the
            # top (the clamped copy only reaches dead lattice slots)
            pl.BlockSpec((1, Y, Z),
                         lambda i, _X=X, _xb=xb: (
                             jnp.minimum((i + 1) * _xb, _X - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((xb, Y, Z), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.int32),
        interpret=interpret,
    )(lev, vol, vol)
    return out
