"""Volume ↔ brick-row layout transforms shared by the Pallas kernels.

A (rx, ry, rz) volume tiles into brick³ cubes in x-major order (z
fastest); each brick's voxels flatten x-major into one (V = brick³) row.
The (NB, V) layout gives kernels spatially-coherent rows whose last dim
is a clean multiple of the 128-lane tile (V = 512 for brick=8).
"""

from __future__ import annotations

import jax.numpy as jnp


def vol_to_bricks(vol, brick: int):
    rx, ry, rz = vol.shape
    nbx, nby, nbz = rx // brick, ry // brick, rz // brick
    t = vol.reshape(nbx, brick, nby, brick, nbz, brick)
    return t.transpose(0, 2, 4, 1, 3, 5).reshape(
        nbx * nby * nbz, brick ** 3
    )


def vol_from_bricks(b2, shape, brick: int):
    rx, ry, rz = shape
    nbx, nby, nbz = rx // brick, ry // brick, rz // brick
    t = b2.reshape(nbx, nby, nbz, brick, brick, brick)
    return t.transpose(0, 3, 1, 4, 2, 5).reshape(rx, ry, rz)
