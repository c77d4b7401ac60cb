"""Grid-hash k-nearest-neighbor search for surface correspondence.

The brute-force kNN (ops/knn.py) computes a (Q,P) distance matrix + top_k
— ~143ms per call at 33k×131k and the frame runs it 4×. Correspondence
search only ever MATCHES nearby points (the point-to-plane tolerance
prunes distant pairs, reference core/fusion.py:273), so this variant bins
the reference points into ``cell``-sized cubes, takes the 2×2×2 cell block
covering each query's ±cell/2 neighborhood, and runs an exact top-k over
those candidates. Queries with no neighbor within ~cell/2 voxels return
invalid (the exact path would return a far match that the tolerance prune
rejects anyway).

Layout: everything channel-major / (Q, CAP)-shaped with CAP a lane
multiple — no padded tiles, no scatters (sort + binary-search bins).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .search import searchsorted1d


@partial(jax.jit, static_argnames=("k", "cell", "cap_per_cell", "grid_n"))
def grid_knn(
    queries: jax.Array,     # (Q,3)
    points: jax.Array,      # (P,3)
    k: int,
    valid: jax.Array | None = None,
    cell: float = 16.0,
    cap_per_cell: int = 256,
    grid_n: int = 32,
):
    """Returns (dists (Q,k), idx (Q,k) int32, found (Q,k) bool,
    overflow () bool).

    Coordinates are assumed ≥ 0 (voxel-lattice space). ``grid_n`` cells per
    axis must cover the coordinate range (grid_n·cell ≥ max coord).
    ``overflow`` is True when some cell holds more than ``cap_per_cell``
    points — its excess points were not candidates, so the true nearest
    neighbor may have been missed; callers should raise cap_per_cell or
    fall back to the exact path.
    """
    Q = queries.shape[0]
    P = points.shape[0]
    if valid is None:
        valid = jnp.ones((P,), bool)

    def cell_of(p):
        c = jnp.clip((p / cell).astype(jnp.int32), 0, grid_n - 1)
        return (c[:, 0] * grid_n + c[:, 1]) * grid_n + c[:, 2]

    pcell = jnp.where(valid, cell_of(points), grid_n**3)  # invalid → last bin
    order = jnp.argsort(pcell)
    sorted_cell = jnp.take(pcell, order, axis=0)
    # per-cell [start, end) ranges
    cells = jnp.arange(grid_n**3, dtype=jnp.int32)
    starts = searchsorted1d(sorted_cell, cells, side="left")
    ends = searchsorted1d(sorted_cell, cells, side="right")

    px = jnp.take(points[:, 0], order, axis=0)
    py = jnp.take(points[:, 1], order, axis=0)
    pz = jnp.take(points[:, 2], order, axis=0)

    # query block: the 2×2×2 cells covering query ± cell/2
    qc = jnp.clip(
        jnp.floor((queries - cell / 2.0) / cell).astype(jnp.int32),
        0,
        grid_n - 2,
    )
    qx, qy, qz = queries[:, 0], queries[:, 1], queries[:, 2]

    big = jnp.float32(3.4e38)
    best_d = [jnp.full((Q,), big) for _ in range(k)]
    best_i = [jnp.zeros((Q,), jnp.int32) for _ in range(k)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (Q, cap_per_cell), 1)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cid = (
                    (qc[:, 0] + dx) * grid_n + (qc[:, 1] + dy)
                ) * grid_n + (qc[:, 2] + dz)
                s = jnp.take(starts, cid, axis=0)
                e = jnp.take(ends, cid, axis=0)
                pos = jnp.minimum(s[:, None] + lane, P - 1)  # (Q, CAP)
                in_cell = (s[:, None] + lane) < jnp.minimum(
                    e[:, None], s[:, None] + cap_per_cell
                )
                cx = jnp.take(px, pos.reshape(-1), axis=0).reshape(Q, -1)
                cy = jnp.take(py, pos.reshape(-1), axis=0).reshape(Q, -1)
                cz = jnp.take(pz, pos.reshape(-1), axis=0).reshape(Q, -1)
                d2 = (
                    (cx - qx[:, None]) ** 2
                    + (cy - qy[:, None]) ** 2
                    + (cz - qz[:, None]) ** 2
                )
                d2 = jnp.where(in_cell, d2, big)
                # merge this cell's top-k into the running top-k
                for kk in range(k):
                    m = jnp.min(d2, axis=1)
                    am = jnp.argmin(d2, axis=1)
                    mi = jnp.take(
                        order, jnp.take_along_axis(
                            pos, am[:, None], axis=1)[:, 0], axis=0,
                    )
                    d2 = jnp.where(
                        lane == am[:, None], big, d2
                    )
                    # insertion sort step against running best
                    for slot in range(k):
                        better = m < best_d[slot]
                        nd, ni = (
                            jnp.where(better, m, best_d[slot]),
                            jnp.where(better, mi, best_i[slot]),
                        )
                        m, mi = (
                            jnp.where(better, best_d[slot], m),
                            jnp.where(better, best_i[slot], mi),
                        )
                        best_d[slot], best_i[slot] = nd, ni

    d = jnp.stack(best_d, axis=1)
    i = jnp.stack(best_i, axis=1)
    found = d < big
    overflow = jnp.any((ends - starts) > cap_per_cell)
    return jnp.sqrt(jnp.where(found, d, big)), i, found, overflow
