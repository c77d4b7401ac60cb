"""Correspondence search between canonical and live surfaces.

Closest-point (ICP-style) path — reference semantics
(core/fusion.py:251-276, core/fusion_dm.py:219-244): warp each canonical
vertex into the live frame, take the k nearest live vertices by Euclidean
distance, choose the candidate minimizing the point-to-plane cost
|n·(v−p)| with the reference's exact best_cost=1 cap and first-candidate
fallback, then accept when best_cost <= tolerance.

The learned (CNN feature) path lives in models/dhbc.py + pipeline/fusion.py
(feature-space nearest neighbor, same pruning).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.knn import knn, knn_2level


@partial(jax.jit, static_argnames=("k", "tolerance", "approx"))
def closest_point_correspondences(
    warped_verts: jax.Array,   # (V,3) canonical verts warped into live frame
    warped_normals: jax.Array, # (V,3)
    vert_mask: jax.Array,      # (V,) bool
    live_verts: jax.Array,     # (L,3) fixed-capacity live surface
    live_mask: jax.Array,      # (L,) bool
    k: int,
    tolerance: float,
    approx: bool | str = False,
):
    """Returns (corr (V,3), corr_valid (V,), best_cost (V,)).

    ``approx``: False = flat exact search; True = hardware approx top-k
    over the flat bf16 distance matrix; "2level" = chunked candidate
    pools exploiting the marching-cubes vertex order's spatial coherence
    (ops/knn.knn_2level — exact fp32 within certified pools, ~4× faster
    than the flat matrix at bench scale)."""
    if approx == "2level":
        _, idx, _ = knn_2level(
            warped_verts, live_verts, k, qvalid=vert_mask, valid=live_mask
        )
    else:
        _, idx = knn(
            warped_verts, live_verts, k, valid=live_mask, approx=approx
        )
    cand = jnp.take(live_verts, idx, axis=0)  # (V,k,3)
    cost = jnp.abs(
        jnp.sum(warped_normals[:, None, :] * (warped_verts[:, None, :] - cand), axis=-1)
    )
    cand_valid = jnp.take(live_mask, idx, axis=0)
    cost = jnp.where(cand_valid, cost, jnp.inf)
    best = jnp.argmin(cost, axis=1)
    min_cost = jnp.take_along_axis(cost, best[:, None], axis=1)[:, 0]
    # reference caps best_cost at its init value 1 and falls back to the
    # first (nearest) candidate when nothing beats it
    use_min = min_cost < 1.0
    best_pt = jnp.where(
        use_min[:, None],
        jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0],
        cand[:, 0],
    )
    best_cost = jnp.where(use_min, min_cost, 1.0)
    valid = vert_mask & (best_cost <= tolerance) & cand_valid[:, 0]
    return best_pt, valid, best_cost


@partial(
    jax.jit, static_argnames=("k", "tolerance", "grid_n", "cell")
)
def closest_point_correspondences_grid(
    warped_verts: jax.Array,
    warped_normals: jax.Array,
    vert_mask: jax.Array,
    live_verts: jax.Array,
    live_mask: jax.Array,
    k: int,
    tolerance: float,
    grid_n: int,
    cell: float = 16.0,
):
    """Grid-hash variant of closest_point_correspondences for voxel-lattice
    coordinates: exact within a ±cell/2 neighborhood, and queries with no
    neighbor in range are invalid (the exact path would return a far match
    that the tolerance prune rejects anyway). Queries whose cells
    overflowed the per-cell candidate cap are marked INVALID rather than
    silently matched against a truncated candidate set."""
    from ..ops.grid_knn import grid_knn

    d, idx, found, overflow = grid_knn(
        warped_verts, live_verts, k, valid=live_mask, cell=cell,
        grid_n=grid_n,
    )
    cand = jnp.take(live_verts, idx, axis=0)  # (V,k,3)
    cost = jnp.abs(
        jnp.sum(
            warped_normals[:, None, :] * (warped_verts[:, None, :] - cand),
            axis=-1,
        )
    )
    cost = jnp.where(found, cost, jnp.inf)
    best = jnp.argmin(cost, axis=1)
    min_cost = jnp.take_along_axis(cost, best[:, None], axis=1)[:, 0]
    use_min = min_cost < 1.0
    best_pt = jnp.where(
        use_min[:, None],
        jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0],
        cand[:, 0],
    )
    best_cost = jnp.where(use_min, min_cost, 1.0)
    valid = vert_mask & (best_cost <= tolerance) & found[:, 0] & ~overflow
    return best_pt, valid, best_cost


@jax.jit
def feature_correspondences(
    canon_feats: jax.Array,  # (V,F) per-canonical-vertex descriptors
    vert_mask: jax.Array,    # (V,)
    live_feats: jax.Array,   # (L,F)
    live_verts: jax.Array,   # (L,3)
    live_mask: jax.Array,    # (L,)
):
    """Feature-space 1-NN matching (CNN path, reference
    core/fusion.py:277-296): each canonical vertex takes the live vertex
    whose descriptor is nearest. Point-to-plane pruning happens afterwards
    exactly like the clpts path."""
    _, idx = knn(canon_feats, live_feats, 1, valid=live_mask)
    corr = jnp.take(live_verts, idx[:, 0], axis=0)
    valid = vert_mask & jnp.take(live_mask, idx[:, 0], axis=0)
    return corr, valid


@partial(jax.jit, static_argnames=("tolerance",))
def prune_by_plane_cost(
    warped_verts, warped_normals, corrs, valid, tolerance: float
):
    """Reject correspondences with |n·(v−c)| > tolerance (reference
    core/fusion.py:287-296)."""
    cost = jnp.abs(jnp.sum(warped_normals * (warped_verts - corrs), axis=-1))
    return valid & (cost <= tolerance), cost
