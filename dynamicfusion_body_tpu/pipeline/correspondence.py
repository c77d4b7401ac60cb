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


@partial(jax.jit, static_argnames=("kc", "approx"))
def correspondence_candidates(
    warped_verts: jax.Array,   # (V,3) — warp at the FRAME-ENTRY state
    vert_mask: jax.Array,
    live_verts: jax.Array,
    live_mask: jax.Array,
    kc: int,
    approx: bool | str = False,
):
    """One full kNN search per frame whose result is reused by every
    solve round: returns (cand_idx (V,kc), d_kc (V,) = distance of the
    kc-th candidate from the base warped position, n_risk).

    The reference re-queries its KDTree every solve iteration
    (core/fusion.py:251-276 via :371); between rounds the warp moves each
    vertex by a fraction of a voxel, so the fresh query's answer is
    almost always inside the previous round's candidate set. The cached
    set + the ball certificate in correspondences_from_candidates make
    the reuse loud instead of silent.

    ``approx``: False = flat exact; True = hardware approx top-k;
    "2level" = chunked candidate pools over the marching-cubes vertex
    order (ops/knn.knn_2level) — exact where certified, with its own
    pool-miss count folded into the returned ``n_risk``.
    """
    if approx == "2level":
        d, idx, n_risk = knn_2level(
            warped_verts, live_verts, kc, qvalid=vert_mask,
            valid=live_mask,
        )
    else:
        d, idx = knn(warped_verts, live_verts, kc, valid=live_mask,
                     approx=approx)
        n_risk = jnp.int32(0)
    return idx, d[:, -1], n_risk


@partial(jax.jit, static_argnames=("k", "tolerance"))
def correspondences_from_candidates(
    warped_verts: jax.Array,    # (V,3) current-round warp
    warped_normals: jax.Array,
    vert_mask: jax.Array,
    live_verts: jax.Array,
    live_mask: jax.Array,
    cand_idx: jax.Array,        # (V,kc) from correspondence_candidates
    d_kc: jax.Array,            # (V,)
    base_warped: jax.Array,     # (V,3) warp the candidates were built at
    k: int,
    tolerance: float,
):
    """closest_point_correspondences against the CACHED candidate set.

    Returns (corr, valid, best_cost, n_risk). Certificate: every live
    vertex outside the cached set is ≥ d_kc from ``base_warped``, hence
    ≥ d_kc − δ from the current position (δ = |warped − base|); the
    re-ranked top-k equals a fresh exact search whenever
    d(current, k-th chosen) < d_kc − δ. ``n_risk`` counts vertices where
    that certificate fails (reported, like the brick pool_risk).
    """
    V, kc = cand_idx.shape
    flat = cand_idx.reshape(-1)
    cx = jnp.take(live_verts[:, 0], flat, axis=0).reshape(V, kc)
    cy = jnp.take(live_verts[:, 1], flat, axis=0).reshape(V, kc)
    cz = jnp.take(live_verts[:, 2], flat, axis=0).reshape(V, kc)
    cvalid = jnp.take(live_mask, flat, axis=0).reshape(V, kc)
    d2 = (
        (warped_verts[:, 0:1] - cx) ** 2
        + (warped_verts[:, 1:2] - cy) ** 2
        + (warped_verts[:, 2:3] - cz) ** 2
    )
    d2 = jnp.where(cvalid, d2, jnp.float32(3.4e38))

    # top-k among the kc candidates (k argmin passes, first-min tie-break
    # = candidate order = ascending base distance, matching the KDTree)
    iota = jax.lax.broadcasted_iota(jnp.int32, (V, kc), 1)
    sel_cols = []
    dk_last = None
    dwork = d2
    for _ in range(k):
        am = jnp.argmin(dwork, axis=1)
        dk_last = jnp.min(dwork, axis=1)
        sel_cols.append(am)
        dwork = jnp.where(iota == am[:, None], jnp.float32(3.4e38), dwork)
    sel = jnp.stack(sel_cols, axis=1)                    # (V,k) kc-local

    take_sel = lambda a: jnp.take_along_axis(a, sel, axis=1)
    sx, sy, sz = take_sel(cx), take_sel(cy), take_sel(cz)
    sval = take_sel(cvalid) & (take_sel(d2) < 1e30)
    cost = jnp.abs(
        warped_normals[:, 0:1] * (warped_verts[:, 0:1] - sx)
        + warped_normals[:, 1:2] * (warped_verts[:, 1:2] - sy)
        + warped_normals[:, 2:3] * (warped_verts[:, 2:3] - sz)
    )
    cost = jnp.where(sval, cost, jnp.inf)
    best = jnp.argmin(cost, axis=1)
    min_cost = jnp.take_along_axis(cost, best[:, None], axis=1)[:, 0]
    use_min = min_cost < 1.0
    pick = jnp.where(use_min, best, 0)
    gx = jnp.take_along_axis(sx, pick[:, None], axis=1)[:, 0]
    gy = jnp.take_along_axis(sy, pick[:, None], axis=1)[:, 0]
    gz = jnp.take_along_axis(sz, pick[:, None], axis=1)[:, 0]
    best_pt = jnp.stack([gx, gy, gz], axis=-1)
    best_cost = jnp.where(use_min, min_cost, 1.0)
    valid = vert_mask & (best_cost <= tolerance) & sval[:, 0]

    delta = jnp.sqrt(jnp.sum((warped_verts - base_warped) ** 2, axis=-1))
    dk = jnp.sqrt(jnp.minimum(dk_last, 3.4e38))
    at_risk = vert_mask & (dk >= d_kc - delta)
    n_risk = jnp.sum(at_risk.astype(jnp.int32))
    return best_pt, valid, best_cost, n_risk


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
