"""Cached-candidate correspondence (pipeline/correspondence.py): one full
kNN per frame + per-round re-ranking under a drift certificate. The
certificate's contract: wherever a vertex is NOT flagged at-risk, the
re-ranked result must equal a fresh full closest-point search exactly
(the reference re-queries its KDTree every solve round,
core/fusion.py:371 -> 251-276 — the cache must be invisible there)."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.pipeline.correspondence import (
    closest_point_correspondences,
    correspondence_candidates,
    correspondences_from_candidates,
)


def _normals(rng, n):
    v = rng.randn(n, 3).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_zero_drift_equals_fresh_search(rng):
    V, L, k = 257, 511, 4
    verts = jnp.asarray((rng.rand(V, 3) * 20).astype(np.float32))
    nrm = jnp.asarray(_normals(rng, V))
    vmask = jnp.asarray(rng.rand(V) > 0.1)
    live = jnp.asarray((rng.rand(L, 3) * 20).astype(np.float32))
    lmask = jnp.asarray(rng.rand(L) > 0.1)
    tol = 2.0

    cand, d_kc, n_risk0 = correspondence_candidates(
        verts, vmask, live, lmask, kc=16, approx=False
    )
    assert int(n_risk0) == 0
    got, gvalid, gcost, n_risk = correspondences_from_candidates(
        verts, nrm, vmask, live, lmask, cand, d_kc, verts, k, tol
    )
    # at zero drift the k-th chosen distance is strictly inside the
    # kc-candidate ball, so nothing should be at risk (kc >> k)
    assert int(n_risk) == 0
    want, wvalid, wcost = closest_point_correspondences(
        verts, nrm, vmask, live, lmask, k, tol
    )
    np.testing.assert_array_equal(np.asarray(gvalid), np.asarray(wvalid))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # cost differs only by summation order (componentwise vs stacked dot)
    np.testing.assert_allclose(
        np.asarray(gcost), np.asarray(wcost), atol=1e-5
    )


def test_drifted_rerank_exact_where_certified(rng):
    """After the warp moves every vertex (sub-candidate-ball drift), the
    re-ranked cached answer must equal a fresh search at the NEW
    positions for every vertex the certificate does not flag."""
    V, L, k = 300, 800, 3
    base = (rng.rand(V, 3) * 20).astype(np.float32)
    drift = rng.randn(V, 3).astype(np.float32) * 0.3
    moved = base + drift
    nrm = jnp.asarray(_normals(rng, V))
    vmask = jnp.ones(V, bool)
    live = jnp.asarray((rng.rand(L, 3) * 20).astype(np.float32))
    lmask = jnp.ones(L, bool)
    tol = 1.5

    cand, d_kc, _ = correspondence_candidates(
        jnp.asarray(base), vmask, live, lmask, kc=16, approx=False
    )
    got, gvalid, gcost, n_risk = correspondences_from_candidates(
        jnp.asarray(moved), nrm, vmask, live, lmask, cand, d_kc,
        jnp.asarray(base), k, tol
    )
    want, wvalid, wcost = closest_point_correspondences(
        jnp.asarray(moved), nrm, vmask, live, lmask, k, tol
    )
    # recompute the at-risk flags the kernel uses (same formula) to know
    # WHICH vertices are certified
    delta = np.linalg.norm(drift, axis=1)
    dkc = np.asarray(d_kc)
    # chosen k-th distance at the new position, from the cached set
    cpts = np.asarray(live)[np.asarray(cand)]           # (V, kc, 3)
    d_new = np.linalg.norm(cpts - moved[:, None, :], axis=2)
    dk_new = np.sort(d_new, axis=1)[:, k - 1]
    certified = dk_new < dkc - delta
    assert certified.sum() > V // 2  # the test must exercise both sides
    np.testing.assert_array_equal(
        np.asarray(gvalid)[certified], np.asarray(wvalid)[certified]
    )
    np.testing.assert_array_equal(
        np.asarray(got)[certified], np.asarray(want)[certified]
    )
    # the kernel's own count must cover every uncertified vertex
    assert int(n_risk) >= int((~certified).sum())
