"""Pinhole projection and grid↔world calibration (batched JAX).

Reference semantics: core/util.py:312-328 ``project_to_pixel`` and the
``_IND`` grid→world matrix construction in core/fusion_dm.py:106-141.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_to_pixel(K: jax.Array, pos: jax.Array, lw: jax.Array | None = None):
    """Project camera/world points to pixel coords.

    pos: (...,3) camera-frame points (or world if ``lw`` 3x4 extrinsic is
    given). Returns ``(u, v, valid)`` with valid=False where the projective
    depth is zero (reference returns (None, None) there,
    core/util.py:318-319).
    """
    if lw is not None:
        R, t = lw[..., :3, :3], lw[..., :3, 3]
        pos = jnp.einsum("...ij,...j->...i", R, pos, precision=jax.lax.Precision.HIGHEST) + t
    p = jnp.einsum("ij,...j->...i", K, pos, precision=jax.lax.Precision.HIGHEST)
    valid = p[..., 2] != 0.0
    z = jnp.where(valid, p[..., 2], 1.0)
    return p[..., 0] / z, p[..., 1] / z, valid


def make_ind_matrix(res: int, avg: jax.Array, std: jax.Array, factor: float = 8.0):
    """Grid-index → world 4x4: scale = factor·std/res, origin avg - scale·res/2.

    Reference core/fusion_dm.py:136-141 (factor 8; the CPU fuse path passes
    12·std/res but the authoritative GPU path projects through _IND, which
    uses 8 — SURVEY §2.4).
    """
    scale = factor * std / res
    ind = jnp.eye(4, dtype=jnp.float32)
    ind = ind.at[0, 0].set(scale).at[1, 1].set(scale).at[2, 2].set(scale)
    ind = ind.at[:3, 3].set(avg - scale * res / 2.0)
    return ind


def estimate_alignment(depths: jax.Array, Kinv: jax.Array, lws: jax.Array):
    """Auto grid calibration: per-map mean/std of backprojected world points.

    Vectorized equivalent of the reference's per-pixel Python scan
    (core/fusion_dm.py:110-134): for every nonzero depth pixel, backproject
    ``-d·(u,v,1)`` through K⁻¹ and the inverted extrinsic, then average the
    per-map means and the per-map (componentwise) stds.

    depths: (N,H,W) with the reference's negative-depth convention;
    lws: (N,3,4). Returns (avg (3,), std scalar).
    """
    n, h, w = depths.shape
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    uv1 = jnp.stack([jnp.broadcast_to(u, (h, w)),
                     jnp.broadcast_to(v, (h, w)),
                     jnp.ones((h, w), jnp.float32)], axis=-1)

    def per_map(dm, lw):
        mask = dm != 0.0
        pts_cam = jnp.einsum("ij,hwj->hwi", Kinv, -dm[..., None] * uv1, precision=jax.lax.Precision.HIGHEST)
        R, t = lw[:, :3], lw[:, 3]
        Rinv = R.T
        pts = jnp.einsum("ij,hwj->hwi", Rinv, pts_cam - t, precision=jax.lax.Precision.HIGHEST)
        cnt = jnp.maximum(jnp.sum(mask), 1)
        m = jnp.sum(jnp.where(mask[..., None], pts, 0.0), axis=(0, 1)) / cnt
        var = jnp.sum(jnp.where(mask[..., None], (pts - m) ** 2, 0.0), axis=(0, 1)) / cnt
        return m, jnp.sqrt(var)

    means, stds = jax.vmap(per_map)(depths, lws)
    return jnp.mean(means, axis=0), jnp.mean(stds)
