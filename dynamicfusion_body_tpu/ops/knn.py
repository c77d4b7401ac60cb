"""k-nearest-neighbor search on device (replaces scipy.spatial.KDTree).

The reference queries a KDTree per voxel / per vertex (66% of updateTSDF
time, SURVEY §6). On TPU the node / vertex sets are small (10²–10⁵), so the
right design is brute force on the MXU: ‖q−p‖² = ‖q‖² − 2 q·p + ‖p‖² where
the cross term is a (Q,3)×(3,P) matmul, followed by ``lax.top_k``. For the
16.7M-voxel grid, a two-level scheme (per-brick candidate sets, then exact
top-k within the candidates) bounds the work — see models/warp_field.py.

KDTree tie-breaking: scipy returns the lowest index among equidistant
points; we subtract a tiny index-proportional epsilon before top_k to match.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pairwise_sqdist(q: jax.Array, p: jax.Array) -> jax.Array:
    """(Q,D),(P,D) → (Q,P) squared distances via MXU-friendly matmul."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    pp = jnp.sum(p * p, axis=-1)
    cross = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qq - 2.0 * cross + pp[None, :], 0.0)


@partial(jax.jit, static_argnames=("k", "chunk", "approx"))
def _knn_jit(queries, points, k, valid, chunk, approx):
    return _knn_impl(queries, points, k, valid, chunk, approx)


def knn(
    queries: jax.Array,
    points: jax.Array,
    k: int,
    valid: jax.Array | None = None,
    chunk: int | None = None,
    approx: bool = False,
):
    """``approx=True`` uses the TPU's hardware approximate top-k
    (recall ≈ 0.99 at k=3 over 10^5 points, ~2x faster than the exact
    reduction) — appropriate for correspondence candidates, not for
    parity-exact graph construction."""
    nq, npts = queries.shape[0], points.shape[0]
    if chunk is None:
        chunk = max(256, min(8192, (1 << 27) // max(npts, 1)))
    return _knn_jit(queries, points, min(k, npts), valid, chunk, approx)


def _knn_impl(queries, points, k, valid, chunk, approx=False):
    """Exact k-NN: returns (dists (Q,k), idx (Q,k) int32), ascending.

    ``valid`` masks out pool slots (distance +inf). Queries are processed in
    chunks to bound the (chunk, P) distance matrix in memory (default:
    ≤ ~512 MB per chunk).
    """
    nq = queries.shape[0]
    npts = points.shape[0]
    if chunk is None:
        chunk = max(256, min(8192, (1 << 27) // max(npts, 1)))
    k = min(k, npts)
    pad = (-nq) % chunk
    qpad = jnp.pad(queries, ((0, pad), (0, 0)))
    nchunks = qpad.shape[0] // chunk
    tie = jnp.arange(npts, dtype=jnp.float32) * 1e-12

    def one(qc):
        if approx:
            # candidate search only (exact distances are recomputed for
            # the selected k below): a bf16 distance matrix halves the
            # HBM traffic of the (chunk, P) materialization feeding the
            # hardware top-k — the dominant cost at 10⁵-point pools
            qq = jnp.sum(qc * qc, axis=-1, keepdims=True)
            pp = jnp.sum(points * points, axis=-1)
            cross = jnp.dot(qc, points.T,
                            preferred_element_type=jnp.float32)
            d2c = (qq - 2.0 * cross + pp[None, :]).astype(jnp.bfloat16)
            if valid is not None:
                d2c = jnp.where(valid[None, :], d2c, jnp.bfloat16(jnp.inf))
            neg, idx = jax.lax.approx_max_k(-d2c, k, recall_target=0.95)
        else:
            d2 = pairwise_sqdist(qc, points)
            if valid is not None:
                d2 = jnp.where(valid[None, :], d2, jnp.inf)
        if approx:
            pass
        elif k <= 4:
            # iterative argmin beats top_k for tiny k (top_k partially
            # sorts the whole 10^5-wide row)
            dwork = d2 + tie[None, :]
            cols = []
            for _ in range(k):
                am = jnp.argmin(dwork, axis=1).astype(jnp.int32)
                cols.append(am)
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, dwork.shape, 1)
                    == am[:, None]
                )
                dwork = jnp.where(onehot, jnp.inf, dwork)
            idx = jnp.stack(cols, axis=1)
        else:
            neg, idx = jax.lax.top_k(-(d2 + tie[None, :]), k)
        # Recompute exact distances for the selected k (the matmul form
        # loses fp32 precision to cancellation; k·Q direct diffs are cheap).
        sel = jnp.take(points, idx.reshape(-1), axis=0).reshape(
            idx.shape + (points.shape[-1],))
        d2s = jnp.sum((qc[:, None, :] - sel) ** 2, axis=-1)
        if valid is not None:
            vs = jnp.take(valid, idx.reshape(-1), axis=0).reshape(idx.shape)
            d2s = jnp.where(vs, d2s, jnp.inf)
        if approx:
            # bf16 candidate distances quantize the hardware top-k's
            # ordering — restore ascending order by exact distance
            order = jnp.argsort(d2s, axis=1)
            d2s = jnp.take_along_axis(d2s, order, axis=1)
            idx = jnp.take_along_axis(idx, order, axis=1)
        return jnp.sqrt(d2s), idx.astype(jnp.int32)

    d, i = jax.lax.map(one, qpad.reshape(nchunks, chunk, queries.shape[-1]))
    d = d.reshape(-1, k)[:nq]
    i = i.reshape(-1, k)[:nq]
    return d, i


def nearest(queries: jax.Array, points: jax.Array, valid: jax.Array | None = None):
    """1-NN convenience wrapper: returns (dist (Q,), idx (Q,))."""
    d, i = knn(queries, points, 1, valid=valid)
    return d[:, 0], i[:, 0]
