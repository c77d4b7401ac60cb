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
            # Precision notes (advisor finding, measured at 256³ scale):
            # 1. the matmul itself must run at HIGHEST precision — a
            #    default (bf16-input) dot has ~2^-8 relative error, which
            #    at voxel-lattice coordinates (products ~4e4) is ±100s of
            #    absolute d² error and collapses recall@3 to 0.05. The
            #    MXU passes are cheap; only the (chunk, P) OUTPUT cast to
            #    bf16 pays off (halves the HBM feed of the hardware
            #    top-k).
            # 2. subtract a per-query min-distance ESTIMATE (from a 1/16
            #    pool subsample) before the cast: d² reaches ~5e5 where
            #    the bf16 ulp is ~2048 — near-equidistant pool points
            #    would quantize to identical keys. A coarse estimate
            #    keeps this single-pass (the exact row min would force a
            #    second fp32 pass; measured 17 → 57 ms per call).
            sub = slice(None, None, 16)
            psub = points[sub]
            ppsub = pp[sub]
            cross_sub = jnp.dot(qc, psub.T,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            d2_sub = qq - 2.0 * cross_sub + ppsub[None, :]
            if valid is not None:
                d2_sub = jnp.where(valid[sub][None, :], d2_sub, jnp.inf)
            est = jnp.min(d2_sub, axis=1, keepdims=True)
            est = jnp.where(jnp.isfinite(est), est, 0.0)
            cross = jnp.dot(qc, points.T,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            d2c = (qq - 2.0 * cross + pp[None, :] - est).astype(jnp.bfloat16)
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


@partial(jax.jit, static_argnames=("k", "chunk", "pool"))
def knn_2level(
    queries: jax.Array,            # (Q,3) — spatially coherent order!
    points: jax.Array,             # (P,3)
    k: int,
    qvalid: jax.Array | None = None,
    valid: jax.Array | None = None,
    chunk: int = 1024,
    pool: int = 4096,
):
    """Two-level kNN for SPATIALLY COHERENT query batches (e.g. marching-
    cubes vertex order, which is edge-id-sorted and therefore x-major
    coherent): per chunk of ``chunk`` consecutive queries, select the
    ``pool`` nearest points to the chunk centroid (one small (nch, P)
    matmul + top_k), then run the exact fp32 search within the pool
    (batched (nch, chunk, pool) matmul — ~32× less distance work and HBM
    traffic than the flat (Q, P) matrix at bench scale).

    Returns (dists (Q,k), idx (Q,k), n_risk): ``n_risk`` counts queries
    whose exact k-th neighbor CANNOT be certified to lie inside the
    chunk's pool, by the same conservative ball bound as
    models/warp_field.brick_candidates_2level: any out-of-pool point is
    ≥ r_pool − d(q, centroid) away, so a miss requires
    d(q, k-th selected) ≥ r_pool − d(q, centroid). Zero risk ⇒ results
    are exactly the flat search's. Ties break to the lowest point index
    (scipy KDTree convention), like the flat path.
    """
    Q, P = queries.shape[0], points.shape[0]
    pool = min(pool, P)
    k = min(k, pool)
    pad = (-Q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    if qvalid is None:
        qv = jnp.arange(qp.shape[0]) < Q
    else:
        qv = jnp.pad(qvalid, (0, pad))
    nch = qp.shape[0] // chunk
    q3 = qp.reshape(nch, chunk, 3)
    qm = qv.reshape(nch, chunk)
    cnt = jnp.sum(qm.astype(jnp.float32), axis=1)
    cent = jnp.sum(
        q3 * qm[:, :, None].astype(jnp.float32), axis=1
    ) / jnp.maximum(cnt, 1.0)[:, None]

    # coarse level: nearest `pool` points per chunk centroid
    d2c = pairwise_sqdist(cent, points)  # (nch, P) — small
    if valid is not None:
        d2c = jnp.where(valid[None, :], d2c, jnp.inf)
    negd, pidx = jax.lax.top_k(-d2c, pool)  # (nch, pool)
    r_pool2 = -negd[:, -1]  # squared radius of the pool ball

    def take_pool(col):
        return jnp.take(col, pidx.reshape(-1), axis=0).reshape(nch, pool)

    ppx = take_pool(points[:, 0])
    ppy = take_pool(points[:, 1])
    ppz = take_pool(points[:, 2])
    pv = (
        take_pool(valid.astype(jnp.float32)) > 0.5
        if valid is not None
        else jnp.ones((nch, pool), bool)
    )

    # fine level: exact fp32 distances within the pool, channel-wise (no
    # (…,3) padded layouts); (nch, chunk, pool) is the transient.
    dx = q3[:, :, 0:1] - ppx[:, None, :]
    dy = q3[:, :, 1:2] - ppy[:, None, :]
    dz = q3[:, :, 2:3] - ppz[:, None, :]
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(pv[:, None, :], d2, jnp.float32(3.4e38))
    # lowest-global-index tie-break
    tie = jnp.take(
        jnp.arange(P, dtype=jnp.float32) * 1e-12, pidx.reshape(-1), axis=0
    ).reshape(nch, 1, pool)
    dwork = d2 + tie

    iota = jax.lax.broadcasted_iota(jnp.int32, dwork.shape, 2)
    cols_d = []
    cols_i = []
    for _ in range(k):
        am = jnp.argmin(dwork, axis=2)                      # (nch, chunk)
        gd = jnp.take_along_axis(d2, am[:, :, None], axis=2)[:, :, 0]
        gi = jnp.take_along_axis(pidx, am, axis=1)          # pool → global
        cols_d.append(gd)
        cols_i.append(gi)
        dwork = jnp.where(iota == am[:, :, None], jnp.float32(3.4e38), dwork)
    dk = jnp.stack(cols_d, axis=-1)  # (nch, chunk, k)
    ik = jnp.stack(cols_i, axis=-1)

    # certificate: miss possible iff d(q, kth) + d(q, cent) >= r_pool
    dq_cent = jnp.sqrt(
        jnp.sum((q3 - cent[:, None, :]) ** 2, axis=2)
    )
    dq_k = jnp.sqrt(jnp.minimum(dk[:, :, -1], 3.4e38))
    r_pool = jnp.sqrt(jnp.maximum(r_pool2, 0.0))[:, None]
    at_risk = (dq_k + dq_cent >= r_pool) & qm & jnp.isfinite(r_pool)
    # a pool that already contains every valid point can never miss
    if valid is not None:
        nvalid = jnp.sum(valid.astype(jnp.int32))
        at_risk = at_risk & (nvalid > pool)
    elif P <= pool:
        at_risk = jnp.zeros_like(at_risk)
    n_risk = jnp.sum(at_risk.astype(jnp.int32))

    d_out = jnp.sqrt(jnp.maximum(dk, 0.0)).reshape(-1, k)[:Q]
    i_out = ik.astype(jnp.int32).reshape(-1, k)[:Q]
    return d_out, i_out, n_risk
