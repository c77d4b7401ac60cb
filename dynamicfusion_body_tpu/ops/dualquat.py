"""Batched quaternion / dual-quaternion algebra (JAX, TPU-native).

Semantics follow the reference implementation's math library
(reference: core/util.py:63-304) but are re-designed as fully batched,
jit-compatible primitives: every function accepts arbitrary leading batch
dimensions with the quaternion (4,) / dual-quaternion (8,) on the trailing
axis, so the whole voxel grid or vertex set is transformed in one fused
XLA computation instead of a Python loop.

Conventions (identical to the reference so outputs match bit-for-bit in f64
and to fp32 tolerance on TPU):

* quaternion layout ``(w, x, y, z)``;
* dual quaternion layout ``(w, x, y, z, we, xe, ye, ze)`` i.e. basis
  ``(1, i, j, k, e, ei, ej, ek)`` (reference core/util.py:78);
* the "full" DQ conjugate used for point transforms negates components
  1..4 — the combined quaternion+dual conjugate (core/util.py:299-304);
* point transform is the literal sandwich product ``dq * v * conj(dq)``
  with ``v = (1,0,0,0, 0,px,py,pz)`` and **no normalization** — the
  reference applies unnormalized/8-norm-normalized DQs and we must
  reproduce that behavior exactly (core/util.py:68-72);
* DQ blending normalizes by the **8-vector** norm (not the real-part
  norm) with an identity fallback at exactly-zero norm
  (core/fusion.py:527-551).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IDENTITY_DQ = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0], dtype=jnp.float32)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b, (w,x,y,z) layout, batched on leading dims.

    Matches reference core/util.py:255-269 (quaternion_multiply(q1=a, q0=b)).
    """
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    """(w, -x, -y, -z). Reference core/util.py:285-296."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def dq_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Dual-quaternion product: (ar + ε ad)(br + ε bd).

    Reference core/util.py:275-282.
    """
    ar, ad = a[..., :4], a[..., 4:]
    br, bd = b[..., :4], b[..., 4:]
    rr = quat_multiply(ar, br)
    rd = quat_multiply(ar, bd) + quat_multiply(ad, br)
    return jnp.concatenate([rr, rd], axis=-1)


def dq_full_conjugate(dq: jax.Array) -> jax.Array:
    """Combined quaternion+dual conjugate: negate components 1,2,3,4.

    Net effect of reference core/util.py:299-304 (dual_quaternion_conjugate).
    """
    sign = jnp.array([1.0, -1, -1, -1, -1, 1, 1, 1], dtype=dq.dtype)
    return dq * sign


def dq_transform_point(dq: jax.Array, p: jax.Array) -> jax.Array:
    """Transform 3D point(s) by dual quaternion(s): (dq · v · conj(dq))[5:8].

    ``v = 1 + ε(p)``. No normalization is applied — for non-unit dq the
    output scales accordingly, exactly as the reference's ``dqb_warp``
    (core/util.py:68-72). Shapes broadcast on leading dims; trailing dims
    are (…,8) and (…,3).
    """
    zeros = jnp.zeros_like(p[..., :1])
    ones = jnp.ones_like(p[..., :1])
    vq = jnp.concatenate([ones, zeros, zeros, zeros, zeros, p], axis=-1)
    dq, vq = jnp.broadcast_arrays(dq, jnp.broadcast_to(vq, p.shape[:-1] + (8,)))
    out = dq_multiply(dq_multiply(dq, vq), dq_full_conjugate(dq))
    return out[..., 5:8]


def dq_transform_normal(dq: jax.Array, n: jax.Array) -> jax.Array:
    """Rotate normal(s) by the real (rotation) part only.

    Reference core/util.py:74-76: zero out the dual part, then transform.
    """
    rq = jnp.concatenate([dq[..., :4], jnp.zeros_like(dq[..., :4])], axis=-1)
    return dq_transform_point(rq, n)


def dq_normalize8(dq: jax.Array, eps: float = 0.0) -> jax.Array:
    """Normalize by the full 8-vector norm; identity DQ fallback at ~zero norm.

    The reference divides by ``la.norm(dqb)`` over all 8 components (NOT the
    standard real-part norm) and falls back to the identity DQ when the norm
    is exactly zero (core/fusion.py:544-551). On TPU fp32 we use a tiny
    threshold instead of exact zero.
    """
    norm = jnp.linalg.norm(dq, axis=-1, keepdims=True)
    safe = jnp.where(norm > eps, norm, 1.0)
    out = dq / safe
    ident = jnp.broadcast_to(IDENTITY_DQ.astype(dq.dtype), dq.shape)
    return jnp.where(norm > eps, out, ident)


def dqb_weights(
    pos: jax.Array, node_pos: jax.Array, node_w: jax.Array
) -> jax.Array:
    """Gaussian blend weights exp(-(‖pos-v_k‖ / (2 w_k))²).

    pos: (..., 3); node_pos: (..., K, 3); node_w: (..., K).
    Reference core/fusion.py:536-538 (dmax=None branch; dg_w = 2·radius so
    the effective denominator is 4·radius).
    """
    d = jnp.linalg.norm(pos[..., None, :] - node_pos, axis=-1)
    return jnp.exp(-((d / (2.0 * node_w)) ** 2))


def dq_blend(
    pos: jax.Array,
    node_pos: jax.Array,
    node_dq: jax.Array,
    node_w: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Dual-quaternion blending over K nodes per query point.

    pos: (..., 3); node_pos: (..., K, 3); node_dq: (..., K, 8);
    node_w: (..., K); mask: optional (..., K) bool — masked nodes contribute
    zero weight (used for fixed-capacity node pools).

    Returns the 8-norm-normalized blended DQ (identity on zero norm),
    reproducing reference core/fusion.py:527-551.
    """
    w = dqb_weights(pos, node_pos, node_w)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    blended = jnp.sum(w[..., None] * node_dq, axis=-2)
    return dq_normalize8(blended)


def warp_point(
    pos: jax.Array,
    node_pos: jax.Array,
    node_dq: jax.Array,
    node_w: jax.Array,
    normal: jax.Array | None = None,
    m_lw: jax.Array | None = None,
    mask: jax.Array | None = None,
):
    """DQB-skin a point (and optionally its normal) into the live frame.

    Blend the K per-point nodes, sandwich-transform the point, then apply
    the optional global rigid DQ ``m_lw`` — reference ``warp``
    (core/fusion.py:502-520).
    """
    se3 = dq_blend(pos, node_pos, node_dq, node_w, mask=mask)
    p = dq_transform_point(se3, pos)
    if m_lw is not None:
        p = dq_transform_point(m_lw, p)
    if normal is None:
        return p
    n = dq_transform_normal(se3, normal)
    if m_lw is not None:
        n = dq_transform_normal(m_lw, n)
    return p, n
