"""SE(3) ↔ dual-quaternion conversions and rigid-matrix helpers (batched JAX).

Reference semantics: core/util.py:13-23 (compose/decompose),
core/util.py:79-89 (SE3TDQ / DQTSE3), core/util.py:143-252 (quaternion ↔
matrix), core/util.py:338-346 (inverse of a 3x4 rigid matrix).

The quaternion-from-matrix path uses the eigenvector method (largest
eigenvalue of the symmetric 4x4 K matrix) exactly like the reference's
non-precise branch, including the q[0] >= 0 sign convention — sign
consistency matters because downstream DQ blending is sign-sensitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dualquat import quat_conjugate, quat_multiply

_EPS = 4.0 * jnp.finfo(jnp.float32).eps


def compose_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """Build (...,4,4) from (...,3,3) rotation and (...,3) translation."""
    batch = R.shape[:-2]
    M = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t.reshape(batch + (3,)))
    M = M.at[..., 3, 3].set(1.0)
    return M


def decompose_se3(M: jax.Array):
    """(...,4,4) or (...,3,4) → rotation (...,3,3), translation (...,3)."""
    return M[..., :3, :3], M[..., :3, 3]


def quat_from_matrix(M: jax.Array) -> jax.Array:
    """Rotation matrix (...,4,4)/(...,3,3) → quaternion (w,x,y,z), w >= 0.

    Eigenvector-of-K method (reference core/util.py:231-252), batched.
    """
    m = M[..., :3, :3]
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    z = jnp.zeros_like(m00)
    K = jnp.stack(
        [
            jnp.stack([m00 - m11 - m22, z, z, z], axis=-1),
            jnp.stack([m01 + m10, m11 - m00 - m22, z, z], axis=-1),
            jnp.stack([m02 + m20, m12 + m21, m22 - m00 - m11, z], axis=-1),
            jnp.stack([m21 - m12, m02 - m20, m10 - m01, m00 + m11 + m22], axis=-1),
        ],
        axis=-2,
    ) / 3.0
    # K is filled lower-triangular; symmetrize for eigh.
    Kl = jnp.tril(K, k=-1)
    Ksym = Kl + jnp.swapaxes(Kl, -1, -2) + jnp.eye(4, dtype=K.dtype) * K
    w, V = jnp.linalg.eigh(Ksym)
    # eigh sorts ascending: largest eigenvalue is last.
    v = V[..., :, -1]
    q = jnp.stack([v[..., 3], v[..., 0], v[..., 1], v[..., 2]], axis=-1)
    return jnp.where(q[..., :1] < 0.0, -q, q)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion → homogeneous (...,4,4) rotation matrix.

    Normalizes by 2/‖q‖² internally and returns identity for ~zero-norm
    quaternions, matching reference core/util.py:143-167.
    """
    n = jnp.sum(q * q, axis=-1, keepdims=True)
    valid = n[..., 0] > _EPS
    qs = q * jnp.sqrt(2.0 / jnp.where(valid[..., None], n, 1.0))
    outer = qs[..., :, None] * qs[..., None, :]
    w, x, y, z = 0, 1, 2, 3
    one = jnp.ones_like(outer[..., 0, 0])
    zero = jnp.zeros_like(one)
    R = jnp.stack(
        [
            jnp.stack([one - outer[..., y, y] - outer[..., z, z],
                       outer[..., x, y] - outer[..., z, w],
                       outer[..., x, z] + outer[..., y, w], zero], axis=-1),
            jnp.stack([outer[..., x, y] + outer[..., z, w],
                       one - outer[..., x, x] - outer[..., z, z],
                       outer[..., y, z] - outer[..., x, w], zero], axis=-1),
            jnp.stack([outer[..., x, z] - outer[..., y, w],
                       outer[..., y, z] + outer[..., x, w],
                       one - outer[..., x, x] - outer[..., y, y], zero], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(4, dtype=q.dtype), R.shape)
    return jnp.where(valid[..., None, None], R, eye)


def se3_to_dq(M: jax.Array) -> jax.Array:
    """4x4 (or 3x4) rigid matrix → 8-vector dual quaternion.

    q = normalized quat(R); qe = 0.5 · (0,t) ⊗ q. Reference core/util.py:79-84.
    """
    _, t = decompose_se3(M)
    q = quat_from_matrix(M)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    tq = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    qe = 0.5 * quat_multiply(tq, q)
    return jnp.concatenate([q, qe], axis=-1)


def dq_to_se3(dq: jax.Array) -> jax.Array:
    """8-vector dual quaternion → 4x4 rigid matrix.

    R from the real part, t = (2·qd ⊗ conj(qr))[1:]. Reference
    core/util.py:86-89 — as there, correct for unit real parts.
    """
    R4 = quat_to_matrix(dq[..., :4])
    t = quat_multiply(2.0 * dq[..., 4:], quat_conjugate(dq[..., :4]))[..., 1:]
    return compose_se3(R4[..., :3, :3], t)


def inverse_rigid_matrix(A: jax.Array) -> jax.Array:
    """Invert a (...,3,4) (or 4x4) rigid transform → (...,3,4).

    Reference core/util.py:338-346 (uses la.inv on R; we use the transpose
    since R is a rotation — identical result, cheaper and batched).
    """
    R, t = decompose_se3(A)
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([Rinv, tinv[..., None]], axis=-1)
