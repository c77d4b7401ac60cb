"""Componentwise (structure-of-arrays) quaternion/DQ algebra.

TPU memory layouts tile the LAST TWO dims to (8,128): a (16.7M, 3) or
(N, C, 3) array pads its minor dim 3 → 128, a 42× HBM blowup that OOMs
256³ voxel batches. The hot voxel kernels therefore carry geometry as
tuples of (N,)-shaped component arrays (or (C, N) candidate-major
arrays) — zero padding, perfect VPU lanes. These helpers mirror
ops/dualquat.py semantics exactly (same reference citations) on that
layout; the AoS API remains for small batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul_c(a, b):
    """Hamilton product on 4-tuples of broadcastable arrays."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def dq_mul_c(a, b):
    """Dual-quaternion product on 8-tuples."""
    ar, ad = a[:4], a[4:]
    br, bd = b[:4], b[4:]
    rr = quat_mul_c(ar, br)
    rd1 = quat_mul_c(ar, bd)
    rd2 = quat_mul_c(ad, br)
    return rr + tuple(x + y for x, y in zip(rd1, rd2))


def dq_conj_full_c(q):
    """Negate components 1..4 (reference core/util.py:299-304)."""
    return (q[0], -q[1], -q[2], -q[3], -q[4], q[5], q[6], q[7])


def dq_point_c(dq, p):
    """Sandwich transform (dq·v·conj(dq))[5:8] on component tuples.

    dq: 8-tuple; p: 3-tuple. No normalization (reference core/util.py:68-72).
    """
    one = jnp.ones_like(p[0])
    zero = jnp.zeros_like(p[0])
    v = (one, zero, zero, zero, zero, p[0], p[1], p[2])
    out = dq_mul_c(dq_mul_c(dq, v), dq_conj_full_c(dq))
    return out[5:8]


def dq_normal_c(dq, n):
    """Rotation-only transform (reference core/util.py:74-76)."""
    zero = jnp.zeros_like(dq[0])
    rq = (dq[0], dq[1], dq[2], dq[3], zero, zero, zero, zero)
    return dq_point_c(rq, n)


def dq_normalize8_c(dq, eps: float = 0.0):
    """8-vector-norm normalization with identity fallback
    (reference core/fusion.py:544-551)."""
    n2 = sum(c * c for c in dq)
    n = jnp.sqrt(n2)
    ok = n > eps
    inv = jnp.where(ok, 1.0 / jnp.where(ok, n, 1.0), 0.0)
    out = tuple(c * inv for c in dq)
    ident_w = jnp.where(ok, out[0], 1.0)
    return (ident_w,) + tuple(jnp.where(ok, c, 0.0) for c in out[1:])
