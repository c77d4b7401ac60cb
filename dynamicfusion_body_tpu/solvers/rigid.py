"""Rigid pose estimation: point-to-plane Gauss-Newton over an 8-vector DQ.

Replaces the reference's scipy ``least_squares(computef_lw, lw)`` calls
(core/fusion_dm.py:264-297, core/fusion.py:350-364,444-456). The pose is
parameterized exactly as the reference does — a free 8-component dual
quaternion applied UNNORMALIZED through the sandwich product — so the
optimum matches; the solver is analytic GN (jacfwd) with an 8x8 normal
system instead of 2-point finite differences.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.dualquat import dq_transform_normal, dq_transform_point


def p2s_residuals(lw_dq, pts, normals, corrs, mask):
    """Point-to-plane residuals r_i = n_i(x)·(p_i(x) − c_i), masked.

    pts/normals: (V,3) canonical (or node-field pre-warped) points;
    corrs: (V,3); mask: (V,). Matches FusionDM.computef_lw
    (core/fusion_dm.py:285-297).
    """
    p = dq_transform_point(lw_dq, pts)
    n = dq_transform_normal(lw_dq, normals)
    r = jnp.sum(n * (p - corrs), axis=-1)
    return jnp.where(mask, r, 0.0)


def _ident(x):
    return x


def solve_rigid_core(
    lw_dq: jax.Array,
    pts: jax.Array,
    normals: jax.Array,
    corrs: jax.Array,
    mask: jax.Array,
    iterations: int = 10,
    damping: float = 1e-6,
    reduce=_ident,
):
    """Gauss-Newton on the 8-dof DQ pose. Returns (lw_dq, cost).

    ``reduce`` is applied to every over-points reduction (the 8×8 JᵀJ,
    JᵀR, and the acceptance energies) — identity single-chip,
    ``lax.psum`` over the vertex-sharded mesh axis in
    parallel/frame_sharded.py. All solver state (the 8-vector pose and
    the tiny normal system) stays replicated.
    """

    def resid(x):
        return p2s_residuals(x, pts, normals, corrs, mask)

    hi = jax.lax.Precision.HIGHEST

    def step(x, _):
        r = resid(x)
        J = jax.jacfwd(resid)(x)  # (V, 8)
        JtJ = reduce(jnp.dot(J.T, J, precision=hi))
        Jtr = reduce(jnp.dot(J.T, r, precision=hi))
        A = JtJ + damping * jnp.eye(8, dtype=x.dtype) * (
            jnp.trace(JtJ) / 8.0 + 1e-12
        )
        delta = jnp.linalg.solve(A, -Jtr)
        x_new = x + delta
        better = reduce(jnp.sum(resid(x_new) ** 2)) <= reduce(
            jnp.sum(r**2)
        )
        return jnp.where(better, x_new, x), None

    x, _ = jax.lax.scan(step, lw_dq, None, length=iterations)
    cost = 0.5 * reduce(jnp.sum(resid(x) ** 2))
    return x, cost


@partial(jax.jit, static_argnames=("iterations", "damping"))
def solve_rigid(
    lw_dq: jax.Array,
    pts: jax.Array,
    normals: jax.Array,
    corrs: jax.Array,
    mask: jax.Array,
    iterations: int = 10,
    damping: float = 1e-6,
):
    """Single-chip entry: solve_rigid_core with the identity reduction."""
    return solve_rigid_core(
        lw_dq, pts, normals, corrs, mask, iterations, damping
    )
