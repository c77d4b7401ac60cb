"""Multi-chip execution of the fusion pipeline via shard_map over a Mesh.

Layout (SURVEY §5.8): the canonical voxel grid is sharded along its
leading (x) axis across the mesh; the live TSDF, depth maps, camera
matrices, and the node pool are replicated (they are tiny next to the
volume); Gauss-Newton reductions ride ``psum`` over ICI. No point-to-point
patterns are needed — the per-voxel work is independent, so the only
collectives are the GN reductions and the initial broadcast.

Every sharded function reuses the single-chip kernel with an ``x_offset``
so each device computes global voxel coordinates for its slab.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.tsdf_volume import fuse_depth, update_tsdf_rigid
from ..models.warp_field import WarpField, update_tsdf_nonrigid
from ..ops.losses import huber_irls_weight
from ..solvers.nonrigid import (
    data_residual_one,
    make_sorted_reducer,
    reg_residual_one,
)
from .mesh import VOXEL_AXIS


def fuse_depth_sharded(mesh: Mesh, tdist: float, wmax: float = 100.0):
    """Returns a jitted (values, weights, depth, proj, kinv) → (v, w) with
    the volume sharded along x and everything else replicated."""

    def local(values, weights, depth, proj, kinv):
        idx = jax.lax.axis_index(VOXEL_AXIS)
        x0 = idx * values.shape[0]
        return fuse_depth(
            values, weights, depth, proj, kinv, tdist, wmax, x_offset=x0
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(VOXEL_AXIS), P(VOXEL_AXIS), P(), P(), P()),
            out_specs=(P(VOXEL_AXIS), P(VOXEL_AXIS)),
        )
    )


def update_tsdf_rigid_sharded(mesh: Mesh, tdist: float, wmax: float = 100.0):
    """Rigid TSDF-to-TSDF fusion with the canonical volume sharded along x
    and the live volume replicated (warped samples cross slab boundaries)."""

    def local(values, weights, live, lw_dq):
        idx = jax.lax.axis_index(VOXEL_AXIS)
        rx = values.shape[0]
        # global x coords for this slab: recompute via offset trick — the
        # rigid kernel builds its own iota, so shift through a dummy pad:
        # simplest correct route: call the pointwise math on offset coords.
        from ..ops.dualquat import dq_transform_point
        from ..ops.interp import trilinear

        _, ry, rz = values.shape
        f32 = jnp.float32
        xs = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 0) + idx * rx
        ys = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 1)
        zs = jax.lax.broadcasted_iota(f32, (rx, ry, rz), 2)
        pos = jnp.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
        warped = dq_transform_point(lw_dq, pos)
        tsdf_l, valid = trilinear(live, warped)
        tsdf_l = tsdf_l.reshape(values.shape)
        valid = valid.reshape(values.shape)
        upd = valid & (tsdf_l > -tdist)
        new_w = weights + 1.0
        new_vals = (values * weights + jnp.minimum(tdist, tsdf_l)) / new_w
        return (
            jnp.where(upd, new_vals, values),
            jnp.where(upd, jnp.minimum(new_w, wmax), weights),
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(VOXEL_AXIS), P(VOXEL_AXIS), P(), P()),
            out_specs=(P(VOXEL_AXIS), P(VOXEL_AXIS)),
        )
    )


def update_tsdf_nonrigid_sharded(
    mesh: Mesh,
    k: int,
    tdist: float,
    wmax: float = 100.0,
    brick: int = 8,
    n_candidates: int = 8,
):
    """Non-rigid canonical fusion: canonical volume sharded along x, live
    volume + warp field replicated."""

    def local(values, weights, live, wf, lw_dq):
        idx = jax.lax.axis_index(VOXEL_AXIS)
        x0 = idx * values.shape[0]
        return update_tsdf_nonrigid(
            values, weights, live, wf, lw_dq, k, tdist, wmax,
            brick=brick, n_candidates=n_candidates, x_offset=x0,
        )

    wf_spec = WarpField(
        node_pos=P(), node_dq=P(), node_w=P(), node_vert_idx=P(),
        active=P(), radius=P(),
    )
    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(VOXEL_AXIS), P(VOXEL_AXIS), P(), wf_spec, P()),
            out_specs=(P(VOXEL_AXIS), P(VOXEL_AXIS)),
        )
    )


def solve_nonrigid_sharded(
    mesh: Mesh,
    gn_iters: int = 8,
    cg_iters: int = 32,
    damping: float = 1e-4,
):
    """Vertex-sharded non-rigid GN: data residuals/Jacobians are computed on
    each device's vertex shard, JᵀWJ/JᵀWr partials are psum'd over the mesh;
    the (small, replicated) regularization term and the PCG state stay
    replicated. Returns a jitted solver with the solve_nonrigid signature
    minus the hyperparameters."""

    def local(
        node_dq, verts, normals, corrs, corr_mask, nbr_idx, blend_wts,
        pair_i, pair_j, pair_v, pair_scale, pair_mask, lw_dq,
    ):
        M = node_dq.shape[0]

        def one_data(dqs_k, vert, normal, corr, wts_k, lw):
            f = lambda d: data_residual_one(d, vert, normal, corr, wts_k, lw)
            return f(dqs_k), jax.jacfwd(f)(dqs_k)

        def one_reg(di, dj, v, s):
            r = reg_residual_one(di, dj, v, s)
            Ji = jax.jacfwd(reg_residual_one, argnums=0)(di, dj, v, s)
            Jj = jax.jacfwd(reg_residual_one, argnums=1)(di, dj, v, s)
            return r, Ji, Jj

        def energy(x):
            dqs_v = jnp.take(x, nbr_idx, axis=0)
            r_d = jax.vmap(data_residual_one, in_axes=(0, 0, 0, 0, 0, None))(
                dqs_v, verts, normals, corrs, blend_wts, lw_dq
            )
            r_d = jnp.where(corr_mask, r_d, 0.0)
            e_d = jax.lax.psum(jnp.sum(jnp.minimum(r_d**2, 2*jnp.sqrt(jnp.maximum(r_d**2,1.0))-1.0)), VOXEL_AXIS)
            r_r = jax.vmap(reg_residual_one)(
                jnp.take(x, pair_i, axis=0), jnp.take(x, pair_j, axis=0),
                pair_v, pair_scale,
            )
            r_r = jnp.where(pair_mask[:, None], r_r, 0.0)
            z = r_r**2
            e_r = jnp.sum(jnp.where(z <= 1.0, z, 2.0 * jnp.sqrt(jnp.maximum(z, 1.0)) - 1.0))
            return 0.5 * (e_d + e_r)

        red_nbr = make_sorted_reducer(nbr_idx.reshape(-1), M)
        red_pi = make_sorted_reducer(pair_i, M)
        red_pj = make_sorted_reducer(pair_j, M)
        V, k = nbr_idx.shape
        N = V * k

        def psum(x):
            return jax.lax.psum(x, VOXEL_AXIS)

        # channel-major GN step (mirrors solvers/nonrigid.py) with the
        # vertex-sharded data term psum'd over the mesh; the replicated
        # regularization term is computed identically on every device.
        def gn_step(x, _):
            dqs_v = jnp.take(x, nbr_idx, axis=0)
            r_d, J_d = jax.vmap(one_data, in_axes=(0, 0, 0, 0, 0, None))(
                dqs_v, verts, normals, corrs, blend_wts, lw_dq
            )
            r_d = jnp.where(corr_mask, r_d, 0.0)
            J_d = jnp.where(corr_mask[:, None, None], J_d, 0.0)
            w_d = huber_irls_weight(r_d) * corr_mask
            Jd8 = J_d.transpose(2, 0, 1).reshape(8, N)

            r_r, J_ri, J_rj = jax.vmap(one_reg)(
                jnp.take(x, pair_i, axis=0),
                jnp.take(x, pair_j, axis=0),
                pair_v,
                pair_scale,
            )
            r_r = jnp.where(pair_mask[:, None], r_r, 0.0)
            J_ri = jnp.where(pair_mask[:, None, None], J_ri, 0.0)
            J_rj = jnp.where(pair_mask[:, None, None], J_rj, 0.0)
            w_r3 = (huber_irls_weight(r_r) * pair_mask[:, None]).T
            r_r3 = r_r.T
            Ji24 = J_ri.transpose(1, 2, 0).reshape(24, -1)
            Jj24 = J_rj.transpose(1, 2, 0).reshape(24, -1)

            def reg_fold(J24, s3):
                return sum(
                    J24[c * 8 : (c + 1) * 8] * s3[c][None, :] for c in range(3)
                )

            def rep(v):
                return jnp.broadcast_to(v[:, None], (V, k)).reshape(N)

            g_d = psum(red_nbr(Jd8 * rep(w_d * r_d)[None, :]))
            g_r = red_pi(reg_fold(Ji24, w_r3 * r_r3)) + red_pj(
                reg_fold(Jj24, w_r3 * r_r3)
            )
            rhs = -(g_d + g_r)

            def outer64(J8, w_row):
                return jnp.concatenate(
                    [J8[a : a + 1] * J8 * w_row[None, :] for a in range(8)],
                    axis=0,
                )

            blk = psum(red_nbr(outer64(Jd8, rep(w_d))))
            for c in range(3):
                blk = blk + red_pi(
                    outer64(Ji24[c * 8 : (c + 1) * 8], w_r3[c])
                ) + red_pj(outer64(Jj24[c * 8 : (c + 1) * 8], w_r3[c]))
            diag = blk.reshape(8, 8, M)[jnp.arange(8), jnp.arange(8), :]
            lam = damping * (jnp.sum(diag) / (8.0 * M) + 1e-12)
            D = blk.T.reshape(M, 8, 8) + lam * jnp.eye(8)[None, :, :]
            Dinv = jnp.linalg.inv(D)

            def precond(r8):
                return jnp.einsum(
                    "mab,bm->am", Dinv, r8,
                    precision=jax.lax.Precision.HIGHEST,
                )

            nbr_flat0 = nbr_idx.reshape(-1)

            def matvec(p8):
                pg = jnp.take(p8, nbr_flat0, axis=1)
                prod = jnp.sum(Jd8 * pg, axis=0)
                Jp_d = jnp.sum(prod.reshape(V, k), axis=1)
                back_d = psum(red_nbr(Jd8 * rep(w_d * Jp_d)[None, :]))
                pgi = jnp.take(p8, pair_i, axis=1)
                pgj = jnp.take(p8, pair_j, axis=1)
                Jp_r3 = jnp.stack(
                    [
                        jnp.sum(Ji24[c * 8 : (c + 1) * 8] * pgi, axis=0)
                        + jnp.sum(Jj24[c * 8 : (c + 1) * 8] * pgj, axis=0)
                        for c in range(3)
                    ],
                    axis=0,
                )
                s3 = w_r3 * Jp_r3
                back_r = red_pi(reg_fold(Ji24, s3)) + red_pj(
                    reg_fold(Jj24, s3)
                )
                return back_d + back_r + lam * p8

            def cg_body(i, state):
                sol, rvec, z, d, rz = state
                Ad = matvec(d)
                alpha = rz / jnp.maximum(jnp.sum(d * Ad), 1e-30)
                sol = sol + alpha * d
                rvec = rvec - alpha * Ad
                z = precond(rvec)
                rz_new = jnp.sum(rvec * z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                d = z + beta * d
                return sol, rvec, z, d, rz_new

            z0 = precond(rhs)
            state = (jnp.zeros_like(rhs), rhs, z0, z0, jnp.sum(rhs * z0))
            delta8 = jax.lax.fori_loop(0, cg_iters, cg_body, state)[0]
            x_new = x + delta8.T
            better = energy(x_new) <= energy(x)
            return jnp.where(better, x_new, x), None

        cost0 = energy(node_dq)
        x, _ = jax.lax.scan(gn_step, node_dq, None, length=gn_iters)
        return x, cost0, energy(x)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(),            # node_dq (replicated)
                P(VOXEL_AXIS),  # verts
                P(VOXEL_AXIS),  # normals
                P(VOXEL_AXIS),  # corrs
                P(VOXEL_AXIS),  # corr_mask
                P(VOXEL_AXIS),  # nbr_idx
                P(VOXEL_AXIS),  # blend_wts
                P(), P(), P(), P(), P(),  # reg pair arrays (replicated)
                P(),            # lw_dq
            ),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
