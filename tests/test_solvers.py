"""Solvers: rigid DQ pose GN and non-rigid warp-field GN+PCG.

Ground-truth-recovery tests: synthesize a known rigid / non-rigid motion,
generate perfect correspondences, and check the solvers drive the
point-to-plane energy to ~0 and recover the motion.
"""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu import ops
from dynamicfusion_body_tpu.solvers import (
    nonrigid_energy,
    make_reg_pairs,
    solve_nonrigid,
    solve_rigid,
)
from dynamicfusion_body_tpu.models import warp_field as W
import oracles


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def make_surface(rng, n=200):
    """Points + normals on a unit sphere."""
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32), v.astype(np.float32)  # normal == position


def test_rigid_recovers_known_pose(rng):
    pts, normals = make_surface(rng)
    M = np.eye(4)
    M[:3, :3] = rot_z(0.3)
    M[:3, 3] = [0.05, -0.02, 0.1]
    gt_dq = np.asarray(ops.se3_to_dq(jnp.array(M, dtype=jnp.float32)))
    corrs = pts @ M[:3, :3].T + M[:3, 3]

    x0 = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0])
    mask = jnp.ones(len(pts), bool)
    x, cost = solve_rigid(x0, jnp.array(pts), jnp.array(normals),
                          jnp.array(corrs), mask, iterations=15)
    assert float(cost) < 1e-8
    # the recovered warp maps points onto the targets
    warped = np.asarray(ops.dq_transform_point(x, jnp.array(pts)))
    np.testing.assert_allclose(warped, corrs, atol=1e-3)


def test_rigid_respects_mask(rng):
    pts, normals = make_surface(rng)
    corrs = pts + np.array([0.1, 0, 0], np.float32)
    # corrupt half the correspondences but mask them out
    corrs2 = corrs.copy()
    corrs2[::2] += 100.0
    mask = np.zeros(len(pts), bool)
    mask[1::2] = True
    x, cost = solve_rigid(
        jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0]), jnp.array(pts),
        jnp.array(normals), jnp.array(corrs2), jnp.array(mask), iterations=10)
    warped = np.asarray(ops.dq_transform_point(x, jnp.array(pts[1::2])))
    np.testing.assert_allclose(warped, corrs[1::2], atol=1e-3)


def _build_nonrigid_problem(rng, n_verts=120, capacity=16, k=3):
    verts, normals = make_surface(rng, n_verts)
    verts = verts * 2.0
    wf = W.construct_graph(jnp.array(verts), jnp.float32(1.0), capacity)
    nbr = W.neighbor_lookup(wf, jnp.array(verts), k)
    # Gaussian blend weights (constant during solve)
    npos = np.asarray(wf.node_pos)[np.asarray(nbr)]
    nw = np.asarray(wf.node_w)[np.asarray(nbr)]
    d = np.linalg.norm(verts[:, None, :] - npos, axis=-1)
    wts = np.exp(-((d / (2 * nw)) ** 2)).astype(np.float32)
    return verts, normals, wf, np.asarray(nbr), wts


def test_nonrigid_recovers_smooth_motion(rng):
    k = 3
    verts, normals, wf, nbr, wts = _build_nonrigid_problem(rng)
    n_active = int(wf.num_active)

    # ground-truth: a global small rigid motion expressed per node (smooth
    # ⇒ representable by the graph exactly)
    M = np.eye(4)
    M[:3, :3] = rot_z(0.15)
    M[:3, 3] = [0.05, 0.03, -0.04]
    gt_dq = np.asarray(ops.se3_to_dq(jnp.array(M, dtype=jnp.float32)))
    corrs = verts @ M[:3, :3].T + M[:3, 3]

    lw = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0])
    pair_i, pair_j, pair_scale, pair_mask = make_reg_pairs(
        wf.node_vert_idx, jnp.array(nbr), wf.node_w, wf.active,
        jnp.float32(0.1))
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)

    x0 = wf.node_dq
    data_args = (jnp.array(verts), jnp.array(normals), jnp.array(corrs),
                 jnp.ones(len(verts), bool), jnp.array(nbr), jnp.array(wts))
    reg_args = (pair_i, pair_j, pair_v, pair_scale, pair_mask)
    c0 = float(nonrigid_energy(x0, data_args, reg_args, lw))

    x, cost0_raw, cost0, cost1 = solve_nonrigid(
        x0, *data_args, pair_i, pair_j, pair_v, pair_scale, pair_mask, lw,
        gn_iters=12, cg_iters=48)
    assert abs(float(cost0) - c0) < 1e-5
    c0_raw = float(nonrigid_energy(x0, data_args, reg_args, lw, robust=False))
    assert abs(float(cost0_raw) - c0_raw) < 1e-5
    assert float(cost1) < 0.02 * c0, (float(cost0), float(cost1))

    # warped vertices land on the target planes (point-to-plane energy
    # leaves tangential sliding free, so compare plane distance, not
    # position)
    xdq = np.asarray(x)
    tgt_normals = normals @ rot_z(0.15).T
    for i in range(0, len(verts), 10):
        se3 = np.zeros(8)
        for kk in range(k):
            se3 += wts[i, kk] * xdq[nbr[i, kk]]
        se3 = se3 / np.linalg.norm(se3)
        p = oracles.dq_point(se3, verts[i])
        plane_err = abs(np.dot(tgt_normals[i], p - corrs[i]))
        assert plane_err < 0.01, (i, plane_err)


def test_nonrigid_inactive_nodes_untouched(rng):
    verts, normals, wf, nbr, wts = _build_nonrigid_problem(rng)
    n_active = int(wf.num_active)
    corrs = verts + np.array([0.02, 0, 0], np.float32)
    lw = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0])
    pair_i, pair_j, pair_scale, pair_mask = make_reg_pairs(
        wf.node_vert_idx, jnp.array(nbr), wf.node_w, wf.active,
        jnp.float32(0.1))
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)
    x, _, _, _ = solve_nonrigid(
        wf.node_dq, jnp.array(verts), jnp.array(normals), jnp.array(corrs),
        jnp.ones(len(verts), bool), jnp.array(nbr), jnp.array(wts),
        pair_i, pair_j, pair_v, pair_scale, pair_mask, lw,
        gn_iters=4, cg_iters=16)
    # pool slots beyond num_active receive no residuals → unchanged
    np.testing.assert_allclose(
        np.asarray(x)[n_active:], np.asarray(wf.node_dq)[n_active:])
