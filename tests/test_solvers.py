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

    x, cost0_raw, cost0, cost1, _, _ = solve_nonrigid(
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
    x, _, _, _, _, _ = solve_nonrigid(
        wf.node_dq, jnp.array(verts), jnp.array(normals), jnp.array(corrs),
        jnp.ones(len(verts), bool), jnp.array(nbr), jnp.array(wts),
        pair_i, pair_j, pair_v, pair_scale, pair_mask, lw,
        gn_iters=4, cg_iters=16)
    # pool slots beyond num_active receive no residuals → unchanged
    np.testing.assert_allclose(
        np.asarray(x)[n_active:], np.asarray(wf.node_dq)[n_active:])


def test_ell_matvec_matches_row_path(rng):
    """use_ell=True (block-ELL assembled normal matrix) must reproduce the
    row-layout matvec solve: same energies, same warp field (up to CG
    summation-order fp noise)."""
    verts, normals, wf, nbr, wts = _build_nonrigid_problem(rng)
    M = rot_z(0.12)
    corrs = (verts @ M.T + np.array([0.03, -0.02, 0.05])).astype(np.float32)
    lw = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0])
    pair_i, pair_j, pair_scale, pair_mask = make_reg_pairs(
        wf.node_vert_idx, jnp.array(nbr), wf.node_w, wf.active,
        jnp.float32(0.1))
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)
    args = (wf.node_dq, jnp.array(verts), jnp.array(normals),
            jnp.array(corrs), jnp.ones(len(verts), bool), jnp.array(nbr),
            jnp.array(wts), pair_i, pair_j, pair_v, pair_scale, pair_mask,
            lw)
    x_e, _, c0_e, c1_e, _, _ = solve_nonrigid(*args, gn_iters=6,
                                              cg_iters=24, use_ell=True)
    x_r, _, c0_r, c1_r, _, _ = solve_nonrigid(*args, gn_iters=6,
                                              cg_iters=24, use_ell=False)
    assert abs(float(c0_e) - float(c0_r)) < 1e-5
    # both drive the energy to ~0; compare on the initial-cost scale
    # (at ~1e-7 absolute the two CG summation orders differ in noise)
    np.testing.assert_allclose(float(c1_e), float(c1_r),
                               atol=1e-4 * float(c0_e))
    # raw node DQs (and even warped positions) are gauge-underdetermined:
    # point-to-plane leaves tangential sliding free, so different CG
    # summation orders reach different equivalent minima. The invariant
    # is the point-to-plane distance to the targets — both paths must
    # drive it to ~0. (Operator exactness is asserted block-by-block in
    # test_ell_assembly_matches_dense_normal_matrix.)
    import oracles
    tgt_normals = normals @ M.T

    def plane_err(xdq):
        xv = np.asarray(xdq)[nbr]                      # (V, k, 8)
        se3 = (wts[:, :, None] * xv).sum(1)
        se3 /= np.linalg.norm(se3, axis=1, keepdims=True) + 1e-30
        errs = [abs(np.dot(tgt_normals[i],
                           oracles.dq_point(se3[i], verts[i]) - corrs[i]))
                for i in range(0, len(verts), 7)]
        return max(errs)

    # same convergence threshold as test_nonrigid_recovers_smooth_motion
    # (gn6/cg24 with reg 0.1 settles near 5e-3), and the two paths must
    # land at the same level
    pe_e, pe_r = plane_err(x_e), plane_err(x_r)
    assert pe_e < 0.01, pe_e
    assert pe_r < 0.01, pe_r
    assert abs(pe_e - pe_r) < 5e-3, (pe_e, pe_r)


def test_ell_degree_cap_covers_knn_graphs(rng):
    """The coupling degree of a kNN-induced sparsity stays far below
    ELL_DEGREE_CAP (measured 12 max at the 256^3 bench graph); overflow
    is counted, not silent."""
    from dynamicfusion_body_tpu.solvers.nonrigid import (
        ELL_DEGREE_CAP, make_block_ell,
    )

    verts, normals, wf, nbr, wts = _build_nonrigid_problem(
        rng, n_verts=400, capacity=64)
    Mcap = wf.capacity
    pair_i, pair_j, pair_scale, pair_mask = make_reg_pairs(
        wf.node_vert_idx, jnp.array(nbr), wf.node_w, wf.active,
        jnp.float32(0.1))
    _, _, _, _, n_over = make_block_ell(
        jnp.array(nbr), jnp.ones(len(verts), bool), pair_i, pair_j,
        pair_mask, Mcap, ELL_DEGREE_CAP)
    assert int(n_over) == 0
    # a deliberately tiny cap overflows LOUDLY (counted)
    _, _, _, _, n_over2 = make_block_ell(
        jnp.array(nbr), jnp.ones(len(verts), bool), pair_i, pair_j,
        pair_mask, Mcap, 2)
    assert int(n_over2) > 0


def test_ell_assembly_matches_dense_normal_matrix(rng):
    """The assembled block-ELL operator equals the dense JtWJ it encodes:
    multiply both against random vectors (tiny problem, brute-force
    oracle)."""
    from dynamicfusion_body_tpu.solvers.nonrigid import (
        make_block_ell,
    )

    V, Mn, k = 40, 8, 2
    nbr = rng.randint(0, Mn, size=(V, k)).astype(np.int32)
    J = rng.randn(V, k, 8).astype(np.float32)
    w = rng.rand(V).astype(np.float32)
    cmask = rng.rand(V) > 0.2
    # no reg rows: empty pair lists exercise the static shapes
    pair_i = jnp.zeros((0,), jnp.int32)
    pair_j = jnp.zeros((0,), jnp.int32)
    pair_mask = jnp.zeros((0,), bool)
    D = 16
    reduce_ell, ell_nbr, self_ids, self_present, n_over = make_block_ell(
        jnp.array(nbr), jnp.array(cmask), pair_i, pair_j, pair_mask, Mn, D)
    assert int(n_over) == 0

    # dense oracle H (8M x 8M)
    H = np.zeros((Mn, 8, Mn, 8), np.float64)
    for v in range(V):
        if not cmask[v]:
            continue
        for a in range(k):
            for b in range(k):
                H[nbr[v, a], :, nbr[v, b], :] += w[v] * np.outer(
                    J[v, a], J[v, b])

    # chunk-major contribution order (one (ka, kb) chunk of V rows at a
    # time) — must match make_block_ell's enumeration
    Jw = (jnp.array(J) * jnp.array(w)[:, None, None]).transpose(1, 2, 0)
    JdT = jnp.array(J).transpose(1, 2, 0)
    contrib = jnp.concatenate(
        [(Jw[ka][:, None, :] * JdT[kb][None, :, :]).reshape(64, V)
         for ka in range(k) for kb in range(k)], axis=1)
    blocks64 = reduce_ell(contrib)
    Bl = np.asarray(blocks64).T.reshape(Mn, D, 8, 8)
    nbr_ell = np.asarray(ell_nbr).reshape(Mn, D)

    p = rng.randn(8, Mn).astype(np.float32)
    out = np.zeros((8, Mn))
    for m in range(Mn):
        for d in range(D):
            out[:, m] += Bl[m, d] @ p[:, nbr_ell[m, d]]
    ref = np.einsum("manb,bn->am", H, p)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    # diagonal extraction: self slots hold H[m, :, m, :]
    diag = np.asarray(blocks64)[:, np.asarray(self_ids)] * np.asarray(
        self_present)[None, :]
    for m in range(Mn):
        np.testing.assert_allclose(
            diag[:, m].reshape(8, 8), H[m, :, m, :], rtol=2e-4, atol=2e-4)
