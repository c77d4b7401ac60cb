"""Sharded execution on the 8-virtual-device CPU mesh: results must match
the single-chip kernels exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamicfusion_body_tpu.models.tsdf_volume import fuse_depth
from dynamicfusion_body_tpu.models import warp_field as W
from dynamicfusion_body_tpu.parallel.mesh import make_mesh, VOXEL_AXIS
from dynamicfusion_body_tpu.parallel import sharded
from dynamicfusion_body_tpu.solvers.nonrigid import make_reg_pairs, solve_nonrigid
from jax.sharding import NamedSharding, PartitionSpec as P


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _vol_put(mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P(VOXEL_AXIS, None, None)))


def test_fuse_depth_sharded_matches_single(rng):
    mesh = make_mesh(8)
    res, tdist = 32, 0.1
    K = np.array([[200.0, 0, 32], [0, 200, 32], [0, 0, 1]], np.float32)
    ind = np.eye(4, dtype=np.float32)
    ind[0, 0] = ind[1, 1] = ind[2, 2] = 0.02
    ind[:3, 3] = [-0.3, -0.3, 4.5]
    proj = jnp.asarray(K @ np.eye(4, dtype=np.float32)[:3] @ ind)
    kinv = jnp.asarray(np.linalg.inv(K).astype(np.float32))
    depth = jnp.asarray(-(4.5 + 0.01 * rng.rand(64, 64)).astype(np.float32))

    v0 = jnp.full((res, res, res), tdist, jnp.float32)
    w0 = jnp.zeros((res, res, res), jnp.float32)
    want_v, want_w = fuse_depth(v0, w0, depth, proj, kinv, tdist)

    fuse = sharded.fuse_depth_sharded(mesh, tdist)
    got_v, got_w = fuse(_vol_put(mesh, v0), _vol_put(mesh, w0), depth, proj, kinv)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w), atol=1e-6)


def test_update_nonrigid_sharded_matches_single(rng):
    mesh = make_mesh(8)
    res, k, tdist = 32, 3, 0.3
    verts = (rng.rand(40, 3) * (res - 1)).astype(np.float32)
    wf = W.construct_graph(jnp.array(verts), jnp.float32(3.0), 32)
    dqs = (rng.randn(32, 8) * 0.05).astype(np.float32)
    dqs[:, 0] += 1.0
    wf = wf.replace(node_dq=jnp.array(dqs))
    lw = jnp.array([1.0, 0, 0, 0, 0, 0.02, 0, 0])
    live = jnp.asarray(rng.uniform(-1, 1, (res, res, res)).astype(np.float32))
    v0 = jnp.asarray(rng.uniform(-0.2, 0.3, (res, res, res)).astype(np.float32))
    w0 = jnp.asarray((rng.rand(res, res, res) * 4).astype(np.float32))

    want_v, want_w, _, _ = W.update_tsdf_nonrigid(
        v0, w0, live, wf, lw, k=k, tdist=tdist, brick=4, n_candidates=16)

    upd = sharded.update_tsdf_nonrigid_sharded(
        mesh, k=k, tdist=tdist, brick=4, n_candidates=16)
    got_v, got_w, _, _ = upd(_vol_put(mesh, v0), _vol_put(mesh, w0), live, wf, lw)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w), atol=1e-5)


def test_solve_nonrigid_sharded_matches_single(rng):
    mesh = make_mesh(8)
    n_verts, k = 160, 3
    verts = rng.randn(n_verts, 3).astype(np.float32)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    verts *= 2.0
    normals = (verts / 2.0).astype(np.float32)
    wf = W.construct_graph(jnp.array(verts), jnp.float32(1.0), 16)
    nbr = W.neighbor_lookup(wf, jnp.array(verts), k)
    npos = np.asarray(wf.node_pos)[np.asarray(nbr)]
    nw = np.asarray(wf.node_w)[np.asarray(nbr)]
    d = np.linalg.norm(verts[:, None, :] - npos, axis=-1)
    wts = np.exp(-((d / (2 * nw)) ** 2)).astype(np.float32)
    corrs = (verts + np.array([0.05, 0.02, -0.01], np.float32)).astype(np.float32)
    lw = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0])
    pair_i, pair_j, pair_scale, pair_mask = make_reg_pairs(
        wf.node_vert_idx, jnp.array(nbr), wf.node_w, wf.active, jnp.float32(0.3))
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)

    # the sharded solver now assembles the SAME block-ELL normal matrix
    # as single-chip (global slot dictionary from the all-gathered
    # coupling graph + psum'd block table, make_block_ell_sharded), so
    # the apples-to-apples single-chip reference is the ELL path
    want_x, want_c0_raw, want_c0, want_c1, _, _ = solve_nonrigid(
        wf.node_dq, jnp.array(verts), jnp.array(normals), jnp.array(corrs),
        jnp.ones(n_verts, bool), jnp.array(nbr), jnp.array(wts),
        pair_i, pair_j, pair_v, pair_scale, pair_mask, lw,
        gn_iters=3, cg_iters=12, use_ell=True)

    vs = NamedSharding(mesh, P(VOXEL_AXIS))
    solver = sharded.solve_nonrigid_sharded(mesh, gn_iters=3, cg_iters=12)
    got_x, got_c0_raw, got_c0, got_c1, _, _ = solver(
        wf.node_dq,
        jax.device_put(jnp.array(verts), vs),
        jax.device_put(jnp.array(normals), vs),
        jax.device_put(jnp.array(corrs), vs),
        jax.device_put(jnp.ones(n_verts, bool), vs),
        jax.device_put(jnp.array(nbr), vs),
        jax.device_put(jnp.array(wts), vs),
        pair_i, pair_j, pair_v, pair_scale, pair_mask, lw)

    np.testing.assert_allclose(float(got_c0), float(want_c0), rtol=1e-5)
    np.testing.assert_allclose(float(got_c0_raw), float(want_c0_raw), rtol=1e-5)
    np.testing.assert_allclose(float(got_c1), float(want_c1), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x), atol=5e-4)
