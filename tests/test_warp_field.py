"""Warp field: graph construction, DQB skinning, non-rigid TSDF update."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu import ops
from dynamicfusion_body_tpu.models import warp_field as W
import oracles


def make_field(rng, n_nodes=12, capacity=16, spread=8.0):
    verts = (rng.rand(40, 3) * spread).astype(np.float32)
    wf = W.construct_graph(jnp.array(verts), jnp.float32(1.0), capacity)
    return verts, wf


def test_construct_graph_matches_greedy(rng):
    verts = (rng.rand(40, 3) * 8).astype(np.float32)
    want = oracles.radius_subsample_oracle(verts, 1.0)
    wf = W.construct_graph(jnp.array(verts), jnp.float32(1.0), 64)
    n = int(wf.num_active)
    assert n == len(want)
    np.testing.assert_array_equal(np.asarray(wf.node_vert_idx)[:n], want)
    np.testing.assert_allclose(np.asarray(wf.node_pos)[:n], verts[want])
    np.testing.assert_allclose(np.asarray(wf.node_w)[:n], 2.0)


def test_warp_points_vs_oracle(rng):
    verts, wf = make_field(rng)
    # randomize node DQs away from identity
    n = int(wf.num_active)
    dqs = rng.randn(wf.capacity, 8).astype(np.float32) * 0.1
    dqs[:, 0] += 1.0
    wf = wf.replace(node_dq=jnp.array(dqs))
    lw = np.array([1.0, 0, 0, 0, 0, 0.05, 0, 0], np.float32)

    k = 4
    nbr = W.neighbor_lookup(wf, jnp.array(verts), k)
    normals = rng.randn(40, 3).astype(np.float32)
    p, nm = W.warp_points(wf, jnp.array(verts), nbr, normals=jnp.array(normals),
                          m_lw=jnp.array(lw))
    p = np.asarray(p)
    nm = np.asarray(nm)

    node_pos = np.asarray(wf.node_pos)[:n]
    node_w = np.asarray(wf.node_w)[:n]
    for i in range(len(verts)):
        d = np.linalg.norm(node_pos - verts[i], axis=1)
        order = np.argsort(d)[:k]
        np.testing.assert_array_equal(sorted(np.asarray(nbr)[i]), sorted(order))
        se3 = oracles.dq_blend_oracle(
            verts[i], node_pos[order], dqs[order], node_w[order])
        want = oracles.dq_point(lw.astype(np.float64), oracles.dq_point(se3, verts[i]))
        np.testing.assert_allclose(p[i], want, atol=1e-4)
        want_n = oracles.dq_normal(lw.astype(np.float64),
                                   oracles.dq_normal(se3, normals[i]))
        np.testing.assert_allclose(nm[i], want_n, atol=1e-4)


def test_update_tsdf_nonrigid_vs_reference_loop(rng):
    """Small-grid parity with a literal transcription of
    Fusion.updateTSDF (core/fusion.py:171-198)."""
    res, k, tdist, wmax = 8, 3, 0.5, 100.0
    verts = (rng.rand(30, 3) * (res - 1)).astype(np.float32)
    wf = W.construct_graph(jnp.array(verts), jnp.float32(1.2), 32)
    n = int(wf.num_active)
    dqs = (rng.randn(32, 8) * 0.05).astype(np.float32)
    dqs[:, 0] += 1.0
    wf = wf.replace(node_dq=jnp.array(dqs))
    lw = np.array([1.0, 0, 0, 0, 0, 0.02, 0.01, 0], np.float32)
    live = rng.uniform(-1, 1, (res, res, res)).astype(np.float32)
    vals0 = rng.uniform(-0.4, 0.5, (res, res, res)).astype(np.float32)
    wts0 = np.where(rng.rand(res, res, res) < 0.3, 0.0,
                    rng.rand(res, res, res) * 5).astype(np.float32)

    got_v, got_w, _, _ = W.update_tsdf_nonrigid(
        jnp.array(vals0), jnp.array(wts0), jnp.array(live), wf, jnp.array(lw),
        k=k, tdist=tdist, wmax=wmax, brick=4, n_candidates=n)
    got_v, got_w = np.asarray(got_v), np.asarray(got_w)

    node_pos = np.asarray(wf.node_pos)[:n].astype(np.float64)
    node_w = np.asarray(wf.node_w)[:n].astype(np.float64)
    ndqs = dqs[:n].astype(np.float64)
    want_v, want_w = vals0.copy().astype(np.float64), wts0.copy().astype(np.float64)
    for x in range(res):
        for y in range(res):
            for z in range(res):
                pos = np.array([x, y, z], np.float64)
                d = np.linalg.norm(node_pos - pos, axis=1)
                order = np.argsort(d)[:k]
                se3 = oracles.dq_blend_oracle(
                    pos, node_pos[order], ndqs[order], node_w[order])
                wp = oracles.dq_point(lw.astype(np.float64),
                                      oracles.dq_point(se3, pos))
                tl = oracles.trilerp_oracle(wp, live)
                if tl is None or tl <= -tdist:
                    continue
                wi = float(np.mean(d[order]))
                wi_t = want_w[x, y, z]
                if wi_t == 0:
                    wi_t = wi
                want_v[x, y, z] = (want_v[x, y, z] * wi_t
                                   + min(tdist, tl) * wi) / (wi + wi_t)
                want_w[x, y, z] = min(wi + wi_t, wmax)

    np.testing.assert_allclose(got_v, want_v, atol=2e-4)
    np.testing.assert_allclose(got_w, want_w, atol=2e-4)


def test_update_tsdf_warp_cache_exact(rng):
    """The kNN-selection cache path must be BIT-IDENTICAL to the computed
    path: selection slots, Gaussian weights, and wi depend only on node
    positions (build_warp_cache docstring), and the cached blend rebuilds
    the same wsel matrix, so values/weights must match exactly."""
    res, k, tdist, wmax = 16, 3, 0.5, 100.0
    verts = (rng.rand(60, 3) * (res - 1)).astype(np.float32)
    wf = W.construct_graph(jnp.array(verts), jnp.float32(1.2), 64)
    dqs = (rng.randn(64, 8) * 0.05).astype(np.float32)
    dqs[:, 0] += 1.0
    wf = wf.replace(node_dq=jnp.array(dqs))
    lw = jnp.array([1.0, 0, 0, 0, 0, 0.02, 0.01, 0], jnp.float32)
    live = jnp.asarray(
        rng.uniform(-1, 1, (res, res, res)).astype(np.float32))
    vals0 = jnp.asarray(
        rng.uniform(-0.4, 0.5, (res, res, res)).astype(np.float32))
    wts0 = jnp.asarray(np.where(
        rng.rand(res, res, res) < 0.3, 0.0,
        rng.rand(res, res, res) * 5).astype(np.float32))

    brick, C = 4, 16
    base_v, base_w, _, _ = W.update_tsdf_nonrigid(
        vals0, wts0, live, wf, lw, k=k, tdist=tdist, wmax=wmax,
        brick=brick, n_candidates=C)

    cand, risk = W.brick_candidates_2level(
        wf, (res,) * 3, brick, C, with_risk=True, risk_k=k)
    wc = W.build_warp_cache(wf, (res,) * 3, cand, k, brick)
    got_v, got_w, _, _ = W.update_tsdf_nonrigid(
        vals0, wts0, live, wf, lw, k=k, tdist=tdist, wmax=wmax,
        brick=brick, n_candidates=C, cand_cache=(cand, risk),
        warp_cache=wc)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(base_v))
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(base_w))


def test_update_graph_inserts_unsupported(rng):
    # nodes cover a cluster at origin; vertices appear far away → new nodes
    verts0 = (rng.rand(20, 3)).astype(np.float32)
    wf = W.construct_graph(jnp.array(verts0), jnp.float32(0.5), 32)
    n0 = int(wf.num_active)
    far = verts0 + np.array([10.0, 0, 0], np.float32)
    allv = np.concatenate([verts0, far]).astype(np.float32)
    wf2, n_dropped = W.update_graph(
        wf, jnp.array(allv), jnp.ones(len(allv), bool), k=3
    )
    assert int(n_dropped) == 0
    n1 = int(wf2.num_active)
    assert n1 > n0
    # new nodes anchor in the far cluster
    newpos = np.asarray(wf2.node_pos)[n0:n1]
    assert np.all(newpos[:, 0] > 5.0)
    # new node DQs are blends of existing field = near-init DQ here
    newdq = np.asarray(wf2.node_dq)[n0:n1]
    ref = np.asarray(W.INIT_NODE_DQ) / np.linalg.norm(np.asarray(W.INIT_NODE_DQ))
    np.testing.assert_allclose(newdq, np.broadcast_to(ref, newdq.shape), atol=1e-5)


def test_brick_candidates_2level_matches_flat(rng):
    """The hierarchical candidate search must reproduce the flat search
    for a surface-like node distribution at the reference's sampling
    density (pool covers several node radii around every voxel)."""
    # nodes on a sphere shell inside a 64³ volume, ~3-voxel spacing
    n = 800
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (32 + d * 22 + rng.randn(n, 3) * 0.5).astype(np.float32)
    wf = W.construct_graph(jnp.asarray(pts), jnp.float32(3.0), 1024)
    flat = np.asarray(
        W.brick_candidates(wf, (64, 64, 64), 8, 8)
    )
    two = np.asarray(
        W.brick_candidates_2level(wf, (64, 64, 64), 8, 8)
    )
    assert flat.shape == two.shape == (512, 8)
    # identical candidate SETS per brick (order may differ on exact ties)
    same = [set(flat[i]) == set(two[i]) for i in range(512)]
    assert np.mean(same) > 0.999, np.mean(same)
