"""Projective TSDF fusion vs the NumPy transcription of the reference
OpenCL kernel (core/fusion_dm.py:630-673)."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.models.tsdf_volume import (
    TsdfVolume,
    fuse_depth,
    update_tsdf_rigid,
)
import oracles


def make_camera():
    K = np.array([[200.0, 0, 32], [0, 200, 32], [0, 0, 1]])
    return K, np.linalg.inv(K)


def synth_depth(h=64, w=64, z0=5.0):
    """Negative-depth map of a slanted plane with a hole (zero depth)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    d = z0 + 0.01 * xx + 0.005 * yy
    d[10:14, 10:14] = 0.0
    return (-d).astype(np.float32)


def test_fuse_depth_matches_opencl_oracle():
    K, Kinv = make_camera()
    res, tdist, wmax = 8, 0.2, 100.0
    # grid→world: center a small cube in front of the camera
    ind = np.eye(4)
    ind[0, 0] = ind[1, 1] = ind[2, 2] = 0.1
    ind[:3, 3] = np.array([-0.4, -0.4, 4.8])
    lw = np.eye(4)[:3]  # identity extrinsic
    lw4 = np.eye(4)
    proj = (K @ lw4[:3] @ ind).astype(np.float32)

    depth = synth_depth()
    tsdf0 = np.full((res, res, res), tdist, np.float32)
    w0 = np.zeros((res, res, res), np.float32)
    # fuse twice to exercise the running average + weight path
    want_v, want_w = oracles.fuse_depth_oracle(
        tsdf0.astype(np.float64), w0.astype(np.float64),
        depth.astype(np.float64), proj.astype(np.float64), Kinv, tdist, wmax)
    want_v, want_w = oracles.fuse_depth_oracle(
        want_v, want_w, depth.astype(np.float64), proj.astype(np.float64),
        Kinv, tdist, wmax)

    got_v, got_w = fuse_depth(
        jnp.array(tsdf0), jnp.array(w0), jnp.array(depth), jnp.array(proj),
        jnp.array(Kinv, dtype=jnp.float32), tdist, wmax)
    got_v, got_w = fuse_depth(
        got_v, got_w, jnp.array(depth), jnp.array(proj),
        jnp.array(Kinv, dtype=jnp.float32), tdist, wmax)

    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_w), want_w, atol=1e-6)
    assert np.asarray(got_w).max() == 2.0  # some voxels were updated twice


def test_fuse_depth_weight_clamp():
    K, Kinv = make_camera()
    res, tdist = 4, 0.2
    ind = np.eye(4)
    ind[0, 0] = ind[1, 1] = ind[2, 2] = 0.1
    ind[:3, 3] = np.array([-0.2, -0.2, 4.9])
    proj = (K @ np.eye(4)[:3] @ ind).astype(np.float32)
    depth = synth_depth()
    v = jnp.full((res, res, res), tdist)
    w = jnp.zeros((res, res, res))
    for _ in range(5):
        v, w = fuse_depth(v, w, jnp.array(depth), jnp.array(proj),
                          jnp.array(Kinv, dtype=jnp.float32), tdist, wmax=3.0)
    assert float(jnp.max(w)) <= 3.0


def test_update_tsdf_rigid_identity():
    # With identity warp, fusing a live TSDF into an empty canonical volume
    # (weights 0) must produce exactly min(tdist, live) where live > -tdist.
    tdist = 0.5
    rng = np.random.RandomState(1)
    live = rng.uniform(-1.0, 1.0, (6, 6, 6)).astype(np.float32)
    vals = np.full((6, 6, 6), tdist, np.float32)
    w = np.zeros((6, 6, 6), np.float32)
    ident = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0])
    got_v, got_w = update_tsdf_rigid(
        jnp.array(vals), jnp.array(w), jnp.array(live), ident, tdist)
    got_v = np.asarray(got_v)
    upd = live > -tdist
    np.testing.assert_allclose(got_v[upd], np.minimum(tdist, live)[upd], atol=1e-6)
    np.testing.assert_allclose(got_v[~upd], tdist, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_w), upd.astype(np.float32))


def test_volume_grid_world_roundtrip():
    vol = TsdfVolume.create(8, 0.2, ind=jnp.array(
        [[0.1, 0, 0, -1.0], [0, 0.1, 0, 2.0], [0, 0, 0.1, 3.0], [0, 0, 0, 1.0]]))
    p = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
    back = vol.world_to_grid(vol.grid_to_world(p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)


def test_fuse_depth_multi_bricks_matches_sequential():
    """Multi-view Pallas kernel (interpret) ≡ sequential XLA fuse_depth,
    including the hole-carve, truncation, and WMAX-clamp paths."""
    from dynamicfusion_body_tpu.ops.bricks import vol_from_bricks, vol_to_bricks
    from dynamicfusion_body_tpu.ops.fusion_pallas import (
        fuse_depth_multi_bricks,
        fuse_depth_multi_supported,
    )

    K = np.array([[200.0, 0, 64], [0, 200, 32], [0, 0, 1]])
    Kinv = np.linalg.inv(K)
    res, tdist, wmax = 16, 0.2, 100.0
    ind = np.eye(4)
    ind[0, 0] = ind[1, 1] = ind[2, 2] = 0.05
    ind[:3, 3] = np.array([-0.4, -0.4, 4.8])

    h, w = 64, 128
    assert fuse_depth_multi_supported((res,) * 3, (h, w), 8)
    rng = np.random.RandomState(3)
    depths, projs = [], []
    for i in range(3):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        d = 5.0 + 0.01 * xx + 0.005 * yy + 0.1 * i
        d[20:24, 30:34] = 0.0  # hole carves free space
        depths.append((-d).astype(np.float32))
        lw4 = np.eye(4)
        lw4[:3, 3] = rng.randn(3) * 0.02
        projs.append((K @ lw4[:3] @ ind).astype(np.float32))

    v = np.full((res, res, res), tdist, np.float32)
    wts = np.zeros((res, res, res), np.float32)
    want_v, want_w = jnp.asarray(v), jnp.asarray(wts)
    for d, p in zip(depths, projs):
        want_v, want_w = fuse_depth(
            want_v, want_w, jnp.asarray(d), jnp.asarray(p),
            jnp.asarray(Kinv, dtype=jnp.float32), tdist, wmax)

    got_vb, got_wb, esc = fuse_depth_multi_bricks(
        vol_to_bricks(jnp.asarray(v), 8), vol_to_bricks(jnp.asarray(wts), 8),
        jnp.asarray(np.stack(depths)), jnp.asarray(np.stack(projs)),
        jnp.asarray(Kinv[2], dtype=jnp.float32),
        vol_shape=(res,) * 3, brick=8, tdist=tdist, wmax=wmax,
        interpret=True,
    )
    assert int(esc) == 0
    got_v = vol_from_bricks(got_vb, (res,) * 3, 8)
    got_w = vol_from_bricks(got_wb, (res,) * 3, 8)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               atol=1e-6)
    # hi/lo-split bf16 sampling: ~2⁻¹⁶ of the metre-scale depths
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               atol=5e-4)
