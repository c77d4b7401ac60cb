"""Transform toolkit + full-state checkpoint tests."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.ops import transforms as T
from dynamicfusion_body_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from dynamicfusion_body_tpu.models.tsdf_volume import TsdfVolume
from dynamicfusion_body_tpu.models import warp_field as W


def test_rotation_matrix_basic():
    R = T.rotation_matrix(np.pi / 2, [0, 0, 1])
    np.testing.assert_allclose(R[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    # about a point: that point is fixed
    Rp = T.rotation_matrix(0.7, [0, 1, 0], point=[1.0, 2.0, 3.0])
    p = np.array([1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(Rp @ p, p, atol=1e-12)


def test_euler_roundtrip(rng):
    angles = (0.3, -0.5, 1.1)
    M = T.euler_matrix(*angles)
    got = T.euler_from_matrix(M)
    np.testing.assert_allclose(got, angles, atol=1e-10)


def test_random_rotation_is_rotation(rng):
    M = T.random_rotation_matrix(rng)
    R = M[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1) < 1e-5
    assert M.shape == (4, 4) and M[3, 3] == 1.0


def test_quaternion_matrix_roundtrip(rng):
    q = T.random_quaternion(rng)
    M = T.quaternion_matrix(q)
    q2 = T.quaternion_from_matrix(M)
    # sign convention w>=0
    if q[0] < 0:
        q = -q
    np.testing.assert_allclose(q2, q, atol=1e-5)
    assert T.is_same_transform(M, T.quaternion_matrix(q2), atol=1e-5)


def test_arcball_drag():
    ball = T.Arcball()
    ball.place([100, 100], 100)
    ball.down([100, 100])
    ball.drag([150, 100])
    M = ball.matrix()
    R = M[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert not np.allclose(R, np.eye(3))


def test_checkpoint_roundtrip(tmp_path, rng):
    vol = TsdfVolume.create(8, 0.2)
    vol = vol.replace(values=jnp.asarray(rng.randn(8, 8, 8).astype(np.float32)))
    verts = (rng.rand(20, 3) * 7).astype(np.float32)
    wf = W.construct_graph(jnp.array(verts), jnp.float32(1.0), 16)
    lw = jnp.asarray(rng.randn(8).astype(np.float32))
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, vol, wf, lw, itercounter=7, extra={"foo": [1, 2, 3]})
    vol2, wf2, lw2, it, extra = load_checkpoint(p)
    np.testing.assert_allclose(np.asarray(vol2.values), np.asarray(vol.values))
    np.testing.assert_allclose(np.asarray(wf2.node_pos), np.asarray(wf.node_pos))
    np.testing.assert_allclose(np.asarray(lw2), np.asarray(lw))
    assert it == 7
    np.testing.assert_array_equal(extra["foo"], [1, 2, 3])
    # resumed state is usable: warp a point
    from dynamicfusion_body_tpu.ops.knn import knn
    from dynamicfusion_body_tpu.models.warp_field import warp_points

    q = jnp.array([[1.0, 1.0, 1.0]])
    _, idx = knn(q, wf2.node_pos, 3, valid=wf2.active)
    out = warp_points(wf2, q, idx)
    assert np.isfinite(np.asarray(out)).all()
