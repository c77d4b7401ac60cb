"""Geometry core unit tests vs NumPy oracles (reference formula spec)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynamicfusion_body_tpu import ops
import oracles


def random_rotation(rng):
    a = rng.randn(3, 3)
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_quat_multiply_known():
    # Known example from reference core/util.py docstring (util.py:258-259)
    q = ops.quat_multiply(jnp.array([4.0, 1, -2, 3]), jnp.array([8.0, -5, 6, 7]))
    np.testing.assert_allclose(np.asarray(q), [28, -44, -14, 48], atol=1e-6)


def test_quat_multiply_batch_vs_oracle(rng):
    a = rng.randn(32, 4).astype(np.float32)
    b = rng.randn(32, 4).astype(np.float32)
    got = np.asarray(ops.quat_multiply(jnp.array(a), jnp.array(b)))
    want = np.stack([oracles.quat_mul(x, y) for x, y in zip(a, b)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dq_transform_point_unit_dq_equals_rigid(rng):
    R = random_rotation(rng)
    t = rng.randn(3)
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = t
    dq = ops.se3_to_dq(jnp.array(M, dtype=jnp.float32))
    p = rng.randn(50, 3).astype(np.float32)
    got = np.asarray(ops.dq_transform_point(dq, jnp.array(p)))
    want = p @ R.T + t
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dq_transform_point_nonunit_matches_sandwich(rng):
    # The reference applies UNNORMALIZED dqs (8-norm blending, raw solver
    # outputs); the transform must be the literal sandwich product.
    dq = rng.randn(8).astype(np.float32)
    p = rng.randn(3).astype(np.float32)
    got = np.asarray(ops.dq_transform_point(jnp.array(dq), jnp.array(p)))
    want = oracles.dq_point(dq.astype(np.float64), p)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dq_transform_normal_rotation_only(rng):
    dq = rng.randn(8).astype(np.float32)
    n = rng.randn(3).astype(np.float32)
    got = np.asarray(ops.dq_transform_normal(jnp.array(dq), jnp.array(n)))
    want = oracles.dq_normal(dq.astype(np.float64), n)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_se3_dq_roundtrip(rng):
    for _ in range(5):
        R = random_rotation(rng)
        t = rng.randn(3)
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = t
        dq = ops.se3_to_dq(jnp.array(M, dtype=jnp.float32))
        M2 = np.asarray(ops.dq_to_se3(dq))
        np.testing.assert_allclose(M2, M, atol=1e-4)


def test_se3_to_dq_batched(rng):
    Ms = []
    for _ in range(4):
        M = np.eye(4)
        M[:3, :3] = random_rotation(rng)
        M[:3, 3] = rng.randn(3)
        Ms.append(M)
    Ms = np.stack(Ms).astype(np.float32)
    dqs = np.asarray(ops.se3_to_dq(jnp.array(Ms)))
    singles = np.stack([np.asarray(ops.se3_to_dq(jnp.array(m))) for m in Ms])
    np.testing.assert_allclose(dqs, singles, atol=1e-5)


def test_dq_blend_vs_oracle(rng):
    pos = rng.randn(3).astype(np.float32)
    node_pos = rng.randn(4, 3).astype(np.float32)
    node_dq = rng.randn(4, 8).astype(np.float32)
    node_w = (0.5 + rng.rand(4)).astype(np.float32)
    got = np.asarray(
        ops.dq_blend(jnp.array(pos), jnp.array(node_pos), jnp.array(node_dq),
                     jnp.array(node_w))
    )
    want = oracles.dq_blend_oracle(pos, node_pos, node_dq, node_w)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dq_blend_zero_norm_identity():
    pos = jnp.zeros(3)
    node_pos = jnp.zeros((2, 3))
    node_dq = jnp.zeros((2, 8))
    node_w = jnp.ones(2)
    got = np.asarray(ops.dq_blend(pos, node_pos, node_dq, node_w))
    np.testing.assert_allclose(got, [1, 0, 0, 0, 0, 0, 0, 0])


def test_dq_blend_mask():
    pos = jnp.zeros(3)
    node_pos = jnp.zeros((2, 3))
    node_dq = jnp.array([[1.0, 0, 0, 0, 0, 1, 1, 0], [0.0, 1, 0, 0, 0, 0, 0, 9]])
    node_w = jnp.ones(2)
    mask = jnp.array([True, False])
    got = np.asarray(ops.dq_blend(pos, node_pos, node_dq, node_w, mask=mask))
    want = oracles.dq_blend_oracle(
        np.zeros(3), np.zeros((1, 3)), np.array([[1.0, 0, 0, 0, 0, 1, 1, 0]]),
        np.ones(1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_trilinear_vs_oracle(rng):
    vol = rng.randn(5, 6, 7).astype(np.float32)
    pos = np.array(
        [[1.3, 2.7, 3.1], [0.0, 0.0, 0.0], [4.0, 5.0, 6.0], [2.0, 2.5, 3.0]],
        dtype=np.float32,
    )
    vals, valid = ops.trilinear(jnp.array(vol), jnp.array(pos))
    for i, p in enumerate(pos):
        want = oracles.trilerp_oracle(p.astype(np.float64), vol)
        assert bool(valid[i])
        np.testing.assert_allclose(float(vals[i]), want, atol=1e-5)


def test_trilinear_out_of_bounds(rng):
    vol = rng.randn(4, 4, 4).astype(np.float32)
    pos = np.array([[-0.1, 1, 1], [1, 1, 3.01], [5, 1, 1]], dtype=np.float32)
    _, valid = ops.trilinear(jnp.array(vol), jnp.array(pos))
    assert not np.any(np.asarray(valid))


def test_bilinear_vs_oracle(rng):
    img = rng.randn(8, 9).astype(np.float32)
    px, py = 3.4, 5.7
    got = float(ops.bilinear(jnp.array(img), jnp.array(px), jnp.array(py)))
    np.testing.assert_allclose(got, oracles.bilerp_oracle(img, px, py), atol=1e-5)


def test_project_to_pixel(rng):
    K = np.array([[2000.0, 0, 800], [0, 2000, 600], [0, 0, 1]], dtype=np.float32)
    pos = np.array([[0.1, -0.2, 2.0]], dtype=np.float32)
    u, v, valid = ops.project_to_pixel(jnp.array(K), jnp.array(pos))
    p = K @ pos[0]
    np.testing.assert_allclose(float(u[0]), p[0] / p[2], rtol=1e-5)
    np.testing.assert_allclose(float(v[0]), p[1] / p[2], rtol=1e-5)
    assert bool(valid[0])


def test_radius_subsample_vs_oracle(rng):
    pts = rng.rand(60, 3).astype(np.float32)
    want = oracles.radius_subsample_oracle(pts, 0.3)
    idx, count = ops.radius_subsample(jnp.array(pts), jnp.float32(0.3), capacity=64)
    got = np.asarray(idx)[: int(count)]
    np.testing.assert_array_equal(got, want)


def test_knn_vs_numpy(rng):
    pts = rng.randn(100, 3).astype(np.float32)
    q = rng.randn(17, 3).astype(np.float32)
    d, i = ops.knn(jnp.array(q), jnp.array(pts), 4)
    d = np.asarray(d)
    i = np.asarray(i)
    for j in range(len(q)):
        dd = np.linalg.norm(pts - q[j], axis=1)
        order = np.argsort(dd)[:4]
        np.testing.assert_array_equal(i[j], order)
        np.testing.assert_allclose(d[j], dd[order], atol=1e-4)


def test_knn_with_mask(rng):
    pts = rng.randn(20, 3).astype(np.float32)
    valid = np.ones(20, bool)
    valid[0] = False
    q = pts[:1] + 0.001
    _, i = ops.knn(jnp.array(q), jnp.array(pts), 1, valid=jnp.array(valid))
    assert int(i[0, 0]) != 0


def test_losses():
    x = jnp.array([0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(ops.huber_loss(x, 1.0)), [0.125, 1.5], atol=1e-6
    )
    got = np.asarray(ops.tukey_biweight_loss(jnp.array([0.5, 3.0]), 1.0))
    np.testing.assert_allclose(got, [0.5 * (1 - 0.25) ** 2, 0.0], atol=1e-6)


def test_inverse_rigid_matrix(rng):
    R = random_rotation(rng)
    t = rng.randn(3)
    A = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
    Ainv = np.asarray(ops.inverse_rigid_matrix(jnp.array(A)))
    p = rng.randn(3).astype(np.float32)
    fwd = R @ p + t
    back = Ainv[:, :3] @ fwd + Ainv[:, 3]
    np.testing.assert_allclose(back, p, atol=1e-4)


def test_warp_point_matches_manual(rng):
    node_pos = rng.randn(4, 3).astype(np.float32)
    node_dq = rng.randn(4, 8).astype(np.float32)
    node_w = (0.5 + rng.rand(4)).astype(np.float32)
    m_lw = rng.randn(8).astype(np.float32)
    pos = rng.randn(3).astype(np.float32)
    normal = rng.randn(3).astype(np.float32)
    p, n = ops.warp_point(
        jnp.array(pos), jnp.array(node_pos), jnp.array(node_dq),
        jnp.array(node_w), normal=jnp.array(normal), m_lw=jnp.array(m_lw)
    )
    se3 = oracles.dq_blend_oracle(pos, node_pos, node_dq, node_w)
    want_p = oracles.dq_point(m_lw.astype(np.float64), oracles.dq_point(se3, pos))
    want_n = oracles.dq_normal(m_lw.astype(np.float64), oracles.dq_normal(se3, normal))
    np.testing.assert_allclose(np.asarray(p), want_p, atol=1e-4)
    np.testing.assert_allclose(np.asarray(n), want_n, atol=1e-4)
