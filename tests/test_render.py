"""Rasterizer tests: depth accuracy, ID dominance, occlusion."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.render import glmath, render_depth, render_id


def quad(z=2.0, size=1.0, dx=0.0):
    """Two triangles forming a square at depth z, centered at (dx,0)."""
    s = size / 2
    v = np.array(
        [[-s + dx, -s, z], [s + dx, -s, z], [s + dx, s, z], [-s + dx, s, z]],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


def test_render_depth_plane():
    K = np.array([[100.0, 0, 64], [0, 100, 64], [0, 0, 1]], np.float32)
    lw = np.eye(4, dtype=np.float32)[:3]
    v, f = quad(z=2.0, size=1.6)
    d = np.asarray(render_depth(
        jnp.array(v), jnp.array(f), jnp.ones(2, bool), jnp.array(K),
        jnp.array(lw), 128, 128, S=96))
    hit = d < 0
    assert hit.mean() > 0.2
    np.testing.assert_allclose(-d[hit], 2.0, atol=2e-3)
    # center pixel hit, far corner empty
    assert d[64, 64] < 0 and d[0, 0] == 0.0


def test_render_depth_occlusion():
    K = np.array([[100.0, 0, 64], [0, 100, 64], [0, 0, 1]], np.float32)
    lw = np.eye(4, dtype=np.float32)[:3]
    v1, f1 = quad(z=2.0, size=0.8)
    v2, f2 = quad(z=3.0, size=2.0)
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + 4])
    d = np.asarray(render_depth(
        jnp.array(v), jnp.array(f), jnp.ones(4, bool), jnp.array(K),
        jnp.array(lw), 128, 128, S=96))
    # near quad (±20px of center) wins at center; far quad (±33px) shows
    # in the ring outside the near quad
    assert abs(-d[64, 64] - 2.0) < 2e-3
    assert abs(-d[35, 64] - 3.0) < 3e-3


def test_render_id_gl_pipeline():
    # a single triangle filling part of the view; MVP = perspective only
    proj = glmath.perspective(glmath.radians(70), 1.0, 1.0, 3.5)
    mod = glmath.identity()
    mod = glmath.translate(mod, glmath.vec3(0, 0, -2.0))
    mvp = proj @ mod
    v = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.0, 0.6, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    ids, zwin = render_id(
        jnp.array(v), jnp.array(f), jnp.ones(1, bool), jnp.array(mvp),
        128, 128, S=96)
    ids = np.asarray(ids)
    zwin = np.asarray(zwin)
    assert (ids > 0).mean() > 0.05
    assert set(np.unique(ids)) <= {0, 1, 2, 3}
    # dominant-vertex rule: corner regions carry their corner's id.
    # vertex 2 (id 3) is the top corner; image row 0 = top.
    ys, xs = np.where(ids == 3)
    assert ys.mean() < 64
    # background depth 1, surface depth < 1
    assert zwin[0, 0] == 1.0
    assert zwin[ids > 0].max() < 1.0


def test_render_id_matches_depth_linearization():
    # zwin → eye depth via the reference's conversion (core/sdf.py:108-135)
    znear, zfar = 1.0, 3.5
    proj = glmath.perspective(glmath.radians(70), 1.0, znear, zfar)
    mod = glmath.translate(glmath.identity(), glmath.vec3(0, 0, -2.0))
    v = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.0, 0.6, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    ids, zwin = render_id(
        jnp.array(v), jnp.array(f), jnp.ones(1, bool), jnp.array(proj @ mod),
        128, 128, S=96)
    zwin = np.asarray(zwin)
    ids = np.asarray(ids)
    b = zfar * znear / (znear - zfar)
    a = -b / znear
    eye_depth = b / (zwin[ids > 0] - a)
    np.testing.assert_allclose(eye_depth, 2.0, atol=0.01)
