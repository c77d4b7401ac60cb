"""Marching cubes: watertightness, geometric accuracy vs analytic SDFs."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes


def sphere_sdf(res, center, radius):
    g = np.arange(res)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (
        np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2 + (z - center[2]) ** 2)
        - radius
    ).astype(np.float32)


def run_mc(vol, **kw):
    out = marching_cubes(jnp.array(vol), **kw)
    nv, nf = int(out["n_verts"]), int(out["n_faces"])
    return (
        np.asarray(out["verts"])[:nv],
        np.asarray(out["faces"])[:nf],
        np.asarray(out["normals"])[:nv],
        np.asarray(out["values"])[:nv],
        out,
    )


def test_sphere_vertices_on_surface():
    vol = sphere_sdf(24, (12, 12, 12), 7.0)
    verts, faces, normals, values, _ = run_mc(vol)
    assert len(verts) > 100 and len(faces) > 100
    d = np.linalg.norm(verts - 12.0, axis=1)
    # linear interp of an exact distance field: vertices within a small
    # fraction of a voxel of the true surface
    np.testing.assert_allclose(d, 7.0, atol=0.05)
    # values ~ level
    np.testing.assert_allclose(values, 0.0, atol=0.05)


def test_sphere_normals_outward():
    vol = sphere_sdf(24, (12, 12, 12), 7.0)
    verts, faces, normals, _, _ = run_mc(vol)
    # SDF positive outside → descent direction = inward… reference meshes
    # use skimage 'descent' convention: normals = -gradient. For an SDF
    # whose gradient points outward, normals point inward.
    radial = (verts - 12.0) / np.linalg.norm(verts - 12.0, axis=1, keepdims=True)
    dots = np.sum(normals * radial, axis=1)
    assert np.all(dots < -0.8)
    # face winding consistent with the normals: triangle geometric normals
    # should agree with the average vertex normal
    tri = verts[faces]
    geo = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nz = np.linalg.norm(geo, axis=1) > 1e-12
    geo = geo[nz] / np.linalg.norm(geo[nz], axis=1, keepdims=True)
    vn = normals[faces].mean(1)[nz]
    agree = np.sum(geo * vn, axis=1)
    assert (agree > 0).mean() > 0.99


def test_watertight_closed_surface():
    vol = sphere_sdf(16, (8, 8, 8), 5.0)
    verts, faces, _, _, _ = run_mc(vol)
    # every undirected edge shared by exactly 2 triangles; Euler V-E+F = 2
    edges = {}
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    assert np.all(counts == 2), np.unique(counts)
    V, E, F = len(verts), len(edges), len(faces)
    assert V - E + F == 2


def test_two_blobs_topology():
    vol = np.minimum(
        sphere_sdf(24, (6, 12, 12), 3.5), sphere_sdf(24, (17, 12, 12), 3.5)
    )
    verts, faces, _, _, _ = run_mc(vol)
    # two closed components: Euler characteristic 4
    edges = set()
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            edges.add((min(a, b), max(a, b)))
    assert len(verts) - len(edges) + len(faces) == 4


def test_empty_volume():
    vol = np.full((8, 8, 8), 1.0, np.float32)
    verts, faces, _, _, out = run_mc(vol)
    assert int(out["n_verts"]) == 0 and int(out["n_faces"]) == 0


def test_step_size_scales_coords():
    vol = sphere_sdf(33, (16, 16, 16), 10.0)
    verts, _, _, _, _ = run_mc(vol, step_size=2)
    d = np.linalg.norm(verts - 16.0, axis=1)
    # coarse sampling: still near the surface, coords in original units
    np.testing.assert_allclose(d, 10.0, atol=0.6)


def test_capacity_saturation_reported():
    vol = sphere_sdf(24, (12, 12, 12), 7.0)
    out = marching_cubes(jnp.array(vol), vert_cap=64, face_cap=64)
    assert int(out["n_verts"]) == 64  # saturated, caller can detect


def test_pallas_frontend_bit_identical(rng):
    """The fused Pallas front-end (interpret mode on CPU) must reproduce
    the dense XLA path exactly: same verts, faces, normals, counts."""
    X, Y, Z = 16, 16, 128
    g = np.stack(np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                             indexing="ij"), -1).astype(np.float32)
    c = np.array([7.5, 7.5, 63.5], np.float32)
    vol = np.linalg.norm((g - c) / np.array([1, 1, 4]), axis=-1) - 6.0
    vol += 0.3 * rng.randn(X, Y, Z).astype(np.float32)  # rough surface

    caps = dict(vert_cap=1 << 13, face_cap=1 << 14)
    want = marching_cubes(jnp.asarray(vol), **caps)
    got = marching_cubes(jnp.asarray(vol), use_pallas=True,
                         pallas_interpret=True, **caps)

    assert int(got["n_verts"]) == int(want["n_verts"]) > 100
    assert int(got["n_faces"]) == int(want["n_faces"]) > 100
    for k in ("verts", "normals", "values", "faces"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
    assert bool(got["overflow"]) == bool(want["overflow"])


def test_pallas_frontend_shape_gate():
    """Unsupported shapes (lane dim not 128-tileable) silently take the
    dense path — same results, no error."""
    vol = np.linalg.norm(
        np.stack(np.meshgrid(*[np.arange(24)] * 3, indexing="ij"), -1)
        - 11.5, axis=-1
    ).astype(np.float32) - 7.0
    a = marching_cubes(jnp.asarray(vol), vert_cap=4096, face_cap=8192)
    b = marching_cubes(jnp.asarray(vol), use_pallas=True,
                       pallas_interpret=True, vert_cap=4096, face_cap=8192)
    np.testing.assert_array_equal(np.asarray(a["verts"]), np.asarray(b["verts"]))
