"""End-to-end geometric accuracy gate.

Renders an analytic sphere mesh from 8 viewpoints, fuses the depth maps
rigidly (FusionDM path, reference core/fusion_dm.py:95-176), extracts the
isosurface, and asserts every stage's composition lands the reconstructed
vertices on the true surface to within ~a voxel. The sphere is analytic so
the ground-truth distance needs no correspondence search:
err(v) = | ‖v − c‖ − r |.
"""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
from dynamicfusion_body_tpu.ops.transforms import rotation_matrix
from dynamicfusion_body_tpu.pipeline.fusion import FusionDM
from dynamicfusion_body_tpu.render.raster import render_depth


def _sphere_mesh(res=96, radius_frac=0.27):
    g = np.arange(res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (res - 1) / 2.0
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    sdf = (r - radius_frac * res).astype(np.float32)
    m = marching_cubes(jnp.asarray(sdf), vert_cap=1 << 14, face_cap=1 << 15)
    nv, nf = int(m["n_verts"]), int(m["n_faces"])
    assert not bool(m["overflow"])
    # to world: center at origin, ~1-unit scale
    verts = (np.asarray(m["verts"])[:nv] - c) / res * 2.0
    faces = np.asarray(m["faces"])[:nf]
    world_r = radius_frac * res / res * 2.0
    return verts.astype(np.float32), faces, world_r


def test_render_fuse_extract_accuracy():
    verts, faces, world_r = _sphere_mesh()
    K = np.array([[200.0, 0, 128], [0, 200, 128], [0, 0, 1]], np.float32)
    fmask = jnp.ones(len(faces), bool)
    depths, lws = [], []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        R = rotation_matrix(ang, [0, 1, 0])[:3, :3]
        t = np.array([0, 0, 2.5])
        lw = np.concatenate([R, t[:, None]], 1).astype(np.float32)
        d = render_depth(
            jnp.asarray(verts), jnp.asarray(faces), fmask, jnp.asarray(K),
            jnp.asarray(lw), 256, 256, S=8,
        )
        depths.append(np.asarray(d))
        lws.append(lw)

    res = 48
    fus = FusionDM(
        8.0 / res * 1.3, K, tsdf_res=res, vert_cap=1 << 14, face_cap=1 << 15
    )
    fus.compute_live_tsdf(depths, lws, UseAutoAlignment=True)
    fus.marching_cubes()  # caches the canonical mesh, reference-style
    m = fus._mesh
    nv = int(m["n_verts"])
    assert nv > 500, nv
    gv = np.asarray(m["verts"])[:nv]
    ind = np.asarray(fus._IND)
    wv = gv @ ind[:3, :3].T + ind[:3, 3]
    voxel = float(ind[0, 0])
    err = np.abs(np.linalg.norm(wv, axis=1) - world_r)
    # mean within one voxel, and nearly every vertex within two
    assert float(err.mean()) < 1.0 * voxel, (err.mean(), voxel)
    assert float(np.percentile(err, 95)) < 2.0 * voxel, (
        np.percentile(err, 95), voxel)
