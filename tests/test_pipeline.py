"""End-to-end pipeline drives mirroring the reference harness flows
(test.py TEST_FUSION_DUMMY / TEST_FUSION_DM paths)."""

import os

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu import Fusion, FusionDM
from fixtures import ellipsoid_levelset, sphere_levelset, synthetic_depth_sphere


def test_dummy_nonrigid_frame(tmp_path):
    """The TEST_FUSION_DUMMY flow (test.py:73-82): one solve + updateTSDF +
    update_graph on an ellipsoid level set vs a shifted one."""
    vol = ellipsoid_levelset(6, 10, 16)[:-1]
    vol2 = ellipsoid_levelset(6, 10, 16, offset=(0.8, 0.5, 0.0))[:-1]

    fus = Fusion(
        vol, float(vol.max()), marching_cubes_step_size=1, subsample_rate=2,
        knn=4, vert_cap=4096, face_cap=8192, node_cap=128,
        write_warpfield=True, warpfield_path=str(tmp_path),
    )
    n0 = int(fus._warp.num_active)
    assert n0 > 3

    fus.setupCorrespondences(vol2, method="clpts", tolerance=2.0)
    valid_frac = float(jnp.mean(fus._corr_valid[: int(fus._mesh["n_verts"])]))
    assert valid_frac > 0.5

    # the solve should reduce the energy
    fus.solve(method="clpts", regularization_weight=10.0)

    fus.updateTSDF()
    assert float(fus.volume.weights.max()) > 0

    fus.update_graph()
    # warp field checkpoint written (reference naming: test__<iter>.p)
    assert any(f.startswith("test__") for f in os.listdir(tmp_path))

    # mesh export works
    fus.write_canonical_mesh(str(tmp_path), "mesh.obj")
    txt = open(os.path.join(tmp_path, "mesh.obj")).read()
    assert txt.count("\nf ") > 10


def test_fusion_dm_multiview(tmp_path):
    """The TEST_FUSION_DM flow (test.py:140-163): multi-view depth fusion
    at small scale, mesh written through the _IND transform."""
    K = np.array([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]], np.float32)
    center = np.array([-0.03, -0.43, -5.6])  # the reference's default avg
    # depth convention: camera at origin looking down +z; the default
    # center has z=-5.6 … keep the sphere in front (positive depth along
    # ray) by putting it at +z and overriding the alignment with ICP off.
    center = np.array([0.0, 0.0, 4.0])
    depths, lws = [], []
    for ang in (0.0, np.pi / 2, np.pi):
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        t = center - R @ center
        lw = np.concatenate([R, t[:, None]], 1).astype(np.float32)
        depths.append(synthetic_depth_sphere(128, 128, K, center, 0.6, lw))
        lws.append(lw)

    fus = FusionDM(0.05, K, tsdf_res=48, vert_cap=16384, face_cap=32768)
    # patch the alignment defaults via auto alignment from the data itself
    v, w = fus.compute_live_tsdf(depths, lws, UseAutoAlignment=True)
    assert w.max() > 0
    assert v.min() < 0 < v.max()

    fus.write_canonical_mesh(str(tmp_path), "dm.obj")
    lines = open(os.path.join(tmp_path, "dm.obj")).read().splitlines()
    vs = np.array(
        [[float(x) for x in l.split()[1:4]] for l in lines if l.startswith("v ")]
    )
    # world-space mesh should sit near the sphere surface
    d = np.linalg.norm(vs - center, axis=1)
    assert abs(np.median(d) - 0.6) < 0.1, np.median(d)


def test_fusion_dm_icp_path():
    """useICP=True: per-map fusion + rigid alignment (reference
    core/fusion_dm.py:149-164)."""
    K = np.array([[300.0, 0, 64], [0, 300, 64], [0, 0, 1]], np.float32)
    center = np.array([0.0, 0.0, 4.0])
    depths, lws = [], []
    for ang in (0.0, 0.2):
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        t = center - R @ center
        lw = np.concatenate([R, t[:, None]], 1).astype(np.float32)
        depths.append(synthetic_depth_sphere(128, 128, K, center, 0.6, lw))
        lws.append(lw)
    fus = FusionDM(0.05, K, tsdf_res=32, vert_cap=8192, face_cap=16384)
    v, w = fus.compute_live_tsdf(depths, lws, UseAutoAlignment=True, useICP=True)
    assert w.max() > 0 and v.min() < 0


def test_write_live_frame_mesh(tmp_path):
    vol = ellipsoid_levelset(6, 8, 10)[:-1]
    fus = Fusion(vol, float(vol.max()), marching_cubes_step_size=1,
                 subsample_rate=2, vert_cap=4096, face_cap=8192, node_cap=64,
                 write_warpfield=True, warpfield_path=str(tmp_path))
    fus.write_warp_field(str(tmp_path), "wf")
    ck = [f for f in os.listdir(tmp_path) if f.startswith("wf__")][0]
    fus.write_live_frame_mesh(str(tmp_path), "live.obj",
                              os.path.join(tmp_path, ck))
    assert os.path.exists(os.path.join(tmp_path, "live.obj"))


def test_fusion_cnn_correspondence_path():
    """method='cnn' end to end through the driver (random-init weights —
    the reference's checkpoint is an external download)."""
    vol = ellipsoid_levelset(5, 7, 9)[:-1]
    vol2 = ellipsoid_levelset(5, 7, 9, offset=(0.5, 0.3, 0.0))[:-1]
    fus = Fusion(vol, float(vol.max()), marching_cubes_step_size=1,
                 subsample_rate=2, vert_cap=2048, face_cap=4096, node_cap=64,
                 use_cnn=True, cnn_image_size=128, write_warpfield=False)
    fus.setupCorrespondences(vol2, method="cnn", tolerance=3.0)
    n = int(fus._mesh["n_verts"])
    frac = float(jnp.mean(fus._corr_valid[:n]))
    assert frac > 0.3, frac
    fus.solve(method="cnn", regularization_weight=5.0)
    fus.updateTSDF()
    assert float(fus.volume.weights.max()) > 0
