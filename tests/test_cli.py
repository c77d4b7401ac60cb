"""CLI harness + config + profiling."""

import json
import os

import numpy as np
import pytest

from dynamicfusion_body_tpu.cli import main
from dynamicfusion_body_tpu.config import (
    FusionConfig,
    FusionDMConfig,
    load_config,
    save_config,
)
from dynamicfusion_body_tpu.utils.profiling import PhaseTimer, print_profile


def test_selftest():
    assert main(["selftest"]) == 0


def test_dummy_cli(tmp_path):
    assert main(["dummy", "--out-dir", str(tmp_path), "--out", "m.obj"]) == 0
    assert os.path.exists(tmp_path / "m.obj")


def test_sequence_cli(tmp_path):
    # two tiny .dist volumes of a moving sphere
    from dynamicfusion_body_tpu.io.sdf_io import save_sdf

    g = np.arange(25, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")

    def sph(cx):
        return (np.sqrt((x - cx) ** 2 + (y - 12) ** 2 + (z - 12) ** 2) - 7).astype(
            np.float32
        )

    data = tmp_path / "data"
    data.mkdir()
    save_sdf(str(data / "0000.64.dist"), sph(12.0), [-1] * 3, [1] * 3)
    save_sdf(str(data / "0001.64.dist"), sph(12.7), [-1] * 3, [1] * 3)
    rc = main([
        "sequence", "--data", str(data), "--out-dir", str(tmp_path),
        "--mc-step", "1", "--subsample-rate", "2",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "mesh.obj")
    prof = json.load(open(tmp_path / "profile.json"))
    assert "solve" in prof and "updateTSDF" in prof
    print_profile(str(tmp_path / "profile.json"))


def test_backproject_cli(tmp_path):
    data = tmp_path / "d"
    data.mkdir()
    dm = np.zeros((8, 8), np.float32)
    dm[2:5, 2:5] = -3.0
    np.save(data / "depth0.npy", dm)
    P = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    K = np.array([[2000.0, 0, 800], [0, 2000, 600], [0, 0, 1]])
    np.savetxt(data / "proj0.txt", K @ P)
    assert main(["backproject", "--data", str(data), "--out-dir", str(tmp_path)]) == 0
    pts = np.loadtxt(tmp_path / "transformed_pts0.txt")
    assert pts.shape == (9, 3)
    np.testing.assert_allclose(pts[:, 2], 3.0, atol=1e-4)


def test_config_roundtrip(tmp_path):
    cfg = FusionDMConfig(tsdf_res=128, use_icp=True)
    p = str(tmp_path / "cfg.json")
    save_config(cfg, p)
    cfg2 = load_config(FusionDMConfig, p)
    assert cfg2.tsdf_res == 128 and cfg2.use_icp
    assert cfg2.camera.fx == 2000.0

    cfg3 = FusionConfig()
    save_config(cfg3, p)
    cfg4 = load_config(FusionConfig, p)
    assert cfg4.knn == cfg3.knn


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
