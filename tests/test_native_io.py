"""Native C IO runtime vs the Python fallbacks (bit-level compatibility)."""

import numpy as np
import pytest

from dynamicfusion_body_tpu import native
from dynamicfusion_body_tpu.io.mesh_io import load_obj, save_obj
from dynamicfusion_body_tpu.io.sdf_io import load_sdf, save_sdf


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


@needs_native
def test_native_obj_roundtrip(tmp_path, rng):
    verts = rng.rand(100, 3).astype(np.float32)
    faces = rng.randint(0, 100, (50, 3)).astype(np.int32)
    normals = rng.randn(100, 3).astype(np.float32)
    p = str(tmp_path / "m.obj")
    assert native.write_obj(p, verts, faces, normals=normals)
    v2, f2 = native.read_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


@needs_native
def test_native_obj_ind_transform(tmp_path, rng):
    verts = rng.rand(20, 3).astype(np.float32)
    faces = rng.randint(0, 20, (10, 3)).astype(np.int32)
    normals = rng.randn(20, 3).astype(np.float32)
    ind = np.eye(4)
    ind[0, 0] = ind[1, 1] = ind[2, 2] = 0.5
    ind[:3, 3] = [1.0, -2.0, 3.0]
    p = str(tmp_path / "m.obj")
    assert native.write_obj(p, verts, faces, normals=normals, ind=ind)
    txt = open(p).read()
    assert "//" in txt  # FusionDM face style
    v2, f2 = native.read_obj(p)
    np.testing.assert_allclose(v2, verts * 0.5 + [1, -2, 3], atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


@needs_native
def test_native_matches_python_obj(tmp_path, rng):
    verts = rng.rand(30, 3).astype(np.float32)
    faces = rng.randint(0, 30, (15, 3)).astype(np.int32)
    # write via save_obj (native path), read via the pure-Python parser by
    # deliberately bypassing the native reader
    p = str(tmp_path / "m.obj")
    save_obj(p, verts, faces)
    import dynamicfusion_body_tpu.native as nat

    lib = nat._lib
    nat._lib = None
    orig_get = nat.get_lib
    nat.get_lib = lambda: None
    try:
        v2, f2 = load_obj(p)
    finally:
        nat.get_lib = orig_get
        nat._lib = lib
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


@needs_native
def test_native_dist_loader(tmp_path, rng):
    vol = rng.randn(9, 9, 9).astype(np.float32)
    p = str(tmp_path / "v.dist")
    save_sdf(p, vol, [-1, -1, -1], [1, 1, 1])
    out = native.read_dist(p)
    assert out is not None
    b_min, b_max, v2 = out
    np.testing.assert_allclose(b_min, [-1, -1, -1])
    np.testing.assert_allclose(v2, vol, atol=0)
    # and through the io front-end (which should pick native)
    b_min2, b_max2, v3, _ = load_sdf(p)
    np.testing.assert_allclose(v3, vol, atol=0)
