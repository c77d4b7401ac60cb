"""DHBC network + CNN correspondence pipeline (small image sizes)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynamicfusion_body_tpu.models.dhbc import (
    DHBC,
    dhbc_loss,
    init_dhbc,
    load_npz_params,
    make_train_step,
    save_npz_params,
)
from dynamicfusion_body_tpu.pipeline.cnn_correspondence import (
    CnnCorrespondence,
    regularize_verts,
    view_mvps,
)
from dynamicfusion_body_tpu.utils import image_color2idx, image_int2color


def test_dhbc_shapes():
    model, params = init_dhbc(h=64, w=64)
    out = model.apply(params, jnp.zeros((1, 64, 64, 1)))
    assert out.shape == (1, 64, 64, 16)


def test_dhbc_npz_roundtrip(tmp_path):
    model, params = init_dhbc(h=64, w=64)
    p = str(tmp_path / "w.npz")
    save_npz_params(params, p)
    params2 = load_npz_params(
        jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), params), p
    )
    out1 = model.apply(params, jnp.ones((1, 64, 64, 1)))
    out2 = model.apply(params2, jnp.ones((1, 64, 64, 1)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_dhbc_training_reduces_loss():
    model, params = init_dhbc(h=64, w=64)
    head = jnp.zeros((16, 10), jnp.float32)
    step, init_opt = make_train_step(model, learning_rate=1e-3, n_classes=10)
    opt_state = init_opt(params)
    rng = np.random.RandomState(0)
    depth = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 11, (1, 64, 64)).astype(np.int32))
    losses = []
    for _ in range(5):
        params, head, opt_state, loss = step(params, head, opt_state, depth, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_view_mvps_count_and_finite():
    mvps = view_mvps()
    assert mvps.shape == (24, 4, 4)
    assert np.isfinite(mvps).all()


def test_regularize_verts_masked():
    v = np.array([[0, 0, 0], [0, 3.6, 0], [99, 99, 99]], np.float32)
    mask = jnp.array([True, True, False])
    out = np.asarray(regularize_verts(jnp.array(v), mask))
    # height scaled to 1.8 over the valid verts
    assert abs((out[1, 1] - out[0, 1]) - 1.8) < 1e-5
    np.testing.assert_allclose(out[2], 0.0)


def test_cnn_match_identical_meshes(rng):
    """Same mesh as canonical and live (random-init weights): each vertex's
    nearest descriptor must be itself → exact correspondence."""
    # small tube mesh, deliberately ASYMMETRIC (a symmetric mesh gives
    # symmetric vertices identical descriptors → ties match rotated copies)
    t = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    r1 = 0.4 + 0.12 * np.cos(3 * t) + 0.07 * np.sin(t)
    r2 = 0.35 + 0.1 * np.sin(2 * t)
    ring1 = np.stack([r1 * np.cos(t), -0.4 + 0.05 * np.sin(2 * t), r1 * np.sin(t)], 1)
    ring2 = np.stack([r2 * np.cos(t), 0.4 + 0.06 * np.cos(t), r2 * np.sin(t)], 1)
    verts = np.concatenate([ring1, ring2]).astype(np.float32)
    faces = []
    for i in range(12):
        j = (i + 1) % 12
        faces.append([i, j, 12 + i])
        faces.append([j, 12 + j, 12 + i])
    faces = np.array(faces, np.int32)

    cap = 32
    v = np.zeros((cap, 3), np.float32)
    v[:24] = verts
    f = np.zeros((cap, 3), np.int32)
    f[: len(faces)] = faces
    mesh = {
        "verts": jnp.array(v), "faces": jnp.array(f),
        "n_verts": jnp.int32(24), "n_faces": jnp.int32(len(faces)),
    }
    vmask = jnp.arange(cap) < 24

    cnn = CnnCorrespondence(image_size=128)
    corr, valid = cnn.match(mesh, mesh, vmask, vmask)
    corr = np.asarray(corr)[:24]
    seen = np.asarray(valid)[:24]
    assert seen.sum() >= 20
    # matched points should be the same vertex (descriptors identical)
    d = np.linalg.norm(corr[seen] - verts[seen], axis=1)
    assert np.median(d) < 1e-5


def test_color_codec_roundtrip(rng):
    ids = rng.randint(0, 1 << 24, (8, 8)).astype(np.int32)
    img = image_int2color(ids)
    back = image_color2idx(img)
    np.testing.assert_array_equal(back, ids)
