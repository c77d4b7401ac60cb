"""The TF-checkpoint converter's name mapping is structurally verified
without the external artifact (core/models/README.txt): a fake checkpoint
randomly initialized per the committed manifest must convert into a
weight set that (a) covers EVERY parameter of models/dhbc.DHBC, (b)
shape-matches the Flax init tree exactly, and (c) runs through the
network. Spec: /root/reference/core/sdf.py:85-93, core/net.py:15-56."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

from convert_tf_dhbc import convert_var_dict, load_manifest  # noqa: E402


@pytest.fixture(scope="module")
def fake_checkpoint():
    rng = np.random.RandomState(0)
    manifest = load_manifest()
    return {n: rng.randn(*s).astype(np.float32) * 0.01
            for n, s in manifest.items()}


def test_manifest_matches_reference_topology():
    """30 variables: 15 convs (7 encoder + 8 decoder) x (weights, biases),
    with the first conv taking the 1-channel depth image and the last
    emitting the 16-D descriptor map (core/net.py:20-53)."""
    manifest = load_manifest()
    assert len(manifest) == 30
    assert manifest["feature/encoder/Conv/weights"] == [11, 11, 1, 96]
    assert manifest["feature/decoder/Conv_7/weights"] == [3, 3, 48, 16]
    # skip concats: iconv5 sees upconv5(256) + conv5(256), iconv4 sees
    # upconv4(256) + conv2(256), iconv3 sees upconv3(96) + conv1(96)
    assert manifest["feature/decoder/Conv_1/weights"][2] == 512
    assert manifest["feature/decoder/Conv_3/weights"][2] == 512
    assert manifest["feature/decoder/Conv_5/weights"][2] == 192


def test_convert_covers_every_flax_param(fake_checkpoint):
    import flax
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.models.dhbc import init_dhbc

    out = convert_var_dict(fake_checkpoint)
    _, params = init_dhbc(h=64, w=64, normalize_input=False)
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    converted = {k: v for k, v in out.items() if not k.startswith("__")}
    assert set(converted) == set(flat)
    for k, v in flat.items():
        assert converted[k].shape == tuple(jnp.shape(v)), k
    # contract markers: raw 0..255 input, raw-feature matching
    assert out["__normalize_input__"] == False  # noqa: E712
    assert out["__feature_norm__"] == False  # noqa: E712


def test_converted_weights_load_and_run(fake_checkpoint, tmp_path):
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.models.dhbc import (
        init_dhbc, load_npz_params, npz_feature_norm, npz_normalize_input,
    )

    out = convert_var_dict(fake_checkpoint)
    npz = tmp_path / "ref_dhbc.npz"
    np.savez(npz, **out)
    assert npz_normalize_input(str(npz)) is False
    assert npz_feature_norm(str(npz)) is False
    model, params = init_dhbc(h=64, w=64, normalize_input=False)
    params = load_npz_params(params, str(npz))
    feats = model.apply(params, jnp.zeros((1, 64, 64, 1), jnp.float32))
    assert feats.shape == (1, 64, 64, 16)
    assert bool(jnp.all(jnp.isfinite(feats)))
    # the loaded tree IS the converted data, not the random init
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    k = "params/_Conv_0/Conv_0/kernel"
    np.testing.assert_array_equal(np.asarray(flat[k]), out[k])


def test_convert_rejects_wrong_shapes(fake_checkpoint):
    bad = dict(fake_checkpoint)
    bad["feature/encoder/Conv/weights"] = np.zeros((11, 11, 1, 95), np.float32)
    with pytest.raises(ValueError, match="shape"):
        convert_var_dict(bad)
    del bad["feature/encoder/Conv/weights"]
    with pytest.raises(ValueError, match="missing"):
        convert_var_dict(bad)
