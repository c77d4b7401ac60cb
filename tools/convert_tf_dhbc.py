"""Convert the reference's TF1 DHBC checkpoint to a models/dhbc.py npz.

The reference restores an external Google-Drive checkpoint
(core/sdf.py:85-93, core/models/README.txt: core/models/model.{index,
meta,data-...}) via ``tf.train.Saver(dhbc.feat_vars)``. Those variables
are the slim-auto-named conv weights of core/net.py:15-56:

    feature/encoder/Conv/weights      conv1 (11,11,1,96)   stride 4
    feature/encoder/Conv_1/weights    conv2 (5,5,96,256)
    ...                               (7 encoder convs)
    feature/decoder/Conv/weights      upconv5 (3,3,4096,256)
    feature/decoder/Conv_1/weights    iconv5  (3,3,512,256)
    ...                               (8 decoder convs)

plus the matching ``.../biases``. slim.conv2d kernels are HWIO — the
same layout flax.linen.Conv uses — so the conversion is a pure renaming
to the Flax param paths of models/dhbc.DHBC (``params/_Conv_i/Conv_0/
kernel|bias`` in call order: encoder convs 0-6, decoder convs 7-14; the
decoder concat order [up, skip] matches the reference's
``tf.concat([upconv, skip], 3)``, so iconv input channels line up).

The expected names+shapes are committed as tools/dhbc_tf_manifest.json
and asserted here — a checkpoint whose variables don't match the
reference topology fails loudly instead of converting garbage.

Usage (requires tensorflow ONLY to read the checkpoint — not installed
in this environment; run wherever the checkpoint lives):

    python tools/convert_tf_dhbc.py --checkpoint core/models/model \
        --out data/dhbc_reference.npz

Then load it with the raw-input contract the checkpoint was trained on:

    Fusion(..., method='cnn', cnn_weights='data/dhbc_reference.npz')
    # or directly:
    CnnCorrespondence(weights_npz='data/dhbc_reference.npz')
    # (normalize_input auto-resolves to False: the npz records the
    #  reference's raw 0..255 input contract, core/sdf.py:135-136)

``convert_var_dict`` is the pure core (dict of TF names → arrays in,
dict of Flax paths → arrays out) so the mapping is unit-testable without
tensorflow or the artifact (tests/test_dhbc_convert.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HERE = os.path.dirname(os.path.abspath(__file__))
MANIFEST_PATH = os.path.join(_HERE, "dhbc_tf_manifest.json")

# TF scope-order → Flax call-order (models/dhbc.py DHBC.__call__):
# encoder Conv..Conv_6 = _Conv_0.._Conv_6, decoder Conv..Conv_7 =
# _Conv_7.._Conv_14.
_TF_ORDER = [f"feature/encoder/Conv{'' if i == 0 else f'_{i}'}"
             for i in range(7)]
_TF_ORDER += [f"feature/decoder/Conv{'' if i == 0 else f'_{i}'}"
              for i in range(8)]


def load_manifest():
    with open(MANIFEST_PATH) as f:
        return json.load(f)


def convert_var_dict(tf_vars: dict) -> dict:
    """TF-name → array dict in, Flax-path → array dict out (npz-ready,
    including the contract markers). Asserts names and shapes against the
    committed manifest."""
    manifest = load_manifest()
    missing = [n for n in manifest if n not in tf_vars]
    if missing:
        raise ValueError(
            f"checkpoint is missing {len(missing)} expected variables "
            f"(first: {missing[:3]}) — not a DHBC feature checkpoint?"
        )
    out = {
        # the reference feeds raw 0..255 depth (core/sdf.py:135-136) and
        # matches raw (unnormalized) descriptors — record both contracts
        "__normalize_input__": np.bool_(False),
        "__feature_norm__": np.bool_(False),
    }
    for i, scope in enumerate(_TF_ORDER):
        for tf_leaf, flax_leaf in (("weights", "kernel"), ("biases", "bias")):
            name = f"{scope}/{tf_leaf}"
            arr = np.asarray(tf_vars[name], dtype=np.float32)
            want = tuple(manifest[name])
            if arr.shape != want:
                raise ValueError(
                    f"{name}: shape {arr.shape} != expected {want} — "
                    "checkpoint topology differs from core/net.py:15-56"
                )
            out[f"params/_Conv_{i}/Conv_0/{flax_leaf}"] = arr
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="TF checkpoint prefix (e.g. core/models/model)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()

    try:
        import tensorflow as tf  # noqa: F401 — only needed to READ
    except ImportError:
        sys.exit(
            "tensorflow is required to read the checkpoint (pip install "
            "tensorflow, any 1.x/2.x — tf.train.load_checkpoint reads TF1 "
            "bundles). The conversion itself is TF-free; see "
            "convert_var_dict."
        )
    reader = tf.train.load_checkpoint(args.checkpoint)
    names = list(load_manifest())
    tf_vars = {n: reader.get_tensor(n) for n in names}
    out = convert_var_dict(tf_vars)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out) - 2} arrays "
          f"(+ input/feature contract markers)")


if __name__ == "__main__":
    main()
