"""DHBC dense-human-body-correspondence feature network (Flax).

Topology transcribed from the reference's TF1/slim graph
(core/net.py:15-56): an AlexNet-ish encoder (96/11/s4 → 256/5 → 384/384/256
→ two 4096 1x1 convs, 3x3 maxpools between stages) and a skip-connected
nearest-neighbor-upsample decoder ending in a 16-channel feature map at
input resolution. Activation is ELU (the reference's explicit
``activation_fn=tf.nn.elu``), padding is reflect-free manual zero padding
with VALID convs, exactly mirroring ``_conv``/``_maxpool``
(core/net.py:94-118).

The reference restores a TF checkpoint from Google Drive
(core/models/README.txt); that artifact is external, so this module
supports (a) random init and (b) loading converted weights from an .npz
via ``load_npz_params`` — the training utilities in ``classify``/``_loss``
were dead code in the reference (SURVEY §2.4) and are superseded by a
working loss in train_dhbc below.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = _pad(x, p)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="VALID",
        )(x)
        return nn.elu(x)


def _maxpool(x, k=3, stride=2):
    p = (k - 1) // 2
    x = _pad(x, p)
    return nn.max_pool(x, (k, k), strides=(stride, stride), padding="VALID")


def _upsample_nn(x, ratio=2):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * ratio, w * ratio, c), method="nearest")


class DHBC(nn.Module):
    """Input (B,H,W,1) depth8 (0..255 floats, the reference's feed format,
    core/sdf.py:135-136); output (B,H,W,16) descriptors.

    ``normalize_input`` rescales to [-0.5, 0.5] inside the module — the
    reference feeds raw 0..255 into a checkpoint trained at that scale,
    but training from scratch needs unit-scale inputs (raw scale leaves
    the net stuck at the majority class). Weight shapes are unchanged, so
    a converted reference checkpoint still loads (set it to False then).
    """

    features: int = 16
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.normalize_input:
            x = x * (1.0 / 255.0) - 0.5
        conv1 = _Conv(96, 11, 4)(x)        # H/4
        pool1 = _maxpool(conv1)            # H/8
        conv2 = _Conv(256, 5)(pool1)       # H/8
        pool2 = _maxpool(conv2)            # H/16
        conv3 = _Conv(384, 3)(pool2)
        conv4 = _Conv(384, 3)(conv3)
        conv5 = _Conv(256, 3)(conv4)       # H/16
        pool5 = _maxpool(conv5)            # H/32
        conv6 = _Conv(4096, 1)(pool5)
        conv7 = _Conv(4096, 1)(conv6)      # H/32

        up5 = _Conv(256, 3)(_upsample_nn(conv7))          # H/16
        i5 = _Conv(256, 3)(jnp.concatenate([up5, conv5], -1))
        up4 = _Conv(256, 3)(_upsample_nn(i5))             # H/8
        i4 = _Conv(256, 3)(jnp.concatenate([up4, conv2], -1))
        up3 = _Conv(96, 3)(_upsample_nn(i4))              # H/4
        i3 = _Conv(96, 3)(jnp.concatenate([up3, conv1], -1))
        up2 = _Conv(48, 3)(_upsample_nn(i3))              # H/2
        up1 = _Conv(self.features, 3)(_upsample_nn(up2))  # H
        return up1


def init_dhbc(rng_seed: int = 0, h: int = 512, w: int = 512,
              normalize_input: bool = True):
    """``normalize_input=False`` reproduces the reference's raw 0..255
    input contract (required when loading a converted reference
    checkpoint, which was trained at that scale)."""
    model = DHBC(normalize_input=normalize_input)
    params = model.init(
        jax.random.PRNGKey(rng_seed), jnp.zeros((1, h, w, 1), jnp.float32)
    )
    return model, params


def npz_normalize_input(npz_path: str):
    """Input-scale contract recorded in a weights npz (see
    save_npz_params), or None for files without the marker (e.g. weights
    converted from the reference TF checkpoint — those were trained on
    raw 0..255 inputs, so callers should default to False for them)."""
    data = np.load(npz_path)
    if "__normalize_input__" in data.files:
        return bool(data["__normalize_input__"])
    return None


def npz_feature_norm(npz_path: str) -> bool:
    """Whether the weights were trained under the cosine (L2-normalized)
    classifier head — in that regime descriptor MAGNITUDE carries no
    class information, so matching must compare L2-normalized
    descriptors. False for files without the marker (linear-head
    training and converted reference checkpoints match raw features)."""
    data = np.load(npz_path)
    if "__feature_norm__" in data.files:
        return bool(data["__feature_norm__"])
    return False


def load_npz_params(params, npz_path: str):
    """Overlay converted weights onto an init pytree by flattened-path name
    (paths like 'params/_Conv_0/Conv_0/kernel')."""
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    data = np.load(npz_path)
    missing = []
    for k in flat:
        if k in data.files:
            flat[k] = jnp.asarray(data[k])
        else:
            missing.append(k)
    if missing:
        print(f"dhbc: {len(missing)} params not found in {npz_path}, kept init")
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def save_npz_params(params, npz_path: str, normalize_input: bool = True,
                    feature_norm: bool = False):
    """Saves weights plus the contracts they were trained with: input
    scale (``__normalize_input__``) and whether matching must compare
    L2-normalized descriptors (``__feature_norm__``, cosine-head
    training), so loading picks the right pipeline automatically."""
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    np.savez(npz_path, __normalize_input__=np.bool_(normalize_input),
             __feature_norm__=np.bool_(feature_norm),
             **{k: np.asarray(v) for k, v in flat.items()})


# --------------------------------------------------------------------- #
# Training — the reference's classify/_loss were bit-rotted dead code
# (core/net.py:58-87: missing self, undefined conf). This is the working
# equivalent: per-pixel correspondence classification heads over the
# feature map with masked softmax cross-entropy, as described in the DHBC
# paper the reference follows.


def dhbc_loss(features, labels, n_classes, head_kernel,
              cosine: bool = False, tau: float = 16.0):
    """features (B,H,W,16); labels (B,H,W) int32, 0 = unlabeled (masked);
    head_kernel (16, n_classes) classifier. Masked mean cross-entropy
    scaled by total/valid pixels like the reference's _loss intent.

    ``cosine``: L2-normalize features and class weights and scale by
    ``tau`` (a cosine classifier). The head is training-only scaffolding
    (the deployed descriptor is the 16-D feature map), so this does NOT
    change the reference topology — it bounds the logit scale on this
    normalization-free net, which otherwise collapses to the class prior
    at large n_classes (measured: 128 classes pinned at ln(128) with the
    plain linear head)."""
    if cosine:
        f = features / jnp.maximum(
            jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-6
        )
        w = head_kernel / jnp.maximum(
            jnp.linalg.norm(head_kernel, axis=0, keepdims=True), 1e-6
        )
        logits = tau * jnp.einsum("bhwf,fc->bhwc", f, w)
    else:
        logits = jnp.einsum("bhwf,fc->bhwc", features, head_kernel)
    logp = jax.nn.log_softmax(logits, axis=-1)
    mask = labels > 0
    lab = jnp.maximum(labels - 1, 0)
    nll = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
    valid = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / valid


def coord_loss(features, labels, coords, coord_head, coord_bias):
    """Auxiliary canonical-coordinate regression: a linear readout
    (16→3) of the descriptor must reproduce each foreground pixel's
    REST-POSE vertex coordinate (normalized), across every deformed
    training pose. This forces the 16-D descriptors to embed canonical
    surface position smoothly, so feature-space nearest-neighbor matching
    (core/sdf.py:147-150's KDTree-over-features contract) approximates
    canonical-space matching — the property that lets the CNN path win
    where closest-point snaps to the wrong surface part under large
    deformation. Classification over coarse regions alone leaves
    within-region matching random (measured: trained ≈ random + a few %
    at every bend angle).

    features (B,H,W,16); labels (B,H,W) int32 (0 = background, masked);
    coords (B,H,W,3) normalized rest-pose coordinates; head (16,3)+(3,).
    Masked mean squared error."""
    pred = jnp.einsum("bhwf,fc->bhwc", features, coord_head) + coord_bias
    mask = labels > 0
    se = jnp.sum((pred - coords) ** 2, axis=-1)
    valid = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, se, 0.0)) / valid


def make_train_step(model, learning_rate=1e-4, n_classes=500,
                    cosine: bool = False, tau: float = 16.0,
                    coord_weight: float = 0.0,
                    clip_norm: float | None = None):
    """``coord_weight > 0`` adds the coordinate-regression auxiliary; the
    returned ``step`` then takes ``head = (cls (16,C), coord (16,3),
    bias (3,))`` and an extra ``coords`` batch. With the default 0 the
    signature is unchanged (classification only).

    ``clip_norm``: global-norm gradient clipping. This normalization-free
    AlexNet-era net diverges without warning under Adam mid-training
    (measured repeatedly: converging to acc 0.16-0.76 then collapsing to
    the class prior within 300 steps); clipping bounds the outlier
    minibatch gradients that trigger it."""
    import optax

    tx = (optax.chain(optax.clip_by_global_norm(clip_norm),
                      optax.adam(learning_rate))
          if clip_norm else optax.adam(learning_rate))

    def loss_fn(params, head, depth, labels, coords=None):
        feats = model.apply(params, depth)
        if coord_weight > 0.0:
            cls_head, chead, cbias = head
            ce = dhbc_loss(feats, labels, n_classes, cls_head,
                           cosine=cosine, tau=tau)
            return ce + coord_weight * coord_loss(
                feats, labels, coords, chead, cbias
            )
        return dhbc_loss(feats, labels, n_classes, head, cosine=cosine,
                         tau=tau)

    @jax.jit
    def step(params, head, opt_state, depth, labels, coords=None):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, head, depth, labels, coords
        )
        # one optimizer over (features, head) jointly — a plain-SGD head
        # next to an Adam feature net stalls at its init, logits stay ~0,
        # and the loss plateaus at ln(n_classes)
        tree = {"p": params, "h": head}
        gtree = {"p": grads[0], "h": grads[1]}
        updates, opt_state = tx.update(gtree, opt_state, tree)
        tree = optax.apply_updates(tree, updates)
        return tree["p"], tree["h"], opt_state, loss

    def init_opt(params, head):
        return tx.init({"p": params, "h": head})

    return step, init_opt
