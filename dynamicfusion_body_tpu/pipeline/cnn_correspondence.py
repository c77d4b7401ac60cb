"""Learned (CNN) correspondence pipeline.

Replaces the reference's TF1 + OpenGL flow (core/sdf.py:75-150 +
core/fusion.py:277-296): render the mesh from 24 yaw angles (15° steps),
convert the z-buffer to the 8-bit linearized depth the network expects,
run DHBC to get per-pixel 16-D descriptors, scatter-average them onto
vertices via the ID render, then match canonical↔live vertices by
nearest descriptor.

TPU design: the renderer emits vertex IDs directly (no 24-bit color codec
round-trip — that codec still exists in utils/colorcodec.py for format
parity), the per-view loop is a ``lax.map`` over precomputed MVPs, and the
feature scatter is a ``segment_sum`` — the whole descriptor computation is
one jitted program instead of 24 GL readbacks + session.run calls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dhbc import DHBC, init_dhbc, load_npz_params
from ..render import glmath
from ..render.raster import render_id
from .correspondence import feature_correspondences


def view_mvps(n_views: int = 24, znear: float = 1.0, zfar: float = 3.5,
              swi: float = 35.0, max_swi: float = 70.0, dis: float = 200.0):
    """The reference's 24 view matrices (core/sdf.py:124-131)."""
    proj = glmath.perspective(glmath.radians(70), 1.0, znear, zfar)
    mvps = []
    for rot in range(0, 360, 360 // n_views):
        mod = glmath.identity()
        mod = glmath.rotate(mod, glmath.radians(swi - max_swi / 2), glmath.vec3(0, 1, 0))
        mod = glmath.translate(mod, glmath.vec3(0, 0, -dis / 100.0))
        mod = glmath.rotate(mod, glmath.radians(rot), glmath.vec3(0, 1, 0))
        mvps.append(proj @ mod)
    return np.stack(mvps).astype(np.float32)


def regularize_verts(verts, vert_mask, flipyz: bool = False):
    """Center + scale to 1.8-unit height over VALID verts (masked version
    of core/meshutil.py:62-69)."""
    if flipyz:
        verts = verts[:, [0, 2, 1]]
    big = jnp.where(vert_mask[:, None], verts, jnp.nan)
    ymax = jnp.nanmax(big[:, 1])
    ymin = jnp.nanmin(big[:, 1])
    mean = jnp.nanmean(big, axis=0)
    scale = 1.8 / jnp.maximum(ymax - ymin, 1e-6)
    out = (verts - mean) * scale
    return jnp.where(vert_mask[:, None], out, 0.0)


@partial(
    jax.jit, static_argnames=("h", "w", "S", "normalize_input",
                              "view_batch"),
)
def _descriptors(model_params, verts, faces, face_mask, vert_mask, mvps,
                 znear, zfar, h: int = 512, w: int = 512, S: int = 8,
                 normalize_input: bool = True, view_batch: int = 8):
    """Per-vertex 16-D descriptors averaged over all views (one jitted
    program; reference loop core/sdf.py:126-150).

    ``view_batch`` views run through DHBC as ONE (B,H,W,1) forward: the
    network's hot layers are the 16²-spatial 4096-channel 1×1 convs and
    the small-spatial 3×3s, which at B=1 leave the MXU starved on the
    batch/spatial axis — batching multiplies the GEMM M-dimension by B
    for identical weight traffic (measured numbers:
    benchmarks/bench_cnn.py). Renders stay serial (see below); the
    feature scatter is one flat segment_sum over all views."""
    model = DHBC(normalize_input=normalize_input)
    reg = regularize_verts(verts, vert_mask)
    b = zfar * znear / (znear - zfar)
    a = -b / znear
    n_verts = verts.shape[0]
    n_views = mvps.shape[0]
    vb = max(1, min(view_batch, n_views))
    if n_views % vb:
        vb = 1  # odd view counts fall back to singles

    # renders stay SERIAL — each view's rasterization keeps F·S²
    # fragment records live (~1 GB of transient pipeline state at the
    # live mesh's 2¹⁸ face cap, S=8) and batching renders keeps vb of
    # them live at once (measured: vmapped renders at vb=8 OOM a 16 GB
    # v5e); the stacked outputs are small (24·512²·4 B = 25 MB each)
    def render_one(mvp):
        ids, zwin = render_id(reg, faces, face_mask, mvp, h, w, S=S)
        depth8 = jnp.floor(
            jnp.clip((zfar - b / (zwin - a)) / (zfar - znear) * 255.0,
                     0, 255)
        )
        return ids, depth8

    ids_all, depth_all = jax.lax.map(render_one, mvps)

    # the NETWORK runs vb views as one (vb, h, w, 1) forward — the hot
    # layers (16²-spatial 4096-channel 1×1s and small-spatial 3×3s)
    # starve the MXU at B=1; batching multiplies the GEMM M-dim by vb
    # for identical weight traffic
    feats_all = jax.lax.map(
        lambda d8: model.apply(model_params,
                               d8[..., None].astype(jnp.float32)),
        depth_all.reshape(-1, vb, h, w),
    ).reshape(n_views, h, w, -1)

    # one flat scatter over ALL views (vertex ids are view-independent,
    # per-view sums just add)
    mask = ids_all > 0
    seg = jnp.where(mask, ids_all - 1, n_verts).reshape(-1)
    fsum = jax.ops.segment_sum(
        feats_all.reshape(-1, feats_all.shape[-1]), seg,
        num_segments=n_verts + 1,
    )[:n_verts]
    cnt = jax.ops.segment_sum(
        mask.reshape(-1).astype(jnp.float32), seg,
        num_segments=n_verts + 1,
    )[:n_verts]
    return fsum / jnp.maximum(cnt, 1.0)[:, None], cnt


class CnnCorrespondence:
    """Driver-facing wrapper (the reference's cnnInitialize +
    compute_correspondence pair, core/sdf.py:75-150)."""

    def __init__(self, weights_npz: str | None = None, image_size: int = 512,
                 n_views: int = 24, znear: float = 1.0, zfar: float = 3.5,
                 normalize_input: bool | None = None,
                 feature_norm: bool | None = None,
                 view_batch: int = 8,
                 samples: int = 4):
        """``normalize_input``: None = auto — use the contract recorded in
        the weights npz; weights files without the marker (converted
        reference checkpoints) default to False, the reference's raw
        0..255 feed (core/sdf.py:135-136); random init defaults True.
        ``feature_norm``: match L2-normalized descriptors (required for
        cosine-head-trained weights, where magnitude is classless); None =
        auto from the npz ``__feature_norm__`` marker."""
        if normalize_input is None:
            if weights_npz is not None:
                from ..models.dhbc import npz_normalize_input

                stored = npz_normalize_input(weights_npz)
                # no marker = converted reference checkpoint → raw scale
                normalize_input = False if stored is None else stored
            else:
                normalize_input = True
        if feature_norm is None:
            if weights_npz is not None:
                from ..models.dhbc import npz_feature_norm

                feature_norm = npz_feature_norm(weights_npz)
            else:
                feature_norm = False
        self.normalize_input = normalize_input
        self.feature_norm = feature_norm
        self.model, self.params = init_dhbc(
            h=image_size, w=image_size, normalize_input=normalize_input
        )
        if weights_npz is not None:
            self.params = load_npz_params(self.params, weights_npz)
        self.image_size = image_size
        self.mvps = jnp.asarray(view_mvps(n_views, znear, zfar))
        self.znear, self.zfar = znear, zfar
        self.view_batch = view_batch
        # rasterizer sample density: hole-free while triangle bboxes fit
        # in samples×samples pixels. Regularized body meshes (1.8-unit
        # height ≈ 400 px at these MVPs) have 1-3 px triangles at the
        # reference's mesh densities, and fragment scatters dominate the
        # whole CNN path (~F·samples²·24 scatter ops). Measured on a v5e
        # at bench meshes (benchmarks/bench_cnn.py): S=8 → 4290 ms/mesh
        # at 0.9993 vertex coverage, S=4 → 1288 ms at 0.9997 (identical
        # match count; full both-mesh setup 21.9 s → 5.9 s), S=2 →
        # coverage collapses (corner-only grids miss interiors). So 4.
        self.samples = samples

    def compute_correspondence(self, verts, faces, face_mask, vert_mask):
        """[N,16] descriptor per vertex (masked slots zero)."""
        feats, cnt = _descriptors(
            self.params, verts, faces, face_mask, vert_mask, self.mvps,
            self.znear, self.zfar, h=self.image_size, w=self.image_size,
            normalize_input=self.normalize_input,
            view_batch=self.view_batch, S=self.samples,
        )
        if self.feature_norm:
            feats = feats / jnp.maximum(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-6
            )
        return jnp.where(vert_mask[:, None], feats, 0.0), cnt

    def match(self, canon_mesh, live_mesh, vmask, lmask):
        """Feature-space matching canonical → live (core/fusion.py:280-285).
        Returns (corr (V,3), valid (V,))."""
        cf, _ = self.compute_correspondence(
            canon_mesh["verts"], canon_mesh["faces"],
            jnp.arange(canon_mesh["faces"].shape[0]) < canon_mesh["n_faces"],
            vmask,
        )
        lf, _ = self.compute_correspondence(
            live_mesh["verts"], live_mesh["faces"],
            jnp.arange(live_mesh["faces"].shape[0]) < live_mesh["n_faces"],
            lmask,
        )
        # invalid live descriptors must never win the NN search
        lf = jnp.where(lmask[:, None], lf, 1e10)
        return feature_correspondences(cf, vmask, lf, live_mesh["verts"], lmask)
