"""JAX triangle rasterizer (replaces OpenGL/GLSL offscreen rendering).

The reference renders with GLUT+FBO and three GLSL shaders whose net
effect is (a) a z-buffer and (b) an image where every fragment takes the
color of its triangle's DOMINANT-barycentric vertex — exact vertex-ID
colors for scatter lookup (core/gl/glrender.py, core/gl/default.{vs,gs,fs};
SURVEY §2 #9/#10). The TPU replacement is a sample-scatter rasterizer:

* every triangle gets an S×S pixel-space sample grid stretched over its
  screen bounding box; samples falling inside the triangle (edge-function
  barycentrics) are fragments. Rounding a ≤1px-spaced grid to pixel
  centers is hole-free whenever the bbox is ≤ S pixels — choose S by the
  expected triangle size (body meshes at 512² are few-px triangles);
* fragments scatter-min a quantized-depth key per pixel (no atomics
  needed), then winners scatter their payload (vertex id / camera depth)
  in a second pass — fully jittable, static shapes.

Front-ends:
* ``render_id`` — GL MVP → (1-based vertex-id image, window-depth buffer),
  feeding the CNN correspondence path; window depth is screen-space
  linear, matching the GL pipeline.
* ``render_depth`` — pinhole K/extrinsic → negative-depth map in the
  reference's convention (0 = no hit), with perspective-correct camera-z
  interpolation; generates FusionDM inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_ZQ = jnp.float32((1 << 22) - 1)


def _fragments(px, py, h, w, S):
    """Per-triangle S×S bbox sample grid → (pix (F,S²), bary (F,S²,3),
    inside (F,S²))."""
    xmin = jnp.clip(jnp.floor(jnp.min(px, axis=1)), 0, w - 1)
    xmax = jnp.clip(jnp.ceil(jnp.max(px, axis=1)), 0, w - 1)
    ymin = jnp.clip(jnp.floor(jnp.min(py, axis=1)), 0, h - 1)
    ymax = jnp.clip(jnp.ceil(jnp.max(py, axis=1)), 0, h - 1)
    # exact 1-px steps whenever the bbox fits in S samples (hole-free);
    # uniform stretch beyond that (triangles larger than S px may alias)
    i = jnp.arange(S, dtype=jnp.float32)
    step_x = jnp.maximum(1.0, (xmax - xmin) / (S - 1))
    step_y = jnp.maximum(1.0, (ymax - ymin) / (S - 1))
    sx = jnp.minimum(xmin[:, None] + i[None, :] * step_x[:, None], xmax[:, None])
    sy = jnp.minimum(ymin[:, None] + i[None, :] * step_y[:, None], ymax[:, None])
    ix = jnp.round(sx).astype(jnp.int32)
    iy = jnp.round(sy).astype(jnp.int32)
    gx = jnp.repeat(ix, S, axis=1)              # (F,S²) x-major
    gy = jnp.tile(iy, (1, S))
    fx = gx.astype(jnp.float32)
    fy = gy.astype(jnp.float32)

    x0, x1, x2 = px[:, 0:1], px[:, 1:2], px[:, 2:3]
    y0, y1, y2 = py[:, 0:1], py[:, 1:2], py[:, 2:3]
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    ok = jnp.abs(denom) > 1e-12
    denom = jnp.where(ok, denom, 1.0)
    b0 = ((y1 - y2) * (fx - x2) + (x2 - x1) * (fy - y2)) / denom
    b1 = ((y2 - y0) * (fx - x2) + (x0 - x2) * (fy - y2)) / denom
    b2 = 1.0 - b0 - b1
    eps = -1e-5
    inside = ok & (b0 >= eps) & (b1 >= eps) & (b2 >= eps)
    pix = gy * w + gx
    return pix, jnp.stack([b0, b1, b2], axis=-1), inside


def _zmin_scatter(pix, zq, valid, npix):
    big = jnp.int32(2**31 - 1)
    pixm = jnp.where(valid, pix, npix)
    zqm = jnp.where(valid, zq, big)
    zbuf = jnp.full((npix + 1,), big, jnp.int32).at[pixm].min(zqm)[:npix]
    return zbuf, big


@partial(jax.jit, static_argnames=("h", "w", "S"))
def render_id(verts, faces, face_mask, mvp, h: int, w: int, S: int = 8):
    """GL-pipeline ID render → (ids (h,w) int32 1-based, 0 = background;
    zwin (h,w) f32 in [0,1], 1 = background)."""
    tri = jnp.take(verts, faces.reshape(-1), axis=0).reshape(-1, 3, 3)
    ones = jnp.ones_like(tri[..., :1])
    clip = jnp.einsum(
        "ij,ftj->fti", mvp, jnp.concatenate([tri, ones], axis=-1),
        precision=jax.lax.Precision.HIGHEST,
    )
    ws = jnp.maximum(clip[..., 3], 1e-9)
    ndc = clip[..., :3] / ws[..., None]
    px = (ndc[..., 0] * 0.5 + 0.5) * (w - 1)
    # the reference flips the readback on both axes (glrender.py:128-129)
    # → row 0 = top = +y in NDC
    py = (1.0 - (ndc[..., 1] * 0.5 + 0.5)) * (h - 1)
    pz = ndc[..., 2] * 0.5 + 0.5

    pix, bary, inside = _fragments(px, py, h, w, S)
    sz = jnp.einsum("fsc,fc->fs", bary, pz)
    front = jnp.all(clip[..., 3] > 1e-6, axis=-1)[:, None]
    valid = inside & front & face_mask[:, None] & (sz >= 0.0) & (sz <= 1.0)

    dom = jnp.argmax(bary, axis=-1)  # (F,S²) dominant vertex (fs rule)
    fvid = jnp.take_along_axis(
        jnp.broadcast_to(faces[:, None, :], bary.shape).astype(jnp.int32),
        dom[..., None], axis=2,
    )[..., 0]

    npix = h * w
    zq = jnp.clip(sz * _ZQ, 0, _ZQ).astype(jnp.int32)
    zbuf, big = _zmin_scatter(pix.reshape(-1), zq.reshape(-1), valid.reshape(-1), npix)

    win = valid.reshape(-1) & (
        zq.reshape(-1) == jnp.take(jnp.append(zbuf, big), jnp.where(valid.reshape(-1), pix.reshape(-1), npix))
    )
    idbuf = (
        jnp.full((npix + 1,), big, jnp.int32)
        .at[jnp.where(win, pix.reshape(-1), npix)]
        .min(jnp.where(win, (fvid + 1).reshape(-1), big))[:npix]
    )
    ids = jnp.where(idbuf == big, 0, idbuf).reshape(h, w)
    zwin = jnp.where(zbuf == big, 1.0, zbuf.astype(jnp.float32) / _ZQ).reshape(h, w)
    return ids, zwin


@partial(jax.jit, static_argnames=("h", "w", "S"))
def render_depth(verts, faces, face_mask, K, lw, h: int, w: int, S: int = 8):
    """Pinhole depth render → NEGATIVE-depth map (h,w): -z_cam at hits,
    0 where nothing projects (the reference's no-measurement value,
    core/fusion_dm.py:196). Perspective-correct z via 1/z interpolation."""
    tri = jnp.take(verts, faces.reshape(-1), axis=0).reshape(-1, 3, 3)
    cam = jnp.einsum(
        "ij,ftj->fti", lw[:, :3], tri, precision=jax.lax.Precision.HIGHEST
    ) + lw[:, 3]
    z = cam[..., 2]
    proj = jnp.einsum("ij,ftj->fti", K, cam, precision=jax.lax.Precision.HIGHEST)
    zs = jnp.where(jnp.abs(proj[..., 2]) > 1e-9, proj[..., 2], 1e-9)
    px = proj[..., 0] / zs
    py = proj[..., 1] / zs

    pix, bary, inside = _fragments(px, py, h, w, S)
    inv_z = jnp.einsum("fsc,fc->fs", bary, 1.0 / jnp.maximum(z, 1e-9))
    sz = 1.0 / jnp.maximum(inv_z, 1e-9)
    front = jnp.all(z > 1e-6, axis=-1)[:, None]
    valid = inside & front & face_mask[:, None]

    npix = h * w
    zq = jnp.clip(sz * 1024.0, 0, jnp.float32(1 << 30)).astype(jnp.int32)
    zbuf, big = _zmin_scatter(pix.reshape(-1), zq.reshape(-1), valid.reshape(-1), npix)
    depth = jnp.where(zbuf == big, 0.0, -(zbuf.astype(jnp.float32) / 1024.0))
    return depth.reshape(h, w)
