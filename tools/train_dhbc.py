"""Train DHBC on synthetic ID-labeled depth renders + correspondence ablation.

The reference's CNN correspondence mode restores an external TF checkpoint
(core/sdf.py:85-93, core/models/README.txt — a Google-Drive artifact this
environment cannot fetch). This script makes the capability real without
it: following the DHBC training recipe the reference's bit-rotted
``classify``/``_loss`` gestured at (core/net.py:58-87), it

1. builds a body mesh (the reference's own result mesh
   /root/reference/meshes/original.obj when present, else a synthetic
   asymmetric blob),
2. partitions the surface into ``n_classes`` regions (FPS centers +
   nearest-center labels),
3. renders (depth8, per-pixel region label) pairs from yaw views with the
   package rasterizer,
4. trains the Flax DHBC with models.dhbc.make_train_step,
5. saves weights to --out (npz, loadable by Fusion(cnn_weights=...)), and
6. reports the correspondence ablation: mean 3D match error under a large
   synthetic bend for clpts vs CNN(trained) vs CNN(random).

Run: python tools/train_dhbc.py --out /root/repo/data/dhbc_synth.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def body_mesh(res=128):
    """Body-like mesh: original.obj if available, else asymmetric blob."""
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.io.mesh_io import load_obj
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes

    ref = "/root/reference/meshes/original.obj"
    if os.path.exists(ref):
        v, f = load_obj(ref)
        return np.asarray(v, np.float32), np.asarray(f, np.int32)
    g = np.arange(res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (res - 1) / 2
    dx, dy, dz = x - c, y - c, z - c
    r = np.sqrt(dx * dx + dy * dy + dz * dz) + 1e-6
    th = np.arccos(np.clip(dz / r, -1, 1))
    ph = np.arctan2(dy, dx)
    bump = 4.0 * np.sin(3 * th + 0.5) * np.cos(2 * ph) + 2.5 * np.sin(
        5 * ph + 1.3
    )
    sdf = (r - (0.27 * res + bump)).astype(np.float32)
    m = marching_cubes(jnp.asarray(sdf), vert_cap=1 << 15, face_cap=1 << 16)
    nv, nf = int(m["n_verts"]), int(m["n_faces"])
    return (np.asarray(m["verts"])[:nv].astype(np.float32),
            np.asarray(m["faces"])[:nf].astype(np.int32))


def region_labels(verts, n_classes, seed=0):
    """FPS centers + nearest-center region id (1-based; 0 = background)."""
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.ops.sampling import furthest_point_sample

    idx, _ = furthest_point_sample(
        jnp.asarray(verts), n_classes, start_idx=seed
    )
    centers = verts[np.asarray(idx)]
    d = np.linalg.norm(verts[:, None, :] - centers[None], axis=-1)
    return (np.argmin(d, axis=1) + 1).astype(np.int32)


def make_dataset(verts, faces, vlabels, mvps, size, znear=1.0, zfar=3.5,
                 vcoords=None):
    """Per view: (depth8 (H,W,1), labels (H,W) int32[, coords (H,W,3)]).

    ``vcoords``: per-vertex REST-POSE normalized coordinates. Like the
    region labels they transfer unchanged to deformed copies of the mesh
    (identity supervision), so pass the same table for every pose."""
    import jax
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.pipeline.cnn_correspondence import (
        regularize_verts,
    )
    from dynamicfusion_body_tpu.render.raster import render_id

    reg = regularize_verts(
        jnp.asarray(verts), jnp.ones(len(verts), bool)
    )
    fmask = jnp.ones(len(faces), bool)
    b = zfar * znear / (znear - zfar)
    a = -b / znear
    vl = jnp.asarray(np.concatenate([[0], vlabels]))  # 0 = background
    vc = (None if vcoords is None else
          jnp.asarray(np.concatenate([np.zeros((1, 3), np.float32),
                                      vcoords])))

    @jax.jit
    def one(mvp):
        ids, zwin = render_id(reg, jnp.asarray(faces), fmask, mvp, size,
                              size, S=8)
        depth8 = jnp.floor(
            jnp.clip((zfar - b / (zwin - a)) / (zfar - znear) * 255.0, 0, 255)
        )
        lab = jnp.take(vl, ids, axis=0)
        out = (depth8.astype(jnp.float32), lab.astype(jnp.int32))
        if vc is not None:
            out += (jnp.take(vc, ids, axis=0).astype(jnp.float32),)
        return out

    return [one(jnp.asarray(m)) for m in mvps]


def bend_mesh(verts, angle=0.7):
    """Large smooth deformation: bend the top half about x through the
    centroid, blended by height."""
    c = verts.mean(0)
    y = verts[:, 1] - c[1]
    h = (y.max() - y.min()) + 1e-6
    t = 1.0 / (1.0 + np.exp(-8.0 * (y / h)))  # 0 bottom → 1 top
    out = np.empty_like(verts)
    ca, sa = np.cos(angle * t), np.sin(angle * t)
    p = verts - c
    out[:, 0] = p[:, 0]
    out[:, 1] = ca * p[:, 1] - sa * p[:, 2]
    out[:, 2] = sa * p[:, 1] + ca * p[:, 2]
    return (out + c).astype(np.float32)


def random_deform(verts, rng):
    """Random large smooth deformation for training augmentation: one or
    two height-blended bends about random horizontal axes (the same
    family as ``bend_mesh`` but with random axis/angle/direction) plus a
    small twist about the vertical. Per-vertex labels transfer unchanged
    — this is the pose augmentation the DHBC recipe trains with (the
    reference checkpoint was trained across many poses of the same body
    model; core/net.py's net is pose-free so invariance must come from
    data)."""
    c = verts.mean(0)
    p = verts - c
    y = p[:, 1]
    h = (y.max() - y.min()) + 1e-6

    for _ in range(rng.integers(1, 3)):
        angle = rng.uniform(0.5, 3.2) * rng.choice([-1.0, 1.0])
        # blend profile: bend the top or the bottom, random sharpness
        sharp = rng.uniform(5.0, 10.0)
        sign = rng.choice([-1.0, 1.0])
        t = 1.0 / (1.0 + np.exp(-sharp * sign * (y / h)))
        # random horizontal bend axis: rotate the (y,z) bend plane about y
        phi = rng.uniform(0.0, 2 * np.pi)
        cp, sp = np.cos(phi), np.sin(phi)
        xz = np.stack([cp * p[:, 0] + sp * p[:, 2],
                       -sp * p[:, 0] + cp * p[:, 2]], 1)
        ca, sa = np.cos(angle * t), np.sin(angle * t)
        py, pz = p[:, 1].copy(), xz[:, 1].copy()
        ny = ca * py - sa * pz
        nz = sa * py + ca * pz
        p = np.stack([cp * xz[:, 0] - sp * nz, ny,
                      sp * xz[:, 0] + cp * nz], 1)

    # small twist about the vertical axis, blended by height
    tw = rng.uniform(-0.6, 0.6) * (p[:, 1] / h)
    ct, st = np.cos(tw), np.sin(tw)
    p = np.stack([ct * p[:, 0] - st * p[:, 2], p[:, 1],
                  st * p[:, 0] + ct * p[:, 2]], 1)
    return (p + c).astype(np.float32)


def yaw_mesh(verts, yaw):
    """Rigid yaw about the vertical axis through the centroid — stacked on
    a bend it models the loop-closure / tracking-loss regime: the live
    surface is a large unknown motion away from the canonical estimate,
    so closest-point snaps canonical vertices to the WRONG side of the
    body, while descriptor matching is viewpoint-invariant (features are
    averaged over the full yaw view circle, core/sdf.py:126-146)."""
    c = verts.mean(0)
    p = verts - c
    cy, sy = np.cos(yaw), np.sin(yaw)
    out = np.stack([cy * p[:, 0] + sy * p[:, 2], p[:, 1],
                    -sy * p[:, 0] + cy * p[:, 2]], 1)
    return (out + c).astype(np.float32)


def match_error(corr, valid, gt_live, vmask):
    """Mean 3D distance between matched live points and the TRUE deformed
    position of each canonical vertex."""
    m = np.asarray(valid) & np.asarray(vmask)
    d = np.linalg.norm(np.asarray(corr) - gt_live, axis=1)
    return float(d[m].mean()), int(m.sum())


def ablation(verts, faces, params_trained, size, n_views=24, angle=0.7,
             feature_norm=False, yaw=0.0):
    """clpts vs CNN(random) vs CNN(trained) under a large bend, optionally
    composed with a rigid yaw (loop-closure regime, see yaw_mesh)."""
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.pipeline.cnn_correspondence import (
        CnnCorrespondence,
    )
    from dynamicfusion_body_tpu.pipeline.correspondence import (
        closest_point_correspondences,
    )

    live_v = bend_mesh(verts, angle=angle)
    if yaw:
        live_v = yaw_mesh(live_v, yaw)
    V = len(verts)
    vmask = jnp.ones(V, bool)
    canon = {"verts": jnp.asarray(verts), "faces": jnp.asarray(faces),
             "n_faces": jnp.int32(len(faces)),
             "normals": jnp.zeros((V, 3), jnp.float32)}
    live = {"verts": jnp.asarray(live_v), "faces": jnp.asarray(faces),
            "n_faces": jnp.int32(len(faces))}

    # normals for clpts point-to-plane: area-weighted vertex normals
    tri = verts[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vn = np.zeros_like(verts)
    np.add.at(vn, faces.reshape(-1), np.repeat(fn, 3, axis=0))
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-9)

    out = {}
    corr, valid, _ = closest_point_correspondences(
        jnp.asarray(verts), jnp.asarray(vn), vmask, jnp.asarray(live_v),
        vmask, 4, tolerance=1e9,
    )
    out["clpts"] = match_error(corr, valid, live_v, np.ones(V, bool))

    # attribution arm: yaw-invariant GEOMETRY, zero learning. The CNN
    # path's yaw robustness comes from averaging descriptors over the
    # full view circle — quotienting out yaw. The geometric equivalent
    # of that quotient is matching on (height, cylindrical radius) of
    # the same normalized vertices the renderer sees: whatever error
    # this arm reaches is what view-circle averaging alone buys, and
    # only the margin beyond it is attributable to learned features.
    from dynamicfusion_body_tpu.pipeline.cnn_correspondence import (
        regularize_verts,
    )
    from dynamicfusion_body_tpu.pipeline.correspondence import (
        feature_correspondences,
    )

    def yawinv_desc(v):
        reg = regularize_verts(jnp.asarray(v), vmask)
        r_cyl = jnp.sqrt(reg[:, 0] ** 2 + reg[:, 2] ** 2)
        return jnp.stack([reg[:, 1], r_cyl], axis=-1)

    corr, valid = feature_correspondences(
        yawinv_desc(verts), vmask, yawinv_desc(live_v),
        jnp.asarray(live_v), vmask,
    )
    out["clpts_yawinv"] = match_error(corr, valid, live_v, np.ones(V, bool))

    for tag, p in (("cnn_random", None), ("cnn_trained", params_trained)):
        cc = CnnCorrespondence(image_size=size)
        if p is not None:
            cc.params = p
            cc.feature_norm = feature_norm
        corr, valid = cc.match(canon, live, vmask, vmask)
        out[tag] = match_error(corr, valid, live_v, np.ones(V, bool))
    return out


def main():
    ap = argparse.ArgumentParser()
    # defaults = the measured-stable recipe: this normalization-free
    # AlexNet-era net collapses to the class prior at larger image sizes
    # / view batches (loss pinned at ln(n_classes)); 64px, 6 views,
    # constant 1e-3 reaches ~0.7 train-view pixel accuracy in 300 steps
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--n-classes", type=int, default=16)
    ap.add_argument("--n-views", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="/root/repo/data/dhbc_synth.npz")
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--bends", type=float, nargs="+", default=[0.7],
                    help="bend angles (rad) for the --ablate sweep")
    ap.add_argument("--decay", action="store_true")
    ap.add_argument("--cosine", action="store_true",
                    help="cosine classifier head (needed for large "
                         "n_classes — the plain linear head collapses to "
                         "the class prior at 128 classes)")
    ap.add_argument("--tau", type=float, default=16.0)
    ap.add_argument("--init-from", default=None,
                    help="npz weights to warm-start the feature net from "
                         "(progressive coarse-to-fine training, as the "
                         "DHBC paper does)")
    ap.add_argument("--aug-poses", type=int, default=0,
                    help="extra randomly-deformed copies of the mesh to "
                         "render for training (deformation augmentation; "
                         "labels transfer unchanged)")
    ap.add_argument("--batch", type=int, default=0,
                    help="minibatch size (views per step); 0 = full batch")
    ap.add_argument("--clip", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off); guards "
                         "against the measured mid-training collapse of "
                         "this normalization-free net")
    ap.add_argument("--coord-weight", type=float, default=0.0,
                    help="weight of the canonical-coordinate regression "
                         "auxiliary (a linear 16→3 readout of the "
                         "descriptor must reproduce each pixel's "
                         "rest-pose coordinate across all deformed "
                         "poses); 0 = classification only")
    args = ap.parse_args()

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.models.dhbc import (
        init_dhbc, make_train_step, save_npz_params,
    )
    from dynamicfusion_body_tpu.pipeline.cnn_correspondence import view_mvps

    verts, faces = body_mesh()
    print(f"# mesh: {len(verts)} verts, {len(faces)} faces", flush=True)
    labels = region_labels(verts, args.n_classes)
    # rest-pose coordinates normalized to ~[-0.5, 0.5] by the mesh height
    # — the identity signal for the coordinate-regression auxiliary
    vc = None
    if args.coord_weight > 0:
        c = verts.mean(0)
        h = (verts[:, 1].max() - verts[:, 1].min()) + 1e-6
        vc = ((verts - c) / h).astype(np.float32)
    mvps = view_mvps(args.n_views)
    data = make_dataset(verts, faces, labels, mvps, args.size, vcoords=vc)
    # deformation augmentation: bent/twisted variants of the same mesh
    # with unchanged vertex labels — without it, descriptors trained on
    # the rest pose alone do not transfer to the deformed live mesh
    # (measured: trained ≈ random matching error at every bend angle)
    rng = np.random.default_rng(7)
    for _ in range(args.aug_poses):
        dv = random_deform(verts, rng)
        data += make_dataset(dv, faces, labels, mvps, args.size,
                             vcoords=vc)
    print(f"# dataset: {len(data)} views at {args.size}^2 "
          f"({args.aug_poses} augmented poses)", flush=True)

    import optax

    model, params = init_dhbc(h=args.size, w=args.size)
    if args.init_from:
        from dynamicfusion_body_tpu.models.dhbc import load_npz_params

        params = load_npz_params(params, args.init_from)
        print(f"# warm-start from {args.init_from}", flush=True)
    # optional cosine decay (constant lr can diverge once the loss gets
    # low on this normalization-free net; decay too early can freeze it)
    lr = (optax.cosine_decay_schedule(args.lr, args.steps)
          if args.decay else args.lr)
    step, init_opt = make_train_step(model, lr, args.n_classes,
                                     cosine=args.cosine, tau=args.tau,
                                     coord_weight=args.coord_weight,
                                     clip_norm=args.clip or None)
    head = jax.random.normal(
        jax.random.PRNGKey(1), (16, args.n_classes), jnp.float32
    ) * 0.1
    if args.coord_weight > 0:
        head = (head,
                jax.random.normal(jax.random.PRNGKey(2), (16, 3),
                                  jnp.float32) * 0.1,
                jnp.zeros(3, jnp.float32))
    opt_state = init_opt(params, head)

    # full-batch steps over all views — batch-1 SGD left this net (no
    # normalization layers, stride-4 stem) stuck at ln(n_classes).
    # With augmentation the dataset grows; --batch samples a fixed-size
    # view minibatch per step to keep step cost flat.
    depth_b = jnp.stack([d[0] for d in data])[..., None]
    lab_b = jnp.stack([d[1] for d in data])
    coord_b = (jnp.stack([d[2] for d in data])
               if args.coord_weight > 0 else None)
    nview = depth_b.shape[0]
    bsz = args.batch if 0 < args.batch < nview else nview
    brng = np.random.default_rng(11)

    def pix_acc(p, hd):
        feats = model.apply(p, depth_b[:1])
        cls = hd[0] if isinstance(hd, tuple) else hd
        pred = np.asarray(jnp.argmax(feats[0] @ cls, axis=-1)) + 1
        lab = np.asarray(lab_b[0])
        fg = lab > 0
        return float((pred[fg] == lab[fg]).mean())

    # keep the best-loss parameters — constant-lr Adam on this net can
    # diverge without warning after converging (measured: acc 0.76 at
    # step 250, collapse by step 300)
    best = (np.inf, params, head)
    t0 = time.time()
    for i in range(args.steps):
        if bsz < nview:
            sel = brng.choice(nview, size=bsz, replace=False)
            db, lb = depth_b[jnp.asarray(sel)], lab_b[jnp.asarray(sel)]
            cb = (coord_b[jnp.asarray(sel)] if coord_b is not None
                  else None)
        else:
            db, lb, cb = depth_b, lab_b, coord_b
        params, head, opt_state, loss = step(
            params, head, opt_state, db, lb, cb
        )
        l = float(loss)
        if l < best[0]:
            best = (l, params, head)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:5d} loss {l:.4f} "
                  f"acc0 {pix_acc(params, head):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    print(f"# best loss {best[0]:.4f}", flush=True)
    params, head = best[1], best[2]
    print(f"# best acc0 {pix_acc(params, head):.3f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_npz_params(params, args.out, feature_norm=args.cosine)
    cls_head = head[0] if isinstance(head, tuple) else head
    np.save(args.out.replace(".npz", "_head.npy"), np.asarray(cls_head))
    print(f"# saved {args.out}", flush=True)

    if args.ablate:
        for ang in args.bends:
            res = ablation(verts, faces, params, args.size, angle=ang,
                           feature_norm=args.cosine)
            print(f"# correspondence ablation at bend={ang} rad "
                  "(mean 3D match error, n_valid):")
            for k, v in res.items():
                print(f"#   {k:12s} err={v[0]:.4f} n={v[1]}", flush=True)


if __name__ == "__main__":
    main()
