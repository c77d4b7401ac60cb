"""Benchmark suite for the five BASELINE.json configs.

  1. rigid projective TSDF fusion of synthetic depth renders into 64³
  2. marching-cubes surface + normal extraction from the fused TSDF
  3. dense rigid ICP camera tracking over a multi-frame depth sequence
  4. warp-field DQB skinning + non-rigid TSDF update at 256³
  5. full DynamicFusion loop at 256³ (== bench.py, the headline metric)

Each config prints one JSON line. Run all: ``python benchmarks/suite.py``;
one: ``python benchmarks/suite.py --config 3``. The input meshes/depths
are synthesized (the reference's data/ directory is gitignored upstream;
SURVEY §2 #16).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bumpy_sdf  # noqa: E402


def _setup_jax():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _body_mesh(res=128, vert_cap=1 << 15, face_cap=1 << 16):
    """Synthetic deformable-body stand-in mesh via our own MC."""
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes

    sdf = bumpy_sdf(res, (res / 2,) * 3, res * 0.27, res / 64, 3.0)
    m = marching_cubes(jnp.asarray(sdf), vert_cap=vert_cap, face_cap=face_cap)
    nv, nf = int(m["n_verts"]), int(m["n_faces"])
    verts = np.asarray(m["verts"])[:nv] / res * 1.8 - 0.9  # ~metric units
    faces = np.asarray(m["faces"])[:nf]
    return verts.astype(np.float32), faces


def _render_views(verts, faces, K, n_views, h, w, dist=2.5):
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.ops.transforms import rotation_matrix
    from dynamicfusion_body_tpu.render.raster import render_depth

    depths, lws = [], []
    fmask = jnp.ones(len(faces), bool)
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        R = rotation_matrix(ang, [0, 1, 0])[:3, :3]
        t = np.array([0, 0, dist]) - R @ np.zeros(3)
        lw = np.concatenate([R, t[:, None]], 1).astype(np.float32)
        d = render_depth(
            jnp.asarray(verts), jnp.asarray(faces), fmask, jnp.asarray(K),
            jnp.asarray(lw), h, w, S=8,
        )
        depths.append(np.asarray(d))
        lws.append(lw)
    return depths, lws


def _fetch_one(x):
    """Completion barrier that works over the axon tunnel (a host fetch
    of one element; block_until_ready can return early there)."""
    import jax.numpy as jnp

    float(jnp.ravel(x)[0])


def _emit(name, ms, extra=None):
    out = {"metric": name, "value": round(ms, 2), "unit": "ms"}
    out.update(extra or {})
    print(json.dumps(out))


def config1():
    """Rigid projective fusion of rendered depth maps into 64³."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.pipeline.fusion import FusionDM

    K = np.array([[400.0, 0, 256], [0, 400, 256], [0, 0, 1]], np.float32)
    verts, faces = _body_mesh()
    depths, lws = _render_views(verts, faces, K, n_views=8, h=512, w=512)
    fus = FusionDM(0.05, K, tsdf_res=64, vert_cap=1 << 15, face_cap=1 << 16)
    fus.compute_live_tsdf(depths, lws, UseAutoAlignment=True,
                          as_numpy=False)  # warm
    t0 = time.time()
    fus.compute_live_tsdf(depths, lws, UseAutoAlignment=True,
                          as_numpy=False)
    _fetch_one(fus.volume.values)
    ms = (time.time() - t0) * 1000
    _emit("config1_rigid_fusion_64", ms, {"n_views": 8})

    # 256³ multi-view ingest (the Pallas one-pass kernel on TPU)
    fus2 = FusionDM(
        8.0 / 256 * 1.3, K, tsdf_res=256, vert_cap=1 << 17,
        face_cap=1 << 18,
    )
    fus2.compute_live_tsdf(depths, lws, UseAutoAlignment=True,
                           as_numpy=False)  # warm
    t0 = time.time()
    fus2.compute_live_tsdf(depths, lws, UseAutoAlignment=True,
                           as_numpy=False)
    _fetch_one(fus2.volume.values)
    ms = (time.time() - t0) * 1000
    _emit("config1_rigid_fusion_256", ms, {"n_views": 8})
    return fus


def config2():
    """Marching cubes + normals from the fused TSDF."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes

    vol = jnp.asarray(bumpy_sdf(256, (128,) * 3, 70.0, 4.0, 3.0))
    f = lambda: marching_cubes(vol, vert_cap=1 << 17, face_cap=1 << 18)
    out = f()
    nv = float(out["n_verts"])
    t0 = time.time()
    for _ in range(5):
        out = f()
        nv = float(out["n_verts"])
    _emit("config2_marching_cubes_256", (time.time() - t0) / 5 * 1000,
          {"n_verts": int(nv)})


def config3():
    """Rigid ICP camera tracking over a rendered depth sequence."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.ops.transforms import rotation_matrix
    from dynamicfusion_body_tpu.ops.se3 import se3_to_dq, dq_to_se3
    from dynamicfusion_body_tpu.pipeline.fusion import FusionDM

    K = np.array([[400.0, 0, 256], [0, 400, 256], [0, 0, 1]], np.float32)
    verts, faces = _body_mesh()
    # frame 0 fused from 8 views, then track 5 slightly-rotated live frames
    depths, lws = _render_views(verts, faces, K, n_views=8, h=512, w=512)
    fus = FusionDM(0.05, K, tsdf_res=96, vert_cap=1 << 15, face_cap=1 << 16)
    fus.compute_live_tsdf(depths, lws, UseAutoAlignment=True)
    fus.marching_cubes()

    errs, times = [], []
    for i, ang in enumerate(np.linspace(0.02, 0.1, 5)):
        # live TSDF: the same surface rigidly rotated in grid space
        Rg = rotation_matrix(ang, [0, 1, 0], point=[48, 48, 48])
        live = FusionDM(0.05, K, tsdf_res=96, vert_cap=1 << 15,
                        face_cap=1 << 16)
        live.volume = fus.volume
        # build live volume by resampling canonical under the rigid motion
        from dynamicfusion_body_tpu.ops.interp import trilinear

        g = np.arange(96, dtype=np.float32)
        x, y, z = np.meshgrid(g, g, g, indexing="ij")
        pts = np.stack([x, y, z], -1).reshape(-1, 3)
        inv = np.linalg.inv(Rg)
        pts_t = pts @ inv[:3, :3].T + inv[:3, 3]
        vals, ok = trilinear(fus.volume.values, jnp.asarray(pts_t))
        lv = jnp.where(ok, vals, 0.05).reshape(96, 96, 96)

        t0 = time.time()
        fus._lw = jnp.array([1, 0, 0, 0, 0, 0, 0, 0], jnp.float32)
        fus.solve(lv)
        jax.block_until_ready(fus._lw)
        times.append(time.time() - t0)
        est = np.asarray(dq_to_se3(fus._lw))
        gt = np.asarray(se3_to_dq(jnp.asarray(Rg, dtype=jnp.float32)))
        # rotation angle error
        cosang = (np.trace(est[:3, :3] @ Rg[:3, :3].T) - 1) / 2
        errs.append(abs(np.degrees(np.arccos(np.clip(cosang, -1, 1)))))
    _emit("config3_rigid_icp_tracking", float(np.median(times) * 1000),
          {"median_rot_err_deg": round(float(np.median(errs)), 3)})


def config4():
    """DQB skinning + non-rigid TSDF update at 256³ (updateTSDF alone)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.models import warp_field as WF
    from dynamicfusion_body_tpu.pipeline.frame import init_canonical
    from dynamicfusion_body_tpu.ops.trilerp_pallas import (
        trilerp_bricks_supported,
    )

    canonical = jnp.asarray(bumpy_sdf(256, (128,) * 3, 70.0, 4.0, 3.0, 0.0))
    live = jnp.asarray(bumpy_sdf(256, (130, 129, 128), 70.0, 4.0, 3.0, 0.1))
    tdist = float(canonical.max())
    wf, _ = init_canonical(canonical, subsample_rate=1.5, node_cap=4096,
                           mc_step=2, vert_cap=1 << 15, face_cap=1 << 16)
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    use_pallas = (jax.default_backend() == "tpu"
                  and trilerp_bricks_supported((256,) * 3, 8))

    def f():
        return WF.update_tsdf_nonrigid(
            canonical, jnp.zeros_like(canonical), live, wf, lw, k=3,
            tdist=tdist, brick=8, n_candidates=16, use_pallas=use_pallas,
        )

    v, w, _, _ = f()
    x = float(v[0, 0, 0])
    t0 = time.time()
    for _ in range(3):
        v, w, _, _ = f()
        x = float(v[0, 0, 0])
    _emit("config4_nonrigid_update_256", (time.time() - t0) / 3 * 1000,
          {"pallas": use_pallas})


def config5():
    """Full DynamicFusion frame at 256³ — delegates to bench.py."""
    import subprocess

    subprocess.run([sys.executable, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py")], check=True)


REF_MESH = "/root/reference/meshes/original.obj"


def _sample_surface(verts, faces, n, seed=0):
    """~n points uniformly on the triangle surface (area-weighted)."""
    rng = np.random.RandomState(seed)
    tri = verts[faces]  # (F, 3, 3)
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    )
    p = area / area.sum()
    fi = rng.choice(len(faces), size=n, p=p)
    u, v = rng.rand(n), rng.rand(n)
    flip = u + v > 1
    u, v = np.where(flip, 1 - u, u), np.where(flip, 1 - v, v)
    t = tri[fi]
    return (
        t[:, 0]
        + u[:, None] * (t[:, 1] - t[:, 0])
        + v[:, None] * (t[:, 2] - t[:, 0])
    ).astype(np.float32)


def config6():
    """Accuracy gate (BASELINE config 1 as written): render the reference's
    own result mesh ``meshes/original.obj`` (the one real artifact,
    SURVEY §2 #16) from 8 views, fuse rigidly at 64³ and 256³, extract the
    surface, and report the mean distance of extracted vertices to the
    input surface — in world units and voxel units."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from dynamicfusion_body_tpu.io.mesh_io import load_obj, regularize_mesh
    from dynamicfusion_body_tpu.pipeline.fusion import FusionDM

    if not os.path.exists(REF_MESH):
        print(json.dumps({"metric": "config6_mesh_vertex_error",
                          "error": f"missing {REF_MESH}"}))
        return
    verts, faces = load_obj(REF_MESH)
    verts = np.asarray(regularize_mesh(jnp.asarray(verts)))  # ~1.8 m tall
    K = np.array([[400.0, 0, 256], [0, 400, 256], [0, 0, 1]], np.float32)
    depths, lws = _render_views(verts, faces, K, n_views=8, h=512, w=512)
    surf = _sample_surface(verts, faces, 300_000)
    tree = cKDTree(surf)

    for res, caps in ((64, (1 << 15, 1 << 16)), (256, (1 << 17, 1 << 18))):
        fus = FusionDM(
            8.0 / res * 1.3, K, tsdf_res=res, vert_cap=caps[0],
            face_cap=caps[1],
        )
        fus.compute_live_tsdf(depths, lws, UseAutoAlignment=True)
        fus.marching_cubes()  # caches the canonical mesh, reference-style
        m = fus._mesh
        nv = int(m["n_verts"])
        gv = np.asarray(m["verts"])[:nv]  # grid coords
        ind = np.asarray(fus._IND)
        wv = gv @ ind[:3, :3].T + ind[:3, 3]  # world coords
        d, _ = tree.query(wv, k=1)
        voxel = float(ind[0, 0])  # grid scale (isotropic)
        # only WELL-OBSERVED surface is meaningful: 8 yaw views leave
        # regions (head top, soles, self-occlusions) unseen, and MC
        # extracts the truncation shell there — gate vertices on the
        # fused observation weight at their location
        from dynamicfusion_body_tpu.ops.interp import trilinear

        wts, okw = trilinear(fus.volume.weights, jnp.asarray(gv))
        obs = np.asarray(wts) >= 3.0
        do = d[obs] if obs.any() else d
        print(json.dumps({
            "metric": f"config6_mesh_vertex_error_{res}",
            "value": round(float(np.mean(do) / voxel), 3),
            "unit": "voxels",
            "mean_err_world": round(float(np.mean(do)), 5),
            "p95_err_voxels": round(float(np.percentile(do, 95) / voxel), 3),
            "n_verts": nv,
            "observed_frac": round(float(obs.mean()), 3),
        }))


def _make_bend(ref_verts):
    """Analytic smooth bend about x through the centroid, blended by
    height (the train_dhbc.py bend_mesh warp with its parameters frozen
    from ``ref_verts`` so it applies to ARBITRARY points — the ground
    truth for config7)."""
    c = ref_verts.mean(0)
    y = ref_verts[:, 1] - c[1]
    h = (y.max() - y.min()) + 1e-6

    def bend(pts, angle):
        p = pts - c
        t = 1.0 / (1.0 + np.exp(-8.0 * (p[:, 1] / h)))
        ca, sa = np.cos(angle * t), np.sin(angle * t)
        out = np.empty_like(p)
        out[:, 0] = p[:, 0]
        out[:, 1] = ca * p[:, 1] - sa * p[:, 2]
        out[:, 2] = sa * p[:, 1] + ca * p[:, 2]
        return (out + c).astype(np.float32)

    return bend


def config7():
    """Non-rigid END-TO-END accuracy gate (VERDICT r2 item 4): deform the
    reference's own result mesh (meshes/original.obj — produced by the
    reference's non-rigid loop, core/fusion.py:577-586) by a KNOWN smooth
    warp, build live TSDFs by multi-view depth fusion on the canonical
    lattice, run the full ``Fusion`` loop per frame (setupCorrespondences
    → solve → updateTSDF → update_graph, the reference flow
    test.py:104-138), and report, at 64³ and 256³:

    * point-to-SURFACE error of the tracked canonical surface vs the true
      deformed surface (the primary metric — it is what updateTSDF
      consumes: a warp that lands on the live surface fuses correctly);
    * material-point (vertex-correspondence) error as a secondary bound —
      a smooth bend slides the body along itself and closest-point data
      terms cannot observe tangential sliding (the ICP aperture problem;
      the reference's clpts mode shares the null space)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.io.mesh_io import load_obj, regularize_mesh
    from dynamicfusion_body_tpu.models.tsdf_volume import TsdfVolume
    from dynamicfusion_body_tpu.ops.interp import trilinear
    from dynamicfusion_body_tpu.pipeline.fusion import Fusion, FusionDM

    if not os.path.exists(REF_MESH):
        print(json.dumps({"metric": "config7_nonrigid_vertex_error",
                          "error": f"missing {REF_MESH}"}))
        return
    verts, faces = load_obj(REF_MESH)
    verts = np.asarray(regularize_mesh(jnp.asarray(verts)))
    bend = _make_bend(verts)
    K = np.array([[400.0, 0, 256], [0, 400, 256], [0, 0, 1]], np.float32)
    angles = [0.08, 0.16, 0.24]

    # Cap sizing (measured round 3): the body's step-1 live mesh at 256³
    # exceeds 2^17 verts (a plain 256³ sphere already extracts 152k) — a
    # truncated live surface feeds partial correspondences and the
    # tracker diverges (measured 58 voxels surface error vs 5.8 if left
    # untracked). Raising Fusion's single shared cap to 2^18 reproducibly
    # crashed the axon TPU worker (cap-scaled solver tables — e.g. the
    # 2^18×4096 neighbor-distance matrix — on top of two 256³ volume
    # pairs); the fix is the live/canonical cap split (Fusion
    # live_vert_cap, mirroring fusion_frame's) so only the
    # correspondence-side arrays grow.
    only = int(os.environ.get("CONFIG7_RES", "0"))  # 0 = both
    for res, caps, live_caps, node_cap in (
        (64, (1 << 15, 1 << 16), (1 << 15, 1 << 16), 1024),
        (256, (1 << 17, 1 << 18), (1 << 18, 1 << 19), 4096),
    ):
        if only and res != only:
            continue
        tdist = 8.0 / res * 1.3
        dm = FusionDM(tdist, K, tsdf_res=res, vert_cap=caps[0],
                      face_cap=caps[1])
        depths0, lws = _render_views(verts, faces, K, n_views=8, h=512,
                                     w=512)
        canon_v, canon_w = dm.compute_live_tsdf(depths0, lws,
                                                UseAutoAlignment=True)
        ind = np.asarray(dm._IND)
        voxel = float(ind[0, 0])
        ind_inv = np.linalg.inv(ind)

        # World-space knobs must not shrink with the lattice: the node
        # radius is subsample_rate × mean mesh-edge length
        # (reference core/fusion.py:89-92) and edges are res/64× shorter
        # at higher res — scale subsample_rate and the canonical MC step
        # so node density and solver size stay a property of the BODY,
        # not the lattice (at 2.0/step-2 the 256³ run wanted ~90k nodes
        # and saturated every pool).
        mc_step = 2 if res <= 64 else 3
        ssr = 2.0 * (res / 64) / (mc_step / 2)
        fus = Fusion(
            canon_v, tdist, subsample_rate=ssr, knn=3,
            marching_cubes_step_size=mc_step, write_warpfield=False,
            vert_cap=caps[0], face_cap=caps[1], node_cap=node_cap,
            live_vert_cap=live_caps[0], live_face_cap=live_caps[1],
        )
        # canonical surface sample (grid coords) + world positions
        m = fus._mesh
        nv = int(m["n_verts"])
        gv = np.asarray(m["verts"])[:nv]
        wv = gv @ ind[:3, :3].T + ind[:3, 3]
        wts, _ = trilinear(jnp.asarray(canon_w), jnp.asarray(gv))
        obs = np.asarray(wts) >= 3.0

        # dense true-surface sample for the point-to-surface metric
        surf = np.concatenate(
            [verts, verts[faces].mean(1),
             0.5 * (verts[faces[:, 0]] + verts[faces[:, 1]])], 0
        )

        def p2s(pts, ang):
            tgt = jnp.asarray(bend(surf, ang))
            outs = []
            pj = jnp.asarray(pts)
            for i in range(0, len(pts), 2048):
                d2 = jnp.sum(
                    (pj[i:i + 2048, None, :] - tgt[None]) ** 2, -1
                )
                outs.append(np.asarray(jnp.sqrt(jnp.min(d2, 1))))
            return np.concatenate(outs)

        t0 = time.time()
        verr_frames, serr_frames = [], []
        for ang in angles:
            bent = bend(verts, ang)
            depths, _ = _render_views(bent, faces, K, n_views=8, h=512,
                                      w=512)
            # live TSDF on the SAME lattice as the canonical volume
            fresh = TsdfVolume.create(res, tdist, ind=jnp.asarray(ind))
            dm.volume = fresh
            live_v, _ = dm._fuse_all(
                fresh.values, fresh.weights, depths, lws
            )
            # live_mc_step 2 at 256³: the body's step-1 live mesh
            # (>2^18 verts) exceeds any practical pool; step 2 halves the
            # live sampling density (still 2× the canonical step) and is
            # the documented knob for bounding the live pool
            fus.setupCorrespondences(live_v, method="clpts", tolerance=5.0,
                                     live_mc_step=1 if res <= 64 else 2)
            fus.solve(regularization_weight=0.5, method="clpts")
            fus.updateTSDF()
            fus.update_graph()
            # tracked canonical surface vs ground-truth deformation
            tracked_g = fus.warp(gv, m_lw=fus._lw)
            tracked_w = np.asarray(tracked_g) @ ind[:3, :3].T + ind[:3, 3]
            truth_w = bend(wv, ang)
            err = np.linalg.norm(tracked_w - truth_w, axis=1)
            verr_frames.append(err[obs] if obs.any() else err)
            serr_frames.append(
                p2s(tracked_w[obs] if obs.any() else tracked_w, ang)
            )
        dt = time.time() - t0

        e, s = verr_frames[-1], serr_frames[-1]
        s_untracked = p2s(wv[obs] if obs.any() else wv, angles[-1])
        print(json.dumps({
            "metric": f"config7_nonrigid_surface_error_{res}",
            "value": round(float(np.mean(s) / voxel), 3),
            "unit": "voxels",
            "mean_err_world": round(float(np.mean(s)), 5),
            "p95_err_voxels": round(float(np.percentile(s, 95) / voxel), 3),
            "per_frame_voxels": [
                round(float(np.mean(x) / voxel), 3) for x in serr_frames
            ],
            "untracked_voxels": round(
                float(np.mean(s_untracked) / voxel), 3
            ),
            "vertex_err_voxels": round(float(np.mean(e) / voxel), 3),
            "vertex_err_per_frame": [
                round(float(np.mean(x) / voxel), 3) for x in verr_frames
            ],
            "final_bend_rad": angles[-1],
            "n_tracked": int(obs.sum()),
            "total_s": round(dt, 1),
        }))


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6, 7: config7}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0, help="0 = all")
    args = ap.parse_args()
    todo = [args.config] if args.config else sorted(CONFIGS)
    for c in todo:
        CONFIGS[c]()


if __name__ == "__main__":
    main()
