"""Decompose config7's 256³ non-rigid tracking error (VERDICT r4 #3).

benchmarks/suite.py config7 reports 2.6 voxels mean point-to-surface at
256³ vs 1.4 at 64³ — resolution-inverted in voxel units (in WORLD units
256³ is ~2× better, but not the 4× the finer lattice should buy). This
tool runs the SAME 256³ protocol with one knob overridden per arm so the
dominant term can be measured instead of guessed:

  tolerance      point-plane prune (GRID units — 5 voxels at 256³ is a
                 4× tighter WORLD prune than at 64³)
  live_mc_step   live-surface sampling stride (2 at 256³ → correspondence
                 targets quantized at 2-voxel spacing)
  mc_step        canonical sampling stride (3 at 256³)
  gn/cg/iters    solver depth per relaxation round
  reg            regularization weight
  angles         per-frame bend increments (motion in voxels scales 4×
                 with the lattice at fixed world motion)

Run one arm:   python tools/diag_config7.py --tolerance 10
Sweep presets: python tools/diag_config7.py --sweep
Each arm prints one JSON line with the per-frame voxel errors.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_arm(res=256, tolerance=5.0, live_mc_step=2, mc_step=3,
            gn_iters=8, cg_iters=32, solve_iters=3, reg=0.5,
            angles=(0.08, 0.16, 0.24), label="base"):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "benchmarks"))
    from suite import REF_MESH, _make_bend, _render_views, _setup_jax

    jax = _setup_jax()
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.io.mesh_io import load_obj, regularize_mesh
    from dynamicfusion_body_tpu.models.tsdf_volume import TsdfVolume
    from dynamicfusion_body_tpu.ops.interp import trilinear
    from dynamicfusion_body_tpu.pipeline.fusion import Fusion, FusionDM

    verts, faces = load_obj(REF_MESH)
    verts = np.asarray(regularize_mesh(jnp.asarray(verts)))
    bend = _make_bend(verts)
    K = np.array([[400.0, 0, 256], [0, 400, 256], [0, 0, 1]], np.float32)

    caps, live_caps, node_cap = ((1 << 17, 1 << 18), (1 << 18, 1 << 19),
                                 4096)
    if res <= 64:
        caps, live_caps, node_cap = ((1 << 15, 1 << 16),
                                     (1 << 15, 1 << 16), 1024)
    tdist = 8.0 / res * 1.3
    dm = FusionDM(tdist, K, tsdf_res=res, vert_cap=caps[0],
                  face_cap=caps[1])
    depths0, lws = _render_views(verts, faces, K, n_views=8, h=512, w=512)
    canon_v, canon_w = dm.compute_live_tsdf(depths0, lws,
                                            UseAutoAlignment=True)
    ind = np.asarray(dm._IND)
    voxel = float(ind[0, 0])

    ssr = 2.0 * (res / 64) / (mc_step / 2)
    fus = Fusion(
        canon_v, tdist, subsample_rate=ssr, knn=3,
        marching_cubes_step_size=mc_step, write_warpfield=False,
        vert_cap=caps[0], face_cap=caps[1], node_cap=node_cap,
        live_vert_cap=live_caps[0], live_face_cap=live_caps[1],
    )
    m = fus._mesh
    nv = int(m["n_verts"])
    gv = np.asarray(m["verts"])[:nv]
    wv = gv @ ind[:3, :3].T + ind[:3, 3]
    wts, _ = trilinear(jnp.asarray(canon_w), jnp.asarray(gv))
    obs = np.asarray(wts) >= 3.0
    surf = np.concatenate(
        [verts, verts[faces].mean(1),
         0.5 * (verts[faces[:, 0]] + verts[faces[:, 1]])], 0
    )

    def p2s(pts, ang):
        tgt = jnp.asarray(bend(surf, ang))
        outs = []
        pj = jnp.asarray(pts)
        for i in range(0, len(pts), 2048):
            d2 = jnp.sum((pj[i:i + 2048, None, :] - tgt[None]) ** 2, -1)
            outs.append(np.asarray(jnp.sqrt(jnp.min(d2, 1))))
        return np.concatenate(outs)

    t0 = time.time()
    serr_frames = []
    for ang in angles:
        bent = bend(verts, ang)
        depths, _ = _render_views(bent, faces, K, n_views=8, h=512, w=512)
        fresh = TsdfVolume.create(res, tdist, ind=jnp.asarray(ind))
        dm.volume = fresh
        live_v, _ = dm._fuse_all(fresh.values, fresh.weights, depths, lws)
        fus.setupCorrespondences(live_v, method="clpts",
                                 tolerance=tolerance,
                                 live_mc_step=live_mc_step)
        fus.solve(regularization_weight=reg, method="clpts",
                  iterations=solve_iters, gn_iters=gn_iters,
                  cg_iters=cg_iters)
        fus.updateTSDF()
        fus.update_graph()
        tracked_g = fus.warp(gv, m_lw=fus._lw)
        tracked_w = np.asarray(tracked_g) @ ind[:3, :3].T + ind[:3, 3]
        serr_frames.append(p2s(tracked_w[obs] if obs.any() else tracked_w,
                               ang))
    dt = time.time() - t0
    out = {
        "metric": "diag_config7",
        "label": label,
        "res": res,
        "tolerance": tolerance,
        "live_mc_step": live_mc_step,
        "mc_step": mc_step,
        "gn_iters": gn_iters,
        "cg_iters": cg_iters,
        "solve_iters": solve_iters,
        "reg": reg,
        "angles": list(angles),
        "per_frame_voxels": [
            round(float(np.mean(x) / voxel), 3) for x in serr_frames
        ],
        "final_voxels": round(float(np.mean(serr_frames[-1]) / voxel), 3),
        "final_p95_voxels": round(
            float(np.percentile(serr_frames[-1], 95) / voxel), 3
        ),
        "total_s": round(dt, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--tolerance", type=float, default=5.0)
    ap.add_argument("--live-mc-step", type=int, default=2)
    ap.add_argument("--mc-step", type=int, default=3)
    ap.add_argument("--gn", type=int, default=8)
    ap.add_argument("--cg", type=int, default=32)
    ap.add_argument("--solve-iters", type=int, default=3)
    ap.add_argument("--reg", type=float, default=0.5)
    ap.add_argument("--angles", type=str, default="0.08,0.16,0.24")
    ap.add_argument("--label", type=str, default="arm")
    ap.add_argument("--sweep", action="store_true",
                    help="run the preset one-knob-at-a-time sweep")
    a = ap.parse_args()
    angles = tuple(float(x) for x in a.angles.split(","))
    if not a.sweep:
        run_arm(res=a.res, tolerance=a.tolerance,
                live_mc_step=a.live_mc_step, mc_step=a.mc_step,
                gn_iters=a.gn, cg_iters=a.cg, solve_iters=a.solve_iters,
                reg=a.reg, angles=angles, label=a.label)
        return
    run_arm(label="base")
    run_arm(tolerance=10.0, label="tolerance10")
    run_arm(mc_step=2, label="mcstep2")
    run_arm(reg=0.25, label="reg.25")
    run_arm(solve_iters=6, label="iters6")
    run_arm(angles=(0.04, 0.08, 0.12, 0.16, 0.20, 0.24),
            label="halfstep_motion")


if __name__ == "__main__":
    main()
