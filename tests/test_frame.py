"""Fused per-frame program: equivalence with the known-motion solvers and
driver-level behavior, at small scale."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.pipeline.frame import fusion_frame, init_canonical
from fixtures import sphere_levelset


def test_fusion_frame_tracks_motion():
    res = 32
    canonical = sphere_levelset(res, (16, 16, 16), 9.0)
    live = sphere_levelset(res, (17.2, 16.4, 16), 9.0)
    tdist = float(canonical.max())
    caps = dict(vert_cap=4096, face_cap=8192)

    wf, radius = init_canonical(
        jnp.asarray(canonical), subsample_rate=2.0, node_cap=128, mc_step=1,
        **caps,
    )
    assert int(wf.num_active) > 3
    lw = jnp.array([1, 0, 0, 0, 0, 0, 0, 0], jnp.float32)

    v, w, wf2, lw2, stats, mesh_out = fusion_frame(
        jnp.asarray(canonical), jnp.zeros((res,) * 3), jnp.asarray(live),
        wf, lw, regularization_weight=1.0, knn_k=3, tdist=tdist, mc_step=1,
        solve_iters=2, gn_iters=6, cg_iters=24, tolerance=2.0,
        brick=8, n_candidates=16, **caps,
    )
    assert int(mesh_out["n_verts"]) > 0
    cb = np.asarray(stats.cost_before)
    ca = np.asarray(stats.cost_after)
    assert ca[0] < 0.5 * cb[0]  # first GN round substantially reduced energy
    assert int(stats.n_corr) > 50
    assert float(w.max()) > 0  # fusion happened
    # DynamicFusion invariant: a good warp absorbs the motion, so the
    # CANONICAL surface stays put after fusing the moved live frame
    # (an identity warp would drag the zero crossing ~1 voxel right).
    line0 = canonical[:, 16, 16]
    line1 = np.asarray(v)[:, 16, 16]
    zc0 = np.interp(0.0, line0[16:28], np.arange(16, 28))
    zc1 = np.interp(0.0, line1[16:28], np.arange(16, 28))
    assert abs(zc1 - zc0) < 0.3, (zc0, zc1)
    # and the recovered warp maps canonical surface points onto the live
    # surface: r(x) = |x_warped - live_center| - 9 ≈ 0
    from dynamicfusion_body_tpu.ops.dualquat import dq_transform_point
    from dynamicfusion_body_tpu.models.warp_field import blend_at
    from dynamicfusion_body_tpu.ops.knn import knn

    p = jnp.array([[25.0, 16.0, 16.0]])
    _, nidx = knn(p, wf2.node_pos, 3, valid=wf2.active)
    se3 = blend_at(wf2, p, nidx)
    wp = dq_transform_point(lw2, dq_transform_point(se3, p))
    sd = float(jnp.linalg.norm(wp[0] - jnp.array([17.2, 16.4, 16.0])) - 9.0)
    assert abs(sd) < 0.35, sd


def test_fusion_frame_no_graph_update():
    res = 24
    canonical = sphere_levelset(res, (12, 12, 12), 7.0)
    caps = dict(vert_cap=2048, face_cap=4096)
    wf, _ = init_canonical(
        jnp.asarray(canonical), subsample_rate=2.0, node_cap=64, mc_step=1,
        **caps,
    )
    lw = jnp.array([1, 0, 0, 0, 0, 0, 0, 0], jnp.float32)
    v, w, wf2, lw2, stats, mesh_out = fusion_frame(
        jnp.asarray(canonical), jnp.zeros((res,) * 3),
        jnp.asarray(canonical), wf, lw, regularization_weight=1.0,
        knn_k=3, tdist=float(canonical.max()), mc_step=1, solve_iters=1,
        gn_iters=2, cg_iters=8, tolerance=2.0, brick=8, n_candidates=16,
        update_graph=False, **caps,
    )
    # identical live frame + identity-ish pose: node count unchanged
    assert int(wf2.num_active) == int(wf.num_active)


def test_fusion_frame_sequence_tracking():
    """Five-frame deforming sequence: the canonical surface must stay
    stable while the warp tracks the moving live surface (the core
    DynamicFusion contract, reference test.py:104-138 flow)."""
    res = 32
    canonical = sphere_levelset(res, (16, 16, 16), 9.0)
    tdist = float(canonical.max())
    caps = dict(vert_cap=4096, face_cap=8192)
    wf, _ = init_canonical(
        jnp.asarray(canonical), subsample_rate=2.0, node_cap=128, mc_step=1,
        **caps,
    )
    lw = jnp.array([1, 0, 0, 0, 0, 0, 0, 0], jnp.float32)
    values = jnp.asarray(canonical)
    weights = jnp.zeros((res,) * 3)
    mesh = None

    line0 = canonical[:, 16, 16]
    zc0 = np.interp(0.0, line0[16:28], np.arange(16, 28))

    centers = [(16.4 + 0.35 * i, 16.0 + 0.15 * i, 16.0) for i in range(5)]
    for cx, cy, cz in centers:
        live = sphere_levelset(res, (cx, cy, cz), 9.0)
        values, weights, wf, lw, stats, mesh = fusion_frame(
            values, weights, jnp.asarray(live), wf, lw,
            regularization_weight=1.0, knn_k=3, tdist=tdist, mc_step=1,
            solve_iters=2, gn_iters=6, cg_iters=24, tolerance=2.0,
            brick=8, n_candidates=16, canon_mesh=mesh, **caps,
        )

    # canonical zero-crossing stationary after 5 fused frames of motion
    line1 = np.asarray(values)[:, 16, 16]
    zc1 = np.interp(0.0, line1[16:28], np.arange(16, 28))
    assert abs(zc1 - zc0) < 0.5, (zc0, zc1)
    # weights accumulated every frame
    assert float(weights.max()) >= 4.0
    # the warp maps the canonical +x surface point onto the final live
    # sphere (center moved 1.4,0.6,0 over the sequence)
    from dynamicfusion_body_tpu.ops.dualquat import dq_transform_point
    from dynamicfusion_body_tpu.models.warp_field import blend_at
    from dynamicfusion_body_tpu.ops.knn import knn as knn_op

    p = jnp.array([[25.0, 16.0, 16.0]])
    _, nidx = knn_op(p, wf.node_pos, 3, valid=wf.active)
    se3 = blend_at(wf, p, nidx)
    wp = dq_transform_point(lw, dq_transform_point(se3, p))
    cend = np.array(centers[-1])
    sd = float(jnp.linalg.norm(wp[0] - jnp.asarray(cend)) - 9.0)
    assert abs(sd) < 0.6, sd


def test_fusion_frame_large_volume_guard():
    """Volumes beyond the measured single-dispatch HBM budget are refused
    with a pointer at the multi-dispatch driver (docs/tpu_kernel_notes.md:
    512³ thrashes HBM at 67-152 s/frame)."""
    import jax
    import pytest

    res = 512
    caps = dict(vert_cap=256, face_cap=512)
    # ShapeDtypeStructs + eval_shape: the guard fires at trace time, no
    # need to allocate 512³ volumes on the test machine.
    vol = jax.ShapeDtypeStruct((res,) * 3, jnp.float32)
    wf_small, _ = init_canonical(
        jnp.asarray(sphere_levelset(32, (16, 16, 16), 9.0)),
        subsample_rate=2.0, node_cap=16, mc_step=2, vert_cap=256,
        face_cap=512,
    )
    lw = jax.ShapeDtypeStruct((8,), jnp.float32)
    with pytest.raises(ValueError, match="multi-dispatch"):
        jax.eval_shape(
            lambda v, w, l, wf_, lw_: fusion_frame(
                v, w, l, wf_, lw_, regularization_weight=1.0, knn_k=3,
                tdist=1.0, mc_step=2, **caps,
            ),
            vol, vol, vol, wf_small, lw,
        )


def test_certificate_steered_corr_refresh():
    """On a LARGE-motion frame, the cached-candidate drift certificate
    must fire and steer the reuse path into fresh in-graph searches
    (pipeline/frame.py CORR_REFRESH_FRAC), leaving zero residual risk and
    a final cost matching the always-fresh path. Round-4 fix for the
    round-3 bench-gate discrepancy: uncertified cached matches left the
    warp ~7.6x worse on a fresh-correspondence objective
    (tools/diag_gate.py)."""
    from fixtures import bumpy_levelset

    res = 64
    canonical = bumpy_levelset(res, (32, 32, 32), 18.0, 2.0, 3.0, 0.0)
    live = bumpy_levelset(res, (33, 32, 32), 18.0, 2.0, 3.0, 0.3)
    tdist = float(canonical.max())
    caps = dict(vert_cap=1 << 12, face_cap=1 << 13)
    wf, _ = init_canonical(
        jnp.asarray(canonical), subsample_rate=1.5, node_cap=512, mc_step=2,
        **caps,
    )
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    h = dict(
        regularization_weight=0.5, knn_k=3, tdist=tdist, mc_step=2,
        solve_iters=3, gn_iters=4, cg_iters=8, tolerance=5.0,
        n_candidates=16, **caps,
    )
    args = (jnp.asarray(canonical), jnp.zeros((res,) * 3),
            jnp.asarray(live), wf, lw)
    out_r = fusion_frame(*args, reuse_corr=True, **h)
    out_f = fusion_frame(*args, reuse_corr=False, **h)
    st = out_r[4]
    # the big motion must trip the certificate on every solve round ...
    assert int(st.corr_refresh) >= 2
    # ... after which the residual (uncertified-but-used) risk is zero
    assert int(st.corr_risk) == 0
    ca_r = float(np.asarray(st.cost_after)[-1])
    ca_f = float(np.asarray(out_f[4].cost_after)[-1])
    assert ca_r <= 1.05 * ca_f
