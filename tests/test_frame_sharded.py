"""Full multi-chip frame (parallel/frame_sharded.py) vs the single-chip
fused frame: all six stages — extraction, correspondence, rigid presolve,
relaxed GN rounds, TSDF fusion, graph update — over an 8-device mesh.

Equivalence is GEOMETRIC, not bitwise: the sharded pipeline enumerates
vertices per-slab, so the greedy node subsample can tie-break differently
(module docstring). The contract: same correspondence count, per-round
solve costs tracking within a few percent, and fused volumes agreeing to
a small fraction of a voxel (the bench gate's own criterion).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_body_tpu.parallel.frame_sharded import (
    make_fusion_frame_sharded,
    make_init_canonical_sharded,
)
from dynamicfusion_body_tpu.parallel.mesh import make_mesh, volume_sharding
from dynamicfusion_body_tpu.pipeline.frame import fusion_frame, init_canonical

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _bumpy(res, center, radius, amp, freq, phase=0.0):
    g = np.arange(res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    dx, dy, dz = x - center[0], y - center[1], z - center[2]
    r = np.sqrt(dx * dx + dy * dy + dz * dz) + 1e-6
    th = np.arccos(np.clip(dz / r, -1, 1))
    ph = np.arctan2(dy, dx)
    bump = amp * np.sin(freq * th + phase) * np.cos(freq * ph + phase)
    return (r - (radius + bump)).astype(np.float32)


def test_sharded_frame_matches_single_chip():
    R = 64
    canonical = _bumpy(R, (32, 32, 32), 18.0, 2.0, 3.0, 0.0)
    live = jnp.asarray(_bumpy(R, (33, 32, 32), 18.0, 2.0, 3.0, 0.05))
    tdist = float(canonical.max())
    values = jnp.asarray(canonical)
    weights = jnp.zeros_like(values)
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    hyper = dict(
        regularization_weight=0.5, knn_k=3, tdist=tdist, mc_step=2,
        solve_iters=3, gn_iters=4, cg_iters=8, tolerance=5.0,
        n_candidates=8,
    )

    mesh = make_mesh(8)
    vs = jax.device_put(values, volume_sharding(mesh))
    ws = jax.device_put(weights, volume_sharding(mesh))
    init = make_init_canonical_sharded(
        mesh, subsample_rate=1.5, node_cap=512, vert_cap=1 << 10,
        face_cap=1 << 11, mc_step=2,
    )
    wf_s, rad_s = init(vs)
    frame = make_fusion_frame_sharded(
        mesh, vert_cap=1 << 10, face_cap=1 << 11, live_vert_cap=1 << 11,
        live_face_cap=1 << 12, **hyper,
    )
    v_s, w_s, wf2_s, lw_s, st_s, mesh_s = frame(vs, ws, live, wf_s, lw)

    wf_c, rad_c = init_canonical(
        values, subsample_rate=1.5, node_cap=512, mc_step=2,
        vert_cap=1 << 12, face_cap=1 << 13,
    )
    v_c, w_c, wf2_c, lw_c, st_c, _ = fusion_frame(
        values, weights, live, wf_c, lw, vert_cap=1 << 12,
        face_cap=1 << 13, live_vert_cap=1 << 13, live_face_cap=1 << 14,
        **hyper,
    )

    # identical surface statistics → identical sampling radius
    np.testing.assert_allclose(float(rad_s), float(rad_c), rtol=1e-6)
    assert int(st_s.n_corr) == int(st_c.n_corr)
    assert not bool(st_s.overflow)

    # per-round solve costs track the single-chip trajectory (identical
    # surfaces; only node tie-breaks + fp order differ)
    ca_s, ca_c = np.asarray(st_s.cost_after), np.asarray(st_c.cost_after)
    cb_s, cb_c = np.asarray(st_s.cost_before), np.asarray(st_c.cost_before)
    np.testing.assert_allclose(cb_s, cb_c, rtol=0.05)
    np.testing.assert_allclose(ca_s, ca_c, rtol=0.10)
    assert ca_s[0] < 0.5 * cb_s[0]  # the solve genuinely descends

    # fused volumes agree to a small fraction of a voxel (the bench
    # accuracy gate's own criterion is p99.9 < 0.5)
    dv = np.abs(np.asarray(v_s) - np.asarray(v_c))
    assert np.percentile(dv, 99.9) < 0.25
    # graph maintenance ran and stayed in capacity
    assert int(st_s.n_nodes) > 0
    assert abs(int(st_s.n_nodes) - int(st_c.n_nodes)) <= 16


def test_sharded_frame_chains():
    """Two dependent frames run back-to-back (state threading: the TSDF,
    warp field, pose, and node pool all round-trip through the sharded
    frame's outputs)."""
    R = 64
    canonical = _bumpy(R, (32, 32, 32), 18.0, 2.0, 3.0, 0.0)
    tdist = float(canonical.max())
    values = jnp.asarray(canonical)
    mesh = make_mesh(8)
    vs = jax.device_put(values, volume_sharding(mesh))
    ws = jax.device_put(jnp.zeros_like(values), volume_sharding(mesh))
    init = make_init_canonical_sharded(
        mesh, subsample_rate=1.5, node_cap=512, vert_cap=1 << 10,
        face_cap=1 << 11, mc_step=2,
    )
    wf, _ = init(vs)
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    frame = make_fusion_frame_sharded(
        mesh, regularization_weight=0.5, knn_k=3, tdist=tdist,
        vert_cap=1 << 10, face_cap=1 << 11, live_vert_cap=1 << 11,
        live_face_cap=1 << 12, mc_step=2, solve_iters=2, gn_iters=2,
        cg_iters=8, tolerance=5.0, n_candidates=8,
    )
    state = (vs, ws, wf, lw)
    for i in (1, 2):
        live = jnp.asarray(
            _bumpy(R, (32 + i, 32, 32), 18.0, 2.0, 3.0, 0.05 * i)
        )
        v, w, wf2, lw2, stats, _ = frame(state[0], state[1], live,
                                         state[2], state[3])
        assert not bool(stats.overflow)
        assert int(stats.n_corr) > 1000
        state = (v, w, wf2, lw2)
