"""Sharded 512³ equivalence: the non-rigid TSDF update on a multi-device
mesh must equal the single-chip kernel bit-for-bit at full 512³ scale.

Purpose (SURVEY §5.8, VERDICT r2 item 9): the sharding layer exists so
volumes past a single chip's HBM fit across a mesh — 512³ is the first
such size on a 16 GB v5e once the frame's transient live set is counted
(docs/tpu_kernel_notes.md measured the single-dispatch 512³ frame
thrashing). This script runs the real sharded kernel
(parallel.sharded.update_tsdf_nonrigid_sharded — the canonical volume
sharded along x, the live volume and node pool replicated) on an
8-virtual-device CPU mesh at the REAL 512³ shapes and asserts agreement
with the dense single-chip result (expected exact: bricks never cross
the 64-plane shard boundary and candidate pools are per-brick; the gate
allows 1e-5 for reduction-order slack).

Per-chip HBM budget at 512³ over 8 chips (f32):
  canonical values+weights   2 × 512³ / 8  =  134 MB
  live TSDF (replicated)     1 × 512³      =  537 MB
  transient warp samples     brick-chunked: 8-plane x-slabs → ~8 MB
  node pool / camera / misc  < 2 MB
  ≈ 0.8 GB per chip — comfortably inside v5e HBM even with the live
  volume replicated; sharding the live volume too (halo exchange via
  ppermute) is unnecessary until ~1024³.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python benchmarks/bench512_sharded.py [res]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_equivalence(res: int = 512, n_devices: int = 8, seed: int = 0):
    """Dense vs sharded update_tsdf_nonrigid at ``res``³. Returns a dict
    with max abs deviations (expected exactly 0.0) and timings."""
    import jax
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.models import warp_field as W
    from dynamicfusion_body_tpu.parallel import sharded
    from dynamicfusion_body_tpu.parallel.mesh import make_mesh, volume_sharding

    from bench import bumpy_sdf

    rng = np.random.RandomState(seed)
    k, node_cap = 3, 1024
    canonical = bumpy_sdf(res, (res // 2,) * 3, 0.27 * res, 0.02 * res,
                          3.0, 0.0)
    tdist = float(canonical.max())
    live_h = bumpy_sdf(res, (res // 2 + 2, res // 2 + 1, res // 2),
                       0.27 * res, 0.02 * res, 3.0, 0.05)

    # surface-ish nodes: random points near the zero set of the canonical
    pts = rng.rand(8 * node_cap, 3) * (res - 1)
    vals = canonical[tuple(pts.astype(np.int32).T)]
    near = np.argsort(np.abs(vals))[:node_cap]
    verts = pts[near].astype(np.float32)
    wf = W.construct_graph(jnp.asarray(verts), jnp.float32(0.05 * res),
                           node_cap)
    dqs = (rng.randn(node_cap, 8) * 0.02).astype(np.float32)
    dqs[:, 0] += 1.0
    wf = wf.replace(node_dq=jnp.asarray(dqs))
    lw = jnp.array([1.0, 0, 0, 0, 0, 0.02 * res, 0, 0], jnp.float32)

    v0 = jnp.asarray(canonical)
    w0 = jnp.asarray((rng.rand(res, res, res) * 4).astype(np.float32))
    live = jnp.asarray(live_h)
    del canonical, live_h, pts

    t0 = time.time()
    want_v, want_w, _, _ = W.update_tsdf_nonrigid(
        v0, w0, live, wf, lw, k=k, tdist=tdist, brick=8, n_candidates=16)
    want_v.block_until_ready()
    t_dense = time.time() - t0

    mesh = make_mesh(n_devices)
    vs = volume_sharding(mesh)
    upd = sharded.update_tsdf_nonrigid_sharded(
        mesh, k=k, tdist=tdist, brick=8, n_candidates=16)
    t0 = time.time()
    got_v, got_w, esc, risk = upd(
        jax.device_put(v0, vs), jax.device_put(w0, vs), live, wf, lw)
    got_v.block_until_ready()
    t_shard = time.time() - t0

    dev_v = float(jnp.max(jnp.abs(got_v - want_v)))
    dev_w = float(jnp.max(jnp.abs(got_w - want_w)))
    return {
        "res": res,
        "n_devices": n_devices,
        "max_dev_values": dev_v,
        "max_dev_weights": dev_w,
        "esc_dropped": int(esc),
        "pool_risk": int(risk),
        "t_dense_s": round(t_dense, 1),
        "t_sharded_s": round(t_shard, 1),
    }


def run_full_frame(res: int = 512, n_devices: int = 8):
    """The COMPLETE six-stage sharded frame (parallel/frame_sharded.py)
    at ``res``³ across the mesh — extraction, correspondence, rigid
    presolve, relaxed GN rounds, fusion, graph maintenance as ONE
    program. There is no dense run to diff against at this size (the
    single-dispatch frame refuses >64M voxels and a CPU 512³ dense frame
    takes tens of minutes); the equivalence anchors are (a) the bitwise
    update-kernel diff above at the same 512³ shapes and (b) the
    full-frame geometric equivalence test at 64³
    (tests/test_frame_sharded.py). Here the gates are behavioral: the
    solve descends, certificates hold, nothing overflows."""
    import jax
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.parallel.frame_sharded import (
        make_fusion_frame_sharded,
        make_init_canonical_sharded,
    )
    from dynamicfusion_body_tpu.parallel.mesh import make_mesh, volume_sharding

    from bench import bumpy_sdf

    canonical = bumpy_sdf(res, (res // 2,) * 3, 0.27 * res, 0.02 * res,
                          3.0, 0.0)
    tdist = float(canonical.max())
    live = jnp.asarray(
        bumpy_sdf(res, (res // 2 + 2, res // 2 + 1, res // 2),
                  0.27 * res, 0.02 * res, 3.0, 0.05)
    )
    mesh = make_mesh(n_devices)
    vs = volume_sharding(mesh)
    values = jax.device_put(jnp.asarray(canonical), vs)
    weights = jax.device_put(jnp.zeros((res,) * 3, jnp.float32), vs)
    del canonical

    # per-device caps: the 512³ step-2 canonical surface is ~95k verts,
    # step-1 live ~380k — slabs are uneven, give each device headroom
    vcap, fcap = 1 << 15, 1 << 16
    lvcap, lfcap = 1 << 17, 1 << 18
    t0 = time.time()
    init = make_init_canonical_sharded(
        mesh, subsample_rate=1.5, node_cap=4096, vert_cap=vcap,
        face_cap=fcap, mc_step=2,
    )
    wf, _rad = init(values)
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    frame = make_fusion_frame_sharded(
        mesh, regularization_weight=0.5, knn_k=3, tdist=tdist,
        vert_cap=vcap, face_cap=fcap, live_vert_cap=lvcap,
        live_face_cap=lfcap, mc_step=2, solve_iters=3, gn_iters=4,
        cg_iters=8, tolerance=5.0, n_candidates=16,
    )
    t_setup = time.time() - t0
    t0 = time.time()
    v1, w1, wf1, lw1, stats, _mesh = frame(values, weights, live, wf, lw)
    float(stats.cost_after[-1])  # force completion
    t_frame = time.time() - t0
    cb = np.asarray(stats.cost_before)
    ca = np.asarray(stats.cost_after)
    return {
        "res": res,
        "n_devices": n_devices,
        "n_corr": int(stats.n_corr),
        "n_nodes": int(stats.n_nodes),
        "cost_before_r0": round(float(cb[0]), 4),
        "cost_after_r0": round(float(ca[0]), 4),
        "descended": bool(ca[0] < cb[0]),
        "pool_risk": int(stats.pool_risk),
        "corr_risk": int(stats.corr_risk),
        "overflow": bool(stats.overflow),
        "t_setup_s": round(t_setup, 1),
        "t_frame_s": round(t_frame, 1),
    }


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    # the axon TPU plugin ignores the JAX_PLATFORMS env var — force the
    # virtual CPU mesh via the config API (tests/conftest.py trick); the
    # device-count XLA flag must still come from the environment because
    # it is read at backend init
    flag = "--xla_force_host_platform_device_count=8"
    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flag
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    full = "--full-frame" in sys.argv
    print(f"# devices: {len(jax.devices())} ({jax.default_backend()})",
          file=sys.stderr)
    if full:
        out = run_full_frame(res=res)
        ok = (out["descended"] and not out["overflow"]
              and np.isfinite(out["cost_after_r0"]))
        out["metric"] = f"sharded_full_frame_{res}"
    else:
        out = run_equivalence(res=res)
        ok = out["max_dev_values"] <= 1e-5 and out["max_dev_weights"] <= 1e-5
        out["metric"] = f"sharded_equivalence_{res}"
    out["ok"] = ok
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
