"""Amortized sub-phase timing of update_tsdf_nonrigid at 256³ on the TPU:
kernel vs candidate search vs merge, and the Pallas kernel's scaling with
``group`` (DMA/grid-overhead amortization). Run:
    nohup python tools/profile_upd.py > /tmp/profile_upd.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import bumpy_sdf, RES
    from dynamicfusion_body_tpu.models import warp_field as WF
    from dynamicfusion_body_tpu.pipeline.frame import init_canonical
    from dynamicfusion_body_tpu.ops.trilerp_pallas import (
        trilerp_bricks, warp_trilerp_bricks,
    )

    def f1(x):
        return float(jnp.ravel(x)[0] if hasattr(x, "ravel") else x)

    def timeit(name, fn, fetch, reps=8):
        fetch(fn())
        fetch(fn())
        t0 = time.time()
        fetch(fn())
        t1 = time.time() - t0
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn()
        fetch(out)
        tn = time.time() - t0
        ms = (tn - t1) / (reps - 1) * 1000.0
        print(f"{name:36s} {ms:9.2f} ms   (1+fetch: {t1*1000:7.1f})",
              flush=True)
        return ms

    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    live = jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.1))
    tdist = float(canonical.max())
    values = jnp.asarray(canonical)
    weights = jnp.ones_like(values)
    caps = dict(vert_cap=1 << 15, face_cap=1 << 16)
    wf, _ = init_canonical(values, subsample_rate=1.5, node_cap=4096,
                           mc_step=2, **caps)
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    print(f"# backend={jax.default_backend()} nodes={int(wf.num_active)}",
          flush=True)

    brick, C, k = 8, 16, 3
    NB = (RES // brick) ** 3
    V = brick ** 3

    cand, risk = WF.brick_candidates_2level(
        wf, (RES,) * 3, brick, C, with_risk=True, risk_k=k)
    cand = jax.block_until_ready(cand)

    M = wf.capacity
    node_table = jnp.concatenate(
        [wf.node_pos, wf.node_w[:, None], wf.active[:, None].astype(jnp.float32),
         wf.node_dq, jnp.zeros((M, 3), jnp.float32)], axis=1)

    # full update with cached candidates (what the fused frame pays)
    upd = jax.jit(lambda: WF.update_tsdf_nonrigid(
        values, weights, live, wf, lw, k=k, tdist=tdist, wmax=100.0,
        brick=brick, n_candidates=C, use_pallas=True,
        cand_cache=(cand, risk)))
    timeit("update_full_cached_cand", upd, lambda o: f1(o[0]))

    # kNN-selection cache: build cost (amortizes to insertion frames) and
    # the per-frame update with it (blend+trilerp+merge only)
    wc = jax.block_until_ready(jax.jit(
        lambda: WF.build_warp_cache(wf, (RES,) * 3, cand, k, brick))())
    timeit("build_warp_cache", jax.jit(
        lambda: WF.build_warp_cache(wf, (RES,) * 3, cand, k, brick)),
        lambda o: f1(o[2]))
    upd_c = jax.jit(lambda: WF.update_tsdf_nonrigid(
        values, weights, live, wf, lw, k=k, tdist=tdist, wmax=100.0,
        brick=brick, n_candidates=C, use_pallas=True,
        cand_cache=(cand, risk), warp_cache=wc))
    timeit("update_full_warp_cache", upd_c, lambda o: f1(o[0]))

    from dynamicfusion_body_tpu.ops.trilerp_pallas import (
        warp_trilerp_bricks_cached,
    )
    node_tab2 = jnp.concatenate(
        [wf.node_pos, wf.node_w[:, None],
         wf.active[:, None].astype(jnp.float32), wf.node_dq,
         jnp.zeros((wf.capacity, 3), jnp.float32)], axis=1)
    for g in (8, 16, 32):
        wkc = jax.jit(lambda g=g: warp_trilerp_bricks_cached(
            live, node_tab2, cand, wc[0], wc[1], lw,
            vol_shape=(RES,) * 3, brick=brick, group=g))
        timeit(f"warp_trilerp_cached_g{g}", wkc, lambda o: f1(o[0]))

    # fused warp+trilerp kernel alone, group sweep
    for g in (8, 16, 32):
        wk = jax.jit(lambda g=g: warp_trilerp_bricks(
            live, node_table, cand, lw, vol_shape=(RES,) * 3, brick=brick,
            k=k, group=g))
        timeit(f"warp_trilerp_kernel_g{g}", wk, lambda o: f1(o[0]))
        esc = int(jnp.sum(wk()[2].astype(jnp.int32)))
        print(f"#   escapes at group={g}: {esc}", flush=True)

    # plain trilerp kernel on the warped coords (isolates kNN/DQB cost)
    wko = jax.jit(lambda: warp_trilerp_bricks(
        live, node_table, cand, lw, vol_shape=(RES,) * 3, brick=brick,
        k=k, group=8))
    _, _, _, _, wx, wy, wz = wko()
    wx, wy, wz = map(jax.block_until_ready, (wx, wy, wz))
    for g in (8, 16, 32):
        tri = jax.jit(lambda g=g: trilerp_bricks(live, wx, wy, wz, group=g))
        timeit(f"trilerp_only_g{g}", tri, lambda o: f1(o[0]))

    # merge (running average) alone: feed kernel outputs
    out = wko()
    tsdf_l, valid = out[0], out[1]
    wi = out[3]
    tsdf_l, valid, wi = map(jax.block_until_ready, (tsdf_l, valid, wi))

    from dynamicfusion_body_tpu.ops.bricks import vol_from_bricks, vol_to_bricks

    def merge():
        vals = vol_to_bricks(values, brick)
        wts = vol_to_bricks(weights, brick)
        wi_t = jnp.where(wts == 0.0, wi, wts)
        upd_m = valid & (tsdf_l > -tdist)
        denom = jnp.maximum(wi + wi_t, 1e-30)
        new_vals = (vals * wi_t + jnp.minimum(tdist, tsdf_l) * wi) / denom
        new_wts = jnp.minimum(wi + wi_t, 100.0)
        ov = vol_from_bricks(jnp.where(upd_m, new_vals, vals), (RES,)*3, brick)
        ow = vol_from_bricks(jnp.where(upd_m, new_wts, wts), (RES,)*3, brick)
        return ov, ow

    timeit("merge_running_average", jax.jit(merge), lambda o: f1(o[0]))


if __name__ == "__main__":
    main()
