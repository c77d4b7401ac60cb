"""Dissect ops/trilerp_pallas.py's per-brick cost on the real TPU.

Kernel-ablation variants (same grid/DMA structure, pieces disabled) to
attribute the ~138 ms between DMA, one-hot construction, and the hi/lo
matmuls, plus parameter sweeps (group size, tent-function weights,
single-pass bf16).

Run: nohup python tools/profile_trilerp.py > /tmp/profile_trilerp.txt 2>&1 &
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = 256
BX = 16
BY = 24


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    live = jnp.asarray(rng.rand(RES, RES, RES).astype(np.float32))
    NB = (RES // 8) ** 3
    V = 512
    base = rng.rand(NB, 1, 3).astype(np.float32) * (RES - 12)
    offs = rng.rand(NB, V, 3).astype(np.float32) * 8.0
    w = base + offs
    wx = jnp.asarray(w[..., 0])
    wy = jnp.asarray(w[..., 1])
    wz = jnp.asarray(w[..., 2])

    def timeit(name, fn, n=4):
        out = fn()
        _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
        ts = []
        for _i in range(n):
            t0 = time.time()
            out = fn()
            _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
            ts.append(time.time() - t0)
        print(f"{name:32s} {np.median(ts)*1000:9.2f} ms", flush=True)

    # --- baseline: the real kernel --------------------------------------
    from dynamicfusion_body_tpu.ops.trilerp_pallas import trilerp_bricks

    jt = jax.jit(trilerp_bricks)
    timeit("full_kernel_group8", lambda: jt(live, wx, wy, wz))

    # --- ablation kernel with switches -----------------------------------
    def make(mode, group=8, passes=3, tent=False):
        def kernel(live_ref, wx_ref, wy_ref, wz_ref, vals_ref,
                   boxes, sems):
            rx, ry, rz = (RES,) * 3
            mins = []
            for g in range(group):
                mxf = jnp.min(wx_ref[g, :])
                myf = jnp.min(wy_ref[g, :])
                mx = jnp.clip(jnp.floor(mxf).astype(jnp.int32) - 1, 0, rx - BX)
                my = jnp.clip(((jnp.floor(myf).astype(jnp.int32) - 1) // 8) * 8,
                              0, ry - BY)
                my = pl.multiple_of(my, 8)
                mins.append((mx, my))
                pltpu.make_async_copy(
                    live_ref.at[pl.ds(mx, BX), pl.ds(my, BY), :],
                    boxes.at[g], sems.at[g]).start()

            iota_z = jax.lax.broadcasted_iota(jnp.int32, (V, rz), 1)
            iota_xy = jax.lax.broadcasted_iota(jnp.int32, (V, BX * BY), 1)
            x_of = iota_xy // BY
            y_of = iota_xy % BY

            for g in range(group):
                mx, my = mins[g]
                pltpu.make_async_copy(
                    live_ref.at[pl.ds(mx, BX), pl.ds(my, BY), :],
                    boxes.at[g], sems.at[g]).wait()
                if mode == "dma_only":
                    vals_ref[g, :] = boxes[g, 0, 0, :V] + wx_ref[g, :]
                    continue
                lx = wx_ref[g, :] - mx.astype(jnp.float32)
                ly = wy_ref[g, :] - my.astype(jnp.float32)
                lz = jnp.clip(wz_ref[g, :], 0.0, rz - 1.0)
                if tent:
                    Wxy = (
                        jnp.maximum(0.0, 1.0 - jnp.abs(
                            x_of.astype(jnp.float32) - lx[:, None]))
                        * jnp.maximum(0.0, 1.0 - jnp.abs(
                            y_of.astype(jnp.float32) - ly[:, None]))
                    )
                    Wz = jnp.maximum(0.0, 1.0 - jnp.abs(
                        iota_z.astype(jnp.float32) - lz[:, None]))
                else:
                    def taps(local, size, axis_of):
                        lc = jnp.clip(local, 0.0, size - 1.0)
                        i0 = jnp.floor(jnp.clip(lc, 0.0, size - 2.0)).astype(jnp.int32)
                        f = jnp.clip(lc - i0.astype(jnp.float32), 0.0, 1.0)
                        return jnp.where(axis_of == i0[:, None], 1.0 - f[:, None], 0.0) + \
                            jnp.where(axis_of == i0[:, None] + 1, f[:, None], 0.0)
                    Wxy = taps(lx, BX, x_of) * taps(ly, BY, y_of)
                    lzc = jnp.clip(lz, 0.0, rz - 1.0)
                    i0 = jnp.floor(jnp.clip(lzc, 0.0, rz - 2.0)).astype(jnp.int32)
                    f = jnp.clip(lzc - i0.astype(jnp.float32), 0.0, 1.0)
                    Wz = jnp.where(iota_z == i0[:, None], 1.0 - f[:, None], 0.0) + \
                        jnp.where(iota_z == i0[:, None] + 1, f[:, None], 0.0)
                if mode == "onehot_only":
                    vals_ref[g, :] = jnp.sum(Wxy, axis=1) + jnp.sum(Wz, axis=1)
                    continue
                cz = boxes[g, BX // 2, BY // 2, :]
                box2 = boxes[g].reshape(BX * BY, rz)
                resid = box2 - cz[None, :]
                r_hi = resid.astype(jnp.bfloat16)
                w_hi = Wxy.astype(jnp.bfloat16)
                t = jnp.dot(w_hi, r_hi, preferred_element_type=jnp.float32)
                if passes >= 2:
                    r_lo = (resid - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    t = t + jnp.dot(w_hi, r_lo, preferred_element_type=jnp.float32)
                if passes >= 3:
                    w_lo = (Wxy - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    t = t + jnp.dot(w_lo, r_hi, preferred_element_type=jnp.float32)
                t = t + cz[None, :]
                vals_ref[g, :] = jnp.sum(t * Wz, axis=1)

        grid = NB // group
        spec = pl.BlockSpec((group, V), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

        @jax.jit
        def run(live, wx, wy, wz):
            return pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          spec, spec, spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((NB, V), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((group, BX, BY, RES), jnp.float32),
                    pltpu.SemaphoreType.DMA((group,)),
                ],
            )(live, wx, wy, wz)

        return run

    for name, kw in [
        ("dma_only_g8", dict(mode="dma_only", group=8)),
        ("dma_only_g16", dict(mode="dma_only", group=16)),
        ("onehot_only_where", dict(mode="onehot_only")),
        ("onehot_only_tent", dict(mode="onehot_only", tent=True)),
        ("full_1pass_tent", dict(mode="full", passes=1, tent=True)),
        ("full_2pass_tent", dict(mode="full", passes=2, tent=True)),
        ("full_3pass_tent", dict(mode="full", passes=3, tent=True)),
        ("full_3pass_where", dict(mode="full", passes=3)),
        ("full_3pass_tent_g16", dict(mode="full", passes=3, tent=True,
                                     group=16)),
    ]:
        try:
            f = make(**kw)
            timeit(name, lambda f=f: f(live, wx, wy, wz))
        except Exception as e:  # noqa
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
