"""Why is step_size=2 MC at 256³ slower than full-res MC?

Hypothesis: the ::2 strided slice fuses into every consumer, so all
downstream ops pay strided (lane-hostile) access. Compare against
pre-materializing the sliced volume via optimization_barrier.

Run: nohup python tools/profile_mc2.py > /tmp/profile_mc2.txt 2>&1 &
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

    from bench import bumpy_sdf
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes

    vol = jnp.asarray(bumpy_sdf(256, (128,) * 3, 70.0, 4.0, 3.0))
    caps = dict(vert_cap=1 << 15, face_cap=1 << 16)

    def timeit(name, fn, n=4):
        m = fn()
        _ = float(m["verts"][0, 0]) + int(m["n_verts"])
        ts = []
        for _i in range(n):
            t0 = time.time()
            m = fn()
            _ = float(m["verts"][0, 0])
            ts.append(time.time() - t0)
        print(f"{name:32s} {np.median(ts)*1000:9.2f} ms", flush=True)

    mc2 = jax.jit(lambda v: marching_cubes(v, 0.0, step_size=2, **caps))
    timeit("mc_step2_on_256", lambda: mc2(vol))

    @jax.jit
    def mc2b(v):
        sliced = jax.lax.optimization_barrier(v[::2, ::2, ::2])
        return marching_cubes(sliced, 0.0, step_size=1, **caps)

    timeit("mc_step1_on_barrier_slice", lambda: mc2b(vol))

    small = jnp.asarray(np.asarray(vol)[::2, ::2, ::2])
    mc1 = jax.jit(lambda v: marching_cubes(v, 0.0, step_size=1, **caps))
    timeit("mc_step1_on_contig_128", lambda: mc1(small))

    big = jax.jit(lambda v: marching_cubes(
        v, 0.0, step_size=1, vert_cap=1 << 17, face_cap=1 << 18))
    timeit("mc_step1_on_256_fullcaps", lambda: big(vol))


if __name__ == "__main__":
    main()
