"""Locate the hot op inside marching_cubes at 256³ on the real TPU.

Times successive prefixes of the MC pipeline as separate jitted programs
(XLA dead-code-eliminates everything not returned, so prefix deltas
attribute cost). Host-fetch barriers throughout.

Run: nohup python tools/profile_mc.py > /tmp/profile_mc.txt 2>&1 &
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
    from dynamicfusion_body_tpu.ops import mc_tables
    from dynamicfusion_body_tpu.ops.interp import trilinear
    from dynamicfusion_body_tpu.ops.search import searchsorted1d

    vol = jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.1))
    level = 0.0
    vert_cap, face_cap = 1 << 17, 1 << 18
    X = Y = Z = RES
    nxyz = X * Y * Z
    TRI_COUNT = jnp.asarray(mc_tables.TRI_COUNT)

    def axis_cross(vol, a):
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[a] = slice(0, vol.shape[a] - 1)
        sl_hi[a] = slice(1, vol.shape[a])
        lo = vol[tuple(sl_lo)]
        hi = vol[tuple(sl_hi)]
        cross = (lo < level) != (hi < level)
        denom = lo - hi
        t = jnp.where(jnp.abs(denom) > 1e-30, (lo - level) / denom, 0.5)
        pad = [(0, 0)] * 3
        pad[a] = (0, 1)
        return jnp.pad(cross, pad), jnp.pad(jnp.where(cross, t, 0.0), pad)

    def p_mask(vol):
        crosses, ts = zip(*(axis_cross(vol, a) for a in range(3)))
        flat_mask = jnp.concatenate([c.reshape(-1) for c in crosses])
        t_all = jnp.concatenate([t.reshape(-1) for t in ts])
        return flat_mask, t_all

    def p_csum(vol):
        flat_mask, t_all = p_mask(vol)
        csum = jnp.cumsum(flat_mask.astype(jnp.int32))
        return csum[-1], t_all[0]

    def p_search(vol):
        flat_mask, t_all = p_mask(vol)
        csum = jnp.cumsum(flat_mask.astype(jnp.int32))
        vslots = jnp.arange(vert_cap, dtype=jnp.int32)
        eov = searchsorted1d(csum, vslots + 1, side="left")
        return jnp.sum(eov), t_all[0]

    def p_verts(vol):
        flat_mask, t_all = p_mask(vol)
        csum = jnp.cumsum(flat_mask.astype(jnp.int32))
        n_verts = csum[-1]
        vslots = jnp.arange(vert_cap, dtype=jnp.int32)
        eov = searchsorted1d(csum, vslots + 1, side="left")
        eov = jnp.minimum(eov, 3 * nxyz - 1)
        vmask0 = vslots < n_verts
        ea = eov // nxyz
        elin = eov % nxyz
        ei = (elin // (Y * Z)).astype(jnp.float32)
        ej = ((elin // Z) % Y).astype(jnp.float32)
        ek = (elin % Z).astype(jnp.float32)
        et = jnp.take(t_all, eov, axis=0)
        vx = ei + jnp.where(ea == 0, et, 0.0)
        vy = ej + jnp.where(ea == 1, et, 0.0)
        vz = ek + jnp.where(ea == 2, et, 0.0)
        verts = jnp.stack(
            [jnp.where(vmask0, c, 0.0) for c in (vx, vy, vz)], axis=-1
        )
        return verts

    def p_case(vol):
        inside = vol < level
        cx, cy, cz = X - 1, Y - 1, Z - 1
        case = jnp.zeros((cx, cy, cz), jnp.int32)
        for b in range(8):
            dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
            case = case | (
                inside[dx:dx + cx, dy:dy + cy, dz:dz + cz].astype(jnp.int32)
                << b)
        case_flat = case.reshape(-1)
        ntris = jnp.take(TRI_COUNT, case_flat, axis=0)
        tsum = jnp.cumsum(ntris)
        return tsum[-1]

    def p_faces(vol):
        inside = vol < level
        cx, cy, cz = X - 1, Y - 1, Z - 1
        case = jnp.zeros((cx, cy, cz), jnp.int32)
        for b in range(8):
            dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
            case = case | (
                inside[dx:dx + cx, dy:dy + cy, dz:dz + cz].astype(jnp.int32)
                << b)
        case_flat = case.reshape(-1)
        ntris = jnp.take(TRI_COUNT, case_flat, axis=0)
        tsum = jnp.cumsum(ntris)
        fslots = jnp.arange(face_cap, dtype=jnp.int32)
        cof = searchsorted1d(tsum, fslots + 1, side="left")
        cof = jnp.minimum(cof, case_flat.shape[0] - 1)
        acase = jnp.take(case_flat, cof, axis=0)
        return jnp.sum(acase)

    def p_grad_stacked(vol):
        grad = jnp.stack(jnp.gradient(vol), axis=-1)
        return grad[0, 0, 0]

    def p_grad_sep(vol):
        outs = [g[0, 0, 0] for g in jnp.gradient(vol)]
        return outs

    def p_normals(vol):
        verts = p_verts(vol)
        grad = jnp.stack(jnp.gradient(vol), axis=-1)
        gvals = jnp.stack(
            [trilinear(grad[..., a], verts)[0] for a in range(3)], axis=-1
        )
        nrm = -gvals
        nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        return nrm / jnp.maximum(nn, 1e-20)

    def p_values(vol):
        verts = p_verts(vol)
        return trilinear(vol, verts)[0]

    def timeit(name, fn, n=4):
        f = jax.jit(fn)
        r = f(vol)
        float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        ts = []
        for _ in range(n):
            t0 = time.time()
            r = f(vol)
            float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
            ts.append(time.time() - t0)
        print(f"{name:24s} {np.median(ts)*1000:9.2f} ms", flush=True)

    timeit("mask+t", p_mask)
    timeit("+cumsum50M", p_csum)
    timeit("+searchsorted", p_search)
    timeit("verts_full", p_verts)
    timeit("case+tsum", p_case)
    timeit("faces_cof+acase", p_faces)
    timeit("grad_stacked", p_grad_stacked)
    timeit("grad_separate", p_grad_sep)
    timeit("normals_full", p_normals)
    timeit("values_full", p_values)


if __name__ == "__main__":
    main()
