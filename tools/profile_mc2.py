"""Incremental amortized timing of marching_cubes stages at LIVE caps
(vert_cap=1<<17, face_cap=1<<18) at 256³ — isolates cap-sized costs.

Run: nohup python tools/profile_mc2.py > /tmp/profile_mc4.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.suite import bumpy_sdf
    from dynamicfusion_body_tpu.ops import marching_cubes as M

    RES = 256
    vol = jnp.asarray(bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0))
    print(f"# backend={jax.default_backend()}", flush=True)

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
        print(f"{name:34s} {ms:9.2f} ms   (1+fetch: {t1*1000:7.1f})",
              flush=True)
        return ms

    level = 0.0
    X = Y = Z = RES
    nxyz = X * Y * Z
    vert_cap, face_cap = 1 << 17, 1 << 18

    def upto(stage):
        def fn(vol):
            inside = vol < level

            def axis_cross(a):
                sl_lo = [slice(None)] * 3
                sl_hi = [slice(None)] * 3
                sl_lo[a] = slice(0, vol.shape[a] - 1)
                sl_hi[a] = slice(1, vol.shape[a])
                cross = (vol[tuple(sl_lo)] < level) != (
                    vol[tuple(sl_hi)] < level)
                pad = [(0, 0)] * 3
                pad[a] = (0, 1)
                return jnp.pad(cross, pad)

            crosses = [axis_cross(a) for a in range(3)]
            flat_mask = jnp.concatenate([c.reshape(-1) for c in crosses])
            vranks = M._Ranks(flat_mask.astype(jnp.int8), 256)
            n_verts = vranks.total
            if stage == "ranks":
                return n_verts

            vslots = jnp.arange(vert_cap, dtype=jnp.int32)
            edge_of_vert = vranks.unrank(vslots)
            vmask0 = vslots < n_verts
            ea = edge_of_vert // nxyz
            elin = edge_of_vert % nxyz
            ei = elin // (Y * Z)
            ej = (elin // Z) % Y
            ek = elin % Z
            vol_flat = vol.reshape(-1)
            vstride = jnp.where(ea == 0, Y * Z, jnp.where(ea == 1, Z, 1))
            vlo = jnp.take(vol_flat, elin, axis=0)
            vhi = jnp.take(vol_flat, jnp.minimum(elin + vstride, nxyz - 1),
                           axis=0)
            denom = vlo - vhi
            et = jnp.where(jnp.abs(denom) > 1e-30, (vlo - level) / denom, 0.5)
            vx = ei.astype(jnp.float32) + jnp.where(ea == 0, et, 0.0)
            vy = ej.astype(jnp.float32) + jnp.where(ea == 1, et, 0.0)
            vz = ek.astype(jnp.float32) + jnp.where(ea == 2, et, 0.0)
            verts = jnp.stack(
                [jnp.where(vmask0, c, 0.0) for c in (vx, vy, vz)], axis=-1)
            if stage == "verts":
                return verts

            cx, cy, cz = X - 1, Y - 1, Z - 1
            case = jnp.zeros((cx, cy, cz), jnp.int32)
            for b in range(8):
                dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
                case = case | (
                    inside[dx:dx + cx, dy:dy + cy, dz:dz + cz].astype(
                        jnp.int32) << b)
            case_flat = case.reshape(-1)
            ntris = M._ntris_chunked(case_flat)
            franks = M._Ranks(ntris, 128)
            n_faces = franks.total
            if stage == "franks":
                return verts, n_faces

            fslots = jnp.arange(face_cap, dtype=jnp.int32)
            cell_of_face = franks.unrank(fslots)
            if stage == "f_unrank":
                return verts, cell_of_face
            fmask0 = fslots < n_faces
            acase = jnp.take(case_flat, cell_of_face, axis=0)
            ntri_f = M._ntris_of_case(acase)
            tsum_f = franks.rank_incl(cell_of_face)
            slot = jnp.clip(fslots - (tsum_f - ntri_f), 0, 4)
            ci = cell_of_face // (cy * cz)
            cj = (cell_of_face // cz) % cy
            ck = cell_of_face % cz
            if stage == "f_meta":
                return verts, slot + ci

            row15 = M._onehot_rows(acase, M._TRI15, 15)
            w_iota = jnp.arange(15, dtype=jnp.int32)[None, :]
            fcols = []
            for c in range(3):
                sel = (w_iota == (slot * 3 + c)[:, None]).astype(jnp.float32)
                el = jnp.sum(row15 * sel, axis=1).astype(jnp.int32)
                off4 = M._onehot_rows(el, M._EDGE_OFF, 4)
                gi = ci + off4[:, 0].astype(jnp.int32)
                gj = cj + off4[:, 1].astype(jnp.int32)
                gk = ck + off4[:, 2].astype(jnp.int32)
                ga = off4[:, 3].astype(jnp.int32)
                eid = ga * nxyz + (gi * Y + gj) * Z + gk
                vidx = vranks.rank_incl(eid) - 1
                fcols.append(jnp.where(fmask0, vidx, 0))
            faces = jnp.stack(fcols, axis=-1)
            if stage == "faces":
                return verts, faces

            stride = jnp.where(ea == 0, Y * Z, jnp.where(ea == 1, Z, 1))
            lin0 = elin
            lin1 = jnp.minimum(elin + stride, nxyz - 1)
            comps = []
            for g in jnp.gradient(vol):
                gf = g.reshape(-1)
                g0 = jnp.take(gf, lin0, axis=0)
                g1 = jnp.take(gf, lin1, axis=0)
                comps.append(g0 + et * (g1 - g0))
            nrm = -jnp.stack(comps, axis=-1)
            nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
            normals = nrm / jnp.maximum(nn, 1e-20)
            return verts, faces, normals

        return jax.jit(fn)

    for st in ["ranks", "verts", "franks", "f_unrank", "f_meta", "faces",
               "normals"]:
        f = upto(st)
        timeit(f"upto_{st}", lambda f=f: f(vol),
               lambda o: f1(o[0] if isinstance(o, tuple) else o))


if __name__ == "__main__":
    main()
