"""Round-4 solver experiment: where does the 163 ms GN solve go, and what
does a frozen-JtWJ step cost?

Times, at bench scale (M=4096, V=32768, k=3), with the dependent-loop
trick (REPS iterations inside one jit, carry dependency):
  - residual pass + energies
  - jacfwd Jacobian build (data + reg)
  - contribution build + block-ELL assembly reduce
  - rhs via red_nbr (current) vs one vjp (frozen-step path)
  - precond build (_inv8_spd) + 16-iteration CG over assembled blocks
  - full solve_nonrigid(gn=8, cg=16) for reference

Run: nohup python tools/exp_freeze.py > /tmp/exp_freeze.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 32


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.solvers import nonrigid as NR

    M, V, k = 4096, 32768, 3
    P = M * k
    rng = np.random.RandomState(0)
    verts = jnp.asarray(rng.rand(V, 3).astype(np.float32) * 2 - 1)
    normals_ = rng.randn(V, 3).astype(np.float32)
    normals_ /= np.linalg.norm(normals_, axis=1, keepdims=True)
    normals = jnp.asarray(normals_)
    corrs = verts + jnp.asarray(0.01 * rng.randn(V, 3).astype(np.float32))
    corr_mask = jnp.asarray(rng.rand(V) < 0.95)
    nbr_idx = jnp.asarray(rng.randint(0, M, (V, k)).astype(np.int32))
    blend_wts = jnp.asarray(rng.rand(V, k).astype(np.float32))
    pair_i = jnp.asarray(np.repeat(np.arange(M, dtype=np.int32), k))
    pair_j = jnp.asarray(rng.randint(0, M, P).astype(np.int32))
    pair_v = jnp.asarray(rng.rand(P, 3).astype(np.float32))
    pair_scale = jnp.asarray(np.full(P, 0.7, np.float32))
    pair_mask = jnp.ones((P,), bool)
    node_dq0 = jnp.tile(
        jnp.array([1, 0, 0, 0, 0, 0, 0, 0], jnp.float32), (M, 1)
    )
    node_dq0 = node_dq0 + 0.01 * jnp.asarray(rng.randn(M, 8).astype(np.float32))
    lw_dq = jnp.array([1, 0, 0, 0, 0, 0, 0, 0], jnp.float32)
    data_args = (verts, normals, corrs, corr_mask, nbr_idx, blend_wts)
    reg_args = (pair_i, pair_j, pair_v, pair_scale, pair_mask)

    def timeit(name, body, init, n=3):
        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, REPS, lambda i, c: body(c), c)

        out = loop(init)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        ts = []
        for _i in range(n):
            t0 = time.time()
            out = loop(init)
            _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
            ts.append(time.time() - t0)
        ms = (np.median(ts) * 1000 - 32.0) / REPS
        print(f"{name:40s} {ms:9.4f} ms/op", flush=True)
        return ms

    hi = jax.lax.Precision.HIGHEST

    # --- residual pass + energies
    def res_body(x):
        r_d, r_r = NR._residuals(x, data_args, reg_args, lw_dq)
        _, rob = NR._energies(r_d, r_r, lambda v: v)
        return x + 1e-12 * rob

    timeit("residuals+energies", res_body, node_dq0)

    # --- jacfwd build (data + reg), as in run_step
    def one_data(dqs_k, vert, normal, corr, wts_k, lw):
        f = lambda d: NR.data_residual_one(d, vert, normal, corr, wts_k, lw)
        return f(dqs_k), jax.jacfwd(f)(dqs_k)

    def one_reg(di, dj, v, s):
        r = NR.reg_residual_one(di, dj, v, s)
        Ji = jax.jacfwd(NR.reg_residual_one, argnums=0)(di, dj, v, s)
        Jj = jax.jacfwd(NR.reg_residual_one, argnums=1)(di, dj, v, s)
        return r, Ji, Jj

    def jac_body(x):
        dqs_v = jnp.take(x, nbr_idx, axis=0)
        r_d, J_d = jax.vmap(one_data, in_axes=(0, 0, 0, 0, 0, None))(
            dqs_v, verts, normals, corrs, blend_wts, lw_dq
        )
        r_r, J_ri, J_rj = jax.vmap(one_reg)(
            jnp.take(x, pair_i, axis=0), jnp.take(x, pair_j, axis=0),
            pair_v, pair_scale,
        )
        return x + 1e-12 * (jnp.sum(J_d) + jnp.sum(J_ri) + jnp.sum(J_rj)
                            + jnp.sum(r_d) + jnp.sum(r_r))

    timeit("jacfwd_build(data+reg)", jac_body, node_dq0)

    # --- vjp gradient (frozen-step path): exact rhs in one reverse pass
    def vjp_body(x):
        def res_d(xx):
            r_d, _ = NR._residuals(xx, data_args, reg_args, lw_dq)
            return r_d

        def res_r(xx):
            _, r_r = NR._residuals(xx, data_args, reg_args, lw_dq)
            return r_r

        r_d, pull_d = jax.vjp(res_d, x)
        r_r, pull_r = jax.vjp(res_r, x)
        from dynamicfusion_body_tpu.ops.losses import huber_irls_weight
        w_d = huber_irls_weight(r_d) * corr_mask
        w_r = huber_irls_weight(r_r) * pair_mask[:, None]
        g = pull_d(w_d * r_d)[0] + pull_r(w_r * r_r)[0]
        return x + 1e-12 * g

    timeit("vjp_gradient(both terms)", vjp_body, node_dq0)

    # --- assembly: contribution build + reduce_ell
    reduce_ell, ell_nbr, self_ids, self_present, _ = NR.make_block_ell(
        nbr_idx, corr_mask, pair_i, pair_j, pair_mask, M, NR.ELL_DEGREE_CAP
    )
    DC = NR.ELL_DEGREE_CAP

    def build_blocks(x):
        dqs_v = jnp.take(x, nbr_idx, axis=0)
        r_d, J_d = jax.vmap(one_data, in_axes=(0, 0, 0, 0, 0, None))(
            dqs_v, verts, normals, corrs, blend_wts, lw_dq
        )
        from dynamicfusion_body_tpu.ops.losses import huber_irls_weight
        w_d = huber_irls_weight(r_d) * corr_mask
        J_d = jnp.where(corr_mask[:, None, None], J_d, 0.0)
        r_r, J_ri, J_rj = jax.vmap(one_reg)(
            jnp.take(x, pair_i, axis=0), jnp.take(x, pair_j, axis=0),
            pair_v, pair_scale,
        )
        J_ri = jnp.where(pair_mask[:, None, None], J_ri, 0.0)
        J_rj = jnp.where(pair_mask[:, None, None], J_rj, 0.0)
        w_r3 = (huber_irls_weight(r_r) * pair_mask[:, None]).T
        Ji24 = J_ri.transpose(1, 2, 0).reshape(24, -1)
        Jj24 = J_rj.transpose(1, 2, 0).reshape(24, -1)
        Jw = (J_d * w_d[:, None, None]).transpose(1, 2, 0)
        JdT = J_d.transpose(1, 2, 0)
        data_chunks = [
            (Jw[ka][:, None, :] * JdT[kb][None, :, :]).reshape(64, V)
            for ka in range(k) for kb in range(k)
        ]

        def reg_outer(Jx24, Jy24):
            return sum(
                ((w_r3[c] * Jx24[c * 8:(c + 1) * 8])[:, None, :]
                 * Jy24[c * 8:(c + 1) * 8][None, :, :]) for c in range(3)
            ).reshape(64, -1)

        contrib = jnp.concatenate(
            data_chunks + [reg_outer(Ji24, Ji24), reg_outer(Ji24, Jj24),
                           reg_outer(Jj24, Ji24), reg_outer(Jj24, Jj24)],
            axis=1,
        )
        return reduce_ell(contrib)

    def asm_body(x):
        blocks64 = build_blocks(x)
        return x + 1e-12 * jnp.sum(blocks64)

    timeit("jacfwd+contrib+reduce_ell(assembly)", asm_body, node_dq0)

    # --- CG 16 iterations with assembled blocks (+ precond build)
    blocks64 = build_blocks(node_dq0)
    Bl = blocks64.T.reshape(M, DC, 8, 8)
    blk = jnp.take(blocks64, self_ids, axis=1) * (
        self_present.astype(jnp.float32)[None, :]
    )
    blkT = blk.T.reshape(M, 8, 8)
    rhs0 = jnp.asarray(rng.rand(8, M).astype(np.float32))

    def cg_body16(rhs):
        lam = 1e-4
        D = blkT + lam * jnp.eye(8)[None, :, :]
        Dinv = NR._inv8_spd(D)

        def precond(r8):
            return jnp.einsum("mab,bm->am", Dinv, r8, precision=hi)

        def matvec(p8):
            pg = jnp.take(p8, ell_nbr, axis=1).reshape(8, M, DC)
            return jnp.einsum("mdab,bmd->am", Bl, pg, precision=hi) + lam * p8

        def body(state):
            sol, rvec, z, d, rz, it = state
            Ad = matvec(d)
            alpha = rz / jnp.maximum(jnp.sum(d * Ad), 1e-30)
            sol = sol + alpha * d
            rvec = rvec - alpha * Ad
            z = precond(rvec)
            rz_new = jnp.sum(rvec * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            d = z + beta * d
            return sol, rvec, z, d, rz_new, it + 1

        z0 = precond(rhs)
        st = (jnp.zeros_like(rhs), rhs, z0, z0, jnp.sum(rhs * z0),
              jnp.int32(0))
        sol = jax.lax.fori_loop(0, 16, lambda i, s: body(s), st)[0]
        return rhs * 0.999 + 1e-12 * sol

    timeit("precond_build+CG16(assembled)", cg_body16, rhs0)

    # --- full current solve for reference
    def solve_body(x):
        out = NR.gn_solve_core(
            x, data_args, reg_args, lw_dq, 8, 16, 1e-4, 1e-5,
            lambda v: v, dense_pairs=True, use_ell=True,
        )
        return x * 0.999 + 1e-9 * out[0]

    timeit("full_solve gn8 cg16 (x%d reps)" % 8, solve_body, node_dq0, n=2)


if __name__ == "__main__":
    main()
