"""Fully-fused per-frame DynamicFusion step — one device program.

The reference processes a frame as a Python choreography of KDTree builds,
scipy solves, and voxel loops (test.py:124-131). Here the ENTIRE frame —
live-surface extraction, correspondence search, rigid presolve, the
3-iteration non-rigid GN loop with the reference's regularization
relaxation schedule, non-rigid TSDF fusion, and deformation-graph
maintenance — compiles to a single XLA program with no host round-trips:
one dispatch per frame, everything resident on device. (Per-dispatch +
fetch latency dominates multi-call drivers on remote-attached TPUs.)

Semantics per iteration mirror Fusion.solve / updateTSDF / update_graph
(core/fusion.py:327-412, 153-198, 201-239); the Python driver in
pipeline/fusion.py exposes the same steps individually for API parity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import warp_field as WF
from ..ops.marching_cubes import marching_cubes
from ..solvers.nonrigid import (
    gn_solve_core,
    make_reg_pairs,
    make_solver_ctx,
    relaxation_step,
)
from ..solvers.rigid import solve_rigid
from .correspondence import (
    closest_point_correspondences,
    closest_point_correspondences_grid,
    correspondence_candidates,
    correspondences_from_candidates,
)


class FrameStats(NamedTuple):
    cost_before: jax.Array  # (iters,) raw cost per GN round
    cost_after: jax.Array   # (iters,) huberized cost per GN round
    cost_before_h: jax.Array  # (iters,) HUBERIZED pre-solve cost per
                            # round — same units as cost_after, so
                            # "unremoved energy" slack bounds compare
                            # like with like (raw ≥ huberized for the
                            # same residuals; ADVICE r3)
    n_corr: jax.Array       # valid correspondences in round 0
    n_nodes: jax.Array      # active nodes after graph update
    n_verts: jax.Array      # canonical mesh verts after graph update
    overflow: jax.Array     # bool: any mesh cap or node pool saturated
                            # this frame (output silently truncated —
                            # grow vert_cap/face_cap/node_cap)
    pool_risk: jax.Array    # VOXELS whose 2-level node-candidate pool
                            # could not be certified == the flat search
                            # AND that lie within some node's 3σ
                            # influence (the per-voxel material
                            # certificate, build_warp_cache pool_ctx
                            # docstring) — monitor, and switch to exact
                            # candidates if persistent
    corr_risk: jax.Array    # vertices (summed over solve rounds) whose
                            # cached-candidate correspondence could not
                            # be certified == a fresh exact search (ball
                            # certificate in correspondences_from_
                            # candidates) — RESIDUAL risk: rounds whose
                            # certificate misses exceeded CORR_REFRESH_
                            # FRAC re-ran a fresh full search in-graph
                            # and contribute 0; 0 on the grid path
    corr_refresh: jax.Array  # solve rounds that re-ran a fresh full
                            # correspondence search because the cached-
                            # candidate drift certificate failed for
                            # > CORR_REFRESH_FRAC of the mesh (the
                            # certificate STEERS, it doesn't just
                            # report — large-motion frames self-repair)
    ell_overflow: jax.Array  # JᵀWJ contributions dropped by the solver's
                            # block-ELL degree cap, summed over solve
                            # rounds (gn_solve_core docstring). Nonzero
                            # = the CG operator was under-assembled:
                            # results stay correct (exact-energy
                            # acceptance) but the solve may stall —
                            # raise solvers.nonrigid.ELL_DEGREE_CAP


# When a solve round's drift certificate fails for more than this
# fraction of the canonical mesh, the round abandons the cached candidate
# set and re-runs a fresh full search in-graph (lax.cond — the fresh
# branch only executes on such rounds). Measured (tools/diag_gate.py,
# round 4): on a large-motion frame, uncertified cached matches leave the
# warp ~7.6× worse on a fresh-correspondence objective, while certified
# reuse is indistinguishable from fresh — so the certificate is the
# correct switch, and 1% misses bounds the uncertified contribution well
# below the solve's own tolerance.
CORR_REFRESH_FRAC = 0.01


def _build_caches(wf, vol_shape, brick, n_candidates, knn_k,
                  exact_candidates):
    """(cand_cache, warp_cache) for update_tsdf_nonrigid — with the
    per-voxel MATERIAL pool certificate as the cached risk (see
    build_warp_cache's pool_ctx docstring; the brick-level ball bound
    cannot certify the far field and fired on ~100% of 256³ bricks)."""
    if exact_candidates:
        cand = WF.brick_candidates(wf, vol_shape, brick, n_candidates)
        warp_cache = WF.build_warp_cache(wf, vol_shape, cand, knn_k, brick)
        return (cand, jnp.int32(0)), warp_cache
    cand, r_pool = WF.brick_candidates_2level(
        wf, vol_shape, brick, n_candidates, with_pool=True
    )
    if r_pool is None:  # grid not s-tileable: flat (exact) fallback
        warp_cache = WF.build_warp_cache(wf, vol_shape, cand, knn_k, brick)
        return (cand, jnp.int32(0)), warp_cache
    sel, selw, wi, risk = WF.build_warp_cache(
        wf, vol_shape, cand, knn_k, brick, pool_ctx=r_pool
    )
    return (cand, risk), (sel, selw, wi)


def _canonical_mesh(values, vert_cap, face_cap, step_size,
                    use_pallas=False):
    m = marching_cubes(
        values, level=0.0, vert_cap=vert_cap, face_cap=face_cap,
        step_size=step_size, use_pallas=use_pallas,
    )
    vmask = jnp.arange(vert_cap) < m["n_verts"]
    return m, vmask


def _blend_weights(wf, verts, nbr_idx):
    npos = jnp.take(wf.node_pos, nbr_idx, axis=0)
    nw = jnp.take(wf.node_w, nbr_idx, axis=0)
    act = jnp.take(wf.active, nbr_idx, axis=0)
    d = jnp.linalg.norm(verts[:, None, :] - npos, axis=-1)
    return jnp.where(act, jnp.exp(-((d / (2.0 * nw)) ** 2)), 0.0)


@partial(
    jax.jit,
    static_argnames=(
        "subsample_rate", "node_cap", "vert_cap", "face_cap", "mc_step",
    ),
)
def init_canonical(
    values: jax.Array,
    subsample_rate: float = 5.0,
    node_cap: int = 2048,
    vert_cap: int = 1 << 16,
    face_cap: int = 1 << 17,
    mc_step: int = 3,
):
    """Canonical-space initialization as one device program: marching
    cubes → sampling radius (subsample_rate × mean face edge length,
    core/fusion.py:89-92) → deformation graph. Returns (wf, radius)."""
    mesh, vmask = _canonical_mesh(values, vert_cap, face_cap, mc_step)
    tri = jnp.take(mesh["verts"], mesh["faces"].reshape(-1), axis=0).reshape(
        -1, 3, 3
    )
    e = (
        jnp.linalg.norm(tri[:, 0] - tri[:, 1], axis=1)
        + jnp.linalg.norm(tri[:, 0] - tri[:, 2], axis=1)
        + jnp.linalg.norm(tri[:, 1] - tri[:, 2], axis=1)
    ) / 3.0
    fmask = jnp.arange(face_cap) < mesh["n_faces"]
    radius = subsample_rate * jnp.sum(jnp.where(fmask, e, 0.0)) / jnp.maximum(
        mesh["n_faces"], 1
    )
    wf = WF.construct_graph(mesh["verts"], radius, node_cap, valid=vmask)
    return wf, radius


@partial(
    jax.jit,
    static_argnames=(
        "knn_k", "tdist", "wmax", "vert_cap", "face_cap", "live_vert_cap",
        "live_face_cap", "mc_step", "live_mc_step", "solve_iters",
        "gn_iters", "cg_iters",
        "ftol", "tolerance", "brick", "n_candidates", "update_graph",
        "use_pallas", "use_grid_corr", "approx_knn", "reuse_corr",
        "allow_large", "exact_candidates",
    ),
)
def fusion_frame(
    values: jax.Array,           # canonical TSDF (R,R,R)
    weights: jax.Array,
    live: jax.Array,             # live TSDF (same lattice)
    wf: WF.WarpField,
    lw_dq: jax.Array,            # (8,) global pose
    regularization_weight: float | jax.Array,
    knn_k: int = 4,
    tdist: float = 0.2,
    wmax: float = 100.0,
    vert_cap: int = 1 << 16,
    face_cap: int = 1 << 17,
    live_vert_cap: int | None = None,
    live_face_cap: int | None = None,
    mc_step: int = 3,
    live_mc_step: int = 1,
    solve_iters: int = 3,
    gn_iters: int | tuple = 8,
    cg_iters: int | tuple = 32,
    ftol: float = 1e-5,  # scipy parity (core/fusion.py:391)
    tolerance: float = 0.2,
    brick: int = 8,
    n_candidates: int = 16,
    update_graph: bool = True,
    use_pallas: bool = False,
    use_grid_corr: bool = False,
    approx_knn: bool = False,
    reuse_corr: bool = True,
    allow_large: bool = False,
    exact_candidates: bool = False,
    canon_mesh=None,
):
    """One DynamicFusion frame. Returns (values', weights', wf', lw',
    FrameStats). ``solve_iters`` = the reference's clpts iteration count.

    ``vert_cap`` sizes the canonical mesh (extracted at ``mc_step``);
    ``live_vert_cap`` sizes the step-1 live mesh (defaults to vert_cap) —
    keep the canonical cap snug, every solver array scales with it.

    ``exact_candidates=True`` bypasses the 2-level brick candidate
    approximation in the TSDF update (flat per-brick kNN over the whole
    node pool; pool_risk is then 0 by construction) — the conservative
    arm of the bench accuracy cross-check.

    ``gn_iters``/``cg_iters`` may be per-round tuples of length
    ``solve_iters`` (e.g. ``gn_iters=(8, 4, 2)``): the relaxation rounds
    then unroll with descending solver depth instead of sharing one
    scanned body — the first round removes most of the tracking energy
    and later rounds only polish the relaxed-regularization basin
    (reference schedule core/fusion.py:405-412), so a deep-first
    schedule buys the same converged cost for fewer total iterations
    (round-5 in-frame profile, tools/profile_frame5.py)."""
    if live_vert_cap is None:
        live_vert_cap = vert_cap
    if live_face_cap is None:
        live_face_cap = face_cap
    # Volume-scale guard: the single-dispatch fused frame is the right
    # execution shape up to ~256³, but at 512³ its one-program peak live
    # set thrashes HBM on a 16 GB chip — measured 67-152 s/frame,
    # nondeterministic, vs ~4.6 s through the multi-dispatch driver
    # (docs/tpu_kernel_notes.md "Fused-frame memory behavior",
    # benchmarks/bench512.py). Refuse rather than silently degrade.
    n_vox = 1
    for d in values.shape:
        n_vox *= int(d)
    if n_vox > (1 << 26) and not allow_large:  # > 64M voxels (~406³)
        raise ValueError(
            f"fusion_frame: volume {values.shape} ({n_vox/1e6:.0f}M voxels)"
            " exceeds the single-dispatch HBM budget (measured thrashing at"
            " 512³; docs/tpu_kernel_notes.md). Use the multi-dispatch"
            " driver pipeline.fusion.Fusion (see benchmarks/bench512.py)"
            " or pass allow_large=True to override."
        )
    # canonical mesh: the reference reuses the mesh from the previous
    # frame's update_graph (identical volume ⇒ identical mesh) — pass the
    # previous frame's returned mesh as ``canon_mesh`` to skip recomputing.
    if canon_mesh is None:
        mesh, vmask = _canonical_mesh(values, vert_cap, face_cap, mc_step,
                                      use_pallas=use_pallas)
    else:
        mesh = canon_mesh
        vmask = jnp.arange(vert_cap) < mesh["n_verts"]
    nbr_idx = WF.neighbor_lookup(wf, mesh["verts"], knn_k)
    blend_wts = _blend_weights(wf, mesh["verts"], nbr_idx)

    # live normals are never consumed (correspondences only target live
    # vertex POSITIONS, core/fusion.py:251-276) — skipping them drops the
    # three full-volume gradient passes (~45 ms at 256³)
    # ``live_mc_step``: extraction stride of the live target surface.
    # The reference extracts at stride 1 (core/fusion.py:247) on a 64³
    # lattice; stride s at 256³ keeps 4/s× the reference's world-space
    # target density. The bench's PINNED exact arm keeps stride 1
    # regardless of the fast arm's setting, so the common-objective
    # ratio gate scores any stride>1 against full-density targets.
    live_mesh = marching_cubes(
        live, level=0.0, vert_cap=live_vert_cap, face_cap=live_face_cap,
        step_size=live_mc_step, use_pallas=use_pallas, with_normals=False,
    )
    lmask = jnp.arange(live_vert_cap) < live_mesh["n_verts"]

    grid_n = (max(live.shape) + 15) // 16

    # ONE full candidate search per frame at the frame-entry warp state;
    # every later round re-ranks the cached candidate set under its
    # updated warp with a drift certificate (correspondence_candidates
    # docstring; the reference re-queries its KDTree per round,
    # core/fusion.py:371 → 251-276, but inter-round warp drift is
    # sub-voxel and divergence is counted in corr_risk, never silent).
    wv0, wn0 = WF.warp_points(
        wf, mesh["verts"], nbr_idx, normals=mesh["normals"], m_lw=lw_dq
    )
    cand_risk = jnp.int32(0)
    if use_grid_corr:
        def correspondences(wf_, lw_):
            wv, wn = WF.warp_points(
                wf_, mesh["verts"], nbr_idx, normals=mesh["normals"],
                m_lw=lw_,
            )
            c, v, bc = closest_point_correspondences_grid(
                wv, wn, vmask, live_mesh["verts"], lmask, knn_k, tolerance,
                grid_n=grid_n,
            )
            return c, v, bc, jnp.int32(0), jnp.int32(0)
    elif reuse_corr:
        cand_idx, d_kc, cand_risk = correspondence_candidates(
            wv0, vmask, live_mesh["verts"], lmask, kc=max(4 * knn_k, 16),
            approx=approx_knn,
        )
        n_valid0 = jnp.sum(vmask.astype(jnp.int32))
        risk_cap = jnp.maximum(
            (CORR_REFRESH_FRAC * n_valid0).astype(jnp.int32), 8
        )

        def correspondences(wf_, lw_):
            wv, wn = WF.warp_points(
                wf_, mesh["verts"], nbr_idx, normals=mesh["normals"],
                m_lw=lw_,
            )
            c, v, bc, risk = correspondences_from_candidates(
                wv, wn, vmask, live_mesh["verts"], lmask, cand_idx, d_kc,
                wv0, knn_k, tolerance,
            )

            # certificate-steered refresh: when the round's warp has
            # drifted so far from the frame-entry state that the ball
            # certificate fails for > CORR_REFRESH_FRAC of the mesh,
            # abandon the cache and re-search (the fresh branch only
            # executes on such rounds — lax.cond)
            def fresh(_):
                c2, v2, bc2 = closest_point_correspondences(
                    wv, wn, vmask, live_mesh["verts"], lmask, knn_k,
                    tolerance, approx=approx_knn,
                )
                return c2, v2, bc2, jnp.int32(0), jnp.int32(1)

            def keep(_):
                return c, v, bc, risk, jnp.int32(0)

            return jax.lax.cond(risk > risk_cap, fresh, keep, None)
    else:
        # fresh full search every round — the reference's literal behavior
        # (core/fusion.py:371 → 251-276); the conservative arm of the
        # bench accuracy cross-check.
        def correspondences(wf_, lw_):
            wv, wn = WF.warp_points(
                wf_, mesh["verts"], nbr_idx, normals=mesh["normals"],
                m_lw=lw_,
            )
            c, v, bc = closest_point_correspondences(
                wv, wn, vmask, live_mesh["verts"], lmask, knn_k, tolerance,
                approx=approx_knn,
            )
            return c, v, bc, jnp.int32(0), jnp.int32(0)

    # --- rigid presolve (core/fusion.py:350-364): residuals on node-field
    # pre-warped points, pose applied on top
    corr, cvalid, _, risk0, refresh0 = correspondences(wf, lw_dq)
    pv, pn = WF.warp_points(wf, mesh["verts"], nbr_idx, normals=mesh["normals"])
    lw_dq, _ = solve_rigid(lw_dq, pv, pn, corr, cvalid, iterations=12)

    n_corr0 = jnp.sum(cvalid.astype(jnp.int32))

    # --- non-rigid rounds with regularization relaxation (327-412)
    pair_i, pair_j, _, pmask0 = make_reg_pairs(
        wf.node_vert_idx, nbr_idx, wf.node_w, wf.active, jnp.float32(1.0)
    )
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)
    wi_ = jnp.take(wf.node_w, pair_i, axis=0)
    wj_ = jnp.take(wf.node_w, pair_j, axis=0)
    base_scale = jnp.maximum(wi_, wj_)

    # frame-constant solver plumbing shared by ALL relaxation rounds
    # (VERDICT r4 #1): the block-ELL slot dictionary, operand-panel
    # gather indices, and sorted reducers depend only on the kNN/pair
    # sparsity and the mesh valid mask — building them once removes the
    # per-round argsorts round 4 paid 3× per frame. The dictionary uses
    # vmask (a superset of every round's correspondence mask), which is
    # exact: see SolverCtx's docstring.
    solver_ctx = make_solver_ctx(
        nbr_idx, vmask, pair_i, pair_j, pmask0, wf.node_dq.shape[0],
        dense_pairs=True,
    )

    def round_fn(carry, it, gn_r, cg_r):
        node_dq, lw_, rw, act, dmp = carry

        def run(args):
            node_dq, lw_, rw, dmp = args
            corr_, cval_, _, risk_, refresh_ = correspondences(
                wf.replace(node_dq=node_dq), lw_
            )
            pair_scale = rw * base_scale
            data_args = (mesh["verts"], mesh["normals"], corr_, cval_,
                         nbr_idx, blend_wts)
            reg_args = (pair_i, pair_j, pair_v, pair_scale, pmask0)
            # cb = the raw pre-solve cost (the reference prints raw cost
            # before and huberized cost after, core/fusion.py:375-398).
            # damping_init warm-starts the LM trust region from the
            # previous relaxation round — the rounds re-solve the same
            # basin with a relaxed reg weight, so the converged damping
            # carries over (gn_solve_core docstring). CLAMPED to 100× the
            # floor (ADVICE r4): a converged round can exit with damping
            # inflated up to 10^MAX_LM_RETRIES, and feeding that to the
            # next round (fresh correspondences + relaxed reg = new energy
            # to remove) would make its first step near-zero — if the
            # reduction then falls under ftol·e the round dies after one
            # step with FRESH blocks, so no stale_fail rescue applies.
            new_dq, cb, cbh, ca, dmp_new, ellov = gn_solve_core(
                node_dq, data_args, reg_args, lw_,
                gn_r, cg_r, 1e-4, ftol, lambda x: x,
                dense_pairs=True,
                damping_init=jnp.minimum(dmp, jnp.float32(1e-2)),
                solver_ctx=solver_ctx,
            )
            return new_dq, cb, cbh, ca, risk_, refresh_, dmp_new, ellov

        def skip(args):
            node_dq, _, _, dmp = args
            return (node_dq, jnp.float32(0.0), jnp.float32(0.0),
                    jnp.float32(0.0), jnp.int32(0), jnp.int32(0), dmp,
                    jnp.int32(0))

        # deactivated rounds are genuinely skipped (the reference breaks
        # out of its iteration loop, core/fusion.py:405-412)
        node_dq, cb, cbh, ca, risk_, refresh_, dmp, ellov = jax.lax.cond(
            act, run, skip, (node_dq, lw_, rw, dmp)
        )
        relax, rw_next = relaxation_step(cb, ca, rw)
        rw = jnp.where(act, rw_next, rw)
        act = act & relax
        return (node_dq, lw_, rw, act, dmp), (cb, cbh, ca, risk_, refresh_,
                                              ellov)

    rw0 = jnp.asarray(regularization_weight, jnp.float32)
    carry0 = (wf.node_dq, lw_dq, rw0, jnp.bool_(True), jnp.float32(1e-4))
    gn_sched = (tuple(gn_iters) if isinstance(gn_iters, (tuple, list))
                else (gn_iters,) * solve_iters)
    cg_sched = (tuple(cg_iters) if isinstance(cg_iters, (tuple, list))
                else (cg_iters,) * solve_iters)
    if len(gn_sched) != solve_iters or len(cg_sched) != solve_iters:
        raise ValueError(
            f"gn_iters/cg_iters schedules must have length solve_iters="
            f"{solve_iters}, got {gn_sched}/{cg_sched}"
        )
    if len(set(gn_sched)) == 1 and len(set(cg_sched)) == 1:
        # uniform depth: one compiled round body, scanned (a tuple like
        # gn_iters=(8, 8) collapses to the scalar scan path)
        (node_dq, lw_dq, _, _, _), (
            cbs, cbhs, cas, risks, refreshes, ellovs
        ) = jax.lax.scan(
            lambda c, it: round_fn(c, it, gn_sched[0], cg_sched[0]),
            carry0, jnp.arange(solve_iters),
        )
    else:
        # per-round depth schedule: unrolled rounds, same carry chain
        carry, ys = carry0, []
        for r in range(solve_iters):
            carry, y = round_fn(carry, jnp.int32(r),
                                gn_sched[r], cg_sched[r])
            ys.append(y)
        node_dq, lw_dq = carry[0], carry[1]
        cbs, cbhs, cas, risks, refreshes, ellovs = (
            jnp.stack([y[i] for y in ys]) for i in range(6)
        )
    wf = wf.replace(node_dq=node_dq)
    corr_risk = cand_risk + risk0 + jnp.sum(risks)
    corr_refresh = refresh0 + jnp.sum(refreshes)

    # --- non-rigid canonical fusion (153-198). The per-brick node
    # candidate lists AND the per-voxel kNN selection/blend-weight/wi
    # cache depend only on (node_pos, node_w, active), which change ONLY
    # when update_graph inserts nodes — so the previous frame's caches
    # (threaded through the returned mesh dict) are exact and both
    # searches amortize to the insertion frames.
    if canon_mesh is not None and "brick_cand" in canon_mesh:
        cand_cache = (canon_mesh["brick_cand"], canon_mesh["brick_risk"])
        warp_cache = (canon_mesh["warp_sel"], canon_mesh["warp_selw"],
                      canon_mesh["warp_wi"])
    else:
        cand_cache, warp_cache = _build_caches(
            wf, values.shape, brick, n_candidates, knn_k, exact_candidates
        )
    values, weights, esc_dropped, pool_risk = WF.update_tsdf_nonrigid(
        values, weights, live, wf, lw_dq, k=knn_k, tdist=tdist, wmax=wmax,
        brick=brick, n_candidates=n_candidates, use_pallas=use_pallas,
        cand_cache=cand_cache, warp_cache=warp_cache,
    )

    # --- deformation-graph maintenance (201-239)
    n_dropped = jnp.int32(0)
    if update_graph:
        mesh2, vmask2 = _canonical_mesh(values, vert_cap, face_cap, mc_step,
                                        use_pallas=use_pallas)
        n_act0 = wf.num_active
        wf, n_dropped = WF.update_graph(wf, mesh2["verts"], vmask2, knn_k)
        n_inserted = wf.num_active - n_act0
        mesh_out = mesh2
    else:
        n_inserted = jnp.int32(0)
        mesh_out = mesh

    # refresh the candidate + warp caches for the next frame only when
    # the node set actually changed (XLA conditional: the recompute
    # branch runs only on insertion frames)
    wf_next = wf

    def _recompute(_):
        cc, wc = _build_caches(
            wf_next, values.shape, brick, n_candidates, knn_k,
            exact_candidates,
        )
        return cc + wc

    cand_next = jax.lax.cond(
        n_inserted > 0, _recompute,
        lambda _: cand_cache + warp_cache, None,
    )
    mesh_out = dict(
        mesh_out, brick_cand=cand_next[0], brick_risk=cand_next[1],
        warp_sel=cand_next[2], warp_selw=cand_next[3],
        warp_wi=cand_next[4],
    )

    stats = FrameStats(
        cost_before=cbs,
        cost_after=cas,
        cost_before_h=cbhs,
        n_corr=n_corr0,
        n_nodes=wf.num_active,
        n_verts=mesh_out["n_verts"],
        overflow=(
            mesh["overflow"] | mesh_out["overflow"] | live_mesh["overflow"]
            | (n_dropped > 0) | (esc_dropped > 0)
        ),
        pool_risk=pool_risk,
        corr_risk=corr_risk,
        corr_refresh=corr_refresh,
        ell_overflow=jnp.sum(ellovs),
    )
    return values, weights, wf, lw_dq, stats, mesh_out
