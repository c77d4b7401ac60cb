"""Non-rigid warp-field solver: block-sparse Gauss-Newton with PCG.

Replaces the reference's scipy ``least_squares(computef, …, jac='2-point',
tr_solver='lsmr', loss='huber')`` (core/fusion.py:382-392) — the profiled
bottleneck (94% of solve time in finite-difference Jacobians, SURVEY §6).

Energy (identical terms to ``computef``, core/fusion.py:459-491):
* data: per vertex i with correspondence c_i,
    r_i = n_i^w · (v_i^w − c_i),
  where v^w/n^w are DQB-skinned by the k neighbor-node DQs (Gaussian
  weights from node positions — constant during the solve) then the global
  rigid DQ ``lw``;
* regularization: per node pair (i, j ∈ kNN of node i's anchor vertex),
    r_ij = rw·max(w_i, w_j) · (W_{dq_i}(v_j) − W_{dq_j}(v_j)) ∈ R³.

TPU design: every residual touches ≤ k nodes, so Jacobians are computed as
dense per-residual blocks with ``jax.jacfwd`` under ``vmap`` (analytic, one
pass — not 570 residual sweeps), and the normal equations are never
materialized: JᵀWJ·p is evaluated block-wise with gathers + segment-sums
inside a Jacobi-preconditioned CG. Robustification = IRLS with scipy-style
huber weights (f_scale=1), matching ``loss='huber'``.

The GN loop carries the current energy through the scan (one residual pass
per step, none at exit) and deactivates — genuinely skipping the remaining
iterations via ``lax.cond`` — once the relative cost reduction drops below
``ftol``, mirroring scipy's ftol termination (the reference passes
ftol=1e-5, core/fusion.py:391).

Damping is Levenberg-Marquardt-adaptive: a rejected step (energy increase
— GN overshoot far from the optimum, where the linearization is poor)
retries INSIDE the same GN round with 10× the damping, reusing the
already-built Jacobians/normal blocks — a retry costs one CG solve + one
residual pass, not a Jacobian rebuild; an accepted step relaxes damping
3×. Without this, a first-step rejection silently returned the input
unchanged (measured: the large-deformation tracking gate stalled at
cost0 == cost1 with fixed damping 1e-4, while damping 1e-2 cut the cost
4×) — the fixed-damping design only converged in the small-motion bench
regime.

Retries are spent ONLY on genuine overshoots: a rejected try whose
energy is within 100·ftol of the current energy is FLAT — the solver
sits at a (local) optimum where more damping can only produce smaller
steps to the same energy, so the retry loop exits immediately and the
ftol test ends the round. Without this exit, every CONVERGED solve
round burned MAX_LM_RETRIES full CG solves + residual passes discovering
it was done (measured round 3: 8 GN × 16 CG went 64 → 381 ms standalone
and the fused frame 277 → 1192 ms — the retry loop, not the step math).

The same GN core runs single-chip and under ``shard_map`` — the sharded
variant (parallel/sharded.py) passes a ``psum`` hook applied to every
data-term reduction; the solver math exists once.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.dualquat import (
    dq_normalize8,
    dq_transform_normal,
    dq_transform_point,
)
from ..ops.losses import huber_irls_weight
from ..ops.search import searchsorted1d

# LM retries per GN round: base damping 1e-4 escalates through 1e-3 …
# 1e-1 — the measured recovery regime for large-deformation first steps
# is ~1e-2 (solvers/nonrigid.py docstring), comfortably inside 4 tries.
MAX_LM_RETRIES = 4

# The reference's regularization-relaxation schedule constants
# (core/fusion.py:405-412): keep iterating (and divide the weight by
# RELAX_DIV) only while the relative cost reduction is inside
# (RELAX_LO, RELAX_HI).
RELAX_DIV = 8.0
RELAX_LO = 0.05
RELAX_HI = 0.9


def relaxation_step(cost_before, cost_after, rw):
    """One step of the reference's relaxation schedule. Returns
    (continue_, rw') — works on python floats and traced arrays alike
    (Fusion.solve's host loop and pipeline/frame.py's lax.scan share it,
    so the schedule exists once)."""
    reduct = (cost_before - cost_after) / jnp.maximum(
        jnp.asarray(cost_before, jnp.float32), 1e-30
    )
    relax = (reduct > RELAX_LO) & (reduct < RELAX_HI)
    return relax, jnp.where(relax, jnp.asarray(rw, jnp.float32) / RELAX_DIV, rw)


def _blend_with(dqs_k, wts_k):
    """Weighted DQ sum + 8-norm normalization (weights precomputed)."""
    return dq_normalize8(jnp.sum(wts_k[:, None] * dqs_k, axis=0))


def _inv8_spd(D):
    """Batched (M, 8, 8) inverse by unrolled Gauss-Jordan, no pivoting.

    The preconditioner blocks are GN normal blocks + λI — symmetric
    positive definite — so pivot-free elimination is stable (SPD never
    needs pivoting). ``jnp.linalg.inv``'s batched LU-with-pivoting costs
    8.8 ms for (4096, 8, 8) on a v5e — HALF the per-GN-step fixed cost;
    this unrolled form runs the same inverse in 1.1 ms as ~24 fused
    vector ops (measured round 3, tools/exp_solver.py postmortem)."""
    n = D.shape[-1]
    aug = jnp.concatenate(
        [D, jnp.broadcast_to(jnp.eye(n, dtype=D.dtype), D.shape)], axis=-1
    )  # (M, n, 2n)
    for i in range(n):
        piv = aug[:, i : i + 1, :] / aug[:, i : i + 1, i : i + 1]
        aug = aug - aug[:, :, i : i + 1] * piv
        aug = aug.at[:, i, :].set(piv[:, 0, :])
    return aug[:, :, n:]


def make_sorted_reducer(ids, num_segments):
    """Scatter-free segment-sum in channel-major layout.

    TPU scatters are near-serial and (N, D) contribution arrays pad their
    minor dim to 128 lanes, so reductions run as: sort contributions by
    segment once (the sparsity is fixed per solve), then per call a
    lane-direction cumsum of the (D, N) array + two boundary gathers.

    Returns ``reduce((D, N)) -> (D, num_segments)`` summing columns by ids.
    """
    order = jnp.argsort(ids)
    sorted_ids = jnp.take(ids, order, axis=0)
    ends = searchsorted1d(
        sorted_ids, jnp.arange(num_segments, dtype=ids.dtype), side="right"
    )
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])

    def reduce(x):  # (D, N) → (D, M)
        xs = jnp.take(x, order, axis=1)
        csum = jnp.cumsum(xs, axis=1)
        padded = jnp.concatenate(
            [jnp.zeros(x.shape[:1] + (1,), x.dtype), csum], axis=1
        )
        return jnp.take(padded, ends, axis=1) - jnp.take(padded, starts, axis=1)

    return reduce


def data_residual_one(dqs_k, vert, normal, corr, wts_k, lw_dq):
    se3 = _blend_with(dqs_k, wts_k)
    p = dq_transform_point(se3, vert)
    p = dq_transform_point(lw_dq, p)
    n = dq_transform_normal(se3, normal)
    n = dq_transform_normal(lw_dq, n)
    return jnp.dot(n, p - corr)


def reg_residual_one(dq_i, dq_j, vj, scale):
    return scale * (dq_transform_point(dq_i, vj) - dq_transform_point(dq_j, vj))


def _rho(z):
    # scipy huber with f_scale=1: rho(z) = z if z<=1 else 2√z − 1; reg rows
    # are 3 scalar residuals (the reference appends the diff components
    # individually), so rho applies per component.
    return jnp.where(z <= 1.0, z, 2.0 * jnp.sqrt(jnp.maximum(z, 1.0)) - 1.0)


def _residuals(node_dq, data_args, reg_args, lw_dq):
    verts, normals, corrs, corr_mask, nbr_idx, blend_wts = data_args
    pair_i, pair_j, pair_v, pair_scale, pair_mask = reg_args
    dqs_v = jnp.take(node_dq, nbr_idx, axis=0)
    r_d = jax.vmap(data_residual_one, in_axes=(0, 0, 0, 0, 0, None))(
        dqs_v, verts, normals, corrs, blend_wts, lw_dq
    )
    r_d = jnp.where(corr_mask, r_d, 0.0)
    r_r = jax.vmap(reg_residual_one)(
        jnp.take(node_dq, pair_i, axis=0),
        jnp.take(node_dq, pair_j, axis=0),
        pair_v,
        pair_scale,
    )
    r_r = jnp.where(pair_mask[:, None], r_r, 0.0)
    return r_d, r_r


def _energies(r_d, r_r, psum):
    """(raw, huberized) total costs from residuals. The data term may be
    vertex-sharded — ``psum`` folds it over the mesh; the reg term is
    replicated."""
    zd, zr = r_d**2, r_r**2
    raw = 0.5 * (psum(jnp.sum(zd)) + jnp.sum(zr))
    rob = 0.5 * (psum(jnp.sum(_rho(zd))) + jnp.sum(_rho(zr)))
    return raw, rob


def nonrigid_energy(node_dq, data_args, reg_args, lw_dq, robust: bool = True):
    """Total cost 0.5·Σρ(r²), scipy-style huber with f_scale=1.

    ``robust=False`` gives the raw 0.5·Σr² the reference prints as
    "cost before optimization" (core/fusion.py:375-376).
    """
    r_d, r_r = _residuals(node_dq, data_args, reg_args, lw_dq)
    raw, rob = _energies(r_d, r_r, lambda x: x)
    return rob if robust else raw


def make_block_ell(nbr_idx, corr_mask, pair_i, pair_j, pair_mask, M: int,
                   D: int):
    """Slot mapping for the block-ELL normal matrix (computed once per
    solve round; reused by every GN step and CG iteration).

    JᵀWJ couples node a with node b iff they are co-selected in some
    vertex's kNN (k² pairs per vertex) or appear in a regularization
    pair (4 combos per pair). The coupling graph is tiny — measured
    max degree 12 / mean 9 at the 256³ bench's 4096-node graph
    (tools/exp_solver.py postmortem) — so the whole matrix fits an
    (M, D, 8, 8) ELL table and the CG matvec collapses from ~10
    gather/segment ops over the (8, V·k) row layout to ONE (8, M·D)
    gather + ONE batched block einsum (~0.2 ms vs 1.8 ms per
    iteration).

    Returns (reduce_ell, ell_nbr, self_ids, self_present, n_overflow):
      reduce_ell — reducer (64, T) → (64, M·D) summing contributions
          (given in ORIGINAL enumeration order: vertex-major k² data
          pairs, then the 4·P reg combos) into their ELL slots;
      ell_nbr (M·D,) int32 — coupled node id per slot (0 where empty —
          harmless: the block there is exactly zero);
      self_ids (M,) int32 — slot of each node's (m, m) diagonal block
          (clamped in-range; mask with self_present);
      self_present (M,) bool — whether the (m, m) block exists;
      n_overflow — contributions whose node degree exceeded D, excluded
          from the assembly. Overflow UNDER-ASSEMBLES the matvec
          operator (never corrupts it): CG then solves a perturbed
          system, but every step is still accepted/rejected on EXACT
          residual energies, so the failure mode is slower convergence,
          not wrong results. D defaults to 2× the measured bench
          maximum; tests/test_solvers.py asserts coverage.

    Everything is built scatter-free from ONE argsort: segment ids
    node·D + d_slot are monotone in key order (d_slot clamped, dead keys
    sort last), so slot sums are cumsum differences at searchsorted
    boundaries and slot metadata are gathers at segment starts.
    """
    V, k = nbr_idx.shape
    i32 = jnp.int32
    # chunk-major enumeration: one (ka, kb) chunk of V contributions at a
    # time, then the 4 reg combos — matches the transpose-free chunked
    # contribution build in gn_solve_core (a (V,k,k,8,8) layout would
    # need a 75 MB 5-D transpose per GN step)
    a_d = jnp.concatenate(
        [nbr_idx[:, ka] for ka in range(k) for _ in range(k)]
    )
    b_d = jnp.concatenate(
        [nbr_idx[:, kb] for _ in range(k) for kb in range(k)]
    )
    v_d = jnp.tile(corr_mask, k * k)
    a_r = jnp.concatenate([pair_i, pair_i, pair_j, pair_j])
    b_r = jnp.concatenate([pair_i, pair_j, pair_i, pair_j])
    v_r = jnp.tile(pair_mask, 4)
    a = jnp.concatenate([a_d, a_r]).astype(i32)
    b = jnp.concatenate([b_d, b_r]).astype(i32)
    valid = jnp.concatenate([v_d, v_r])
    BIG = jnp.int32(M * M)  # M ≤ 46340 keeps M² in int32
    keys = jnp.where(valid, a * M + b, BIG)
    T = keys.shape[0]

    order = jnp.argsort(keys)
    sk = jnp.take(keys, order, axis=0)
    node = sk // M                                   # = M for dead rows
    prev = jnp.concatenate([jnp.full((1,), -1, i32), sk[:-1]])
    newseg = sk != prev
    seg_id = jnp.cumsum(newseg.astype(i32)) - 1
    first_idx = searchsorted1d(node, jnp.arange(M, dtype=i32), side="left")
    first_seg = jnp.take(seg_id, jnp.minimum(first_idx, T - 1), axis=0)
    d_slot = seg_id - jnp.take(first_seg, jnp.minimum(node, M - 1), axis=0)
    dead = node >= M
    over = (d_slot >= D) & ~dead
    keep = (~(dead | over)).astype(jnp.float32)
    # monotone: d_slot increases within a node (clamping preserves it),
    # node*D dominates across nodes, dead keys sort last
    ids_mono = jnp.where(dead, M * D,
                         node * D + jnp.minimum(d_slot, D - 1))
    slots = jnp.arange(M * D, dtype=i32)
    seg_hi = searchsorted1d(ids_mono, slots, side="right")
    # in a sorted array, left(s) == right(s-1): one search, not two
    seg_lo = jnp.concatenate([jnp.zeros((1,), seg_hi.dtype), seg_hi[:-1]])

    def reduce_ell(x):  # (R, T) original order → (R, M·D)
        xs = jnp.take(x, order, axis=1) * keep[None, :]
        csum = jnp.cumsum(xs, axis=1)
        padded = jnp.concatenate(
            [jnp.zeros(x.shape[:1] + (1,), x.dtype), csum], axis=1
        )
        return jnp.take(padded, seg_hi, axis=1) - jnp.take(
            padded, seg_lo, axis=1
        )

    empty = seg_hi == seg_lo
    ell_nbr = jnp.where(
        empty, 0, jnp.take(sk % M, jnp.minimum(seg_lo, T - 1), axis=0)
    )

    key_self = (jnp.arange(M, dtype=i32) * M) + jnp.arange(M, dtype=i32)
    pos = searchsorted1d(sk, key_self, side="left")
    pos_c = jnp.minimum(pos, T - 1)
    present = (jnp.take(sk, pos_c, axis=0) == key_self) & ~jnp.take(
        over, pos_c, axis=0
    )
    self_ids = jnp.minimum(
        jnp.take(ids_mono, pos_c, axis=0), M * D - 1
    )
    return reduce_ell, ell_nbr, self_ids, present, jnp.sum(over)


class EllDict(NamedTuple):
    """Replicated block-ELL slot dictionary for the SHARDED solver.

    Built OUTSIDE ``shard_map`` from the full (unsharded) coupling graph
    by :func:`make_ell_dict` and passed into the sharded region as
    replicated operands (``P()`` in_specs). This keeps every array
    VMA-invariant inside ``shard_map`` — deriving the dictionary from an
    in-region ``all_gather`` types it as device-varying, which poisons
    the lax.cond freeze carries and forces ``check_vma=False`` (round-4
    ADVICE/VERDICT #7); hoisting it restores the checker AND deletes the
    per-solve all_gather.
    """

    slot_key: jax.Array   # (M·D,) coupling key per slot (BIG = empty)
    ell_nbr: jax.Array    # (M·D,) coupled node id per slot
    self_ids: jax.Array   # (M,) slot of each diagonal block
    present: jax.Array    # (M,) diagonal block exists
    n_overflow: jax.Array  # degree-cap overflow over the GLOBAL graph


def make_ell_dict(nbr_idx, corr_mask, pair_i, pair_j, pair_mask, M: int,
                  D: int) -> EllDict:
    """Slot dictionary from the FULL coupling graph (replicated work —
    the graph is tiny, V·k int32 ≈ 400 KB at bench scale). Same
    construction as ``make_block_ell``; see :class:`EllDict` for why it
    lives outside the sharded region."""
    i32 = jnp.int32
    k = nbr_idx.shape[1]
    a_g = jnp.concatenate(
        [nbr_idx[:, ka] for ka in range(k) for _ in range(k)]
        + [pair_i, pair_i, pair_j, pair_j]
    ).astype(i32)
    b_g = jnp.concatenate(
        [nbr_idx[:, kb] for _ in range(k) for kb in range(k)]
        + [pair_i, pair_j, pair_i, pair_j]
    ).astype(i32)
    valid_g = jnp.concatenate(
        [jnp.tile(corr_mask, k * k), jnp.tile(pair_mask, 4)]
    )
    BIG = jnp.int32(M * M)  # M ≤ 46340 keeps M² in int32
    keys_g = jnp.where(valid_g, a_g * M + b_g, BIG)
    Tg = keys_g.shape[0]

    sk = jnp.sort(keys_g)
    node = sk // M
    prev = jnp.concatenate([jnp.full((1,), -1, i32), sk[:-1]])
    newseg = sk != prev
    seg_id = jnp.cumsum(newseg.astype(i32)) - 1
    first_idx = searchsorted1d(node, jnp.arange(M, dtype=i32), side="left")
    first_seg = jnp.take(seg_id, jnp.minimum(first_idx, Tg - 1), axis=0)
    d_slot = seg_id - jnp.take(first_seg, jnp.minimum(node, M - 1), axis=0)
    dead = node >= M
    over = (d_slot >= D) & ~dead
    ids_mono = jnp.where(dead, M * D,
                         node * D + jnp.minimum(d_slot, D - 1))
    slots = jnp.arange(M * D, dtype=i32)
    seg_hi = searchsorted1d(ids_mono, slots, side="right")
    seg_lo = jnp.concatenate([jnp.zeros((1,), seg_hi.dtype), seg_hi[:-1]])
    empty = seg_hi == seg_lo
    lo_c = jnp.minimum(seg_lo, Tg - 1)
    # the key each slot holds (BIG for empty slots — local dead keys are
    # BIG too, but the reducer zero-scales them, so empty slots stay 0).
    # NOTE overflowed keys clamp into slot D-1's ids_mono range, but the
    # slot's KEY is its segment-start key (the legitimate d_slot = D-1
    # coupling), so overflow keys match no slot_key and drop out — the
    # single-chip `keep` semantics, expressed as key inequality.
    slot_key = jnp.where(empty, BIG, jnp.take(sk, lo_c, axis=0))
    ell_nbr = jnp.where(empty, 0, jnp.take(sk % M, lo_c, axis=0))

    key_self = (jnp.arange(M, dtype=i32) * M) + jnp.arange(M, dtype=i32)
    pos = searchsorted1d(sk, key_self, side="left")
    pos_c = jnp.minimum(pos, Tg - 1)
    present = (jnp.take(sk, pos_c, axis=0) == key_self) & ~jnp.take(
        over, pos_c, axis=0
    )
    self_ids = jnp.minimum(jnp.take(ids_mono, pos_c, axis=0), M * D - 1)
    # overflow is counted on the GLOBAL key multiset — do NOT psum it
    n_overflow = jnp.sum(over).astype(i32)
    return EllDict(slot_key, ell_nbr, self_ids, present, n_overflow)


def make_block_ell_sharded(
    axis_name, ell_dict: EllDict, nbr_idx, corr_mask, pair_i, pair_j,
    pair_mask, M: int,
):
    """Shard-aware block-ELL (round-3 verdict #6): each device reduces
    its LOCAL contributions into the GLOBAL slots of ``ell_dict`` (built
    outside the sharded region, replicated — see :class:`EllDict`) and
    one ``psum`` of the (64, M·D) block table finishes the assembly, so
    every CG iteration keeps the assembled-block matvec the single-chip
    path gets (4.8× cheaper than the row matvec it replaces in
    parallel/sharded.py).

    Same contract as ``make_block_ell`` (drop-in for gn_solve_core's
    ``ell_ctx``), with two sharding-specific differences:
    * ``reduce_ell`` includes the cross-device ``psum`` — its result is
      the GLOBAL block table, replicated;
    * regularization contributions (replicated — every device computes
      all of them) are pre-scaled by 1/n_devices inside the reducer so
      the psum restores them exactly (n_devices is a power of two on
      every real mesh, so the scale round-trips bit-exactly in f32).

    Local keys that were dropped from the dictionary by the degree cap
    simply match no slot (the reducer sums, per slot, the local
    contributions whose key EQUALS the slot's key), so overflow behaves
    exactly like the single-chip path: under-assembly, counted once,
    globally, in ``ell_dict.n_overflow``.
    """
    i32 = jnp.int32
    n_dev = jax.lax.psum(1, axis_name)
    BIG = jnp.int32(M * M)
    slot_key = ell_dict.slot_key
    k = nbr_idx.shape[1]

    # ---- local contribution keys, in gn_solve_core's enumeration order
    # (chunk-major (ka, kb) data chunks over the LOCAL vertex shard, then
    # the 4 replicated reg combos) -------------------------------------
    a_l = jnp.concatenate(
        [nbr_idx[:, ka] for ka in range(k) for _ in range(k)]
        + [pair_i, pair_i, pair_j, pair_j]
    ).astype(i32)
    b_l = jnp.concatenate(
        [nbr_idx[:, kb] for _ in range(k) for kb in range(k)]
        + [pair_i, pair_j, pair_i, pair_j]
    ).astype(i32)
    valid_l = jnp.concatenate(
        [jnp.tile(corr_mask, k * k), jnp.tile(pair_mask, 4)]
    )
    keys_l = jnp.where(valid_l, a_l * M + b_l, BIG)
    nd = nbr_idx.shape[0] * k * k
    scale_l = jnp.where(valid_l, 1.0, 0.0) * jnp.concatenate(
        [
            jnp.ones((nd,), jnp.float32),
            jnp.full((4 * pair_i.shape[0],), 1.0 / n_dev, jnp.float32),
        ]
    )
    order_l = jnp.argsort(keys_l)
    sk_l = jnp.take(keys_l, order_l, axis=0)
    sc_l = jnp.take(scale_l, order_l, axis=0)
    hi_l = searchsorted1d(sk_l, slot_key, side="right")
    lo_l = searchsorted1d(sk_l, slot_key, side="left")

    def reduce_ell(x):  # (R, T_local) local order → (R, M·D) GLOBAL
        xs = jnp.take(x, order_l, axis=1) * sc_l[None, :]
        csum = jnp.cumsum(xs, axis=1)
        padded = jnp.concatenate(
            [jnp.zeros(x.shape[:1] + (1,), x.dtype), csum], axis=1
        )
        part = jnp.take(padded, hi_l, axis=1) - jnp.take(
            padded, lo_l, axis=1
        )
        return jax.lax.psum(part, axis_name)

    return (reduce_ell, ell_dict.ell_nbr, ell_dict.self_ids,
            ell_dict.present, ell_dict.n_overflow)


ELL_DEGREE_CAP = 24  # 2× the measured bench max coupling degree (12)


class SolverCtx(NamedTuple):
    """Frame-constant solver plumbing (round-5 restructure, VERDICT r4 #1).

    Everything here depends only on the SPARSITY of the problem — the
    per-vertex kNN table, the reg pair lists, and the mesh valid mask —
    which is fixed for a whole frame while the reference's relaxation
    loop re-solves 3× with refreshed correspondences and a relaxed reg
    weight (core/fusion.py:405-412). Building it once per frame and
    passing it to every ``gn_solve_core`` round removes the per-round
    argsorts (slot dictionary over ~260k coupling keys, 19.9 ms measured
    on v5e, + three sorted reducers) that round 4 paid 3× per frame.

    The slot dictionary is built with the mesh VALID mask as the data-
    coupling validity (a superset of any round's correspondence mask):
    contributions from vertices without a valid correspondence that round
    carry exactly-zero Jacobians, so they add 0 to their slots and the
    assembled table is identical to one built from the round's own mask —
    only the degree-cap overflow accounting can differ (conservatively).

    ``ell`` is the ``make_block_ell`` 5-tuple (reduce_ell, ell_nbr,
    self_ids, self_present, n_overflow); n_overflow is the LOCAL raw
    count (the consumer psums it). A presorted-operand-panel variant of
    the assembly (two (8, T_d) gathers + lazily fused outer rows) was
    measured SLOWER than this single (64, T) gather reduce on v5e
    (7.7 vs 6.1 ms — the split reduces pay 2× the boundary gathers and
    lose the one-pass cumsum), so the chunk-major reducer stays.
    """

    red_nbr: Callable        # (R, V·k) → (R, M) data-term segment sum
    red_pi: Callable         # (R, P) → (R, M) reg i-side reduction
    take_pi: Callable        # (R, M) → (R, P) reg i-side gather
    red_pj: Callable         # (R, P) → (R, M) reg j-side reduction
    ell: tuple | None        # make_block_ell output (None: with_ell=False)


def make_solver_ctx(
    nbr_idx, valid_mask, pair_i, pair_j, pair_mask, M: int,
    D: int = ELL_DEGREE_CAP, dense_pairs: bool = True,
    with_ell: bool = True,
):
    """Build the frame-constant :class:`SolverCtx` (see its docstring).

    ``valid_mask`` is the per-vertex validity used for the slot
    dictionary — pass the mesh valid mask when the ctx is shared across
    relaxation rounds (it must be a superset of every round's
    correspondence mask), or the round's correspondence mask for a
    single solve.
    """
    V, k = nbr_idx.shape
    P = pair_i.shape[0]

    red_nbr = make_sorted_reducer(nbr_idx.reshape(-1), M)
    if dense_pairs:
        kp = P // M
        red_pi = lambda x: jnp.sum(x.reshape(x.shape[0], M, kp), axis=2)
        take_pi = lambda p8: jnp.broadcast_to(
            p8[:, :, None], (p8.shape[0], M, kp)
        ).reshape(p8.shape[0], M * kp)
    else:
        red_pi = make_sorted_reducer(pair_i, M)
        take_pi = lambda p8: jnp.take(p8, pair_i, axis=1)
    red_pj = make_sorted_reducer(pair_j, M)

    ell = None
    if with_ell:
        ell = make_block_ell(
            nbr_idx, valid_mask, pair_i, pair_j, pair_mask, M, D
        )
    return SolverCtx(red_nbr, red_pi, take_pi, red_pj, ell)


def gn_solve_core(
    node_dq,
    data_args,
    reg_args,
    lw_dq,
    gn_iters: int,
    cg_iters: int,
    damping: float,
    ftol: float,
    psum,
    cg_rtol: float = 0.0,
    dense_pairs: bool = False,
    use_ell: bool = True,
    freeze_frac: float = 0.25,
    flat_factor: float = 100.0,
    damping_init=None,
    ell_ctx=None,
    solver_ctx: SolverCtx | None = None,
):
    """Damped GN outer loop; block JᵀWJ matvec + Jacobi-PCG inner solve.

    ``psum`` is applied to every data-term reduction (identity single-chip;
    ``lax.psum`` over the vertex-sharded mesh axis in parallel/sharded.py —
    the reg term and all CG state are replicated there).

    CG terminates early (inexact-Newton forcing, Eisenstat-Walker style)
    once the residual norm drops below η·‖rhs‖ with η =
    cg_rtol·(e/cost0): loose steps far from the optimum (where CG
    accuracy is wasted), asymptotically exact ones near it (the GT
    recovery regime). The GN energy-acceptance guard keeps the outer
    iteration monotone regardless. ``dense_pairs``: promise that
    pair_i == repeat(arange(M), k) (what make_reg_pairs always builds), so
    pair-term gathers/reductions become reshapes.

    ``use_ell``: assemble JᵀWJ into an (M, D, 8, 8) block-ELL table (see
    make_block_ell) so each CG matvec is one gather + one block einsum
    instead of ~10 gather/segment ops over the (8, V·k) rows — 1.8 →
    ~0.2 ms per iteration at bench scale. Under shard_map, pass
    ``ell_ctx`` from ``make_block_ell_sharded``: its slot dictionary is
    built from the all-gathered (replicated) coupling graph so the block
    tables psum across devices; without it the slot mapping is built
    from the local vertex shard and is single-chip only.

    ``ell_ctx``: optional prebuilt (reduce_ell, ell_nbr, self_ids,
    self_present, ell_overflow) — ``reduce_ell`` must produce the GLOBAL
    block table (the sharded builder folds the psum in) and
    ``ell_overflow`` must already be globally reduced.

    ``solver_ctx``: optional frame-constant :class:`SolverCtx` shared by
    several solve rounds (pipeline/frame.py builds one per frame); when
    omitted, an equivalent per-call ctx is built from the round's own
    sparsity. Mutually exclusive with ``ell_ctx``'s ELL part (``ell_ctx``
    wins for the block table; the ctx still supplies the rhs reducers).

    ``freeze_frac`` (ELL path only): the assembly reduce is the single
    most expensive per-GN-step operation (7.5 of ~12.7 ms at bench scale,
    docs/tpu_kernel_notes.md) while the GN matrix changes slowly near
    convergence — so the assembled blocks are FROZEN across GN steps and
    rebuilt only once the energy has dropped by more than ``freeze_frac``
    (relative) since the last assembly. Frozen steps still compute fresh
    residuals, Jacobians, and the exact gradient (all cheap), so the step
    is a chord/quasi-Newton step on the exact rhs; every step remains
    accepted/rejected on EXACT residual energies, and a step that makes
    no progress on stale blocks forces a rebuild-and-retry instead of
    terminating the round (stale curvature can never end a round early).
    ``freeze_frac=0`` rebuilds every step (round-3 behavior).

    ``flat_factor``: a rejected LM try whose energy is within
    ``flat_factor·ftol`` (relative) of the current energy is treated as
    converged-flat and ends the retry loop (see module docstring).
    100·ftol is the measured bench optimum; expose it so accuracy gates
    can sweep it (ADVICE r3).

    ``damping_init``: optional traced initial LM damping (warm start from
    the previous solve round's final damping — the reference's relaxation
    rounds re-solve the same basin, so re-deriving the trust region from
    1e-4 each round wastes retries). Defaults to ``damping``. The
    ``damping`` constant stays the floor an accepted step relaxes toward.

    Returns (node_dq, cost0_raw, cost0, cost1, dmp_out, ell_overflow) —
    cost0/cost1 huberized, cost0_raw the raw 0.5·Σr² the reference prints
    before optimizing, dmp_out the final LM damping (feed to the next
    round's damping_init), ell_overflow the number of JᵀWJ contributions
    dropped by the ELL degree cap (0 when use_ell=False). Nonzero
    overflow under-assembles the CG operator — results stay correct
    (exact-energy acceptance) but convergence may stall; drivers should
    warn (ADVICE r3).
    """
    verts, normals, corrs, corr_mask, nbr_idx, blend_wts = data_args
    pair_i, pair_j, pair_v, pair_scale, pair_mask = reg_args
    M = node_dq.shape[0]
    kp = pair_i.shape[0] // M  # pairs per node when dense

    def one_data(dqs_k, vert, normal, corr, wts_k, lw):
        f = lambda d: data_residual_one(d, vert, normal, corr, wts_k, lw)
        return f(dqs_k), jax.jacfwd(f)(dqs_k)

    def one_reg(di, dj, v, s):
        r = reg_residual_one(di, dj, v, s)
        Ji = jax.jacfwd(reg_residual_one, argnums=0)(di, dj, v, s)
        Jj = jax.jacfwd(reg_residual_one, argnums=1)(di, dj, v, s)
        return r, Ji, Jj

    r_d0, r_r0 = _residuals(node_dq, data_args, reg_args, lw_dq)
    cost0_raw, cost0 = _energies(r_d0, r_r0, psum)

    nbr_flat0 = nbr_idx.reshape(-1)
    V, k = nbr_idx.shape
    N = V * k
    if solver_ctx is None:
        # per-call ctx (standalone solves); pipeline/frame.py passes one
        # frame-constant ctx shared by all relaxation rounds instead
        solver_ctx = make_solver_ctx(
            nbr_idx, corr_mask, pair_i, pair_j, pair_mask, M,
            dense_pairs=dense_pairs,
            with_ell=use_ell and ell_ctx is None,
        )
    red_nbr = solver_ctx.red_nbr
    red_pi = solver_ctx.red_pi
    take_pi = solver_ctx.take_pi
    red_pj = solver_ctx.red_pj
    ell_overflow = jnp.int32(0)
    if use_ell:
        if ell_ctx is not None:
            # prebuilt GLOBAL ctx (the sharded builder): reduce_ell
            # psums internally, overflow already globally reduced
            reduce_ell, ell_nbr, self_ids, self_present, ell_overflow = (
                ell_ctx
            )
        else:
            reduce_ell, ell_nbr, self_ids, self_present, n_over = (
                solver_ctx.ell
            )
            ell_overflow = psum(n_over).astype(jnp.int32)
        DC = ell_nbr.shape[0] // M

    # All per-CG-iteration arrays live in channel-major (D, N) layout —
    # (N, k, 8) shapes would pad their minor dims to the (8,128) tile and
    # multiply HBM traffic ~40x across the CG iterations.
    def run_step(args):
        x, e, dmp, Bl_c, blk_c, e_asm = args
        dqs_v = jnp.take(x, nbr_idx, axis=0)
        r_d, J_d = jax.vmap(one_data, in_axes=(0, 0, 0, 0, 0, None))(
            dqs_v, verts, normals, corrs, blend_wts, lw_dq
        )
        r_d = jnp.where(corr_mask, r_d, 0.0)
        J_d = jnp.where(corr_mask[:, None, None], J_d, 0.0)
        w_d = huber_irls_weight(r_d) * corr_mask  # (V,)
        Jd8 = J_d.transpose(2, 0, 1).reshape(8, N)  # (8, V·k)

        r_r, J_ri, J_rj = jax.vmap(one_reg)(
            jnp.take(x, pair_i, axis=0),
            jnp.take(x, pair_j, axis=0),
            pair_v,
            pair_scale,
        )
        r_r = jnp.where(pair_mask[:, None], r_r, 0.0)
        J_ri = jnp.where(pair_mask[:, None, None], J_ri, 0.0)
        J_rj = jnp.where(pair_mask[:, None, None], J_rj, 0.0)
        w_r3 = (huber_irls_weight(r_r) * pair_mask[:, None]).T  # (3, P)
        r_r3 = r_r.T                                             # (3, P)
        Ji24 = J_ri.transpose(1, 2, 0).reshape(24, -1)  # rows = c·8+e
        Jj24 = J_rj.transpose(1, 2, 0).reshape(24, -1)

        def reg_fold(J24, s3):
            """Σ_c J[(c,e), p] · s3[c, p] → (8, P)."""
            return sum(
                J24[c * 8 : (c + 1) * 8] * s3[c][None, :] for c in range(3)
            )

        def rep(v):  # (V,) → (N,) repeating each vertex value k times
            return jnp.broadcast_to(v[:, None], (V, k)).reshape(N)

        # rhs = -JᵀW r, channel-major (8, M)
        g_d = psum(red_nbr(Jd8 * rep(w_d * r_d)[None, :]))
        g_r = red_pi(reg_fold(Ji24, w_r3 * r_r3)) + red_pj(
            reg_fold(Jj24, w_r3 * r_r3)
        )
        rhs = -(g_d + g_r)

        # Block-Jacobi preconditioner: the exact per-node 8×8 diagonal
        # block of JᵀWJ (data + both reg slots), inverted once per GN
        # round. Far stronger than the scalar diagonal — CG needs ~half
        # the iterations for the same residual.
        if use_ell:
            # Assemble the FULL block-sparse normal matrix: contribution
            # rows (64, T) in the make_block_ell enumeration order
            # (chunk-major: one (ka, kb) data chunk of V rows at a time,
            # then the 4·P reg combos), summed into ELL slots. Chunked
            # channel-major construction — a (V, k, k, 8, 8) layout would
            # pay a 75 MB 5-D transpose. The diagonal blocks fall out as
            # the (m, m) slots. Under freeze_frac > 0 this runs only when
            # the energy has dropped freeze_frac since the last assembly
            # (see the docstring) — the carried stale blocks are reused
            # otherwise.
            def reg_outer(Jx24, Jy24):
                return sum(
                    (
                        (w_r3[c] * Jx24[c * 8 : (c + 1) * 8])[:, None, :]
                        * Jy24[c * 8 : (c + 1) * 8][None, :, :]
                    )
                    for c in range(3)
                ).reshape(64, -1)

            def assemble(_):
                Jw = (J_d * w_d[:, None, None]).transpose(1, 2, 0)
                JdT = J_d.transpose(1, 2, 0)                # (k,8,V)
                data_chunks = [
                    (Jw[ka][:, None, :] * JdT[kb][None, :, :]).reshape(
                        64, V
                    )
                    for ka in range(k)
                    for kb in range(k)
                ]
                contrib = jnp.concatenate(
                    data_chunks
                    + [
                        reg_outer(Ji24, Ji24),
                        reg_outer(Ji24, Jj24),
                        reg_outer(Jj24, Ji24),
                        reg_outer(Jj24, Jj24),
                    ],
                    axis=1,
                )
                blocks64 = reduce_ell(contrib)              # (64, M·DC)
                Bl_n = blocks64.T.reshape(M, DC, 8, 8)
                blk_n = jnp.take(blocks64, self_ids, axis=1) * (
                    self_present.astype(jnp.float32)[None, :]
                )
                return Bl_n, blk_n

            if freeze_frac > 0.0:
                # INVARIANT (sharded path): this predicate must remain
                # REPLICATED across devices — `e` and `e_asm` derive from
                # psum'd energies, so every device takes the same branch.
                # That is what makes the cond deadlock-free: assemble()
                # calls reduce_ell, which under a make_block_ell_sharded
                # ctx performs a lax.psum; a per-device predicate would
                # have some devices enter the collective and others not
                # (hang/corruption). Keep any future predicate a function
                # of psum'd (replicated) values only. (ADVICE r4)
                fresh = e < (1.0 - freeze_frac) * e_asm
                Bl, blk, e_asm = jax.lax.cond(
                    fresh,
                    lambda _: assemble(None) + (e,),
                    lambda _: (Bl_c, blk_c, e_asm),
                    None,
                )
            else:
                Bl, blk = assemble(None)
                e_asm = e
                fresh = jnp.bool_(True)
        else:
            def outer64(J8, w_row):
                # (8,N),(N,) → (64,N): rows (a·8+b) = J[a]·J[b]·w
                return jnp.concatenate(
                    [J8[a : a + 1] * J8 * w_row[None, :] for a in range(8)],
                    axis=0,
                )

            blk = psum(red_nbr(outer64(Jd8, rep(w_d))))  # (64, M)
            for c in range(3):
                blk = blk + red_pi(
                    outer64(Ji24[c * 8 : (c + 1) * 8], w_r3[c])
                ) + red_pj(outer64(Jj24[c * 8 : (c + 1) * 8], w_r3[c]))
            Bl = Bl_c  # dummy carry (row matvec rebuilds from Jd8 fresh)
            e_asm = e
            fresh = jnp.bool_(True)
        diag = blk.reshape(8, 8, M)[
            jnp.arange(8), jnp.arange(8), :
        ]  # (8, M) true diagonal (for damping scale)
        diag_mean = jnp.sum(diag) / (8.0 * M) + 1e-12
        blkT = blk.T.reshape(M, 8, 8)

        def cg_solve(lam):
            """PCG solve of (JᵀWJ + λI)·δ = rhs with the per-node 8×8
            block preconditioner at THIS λ — Jacobians/normal blocks are
            closed over, so an LM retry re-runs only this."""
            D = blkT + lam * jnp.eye(8)[None, :, :]
            Dinv = _inv8_spd(D)  # (M, 8, 8)

            def precond(r8):  # (8, M) → (8, M)
                return jnp.einsum(
                    "mab,bm->am", Dinv, r8,
                    precision=jax.lax.Precision.HIGHEST,
                )

            if use_ell:
                def matvec(p8):  # (8, M) → (8, M): one gather + one
                    # batched block contraction over the assembled ELL
                    pg = jnp.take(p8, ell_nbr, axis=1).reshape(8, M, DC)
                    out = jnp.einsum(
                        "mdab,bmd->am", Bl, pg,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    return out + lam * p8
            else:
                def matvec(p8):  # (8, M) → (8, M)
                    pg = jnp.take(p8, nbr_flat0, axis=1)          # (8, N)
                    prod = jnp.sum(Jd8 * pg, axis=0)              # (N,)
                    Jp_d = jnp.sum(prod.reshape(V, k), axis=1)    # (V,)
                    back_d = psum(red_nbr(Jd8 * rep(w_d * Jp_d)[None, :]))

                    pgi = take_pi(p8)                             # (8, P)
                    pgj = jnp.take(p8, pair_j, axis=1)
                    Jp_r3 = jnp.stack(
                        [
                            jnp.sum(Ji24[c * 8 : (c + 1) * 8] * pgi, axis=0)
                            + jnp.sum(Jj24[c * 8 : (c + 1) * 8] * pgj, axis=0)
                            for c in range(3)
                        ],
                        axis=0,
                    )  # (3, P)
                    s3 = w_r3 * Jp_r3
                    back_r = red_pi(reg_fold(Ji24, s3)) + red_pj(
                        reg_fold(Jj24, s3)
                    )
                    return back_d + back_r + lam * p8

            # Jacobi-PCG in (8, M) layout; stops at cg_iters or once
            # ‖r‖ ≤ cg_rtol·‖rhs‖ (everything in the state is replicated
            # under shard_map, so the loop count matches across devices)
            def cg_body(state):
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
            state = (jnp.zeros_like(rhs), rhs, z0, z0, jnp.sum(rhs * z0),
                     jnp.int32(0))
            if cg_rtol > 0.0:
                # inexact-Newton forcing: measured a net LOSS at bench
                # scale (saved CG iterations < extra full GN retries it
                # triggers), so this is off by default.
                eta = cg_rtol * (e / jnp.maximum(cost0, 1e-30))
                tol2 = (eta * eta) * jnp.sum(rhs * rhs)

                def cg_cond(st):
                    _, rvec, _, _, _, it = st
                    return (it < cg_iters) & (jnp.sum(rvec * rvec) > tol2)

                return jax.lax.while_loop(cg_cond, cg_body, state)[0]
            return jax.lax.fori_loop(
                0, cg_iters, lambda i, st: cg_body(st), state
            )[0]

        def try_step(dmp_):
            delta8 = cg_solve(dmp_ * diag_mean)
            x_new = x + delta8.T
            r_d1, r_r1 = _residuals(x_new, data_args, reg_args, lw_dq)
            _, e_new = _energies(r_d1, r_r1, psum)
            return x_new, e_new

        # LM trust loop: accept the step if the energy decreases,
        # otherwise retry with 10× damping (Jacobians reused — see
        # cg_solve). `accepted` replicates under shard_map because e/e_new
        # are psum'd. A FLAT rejection (e_new barely above e — the solver
        # is at the optimum, not overshooting) exits instead of retrying:
        # see the module docstring's cost note.
        def lm_body(st):
            dmp_, x_b, e_b, _, _, tries = st
            x_new, e_new = try_step(dmp_)
            ok = e_new <= e
            x_b = jnp.where(ok, x_new, x_b)
            e_b = jnp.where(ok, e_new, e_b)
            dmp_next = jnp.where(
                ok, jnp.maximum(dmp_ / 3.0, damping), dmp_ * 10.0
            )
            return dmp_next, x_b, e_b, ok, e_new, tries + 1

        def lm_cond(st):
            _, _, _, accepted, e_last, tries = st
            flat = (e_last - e) <= (flat_factor * ftol) * e
            return (~accepted) & (~flat) & (tries < MAX_LM_RETRIES)

        st = (dmp, x, e, jnp.bool_(False), jnp.float32(jnp.inf),
              jnp.int32(0))
        dmp_out, x_b, e_b, _, _, _ = jax.lax.while_loop(
            lm_cond, lm_body, st
        )
        return x_b, e_b, dmp_out, Bl, blk, e_asm, fresh

    def gn_step(carry, _):
        x, e, act, dmp, Bl_c, blk_c, e_asm = carry
        # `act` must remain REPLICATED under shard_map (it derives from
        # psum'd energies via the ftol test below): run_step may execute
        # a collective (reduce_ell's psum in the sharded ctx, and the
        # psum'd rhs/energy reductions), so a per-device predicate would
        # deadlock. See the matching invariant note at the freeze cond.
        x2, e2, dmp2, Bl2, blk2, e_asm2, fresh = jax.lax.cond(
            act,
            run_step,
            lambda a: (a[0], a[1], a[2], a[3], a[4], a[5],
                       jnp.bool_(True)),
            (x, e, dmp, Bl_c, blk_c, e_asm),
        )
        # scipy-style ftol termination: stop (skip remaining iterations)
        # once the relative cost reduction falls below ftol — a step all
        # of whose LM retries were rejected (e2 == e) terminates too.
        # EXCEPT when the failed step ran on frozen (stale) normal
        # blocks: stale curvature is not evidence of convergence, so
        # force a rebuild (e_asm := ∞) and keep the round active for one
        # fresh-block attempt; the damping blown up by the stale retries
        # is reset too.
        reduced = (e - e2) > ftol * e
        stale_fail = act & ~reduced & ~fresh
        act = act & (reduced | stale_fail)
        e_asm2 = jnp.where(stale_fail, jnp.float32(jnp.inf), e_asm2)
        dmp2 = jnp.where(stale_fail, dmp, dmp2)
        return (x2, e2, act, dmp2, Bl2, blk2, e_asm2), None

    if use_ell:
        Bl0 = jnp.zeros((M, DC, 8, 8), jnp.float32)
    else:
        Bl0 = jnp.zeros((1,), jnp.float32)
    blk0 = jnp.zeros((64, M), jnp.float32)
    dmp0 = (
        jnp.asarray(damping, jnp.float32)
        if damping_init is None
        else jnp.asarray(damping_init, jnp.float32)
    )
    (x, cost1, _, dmp_out, _, _, _), _ = jax.lax.scan(
        gn_step,
        (node_dq, cost0, jnp.bool_(True), dmp0, Bl0, blk0,
         jnp.float32(jnp.inf)),
        None,
        length=gn_iters,
    )
    return x, cost0_raw, cost0, cost1, dmp_out, ell_overflow


@partial(
    jax.jit,
    static_argnames=(
        "gn_iters", "cg_iters", "damping", "ftol", "cg_rtol", "dense_pairs",
        "use_ell", "freeze_frac", "flat_factor",
    ),
)
def solve_nonrigid(
    node_dq,
    verts,
    normals,
    corrs,
    corr_mask,
    nbr_idx,
    blend_wts,
    pair_i,
    pair_j,
    pair_v,
    pair_scale,
    pair_mask,
    lw_dq,
    gn_iters: int = 8,
    cg_iters: int = 32,
    damping: float = 1e-4,
    ftol: float = 1e-5,  # the reference's scipy ftol (core/fusion.py:391)
    cg_rtol: float = 0.0,
    dense_pairs: bool = False,
    use_ell: bool = True,
    freeze_frac: float = 0.25,
    flat_factor: float = 100.0,
    damping_init=None,
):
    """Single-chip non-rigid GN solve.

    Returns (node_dq, cost0_raw, cost0, cost1, dmp_out, ell_overflow):
    the raw and huberized initial costs, the final huberized cost, the
    final LM damping (for warm-starting the next relaxation round), and
    the block-ELL degree-cap overflow count (see gn_solve_core).
    """
    data_args = (verts, normals, corrs, corr_mask, nbr_idx, blend_wts)
    reg_args = (pair_i, pair_j, pair_v, pair_scale, pair_mask)
    return gn_solve_core(
        node_dq, data_args, reg_args, lw_dq,
        gn_iters, cg_iters, damping, ftol, lambda x: x,
        cg_rtol=cg_rtol, dense_pairs=dense_pairs, use_ell=use_ell,
        freeze_frac=freeze_frac, flat_factor=flat_factor,
        damping_init=damping_init,
    )


def make_reg_pairs(node_vert_idx, nbr_idx, node_w, active, rw):
    """Regularization pair lists from the per-vertex kNN table.

    Reference computef regularization (core/fusion.py:475-484): for node i,
    neighbors = neighbor_look_up[node i's anchor vertex]; scale =
    rw·max(w_i, w_j). Returns (pair_i, pair_j, pair_scale, pair_mask)
    with P = M·k rows; pair_v (node j's position) is NOT returned — the
    caller gathers it (``jnp.take(node_pos, pair_j, axis=0)``, see
    pipeline/frame.py) because node positions may be fresher than this
    table.
    """
    M, k = active.shape[0], nbr_idx.shape[1]
    nbrs = jnp.take(nbr_idx, node_vert_idx, axis=0)  # (M, k)
    pair_i = jnp.repeat(jnp.arange(M, dtype=jnp.int32), k)
    pair_j = nbrs.reshape(-1)
    wi = jnp.take(node_w, pair_i, axis=0)
    wj = jnp.take(node_w, pair_j, axis=0)
    pair_scale = rw * jnp.maximum(wi, wj)
    pair_mask = jnp.take(active, pair_i, axis=0) & jnp.take(
        active, pair_j, axis=0
    )
    return pair_i, pair_j, pair_scale, pair_mask
