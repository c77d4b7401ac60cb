"""Point subsampling: greedy radius subsample and furthest-point sampling.

Reference semantics:
* ``uniform_sample`` (core/util.py:27-47): greedy first-fit in index order —
  take the first remaining candidate, drop every candidate within ``radius``
  of it, repeat. Order-dependent by design; we reproduce that exact order.
* ``furthest_point_sample`` (core/meshutil.py:72-90).

TPU design: fixed-capacity outputs + counts (static shapes). The greedy
pass is a ``lax.fori_loop`` whose body is fully vectorized over all points,
so the O(N²) work runs on the VPU; it executes rarely (graph construction /
node insertion only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .search import searchsorted1d


@partial(jax.jit, static_argnames=("capacity",))
def radius_subsample(
    points: jax.Array,
    radius: jax.Array,
    capacity: int,
    valid: jax.Array | None = None,
):
    """Greedy radius-based subsample with fixed output capacity.

    points: (N,3); valid: optional (N,) bool (invalid points are never
    selected and never suppress others). Returns (indices (capacity,) int32,
    count int32). Slots >= count hold index 0 and must be masked by callers.

    TPU algorithm: greedy first-fit is inherently index-sequential, but its
    *fixpoint* form parallelizes — "committed rounds": a point commits once
    every earlier conflicting point is committed; it commits SELECTED iff no
    earlier committed-selected point conflicts. Each round is a blocked
    (chunk,N)·(N,2) distance-mask matmul on the MXU; the round count equals
    the dependency-chain depth (tens, not N). Exactly equivalent to the
    reference's sequential loop (core/util.py:27-47) — verified against the
    NumPy oracle in tests.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    r2 = (radius * radius).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    chunk = max(128, min(2048, (1 << 26) // max(n, 1)))
    pad = (-n) % chunk
    npad = n + pad
    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    gidx = jnp.arange(npad, dtype=jnp.int32)
    nchunks = npad // chunk
    pp = jnp.sum(pts * pts, axis=-1)

    def round_fn(state):
        committed, selected, rounds = state
        rhs = jnp.stack(
            [selected.astype(jnp.float32),
             (~committed).astype(jnp.float32)], axis=1
        )  # (npad, 2)

        def chunk_fn(c):
            q = jax.lax.dynamic_slice_in_dim(pts, c * chunk, chunk, 0)
            qq = jnp.sum(q * q, axis=-1, keepdims=True)
            cross = jnp.dot(q, pts.T, preferred_element_type=jnp.float32,
                            precision=hi)
            d2 = qq - 2.0 * cross + pp[None, :]
            lower = gidx[None, :] < (c * chunk + jnp.arange(chunk))[:, None]
            A = ((d2 < r2) & lower).astype(jnp.float32)
            return jnp.dot(A, rhs, preferred_element_type=jnp.float32,
                           precision=hi)

        out = jax.lax.map(chunk_fn, jnp.arange(nchunks)).reshape(npad, 2)
        conflict = out[:, 0] > 0.5
        blocked = out[:, 1] > 0.5
        new_sel = (~committed) & (~conflict) & (~blocked)
        new_rej = (~committed) & conflict
        selected = selected | new_sel
        committed = committed | new_sel | new_rej
        return committed, selected, rounds + 1

    committed0 = jnp.pad(~valid, (0, pad), constant_values=True)
    selected0 = jnp.zeros((npad,), dtype=bool)

    def cond_fn(state):
        committed, _, rounds = state
        return (~jnp.all(committed)) & (rounds < n)

    _, selected, _ = jax.lax.while_loop(
        cond_fn, round_fn, (committed0, selected0, jnp.int32(0))
    )
    selected = selected[:n]

    csum = jnp.cumsum(selected.astype(jnp.int32))
    count = jnp.minimum(csum[-1], capacity)
    slots = jnp.arange(capacity, dtype=jnp.int32)
    out_idx = searchsorted1d(csum, slots + 1, side="left")
    out_idx = jnp.where(slots < count, jnp.minimum(out_idx, n - 1), 0)
    return out_idx, count


@partial(jax.jit, static_argnames=("n_samples", "start_idx"))
def furthest_point_sample(points: jax.Array, n_samples: int, start_idx: int = 0):
    """Deterministic FPS: iteratively pick the point furthest from the set.

    Reference core/meshutil.py:72-90 seeds from random choices; we use a
    deterministic start (callers can pass a PRNG-chosen start) and the same
    min-distance update rule. Returns (indices (n_samples,), assignment (N,)).
    """
    n = points.shape[0]

    def body(i, carry):
        idxs, d2, assign = carry
        c = points[idxs[i]]
        nd2 = jnp.sum((points - c) ** 2, axis=-1)
        upd = nd2 < d2
        d2 = jnp.where(upd, nd2, d2)
        assign = jnp.where(upd, i, assign)
        nxt = jnp.argmax(d2).astype(jnp.int32)
        idxs = idxs.at[jnp.minimum(i + 1, n_samples - 1)].set(
            jnp.where(i + 1 < n_samples, nxt, idxs[n_samples - 1])
        )
        return idxs, d2, assign

    idxs0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start_idx)
    d20 = jnp.full((n,), 1e10, dtype=points.dtype)
    assign0 = jnp.zeros((n,), jnp.int32)
    idxs, _, assign = jax.lax.fori_loop(0, n_samples, body, (idxs0, d20, assign0))
    return idxs, assign
