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

import jax
import jax.numpy as jnp


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
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    r2 = radius * radius

    def body(i, carry):
        removed, out_idx, count = carry
        alive = valid[i] & (~removed[i]) & (count < capacity)
        d2 = jnp.sum((points - points[i]) ** 2, axis=-1)
        removed = removed | (alive & (d2 < r2))
        slot = jnp.minimum(count, capacity - 1)
        out_idx = out_idx.at[slot].set(
            jnp.where(alive, i, out_idx[slot]).astype(jnp.int32)
        )
        return removed, out_idx, count + alive.astype(jnp.int32)

    removed0 = jnp.zeros((n,), dtype=bool)
    out0 = jnp.zeros((capacity,), dtype=jnp.int32)
    _, out_idx, count = jax.lax.fori_loop(0, n, body, (removed0, out0, jnp.int32(0)))
    return out_idx, count


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
