"""Vectorized binary search (searchsorted) tuned for TPU.

``jnp.searchsorted``'s default lowering costs ~100ms for 131k queries over
a 50M-element cumsum on TPU; this explicit statically-unrolled bisection
(⌈log2 N⌉ gather+select rounds) runs in well under a millisecond for the
same shapes. Used by the marching-cubes compaction and the solver's
sorted-segment reducers.
"""

from __future__ import annotations

import jax.numpy as jnp


def searchsorted1d(sorted_arr, queries, side: str = "left"):
    """First index i where inserting ``queries`` keeps order.

    side='left': smallest i with sorted_arr[i] >= q;
    side='right': smallest i with sorted_arr[i] > q.
    Returns int32 indices in [0, N].
    """
    n = sorted_arr.shape[0]
    steps = max(1, (n).bit_length())
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) // 2
        v = jnp.take(sorted_arr, jnp.minimum(mid, n - 1), axis=0)
        if side == "left":
            go_left = v >= queries
        else:
            go_left = v > queries
        hi = jnp.where(go_left, mid, hi)
        lo = jnp.where(go_left, lo, mid + 1)
    return hi
