"""Warp-field checkpointing, format-compatible with the reference.

The reference pickles ``self._nodes`` — a list of 4-tuples
(anchor_vertex_idx, position (3,) ndarray, dq (8,) ndarray, weight) —
after every graph update (core/fusion.py:571-573). We serialize the
fixed-capacity WarpField pool to the identical structure (active nodes
only) so checkpoints interoperate, and can load either format back.
"""

from __future__ import annotations

import os
import pickle

import jax.numpy as jnp
import numpy as np


def save_warp_field(wf, path, filename, itercounter):
    nodes = []
    n = int(np.asarray(wf.num_active))
    pos = np.asarray(wf.node_pos)
    dq = np.asarray(wf.node_dq)
    w = np.asarray(wf.node_w)
    vidx = np.asarray(wf.node_vert_idx)
    for i in range(n):
        nodes.append((int(vidx[i]), pos[i].copy(), dq[i].copy(), float(w[i])))
    fpath = os.path.join(path, filename + "__" + str(itercounter) + ".p")
    with open(fpath, "wb") as f:
        pickle.dump(nodes, f)
    return fpath


def load_warp_field_nodes(path):
    """Returns (positions (N,3), dqs (N,8), weights (N,), vert_idx (N,))."""
    with open(path, "rb") as f:
        nodes = pickle.load(f)
    vidx = np.array([n[0] for n in nodes], dtype=np.int32)
    pos = np.array([n[1] for n in nodes], dtype=np.float32)
    dq = np.array([n[2] for n in nodes], dtype=np.float32)
    w = np.array([n[3] for n in nodes], dtype=np.float32)
    return pos, dq, w, vidx


def restore_warp_field(wf_cls, path, capacity):
    """Rebuild a WarpField pool from a checkpoint (resume path — the
    reference never implemented one, SURVEY §5.4)."""
    pos, dq, w, vidx = load_warp_field_nodes(path)
    n = len(pos)
    if n > capacity:
        raise ValueError(f"checkpoint has {n} nodes > capacity {capacity}")
    pad = capacity - n
    return wf_cls(
        node_pos=jnp.array(np.pad(pos, ((0, pad), (0, 0)))),
        node_dq=jnp.array(
            np.pad(dq, ((0, pad), (0, 0)), constant_values=0.0)
        ).at[n:, 0].set(1.0),
        node_w=jnp.array(np.pad(w, (0, pad))),
        node_vert_idx=jnp.array(np.pad(vidx, (0, pad))),
        active=jnp.arange(capacity) < n,
        radius=jnp.float32(w[0] / 2.0 if n else 1.0),
    )
