"""Full pipeline checkpoint / resume.

The reference only pickled the node list per frame and np.save'd one TSDF
snapshot, with an explicitly empty resume stub (core/fusion.py:571-573,
589-590; core/fusion_dm.py:174-176; SURVEY §5.4). Here the COMPLETE
per-frame state — canonical TSDF values/weights/IND, the warp-field pool,
the global pose, and the frame counter — round-trips through a single
compressed npz, and the legacy pickle warp-field format stays available
via io/warpfield_io.py for interop.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..models.tsdf_volume import TsdfVolume
from ..models.warp_field import WarpField

FORMAT_VERSION = 1


def save_checkpoint(path, volume: TsdfVolume, wf: WarpField, lw_dq,
                    itercounter: int = 0, extra: dict | None = None):
    """Write the full fusion state to ``path`` (npz, compressed)."""
    data = {
        "format_version": FORMAT_VERSION,
        "tsdf_values": np.asarray(volume.values),
        "tsdf_weights": np.asarray(volume.weights),
        "ind": np.asarray(volume.ind),
        "node_pos": np.asarray(wf.node_pos),
        "node_dq": np.asarray(wf.node_dq),
        "node_w": np.asarray(wf.node_w),
        "node_vert_idx": np.asarray(wf.node_vert_idx),
        "active": np.asarray(wf.active),
        "radius": np.asarray(wf.radius),
        "lw_dq": np.asarray(lw_dq),
        "itercounter": itercounter,
    }
    for k, v in (extra or {}).items():
        data["extra_" + k] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_checkpoint(path):
    """Returns (volume, warp_field, lw_dq, itercounter, extra)."""
    with np.load(path) as z:
        if int(z["format_version"]) != FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {int(z['format_version'])}"
            )
        volume = TsdfVolume(
            values=jnp.asarray(z["tsdf_values"]),
            weights=jnp.asarray(z["tsdf_weights"]),
            ind=jnp.asarray(z["ind"]),
        )
        wf = WarpField(
            node_pos=jnp.asarray(z["node_pos"]),
            node_dq=jnp.asarray(z["node_dq"]),
            node_w=jnp.asarray(z["node_w"]),
            node_vert_idx=jnp.asarray(z["node_vert_idx"]),
            active=jnp.asarray(z["active"]),
            radius=jnp.asarray(z["radius"]),
        )
        lw = jnp.asarray(z["lw_dq"])
        it = int(z["itercounter"])
        extra = {
            k[6:]: z[k] for k in z.files if k.startswith("extra_")
        }
    return volume, wf, lw, it, extra
