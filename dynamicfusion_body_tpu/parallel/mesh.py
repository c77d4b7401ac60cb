"""Device-mesh construction helpers.

The workload (SURVEY §2.3, §5.8) is embarrassingly data-parallel over
voxels with tiny shared state (node pool, camera, depth maps), so the
canonical layout is a 1-D mesh sharding the voxel grid's leading (x) axis
over ICI, with nodes/depths replicated and Gauss-Newton reductions psum'd.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VOXEL_AXIS = "vox"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (VOXEL_AXIS,))


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """Voxel volumes shard along x (leading axis)."""
    return NamedSharding(mesh, P(VOXEL_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def vertex_sharding(mesh: Mesh) -> NamedSharding:
    """Vertex-parallel arrays (V, ...) shard along V."""
    return NamedSharding(mesh, P(VOXEL_AXIS))
