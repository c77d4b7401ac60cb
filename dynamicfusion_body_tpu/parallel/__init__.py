from .mesh import VOXEL_AXIS, make_mesh, replicated, vertex_sharding, volume_sharding
from .sharded import (
    fuse_depth_sharded,
    solve_nonrigid_sharded,
    update_tsdf_nonrigid_sharded,
    update_tsdf_rigid_sharded,
)
