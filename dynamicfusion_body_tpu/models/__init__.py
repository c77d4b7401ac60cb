from .tsdf_volume import TsdfVolume, fuse_depth, update_tsdf_rigid
from .warp_field import (
    WarpField,
    blend_at,
    brick_candidates,
    construct_graph,
    neighbor_lookup,
    update_graph,
    update_tsdf_nonrigid,
    warp_points,
)
