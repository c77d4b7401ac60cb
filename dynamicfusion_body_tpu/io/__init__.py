from .mesh_io import load_obj, regularize_mesh, save_obj
from .sdf_io import load_sdf, save_sdf
from .warpfield_io import (
    load_warp_field_nodes,
    restore_warp_field,
    save_warp_field,
)
