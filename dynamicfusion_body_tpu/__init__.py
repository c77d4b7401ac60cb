"""dynamicfusion_body_tpu — TPU-native non-rigid RGB-D reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
DynamicFusion_Body reference (non-rigid multi-view depth fusion into a
canonical TSDF with a dual-quaternion warp field), re-designed TPU-first:
fused voxel kernels, analytic Gauss-Newton solvers, static shapes, and
pjit/shard_map scaling over device meshes.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from .io.sdf_io import load_sdf  # noqa: F401
from .pipeline.fusion import Fusion, FusionDM, FusionDM_GPU  # noqa: F401
