"""TPU-native compute primitives for the DynamicFusion_Body rebuild."""

from .dualquat import (
    IDENTITY_DQ,
    dq_blend,
    dq_full_conjugate,
    dq_multiply,
    dq_normalize8,
    dq_transform_normal,
    dq_transform_point,
    dqb_weights,
    quat_conjugate,
    quat_multiply,
    warp_point,
)
from .interp import bilinear, trilinear
from .knn import knn, nearest, pairwise_sqdist
from .losses import huber_irls_weight, huber_loss, tukey_biweight_loss, tukey_irls_weight
from .projection import estimate_alignment, make_ind_matrix, project_to_pixel
from .sampling import furthest_point_sample, radius_subsample
from .search import searchsorted1d
from .se3 import (
    compose_se3,
    decompose_se3,
    dq_to_se3,
    inverse_rigid_matrix,
    quat_from_matrix,
    quat_to_matrix,
    se3_to_dq,
)
from . import transforms  # noqa: F401  (4x4/quaternion/Euler toolkit)
from .grid_knn import grid_knn
from .trilerp_pallas import trilerp_bricks, trilerp_bricks_supported
