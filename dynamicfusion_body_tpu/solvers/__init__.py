from .nonrigid import (
    data_residual_one,
    make_reg_pairs,
    nonrigid_energy,
    reg_residual_one,
    solve_nonrigid,
)
from .rigid import p2s_residuals, solve_rigid
