"""Facade matching reference webApps/denovo3D/solver_linear_regression.py.

The TPU-native solver lives in helicon_tpu.denovo3d; these names keep
the reference import paths working.
"""

from ...denovo3d.geometry import (  # noqa: F401
    back_project_2d_coords_to_3d_coords,
    select_copies,
    select_pairs,
    sorted_hsym_csym_pairs,
)
from ...denovo3d.refine import refine_tilt_psi_dy  # noqa: F401
from ...denovo3d.solver import lsq_reconstruct  # noqa: F401
