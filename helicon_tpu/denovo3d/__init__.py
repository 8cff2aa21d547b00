"""De-novo helical indexing + 3D reconstruction from one 2D class average.

TPU-native re-design of the reference solver
(/root/reference/src/helicon/webApps/denovo3D/): the reference builds an
explicit sparse system (back-projection rows + helical-symmetry-pair rows,
numba kernels) and solves it with scipy/sklearn on CPU. Here the same
objective is expressed matrix-free: the projection and symmetry-resampling
operators are jitted gather/interpolation expressions, the bounded
least-squares solve is CG + FISTA on TPU, candidates (twist, rise) are
vmapped, and the candidate grid is sharded across chips with
jax.sharding.  Scores use the identical definitions (cosine of A.x vs b),
so rankings match the reference on its own workload.
"""

from .geometry import (  # noqa: F401
    ReconstructionGeometry,
    back_project_2d_coords_to_3d_coords,
    select_copies,
    select_pair_ops,
    compute_sym_dedup_mask,
    select_pairs,
    sorted_hsym_csym_pairs,
)
from .projector import data_operator, sym_operator  # noqa: F401
from .solver import lsq_reconstruct, solve_candidate  # noqa: F401
from .pipeline import process_one_task  # noqa: F401
from .grid import build_candidate_grid, reconstruct_grid  # noqa: F401
from .checkpoint import reconstruct_grid_checkpointed  # noqa: F401
