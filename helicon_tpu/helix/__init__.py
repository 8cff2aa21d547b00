"""Helical symmetry engine: simulation, symmetrization, and orientation.

Parity map (reference: /root/reference/src/helicon/webApps/denovo3D/utils.py):
  simulate_helical_projection .. utils.py:31-191
  random_polymer              .. utils.py:194-333
  generate_xyz_projections    .. utils.py:336-343
  symmetrize_transform_map    .. utils.py:346-380
  auto_horizontalize          .. utils.py:383-426
  is_vertical                 .. utils.py:429-447
  tilt_psi_dy_str             .. utils.py:450-480

``apply_helical_symmetry`` itself lives in :mod:`helicon_tpu.core.transforms`.
"""

from .simulate import (  # noqa: F401
    helical_unit_positions,
    random_polymer,
    simulate_helical_projection,
)
from .orient import (  # noqa: F401
    auto_horizontalize,
    generate_xyz_projections,
    is_vertical,
    symmetrize_transform_map,
    tilt_psi_dy_str,
)
from .indexing import (  # noqa: F401
    LayerLine,
    bessel_first_peak_x,
    detect_layer_lines,
    detect_layer_lines_batch,
    estimate_bessel_order,
    estimate_helical_parameters,
    layer_line_profiles,
)
from .pitch import (  # noqa: F401
    estimate_pitch_from_class2d,
    estimate_pitch_from_pair_distances,
)
from .lattice import (  # noqa: F401
    helical_lattice_points,
    lattice_vectors_from_parameters,
    parameters_from_lattice_vectors,
)
