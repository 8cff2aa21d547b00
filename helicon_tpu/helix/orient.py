"""Helix orientation / symmetrized-map utilities.

Reference: webApps/denovo3D/utils.py:336-480.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.analysis import estimate_helix_rotation_center_diameter
from ..core.filters import low_high_pass_filter
from ..core.transforms import apply_helical_symmetry, rotate_shift_image, transform_map

__all__ = [
    "auto_horizontalize",
    "generate_xyz_projections",
    "is_vertical",
    "symmetrize_transform_map",
    "tilt_psi_dy_str",
]


def is_vertical(data) -> bool:
    """True if the filament runs predominantly vertically (utils.py:429-447)."""
    data = np.asarray(data)
    py_max = np.max(np.sum(data, axis=0))
    px_max = np.max(np.sum(data, axis=1))
    return bool(py_max > px_max)


def auto_horizontalize(data, refine: bool = False):
    """Rotate/shift an image so the helix lies horizontally through center.

    Mirrors reference auto_horizontalize (utils.py:383-426): moment-based
    initial estimate, then optional Nelder-Mead refinement maximizing the
    mirror symmetry (std of the folded row profile) of the rotated image.
    Returns (image, theta_degree, shift_y_pixel).
    """
    data = np.asarray(data, np.float32)
    data_work = np.clip(data, 0, None)
    theta, shift_y, diameter = estimate_helix_rotation_center_diameter(data)

    if refine:
        from scipy.optimize import fmin

        def score_rotation_shift(x):
            th, sy = x
            tmp = np.asarray(
                rotate_shift_image(data_work, angle=th, post_shift=(sy, 0))
            )
            y = np.sum(tmp, axis=1)[1:]
            y = y + y[::-1]
            return -np.std(y)

        theta, shift_y = fmin(
            score_rotation_shift, x0=(theta, shift_y), xtol=1e-2, disp=0
        )

    out = rotate_shift_image(data, angle=theta, post_shift=(shift_y, 0), order=3)
    return np.asarray(out), float(theta), float(shift_y)


def generate_xyz_projections(map3d, is_amyloid: bool = False, apix=None):
    """X/Y/Z sum-projections; amyloids use one 4.75 A rung for Z
    (utils.py:336-343)."""
    map3d = np.asarray(map3d)
    proj_xyz = [map3d.sum(axis=i) for i in (2, 1, 0)]
    if is_amyloid:
        nz = map3d.shape[0]
        nz_center = int(round(4.75 / apix))
        z0 = nz // 2 - nz_center // 2
        proj_xyz[-1] = map3d[z0 : z0 + nz_center].sum(axis=0)
    return proj_xyz


def symmetrize_transform_map(
    data,
    apix: float,
    twist_degree: float,
    rise_angstrom: float,
    csym: int = 1,
    fraction: float = 1.0,
    new_size=None,
    new_apix=None,
    axial_rotation: float = 0,
    tilt: float = 0,
):
    """Low-pass (if downsampling) + helical symmetrization + optional
    rot/tilt reorientation of a 3D map (utils.py:346-380)."""
    data = jnp.asarray(data, jnp.float32)
    if new_apix is not None and new_apix > apix:
        data = low_high_pass_filter(data, low_pass_fraction=apix / new_apix)
    m = apply_helical_symmetry(
        data=data,
        apix=apix,
        twist_degree=twist_degree,
        rise_angstrom=rise_angstrom,
        csym=csym,
        new_size=new_size,
        new_apix=new_apix,
        fraction=fraction,
    )
    if axial_rotation or tilt:
        m = transform_map(m, rot=axial_rotation, tilt=tilt)
    return m


def tilt_psi_dy_str(tilt, psi, dy, sep=" ", sep2="=", unit: bool = True) -> str:
    """Compact ``tilt=..deg psi=..deg dy=..A`` label (utils.py:450-480)."""
    s = ""
    if tilt:
        s += f"{sep}tilt{sep2}{round(tilt, 2)}" + ("°" if unit else "")
    if psi:
        s += f"{sep}psi{sep2}{round(psi, 2)}" + ("°" if unit else "")
    if dy:
        s += f"{sep}dy{sep2}{round(dy, 2)}" + ("Å" if unit else "")
    return s
