"""Tests for helicon_tpu.helix (simulation + orientation utilities)."""

import numpy as np
import pytest

import helicon_tpu as ht
from helicon_tpu.helix import (
    auto_horizontalize,
    generate_xyz_projections,
    helical_unit_positions,
    is_vertical,
    random_polymer,
    simulate_helical_projection,
    symmetrize_transform_map,
    tilt_psi_dy_str,
)


def test_simulate_helical_projection_shape_and_positivity():
    img = simulate_helical_projection(
        n=1,
        twist=30.0,
        rise=4.75,
        csym=1,
        helical_diameter=60.0,
        ball_radius=6.0,
        polymer=0,
        planarity=1.0,
        ny=48,
        nx=96,
        apix=2.0,
        rng=0,
    )
    assert img.shape == (48, 96)
    assert np.all(img >= 0)
    assert img.max() > 0.5


def test_simulate_projection_is_horizontal():
    img = simulate_helical_projection(
        n=1, twist=20.0, rise=5.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=64, nx=128, apix=2.0, rng=1,
    )
    assert not is_vertical(img)
    assert is_vertical(img.T)


def test_helical_unit_positions_count_and_extent():
    pos = helical_unit_positions(
        n=1, twist=30.0, rise=5.0, csym=2, diameter=40.0, height=100.0, rng=0
    )
    imax = int(np.ceil(100.0 / 5.0))
    assert pos.shape == ((2 * imax + 1) * 2, 2)
    # radial coordinate bounded by diameter/2
    assert np.max(np.abs(pos[:, 0])) <= 20.0 + 1e-6


def test_random_polymer_self_avoidance():
    xyz = random_polymer(n_atoms=20, rmin=0, rmax=30, csym=1, planarity=0.9, rng=3)
    assert xyz.shape[1] == 3
    if len(xyz) > 1:
        d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
        d[np.diag_indices_from(d)] = 1e9
        assert d.min() > 3.8 * 0.8 - 1e-6


def test_auto_horizontalize_recovers_rotation():
    img = simulate_helical_projection(
        n=1, twist=45.0, rise=4.75, csym=1, helical_diameter=50.0,
        ball_radius=8.0, polymer=0, planarity=1.0, ny=80, nx=80, apix=2.0, rng=0,
    )
    rotated = np.asarray(ht.rotate_shift_image(img, angle=10.0))
    out, theta, shift_y = auto_horizontalize(rotated, refine=True)
    assert out.shape == rotated.shape
    assert abs(abs(theta) - 10.0) < 3.0


def test_generate_xyz_projections():
    vol = np.random.default_rng(0).random((12, 10, 8)).astype(np.float32)
    px, py, pz = generate_xyz_projections(vol)
    assert px.shape == (12, 10) and py.shape == (12, 8) and pz.shape == (10, 8)
    np.testing.assert_allclose(pz, vol.sum(axis=0), rtol=1e-6)
    pz_amyloid = generate_xyz_projections(vol, is_amyloid=True, apix=2.0)[2]
    assert pz_amyloid.shape == (10, 8)


def test_symmetrize_transform_map_runs():
    rng = np.random.default_rng(0)
    vol = rng.random((16, 12, 12)).astype(np.float32)
    out = symmetrize_transform_map(
        vol, apix=2.0, twist_degree=30.0, rise_angstrom=6.0, csym=1,
        new_size=(16, 12, 12), new_apix=2.0,
    )
    assert out.shape == (16, 12, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_tilt_psi_dy_str():
    assert tilt_psi_dy_str(0, 0, 0) == ""
    s = tilt_psi_dy_str(1.234, -2.0, 3.5, unit=False)
    assert "tilt=1.23" in s and "psi=-2.0" in s and "dy=3.5" in s


def test_tilt_psi_rotation_matches_scipy_extrinsic():
    """Reference utils.py:167 composes R.from_euler("yx", (tilt, -psi)) —
    EXTRINSIC order, i.e. Rx(-psi) @ Ry(tilt). A swapped composition put
    every ball at wrong (y, z) whenever both angles are nonzero."""
    from scipy.spatial.transform import Rotation as R

    from helicon_tpu.helix.simulate import _rot_x, _rot_y

    rot = R.from_euler("yx", (30.0, -20.0), degrees=True)
    pts = np.array([[0.0, 20.0, 0.0], [5.0, -3.0, 7.0], [1.0, 0.0, 0.0]])
    q = rot.apply(pts)
    q2 = pts @ (_rot_x(-20.0) @ _rot_y(30.0)).T
    np.testing.assert_allclose(q, q2, atol=1e-10)
