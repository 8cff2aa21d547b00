"""Property-based tests for angular math (hypothesis), mirroring the
reference's test strategy (tests/test_angular_property.py there)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import helicon_tpu as ht

angles = st.floats(min_value=-720, max_value=720, allow_nan=False, width=32)


@given(a=angles)
@settings(max_examples=50, deadline=None)
def test_set_angle_range_invariant(a):
    out = ht.set_angle_range(float(a), range=(-180, 180))
    assert -180 - 1e-6 <= out <= 180 + 1e-6


@given(a=angles)
@settings(max_examples=50, deadline=None)
def test_set_to_periodic_range(a):
    out = ht.set_to_periodic_range(float(a))
    assert -180 <= out <= 180
    # value should differ by a multiple of 360
    assert abs((float(a) - out) % 360) < 1e-6 or abs((float(a) - out) % 360 - 360) < 1e-6


@given(
    rot=st.floats(-179, 179, allow_nan=False),
    tilt=st.floats(1, 179, allow_nan=False),
    psi=st.floats(-179, 179, allow_nan=False),
)
@settings(max_examples=30, deadline=None)
def test_euler_quaternion_round_trip(rot, tilt, psi):
    q = ht.relion_euler2quaternion(np.array([rot]), np.array([tilt]), np.array([psi]))
    r2, t2, p2 = ht.quaternion2euler(q)
    from scipy.spatial.transform import Rotation as R

    r_in = R.from_euler("ZYZ", (rot, tilt, psi), degrees=True)
    r_out = R.from_euler("ZYZ", (r2[0], t2[0], p2[0]), degrees=True)
    assert ht.angular_distance(r_in, r_out) < 0.01


def test_relion_eman_round_trip():
    rot, tilt, psi = 10.0, 20.0, 30.0
    az, alt, phi = ht.euler_relion2eman(rot, tilt, psi)
    assert ht.euler_eman2relion(az, alt, phi) == (rot, tilt, psi)


def test_eman_quaternion_matches_relion():
    q1 = ht.eman_euler2quaternion(np.array([100.0]), np.array([20.0]), np.array([-60.0]))
    q2 = ht.relion_euler2quaternion(np.array([10.0]), np.array([20.0]), np.array([30.0]))
    assert np.allclose(np.abs(np.sum(q1 * q2)), 1.0, atol=1e-6)


def test_average_quaternions_identity():
    q = np.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    avg = ht.average_quaternions(q)
    assert np.allclose(np.abs(avg), [1, 0, 0, 0], atol=1e-8)


def test_average_quaternions_sign_ambiguity():
    q = np.array([[1.0, 0, 0, 0], [-1.0, 0, 0, 0]])
    avg = ht.average_quaternions(q)
    assert np.allclose(np.abs(avg[0]), 1.0, atol=1e-8)


def test_average_relion_eulers():
    rot = np.array([10.0, 12.0])
    tilt = np.array([80.0, 82.0])
    psi = np.array([5.0, 7.0])
    r, t, p = ht.average_relion_eulers(rot, tilt, psi)
    assert abs(r[0] - 11) < 1.5 and abs(t[0] - 81) < 1.5 and abs(p[0] - 6) < 1.5


def test_angular_difference_wraps():
    assert ht.angular_difference(359.0, 1.0) == pytest.approx(-2.0)
    assert ht.angular_difference(1.0, 359.0) == pytest.approx(2.0)


def test_euler_matrix_matches_scipy():
    from scipy.spatial.transform import Rotation as R
    import jax.numpy as jnp
    from helicon_tpu.core.rotation import euler_matrix

    for seq, ang in [("ZYZ", (10.0, 20.0, 30.0)), ("yx", (15.0, -25.0)), ("z", (40.0,))]:
        got = np.asarray(euler_matrix(seq, jnp.asarray(ang)))
        want = R.from_euler(seq, ang, degrees=True).as_matrix()
        assert np.abs(got - want).max() < 1e-6, seq
