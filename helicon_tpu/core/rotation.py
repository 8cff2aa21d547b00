"""Rotation matrices for the Euler conventions used across the framework.

Matches scipy.spatial.transform.Rotation semantics: ``from_euler(seq, angles)``
with uppercase axes = intrinsic, lowercase = extrinsic; matrices act on
column vectors (``R @ v``), i.e. ``Rotation.apply(v) == v @ R.T``.

All functions are jnp-traceable so rotations can be computed per-candidate
inside jit (angles may be traced scalars).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rot_x", "rot_y", "rot_z", "euler_matrix", "apply_rotation"]


def _c_s(angle_deg):
    a = jnp.deg2rad(angle_deg)
    return jnp.cos(a), jnp.sin(a)


def rot_x(angle_deg):
    c, s = _c_s(angle_deg)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def rot_y(angle_deg):
    c, s = _c_s(angle_deg)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rot_z(angle_deg):
    c, s = _c_s(angle_deg)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


_AXES = {"x": rot_x, "y": rot_y, "z": rot_z}


def euler_matrix(seq: str, angles) -> jnp.ndarray:
    """Rotation matrix for an Euler sequence (scipy convention).

    Uppercase sequence = intrinsic: R = R(a1) @ R(a2) @ R(a3).
    Lowercase = extrinsic: R = R(a3) @ R(a2) @ R(a1).
    """
    angles = jnp.atleast_1d(jnp.asarray(angles, jnp.float32))
    mats = [_AXES[ax.lower()](angles[..., i]) for i, ax in enumerate(seq)]
    if seq.isupper():
        out = mats[0]
        for m in mats[1:]:
            out = out @ m
    elif seq.islower():
        out = mats[0]
        for m in mats[1:]:
            out = m @ out
    else:
        raise ValueError(f"mixed-case Euler sequence {seq!r} not supported")
    return out


def apply_rotation(matrix, vectors, inverse: bool = False):
    """Rotate (..., 3) vectors; ``inverse=True`` applies R^T."""
    if inverse:
        return vectors @ matrix
    return vectors @ matrix.T if matrix.ndim == 2 else vectors @ jnp.swapaxes(matrix, -1, -2)
