"""Matrix-free projection / symmetry operators for the denovo3D solver.

The reference materializes two sparse matrices per candidate
(solver_linear_regression.py:1304-1654 data rows, 844-1298 symmetry-pair
rows) with numba kernels. Here both are *linear operators* built from the
identical sampling geometry:

  data term   P(x)[t, i, j] = sum_k w(coords(t, i, j, k)) . x     = b[i, j]
  sym term    S(x)[p, v]    = interp(x, g1.v) - interp(x, g2.v)   = 0

with coordinate conventions copied from the reference:
  * 2D pixel (row j, column i) back-projects to the ray
    (x, y, z) = (-s.kc, s.jc, s.ic), kc the ray parameter
    (back_project_2d_coords_to_3d_coords, solver:1657-1746);
  * per projection copy t=(h,c): rotate about z by
    -(twist.h + 360.c/csym), then z -= h.rise (solver:1577-1588);
  * per symmetry op g=(h,c) of a pair: rotate about z by
    +(twist.h + 360.c/csym), then z += h.rise (solver:1232-1251);
  * "nn": round + in-mask test; "linear": floor + all-8-corners-in-mask
    test (the corner test is precomputed as one static cell-valid volume).

Coordinates and interpolation weights are recomputed inside the per-copy
scan body on every operator application: ~20 VPU flops per sample instead
of persisting O(100 MB) index/weight tables per candidate, which keeps
large vmap batches of candidates resident on chip.

All functions are jittable; twist/rise/tilt/psi/dy and the (h, c) copy and
pair tables are traced, so one compilation serves an entire candidate grid
under vmap.

Note: the reference's linear-interpolation symmetry kernel has two typo'd
corner weights (solver:1090,1094 use xf*yf*(1-xf) and xf*yf*zf for the
110/111 corners); we implement the evidently intended trilinear weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_problem", "data_operator", "sym_operator"]


def _use_remat() -> bool:
    """Should the per-copy/per-pair scan bodies be jax.checkpoint'ed?

    Differentiating through the scans (the PT/ST vjps and the refine
    path's pose Jacobian) stores every step's (l2, d2, d2)
    coordinate/weight intermediates — measured ~1.3 GB per candidate at
    the amyloid-fixture geometry, which capped TPU refine batches at 2
    and could OOM-crash the worker. Remat recomputes the ~20-flop
    coordinate math in the backward pass instead: measured +47 % wall
    on the CPU backend (gather-paced, memory-rich) but the enabler for
    real refine batches on accelerators. Policy: on for accelerator
    backends, off on CPU; HELICON_PROJECTOR_REMAT=1/0 overrides.
    Read at trace time."""
    import os

    v = os.environ.get("HELICON_PROJECTOR_REMAT", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() != "cpu"


def _maybe_checkpoint(fn):
    return jax.checkpoint(fn) if _use_remat() else fn


def _rot_yx_inv(tilt_deg, psi_deg):
    """Transpose of scipy R.from_euler('yx', (tilt, psi)) as a 3x3."""
    t = jnp.deg2rad(tilt_deg)
    p = jnp.deg2rad(psi_deg)
    ct, st = jnp.cos(t), jnp.sin(t)
    cp, sp = jnp.cos(p), jnp.sin(p)
    # extrinsic 'yx' => R = Rx(psi) @ Ry(tilt); inverse = Ry(-tilt) @ Rx(-psi)
    ry = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]])
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cp, sp], [0.0, -sp, cp]])
    return ry @ rx


def _gather3(vol_flat, zi, yi, xi, d3: int, l3: int):
    """Clamped flat gather from a (l3, d3, d3) volume."""
    zc = jnp.clip(zi, 0, l3 - 1)
    yc = jnp.clip(yi, 0, d3 - 1)
    xc = jnp.clip(xi, 0, d3 - 1)
    return vol_flat[(zc * d3 + yc) * d3 + xc]


def _sample_nn(x_flat, aux_flat, Z, Y, X, d3: int, l3: int):
    """Nearest-neighbour sample of x with validity (bounds + mask)."""
    zi = jnp.round(Z).astype(jnp.int32)
    yi = jnp.round(Y).astype(jnp.int32)
    xi = jnp.round(X).astype(jnp.int32)
    inb = (
        (zi >= 0) & (zi <= l3 - 1)
        & (yi >= 0) & (yi <= d3 - 1)
        & (xi >= 0) & (xi <= d3 - 1)
    )
    valid = inb & (_gather3(aux_flat, zi, yi, xi, d3, l3) > 0.5)
    val = _gather3(x_flat, zi, yi, xi, d3, l3) * valid.astype(jnp.float32)
    return val, valid


def _sample_linear(x_flat, aux_flat, Z, Y, X, d3: int, l3: int):
    """Trilinear sample of x, valid iff the enclosing cell lies fully in
    the mask (aux = cell-valid volume; reference solver:1403-1470)."""
    zf = jnp.floor(Z)
    yf = jnp.floor(Y)
    xf = jnp.floor(X)
    zi = zf.astype(jnp.int32)
    yi = yf.astype(jnp.int32)
    xi = xf.astype(jnp.int32)
    inb = (
        (zi >= 0) & (zi <= l3 - 2)
        & (yi >= 0) & (yi <= d3 - 2)
        & (xi >= 0) & (xi <= d3 - 2)
    )
    valid = inb & (_gather3(aux_flat, zi, yi, xi, d3, l3) > 0.5)
    wz = Z - zf
    wy = Y - yf
    wx = X - xf
    zc = jnp.clip(zi, 0, l3 - 2)
    yc = jnp.clip(yi, 0, d3 - 2)
    xc = jnp.clip(xi, 0, d3 - 2)
    base = (zc * d3 + yc) * d3 + xc
    dzs = d3 * d3
    v000 = x_flat[base]
    v001 = x_flat[base + 1]
    v010 = x_flat[base + d3]
    v011 = x_flat[base + d3 + 1]
    v100 = x_flat[base + dzs]
    v101 = x_flat[base + dzs + 1]
    v110 = x_flat[base + dzs + d3]
    v111 = x_flat[base + dzs + d3 + 1]
    val = (
        (1 - wz) * (1 - wy) * (1 - wx) * v000
        + (1 - wz) * (1 - wy) * wx * v001
        + (1 - wz) * wy * (1 - wx) * v010
        + (1 - wz) * wy * wx * v011
        + wz * (1 - wy) * (1 - wx) * v100
        + wz * (1 - wy) * wx * v101
        + wz * wy * (1 - wx) * v110
        + wz * wy * wx * v111
    )
    return val * valid.astype(jnp.float32), valid


def _sampler(interpolation: str):
    return _sample_linear if interpolation.startswith("linear") else _sample_nn


def data_operator(
    geom,
    twist_degree,
    rise_pixel,
    copies_h,
    copies_c,
    copies_valid,
    tilt_degree=0.0,
    psi_degree=0.0,
    dy_pixel=0.0,
    interpolation: str = "nn",
    mask_flat=None,
    cellok_flat=None,
):
    """Projection operator P and row validity for one candidate.

    Returns (P, row_valid): P(x_vol) -> pred (n_copies, l2, d2);
    row_valid same shape, True where the ray hit >=1 valid voxel and the
    copy slot is populated.
    """
    d2, l2, d3, l3 = geom.d2, geom.l2, geom.d3, geom.l3
    s = geom.scale2d_to_3d
    csym = geom.csym
    sample = _sampler(interpolation)
    aux_flat = cellok_flat if interpolation.startswith("linear") else mask_flat

    ic = (jnp.arange(l2, dtype=jnp.float32) - l2 // 2)[:, None, None]
    jc = (jnp.arange(d2, dtype=jnp.float32) - d2 // 2)[None, :, None]
    kc = (jnp.arange(d2, dtype=jnp.float32) - d2 // 2)[None, None, :]

    x0 = jnp.broadcast_to(-s * kc, (l2, d2, d2))
    y0 = jnp.broadcast_to(s * jc, (l2, d2, d2)) - dy_pixel
    z0 = jnp.broadcast_to(s * ic, (l2, d2, d2))
    R = _rot_yx_inv(tilt_degree, psi_degree)
    bx = R[0, 0] * x0 + R[0, 1] * y0 + R[0, 2] * z0
    by = R[1, 0] * x0 + R[1, 1] * y0 + R[1, 2] * z0
    bz = R[2, 0] * x0 + R[2, 1] * y0 + R[2, 2] * z0

    theta = jnp.deg2rad(
        twist_degree * copies_h.astype(jnp.float32)
        + 360.0 * copies_c.astype(jnp.float32) / csym
    )
    dz = copies_h.astype(jnp.float32) * rise_pixel

    def copy_coords(th, dzc):
        c, sn = jnp.cos(th), jnp.sin(th)
        # inverse z-rotation: (x, y) -> (x c + y s, -x s + y c)
        X = (bx * c + by * sn) + d3 // 2
        Y = (-bx * sn + by * c) + d3 // 2
        Z = (bz - dzc) + l3 // 2
        return Z, Y, X

    def row_valid_one(th, dzc, cv):
        Z, Y, X = copy_coords(th, dzc)
        _, valid = sample(jnp.zeros_like(mask_flat), aux_flat, Z, Y, X, d3, l3)
        return jnp.any(valid, axis=2) & cv

    row_valid = jax.vmap(row_valid_one)(theta, dz, copies_valid)

    def P(x_vol):
        xf = x_vol.reshape(-1)

        # see _use_remat: keeps the PT vjp / pose Jacobian from
        # storing per-copy coordinate intermediates on accelerators
        @_maybe_checkpoint
        def one(carry, tdc):
            th, dzc, cv = tdc
            Z, Y, X = copy_coords(th, dzc)
            val, _ = sample(xf, aux_flat, Z, Y, X, d3, l3)
            return carry, jnp.sum(val, axis=2) * cv.astype(jnp.float32)

        _, pred = jax.lax.scan(one, 0.0, (theta, dz, copies_valid))
        return pred  # (C, l2, d2)

    return P, row_valid


def sym_operator(
    geom,
    twist_degree,
    rise_pixel,
    pairs_hc,
    pairs_valid,
    interpolation: str = "nn",
    mask_flat=None,
    cellok_flat=None,
    sym_keep=None,
):
    """Symmetry-constraint operator S for one candidate.

    S(x_vol) -> residuals (n_pairs, l3, d3, d3): interp at g1.v minus
    interp at g2.v per voxel v, zeroed where either side leaves the mask,
    where v is unmasked, or where the pair slot is padding. Optional
    sym_keep (P, l3, d3, d3) bool additionally drops duplicate voxel-pair
    constraints (geometry.compute_sym_dedup_mask, matching the
    reference's nn pair_ids first-occurrence dedup).
    """
    d3, l3 = geom.d3, geom.l3
    csym = geom.csym
    sample = _sampler(interpolation)
    aux_flat = cellok_flat if interpolation.startswith("linear") else mask_flat
    voxel_in_mask = mask_flat.reshape(l3, d3, d3) > 0.5

    zc = (jnp.arange(l3, dtype=jnp.float32) - l3 // 2)[:, None, None]
    yc = (jnp.arange(d3, dtype=jnp.float32) - d3 // 2)[None, :, None]
    xc = (jnp.arange(d3, dtype=jnp.float32) - d3 // 2)[None, None, :]
    X0 = jnp.broadcast_to(xc, (l3, d3, d3))
    Y0 = jnp.broadcast_to(yc, (l3, d3, d3))
    Z0 = jnp.broadcast_to(zc, (l3, d3, d3))

    def op_sample(xf, h, c):
        th = jnp.deg2rad(
            twist_degree * h.astype(jnp.float32)
            + 360.0 * c.astype(jnp.float32) / csym
        )
        cs, sn = jnp.cos(th), jnp.sin(th)
        # forward z-rotation: (x, y) -> (x c - y s, x s + y c)
        X = (X0 * cs - Y0 * sn) + d3 // 2
        Y = (X0 * sn + Y0 * cs) + d3 // 2
        Z = (Z0 + h.astype(jnp.float32) * rise_pixel) + l3 // 2
        return sample(xf, aux_flat, Z, Y, X, d3, l3)

    # sym_keep=None (the vmapped grid pass) must NOT bake an all-True
    # (n_pairs, l3, d3, d3) tensor into the executable: drop the term
    # at trace time instead of relying on XLA to fold `x & True`.
    _keep = None if sym_keep is None else jnp.asarray(sym_keep, bool)

    def S(x_vol):
        xf = x_vol.reshape(-1)

        # same rationale as data_operator.P (see _use_remat)
        @_maybe_checkpoint
        def one(carry, hp):
            hc, pv = hp[0], hp[1]
            v1, ok1 = op_sample(xf, hc[0], hc[1])
            v2, ok2 = op_sample(xf, hc[2], hc[3])
            valid = ok1 & ok2 & voxel_in_mask & pv
            if _keep is not None:
                valid = valid & hp[2]
            return carry, (v1 - v2) * valid.astype(jnp.float32)

        xs = (
            (pairs_hc, pairs_valid)
            if _keep is None
            else (pairs_hc, pairs_valid, _keep)
        )
        _, res = jax.lax.scan(one, 0.0, xs)
        return res  # (P, l3, d3, d3)

    return S


def build_problem(
    geom,
    image_region,
    twist_degree,
    rise_pixel,
    copies_h,
    copies_c,
    copies_valid,
    pairs_hc,
    pairs_valid,
    tilt_degree=0.0,
    psi_degree=0.0,
    dy_pixel=0.0,
    interpolation: str = "nn",
    mask=None,
    cellok=None,
    sym_keep=None,
):
    """Assemble (P, PT, S, ST, b, row_valid, mask) for one candidate.

    image_region: (d2, l2) pixel values (rows j, columns i), i.e. the
    centered crop of the prepared class average; b[i, j] = region[j, i]
    (reference b_tmp[row] = pixel_vals[j, k], solver:1502-1504).
    """
    mask_flat = jnp.asarray(mask, jnp.float32).reshape(-1)
    cellok_flat = jnp.asarray(cellok, jnp.float32).reshape(-1)

    P, row_valid = data_operator(
        geom,
        twist_degree,
        rise_pixel,
        copies_h,
        copies_c,
        copies_valid,
        tilt_degree,
        psi_degree,
        dy_pixel,
        interpolation,
        mask_flat,
        cellok_flat,
    )
    S = sym_operator(
        geom,
        twist_degree,
        rise_pixel,
        pairs_hc,
        pairs_valid,
        interpolation,
        mask_flat,
        cellok_flat,
        sym_keep=sym_keep,
    )
    vol_shape = geom.volume_shape
    # P and S are linear in x, so their vjp at any point is the transpose.
    _, PT_vjp = jax.vjp(P, jnp.zeros(vol_shape, jnp.float32))
    _, ST_vjp = jax.vjp(S, jnp.zeros(vol_shape, jnp.float32))
    b = jnp.asarray(image_region, jnp.float32).T  # (l2, d2)
    return dict(
        P=P,
        PT=lambda r: PT_vjp(r)[0],
        S=S,
        ST=lambda r: ST_vjp(r)[0],
        b=b,
        row_valid=row_valid,
        mask=mask_flat.reshape(vol_shape) > 0.5,
    )
