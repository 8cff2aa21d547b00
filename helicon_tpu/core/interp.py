"""JAX N-d interpolation: map_coordinates (order 0/1/3) and masked
trilinear gathers.

Replaces scipy.ndimage.map_coordinates / affine_transform and the numba
trilinear loops of the reference (transforms.py:58-165, solver kernels).
All functions are jittable, vmappable, and differentiable.

Order-3 uses true cubic B-spline interpolation with the standard
recursive prefilter (pole sqrt(3)-2), computed with lax.scan so it stays
on-device.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "spline_filter1d",
    "spline_filter",
    "map_coordinates",
    "linear_gather_2d",
    "trilinear_gather_3d",
]

_CUBIC_POLE = math.sqrt(3.0) - 2.0


def _mirror_index(idx, n):
    """Reflect indices into [0, n-1] with symmetry about the end samples
    (scipy 'mirror': no repeated edge sample)."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * (n - 1)
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= n, period - idx, idx)


def _reflect_index(idx, n):
    """scipy 'reflect': symmetry about the edge (edge sample repeated)."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n
    idx = jnp.abs(idx + (idx < 0)) % period  # reflect about -0.5
    idx = jnp.where(idx >= n, period - 1 - idx, idx)
    return idx


def _index_fixer(mode: str, n: int):
    if mode in ("mirror",):
        return lambda idx: (_mirror_index(idx, n), jnp.ones(idx.shape, bool))
    if mode in ("reflect",):
        return lambda idx: (_reflect_index(idx, n), jnp.ones(idx.shape, bool))
    if mode in ("nearest", "edge"):
        return lambda idx: (jnp.clip(idx, 0, n - 1), jnp.ones(idx.shape, bool))
    # note: "wrap" here is scipy's *grid-wrap* (exact periodic
    # indexing); scipy's own "wrap" overlaps the first/last samples.
    # skimage "wrap" (true periodic) maps onto this correctly.
    if mode in ("wrap", "grid-wrap"):
        return lambda idx: (idx % n, jnp.ones(idx.shape, bool))
    # constant
    return lambda idx: (jnp.clip(idx, 0, n - 1), (idx >= 0) & (idx <= n - 1))


def spline_filter1d(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Cubic B-spline prefilter along one axis (mirror boundary).

    Matches scipy.ndimage.spline_filter1d(order=3, mode='mirror') to fp32
    precision.
    """
    z = _CUBIC_POLE
    axis = axis % x.ndim
    n = x.shape[axis]
    if n == 1:
        return x
    x = jnp.moveaxis(x, axis, 0)
    gain = (1.0 - z) * (1.0 - 1.0 / z)
    y = x * gain

    # causal init (mirror): c0 = y0 + sum_{k>=1} y_k z^k over a horizon
    horizon = min(n, int(np.ceil(np.log(1e-8) / np.log(abs(z)))) + 1)
    powers = (z ** np.arange(horizon)).astype(x.dtype)
    c0 = jnp.tensordot(jnp.asarray(powers), y[:horizon], axes=(0, 0))

    def causal(carry, yi):
        c = yi + z * carry
        return c, c

    _, cp_rest = jax.lax.scan(causal, c0, y[1:])
    cp = jnp.concatenate([c0[None], cp_rest], axis=0)

    # anticausal init (mirror): c_minus[n-1] = z/(z^2-1) * (cp[n-1] + z cp[n-2])
    cm_last = (z / (z * z - 1.0)) * (cp[n - 1] + z * cp[n - 2])

    def anticausal(carry, ci):
        c = z * (carry - ci)
        return c, c

    _, cm_rest = jax.lax.scan(anticausal, cm_last, cp[: n - 1], reverse=True)
    out = jnp.concatenate([cm_rest, cm_last[None]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def spline_filter(x: jnp.ndarray) -> jnp.ndarray:
    """Cubic B-spline prefilter along every axis."""
    for ax in range(x.ndim):
        x = spline_filter1d(x, axis=ax)
    return x


def _cubic_weights(t):
    """B-spline basis values at offsets (-1, 0, 1, 2) for fraction t in [0,1)."""
    t2 = t * t
    t3 = t2 * t
    w0 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0
    w1 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0
    w2 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0
    w3 = t3 / 6.0
    return (w0, w1, w2, w3)


def map_coordinates(
    input: jnp.ndarray,
    coordinates,
    order: int = 1,
    mode: str = "constant",
    cval: float = 0.0,
    prefilter: bool = True,
) -> jnp.ndarray:
    """Evaluate *input* at fractional *coordinates* (scipy convention).

    coordinates: array-like of shape (ndim, ...). Supported orders: 0
    (nearest), 1 (linear), 3 (cubic B-spline). Modes: constant, nearest,
    mirror, reflect, wrap.

    Jit-compiled (cached on shapes + the static kwargs): eagerly, the
    order-3 prefilter's lax.scan dispatches per step — on the tunneled
    TPU each step is a full host round trip (measured ~0.5 s for one
    128x256 resample; see docs/PROFILE.md "Host-pipeline fixes").
    Calling this inside an enclosing jit is unchanged (nested jit is
    inlined into the outer trace).
    """
    return _map_coordinates_jit(
        jnp.asarray(input),
        tuple(jnp.asarray(c, jnp.float32) for c in coordinates),
        order=int(order),
        mode=str(mode),
        # cval stays uncoerced: it is a DYNAMIC jit argument, so traced
        # fill values (vmap over per-sample cval) keep working
        cval=cval,
        prefilter=bool(prefilter),
    )


@functools.partial(jax.jit, static_argnames=("order", "mode", "prefilter"))
def _map_coordinates_jit(
    input: jnp.ndarray,
    coordinates,
    order: int = 1,
    mode: str = "constant",
    cval: float = 0.0,
    prefilter: bool = True,
) -> jnp.ndarray:
    x = jnp.asarray(input)
    coords = [jnp.asarray(c, jnp.float32) for c in coordinates]
    assert len(coords) == x.ndim, "need one coordinate array per input dim"
    out_shape = jnp.broadcast_shapes(*(c.shape for c in coords))
    coords = [jnp.broadcast_to(c, out_shape) for c in coords]

    # scipy 'constant': a point whose coordinate falls outside [0, n-1]
    # in any dimension returns cval outright.
    in_domain = jnp.ones(out_shape, bool)
    if mode == "constant":
        for d, c in enumerate(coords):
            in_domain &= (c >= 0) & (c <= x.shape[d] - 1)

    if order == 0:
        idxs = []
        valid = jnp.ones(out_shape, bool)
        for d, c in enumerate(coords):
            # scipy's order=0 uses floor(x + 0.5), NOT round-half-even:
            # exact .5 coordinates must pick the upper pixel
            i = jnp.floor(c + 0.5).astype(jnp.int32)
            fix = _index_fixer(mode, x.shape[d])
            i, ok = fix(i)
            idxs.append(i)
            valid &= ok
        vals = x[tuple(idxs)]
        if mode == "constant":
            vals = jnp.where(valid & in_domain, vals, cval)
        return vals

    if order == 1:
        lo_list, frac_list = [], []
        for c in coords:
            f = jnp.floor(c)
            lo_list.append(f.astype(jnp.int32))
            frac_list.append(c - f)
        # accumulate in floating point ALWAYS: an integer accumulator
        # would truncate the bilinear weights (0.5 -> 0) and return zeros
        acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
        out = jnp.zeros(out_shape, acc_dtype)
        for corner in range(2 ** x.ndim):
            w = jnp.ones(out_shape, jnp.float32)
            idxs = []
            valid = jnp.ones(out_shape, bool)
            for d in range(x.ndim):
                hi = (corner >> d) & 1
                i = lo_list[d] + hi
                w = w * (frac_list[d] if hi else (1.0 - frac_list[d]))
                fix = _index_fixer(mode, x.shape[d])
                i, ok = fix(i)
                idxs.append(i)
                valid &= ok
            vals = x[tuple(idxs)]
            if mode == "constant":
                vals = jnp.where(valid, vals, cval)
            out = out + vals.astype(out.dtype) * w.astype(out.dtype)
        if mode == "constant":
            out = jnp.where(in_domain, out, cval)
        if jnp.issubdtype(x.dtype, jnp.integer):
            # scipy casts with round-half-AWAY for integer inputs
            # (2.5 -> 3, -2.5 -> -3; jnp.round would give banker's 2)
            out = (jnp.sign(out) * jnp.floor(jnp.abs(out) + 0.5)).astype(x.dtype)
        else:
            out = out.astype(x.dtype)
        return out

    if order == 3:
        # scipy's 'constant' mode mirror-extends the spline coefficients for
        # window samples that cross the edge; cval applies only to points
        # whose coordinate is out of domain (handled by in_domain below).
        sample_mode = "mirror" if mode == "constant" else mode
        cx = spline_filter(x) if prefilter else x
        lo_list, w_list = [], []
        for c in coords:
            f = jnp.floor(c)
            lo_list.append(f.astype(jnp.int32))
            w_list.append(_cubic_weights(c - f))
        out = jnp.zeros(out_shape, jnp.promote_types(x.dtype, jnp.float32))
        for corner in range(4 ** x.ndim):
            w = jnp.ones(out_shape, jnp.float32)
            idxs = []
            valid = jnp.ones(out_shape, bool)
            rem = corner
            for d in range(x.ndim):
                o = rem % 4
                rem //= 4
                i = lo_list[d] + (o - 1)
                w = w * w_list[d][o]
                fix = _index_fixer(sample_mode, x.shape[d])
                i, ok = fix(i)
                idxs.append(i)
                valid &= ok
            vals = cx[tuple(idxs)]
            out = out + vals.astype(out.dtype) * w.astype(out.dtype)
        if mode == "constant":
            out = jnp.where(in_domain, out, cval)
        return out.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else out

    raise ValueError(f"order={order} not supported (use 0, 1, or 3)")


@functools.partial(jax.jit, static_argnames=("fill",))
def linear_gather_2d(img, yy, xx, fill: float = 0.0):
    """Bilinear sample of a 2D image at (yy, xx); out-of-bounds -> fill."""
    return map_coordinates(img, (yy, xx), order=1, mode="constant", cval=fill)


def trilinear_gather_3d(vol, zz, yy, xx, fill: float = 0.0):
    """Trilinear sample of a 3D volume at (zz, yy, xx); OOB -> fill."""
    return map_coordinates(vol, (zz, yy, xx), order=1, mode="constant", cval=fill)
