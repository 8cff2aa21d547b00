"""Local refinement of (tilt, psi, dy) for a denovo3D candidate.

Reference: solver_linear_regression.py refine_tilt_psi_dy (550-841) —
Gauss-Newton with finite-difference Jacobians obtained by rebuilding the
sparse system per perturbed parameter. Here the residual is the
matrix-free data term, so the Jacobian w.r.t. the three pose parameters
comes from forward-mode autodiff (jax.jacfwd: 3 JVPs, no rebuilds), with
the density x held fixed during each Gauss-Newton step exactly like the
reference; x is re-solved between outer iterations.

The nn interpolation path is piecewise constant (zero gradient), so
refinement always uses the linear path for the pose Jacobian, matching
the reference's use of finite differences over the same objective.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .projector import build_problem

__all__ = ["refine_tilt_psi_dy"]


@functools.partial(jax.jit, static_argnames=("geom", "cfg"))
def _gn_step(
    geom,
    cfg,
    image_region,
    twist_degree,
    rise_pixel,
    copies,
    pairs,
    x_vol,
    params,
):
    """One damped Gauss-Newton step on (tilt, psi, dy), x fixed."""
    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    ch, cc, cv = copies
    phc, pv = pairs
    interp = "linear" if not cfg.interpolation.startswith("linear") else cfg.interpolation

    def residual(p):
        ops = build_problem(
            geom,
            image_region,
            twist_degree,
            rise_pixel,
            ch,
            cc,
            cv,
            phc,
            pv,
            p[0],
            p[1],
            p[2],
            interp,
            mask,
            cellok,
        )
        rowv = ops["row_valid"].astype(jnp.float32)
        return ((ops["P"](x_vol) - ops["b"][None]) * rowv).ravel()

    r = residual(params)
    J = jax.jacfwd(residual)(params)  # (n_res, 3)
    JtJ = J.T @ J + 1e-6 * jnp.eye(3)
    g = J.T @ r
    step = jnp.linalg.solve(JtJ, g)
    return params - step, jnp.vdot(r, r)


def refine_tilt_psi_dy(
    geom,
    cfg,
    image_region,
    twist_degree: float,
    rise_pixel: float,
    copies,
    pairs,
    tilt0: float,
    psi0: float,
    dy0: float,
    r_range: dict,
):
    """Alternate GN pose steps and density re-solves; return best pose.

    r_range keys as the reference (solver:383-424): tilt/psi/dy bounds,
    max_iter (outer iterations, default 5).
    """
    from .solver import solve_candidate

    max_iter = int(r_range.get("max_iter", 5))

    def _bounds(v, default):
        # scalar half-width (our grid callers) OR explicit (lo, hi)
        # tuple (the reference's bounds_tilt/psi/dy form)
        if isinstance(v, (tuple, list, np.ndarray)):
            return float(v[0]), float(v[1])
        b = float(default if v is None else v)
        return -b, b

    lo_t, hi_t = _bounds(r_range.get("tilt", 30.0), 30.0)
    lo_p, hi_p = _bounds(r_range.get("psi", 45.0), 45.0)
    lo_d, hi_d = _bounds(r_range.get("dy", 5.0), 5.0)
    lo = np.array([lo_t, lo_p, lo_d], np.float32)
    hi = np.array([hi_t, hi_p, hi_d], np.float32)

    params = np.array([tilt0, psi0, dy0], np.float32)
    region = jnp.asarray(image_region, jnp.float32)
    ch, cc, cv = (jnp.asarray(a) for a in copies)
    phc, pv = (jnp.asarray(a) for a in pairs)

    best = (params.copy(), -np.inf)
    for _ in range(max_iter):
        out = solve_candidate(
            geom,
            cfg,
            region,
            jnp.float32(twist_degree),
            jnp.float32(rise_pixel),
            ch,
            cc,
            cv,
            phc,
            pv,
            jnp.float32(params[0]),
            jnp.float32(params[1]),
            jnp.float32(params[2]),
        )
        score = float(out["score"])
        if score > best[1]:
            best = (params.copy(), score)
        new_params, _ = _gn_step(
            geom,
            cfg,
            region,
            jnp.float32(twist_degree),
            jnp.float32(rise_pixel),
            (ch, cc, cv),
            (phc, pv),
            out["rec3d"],
            jnp.asarray(params),
        )
        params = np.clip(np.asarray(new_params, np.float32), lo, hi)
        if np.allclose(params, best[0], atol=1e-4):
            break
    return float(best[0][0]), float(best[0][1]), float(best[0][2])
