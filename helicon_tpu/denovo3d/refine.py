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

__all__ = ["refine_tilt_psi_dy", "refine_all_candidates"]


def _pose_bounds(r_range: dict) -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) float32 triples for (tilt, psi, dy) from a refine-range
    dict: scalar half-width (our grid callers) OR explicit (lo, hi)
    tuple (the reference's bounds_tilt/psi/dy form)."""

    def one(v, default):
        if isinstance(v, (tuple, list, np.ndarray)):
            return float(v[0]), float(v[1])
        b = float(default if v is None else v)
        return -b, b

    lo_t, hi_t = one(r_range.get("tilt", 30.0), 30.0)
    lo_p, hi_p = one(r_range.get("psi", 45.0), 45.0)
    lo_d, hi_d = one(r_range.get("dy", 5.0), 5.0)
    return (
        np.array([lo_t, lo_p, lo_d], np.float32),
        np.array([hi_t, hi_p, hi_d], np.float32),
    )


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

    The nn-lsq-cosine default runs on the native C++ engine when
    available (same dispatch as refine_all_candidates — this is the
    winner-refinement path of refine_mode="topk" and the web app's
    per-task refinement, where the engine's ~75x matters for
    interactivity). The engine's fixed-iteration loop additionally
    scores the final GN iterate (the Python loop stops at its early-
    exit check), which can only improve the returned best pose.
    """
    from .solver import solve_candidate

    max_iter = int(r_range.get("max_iter", 5))
    lo, hi = _pose_bounds(r_range)

    p0_in_bounds = bool(
        np.all((np.asarray([tilt0, psi0, dy0]) >= lo)
               & (np.asarray([tilt0, psi0, dy0]) <= hi))
    )
    # out-of-bounds start poses stay on the Python loop: it scores the
    # UNCLIPPED initial pose (and may return it), while the engine
    # clips first — dispatching would change the result
    if _native_refine_eligible(cfg) and p0_in_bounds:
        from ..native import load_refine_engine

        lib = load_refine_engine()
        if lib is not None:
            ch, cc, cv = (np.asarray(a) for a in copies)
            phc, pv = (np.asarray(a) for a in pairs)
            _, params1 = _refine_all_native(
                lib, geom, cfg, np.asarray(image_region, np.float32),
                np.asarray([twist_degree], np.float32),
                np.asarray([rise_pixel], np.float32),
                (ch[None], cc[None], cv[None], phc[None], pv[None]),
                tilt0, psi0, dy0, r_range,
            )
            return (
                float(params1[0, 0]),
                float(params1[0, 1]),
                float(params1[0, 2]),
            )

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


@functools.partial(
    jax.jit, static_argnames=("geom", "cfg", "n_iter")
)
def _refine_batch(
    geom, cfg, region, tw, ri, ch, cc, cv, phc, pv, p0, lo, hi,
    n_iter: int,
):
    """Vmapped fixed-iteration GN refinement of a candidate batch.

    Reference semantics (solver_linear_regression.py:550-841): every
    task refines its own pose. Implemented as a lax.scan of
    (solve -> GN step -> clip) with the best-so-far (params, score)
    carried, vmapped over candidates. Early-exit is dropped (fixed
    n_iter) so the whole batch stays one compiled program.
    Returns (best_params (n, 3), best_score (n,)).
    """
    from .solver import _solve_candidate_impl

    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    interp = (
        "linear" if not cfg.interpolation.startswith("linear")
        else cfg.interpolation
    )

    def one(tw1, ri1, ch1, cc1, cv1, phc1, pv1, p01):
        def residual(p, x_vol):
            ops = build_problem(
                geom, region, tw1, ri1, ch1, cc1, cv1, phc1, pv1,
                p[0], p[1], p[2], interp, mask, cellok,
            )
            rowv = ops["row_valid"].astype(jnp.float32)
            return ((ops["P"](x_vol) - ops["b"][None]) * rowv).ravel()

        def solve_at(p):
            out = _solve_candidate_impl(
                geom, cfg, region, tw1, ri1, ch1, cc1, cv1, phc1, pv1,
                p[0], p[1], p[2],
            )
            return out["score"], out["rec3d"]

        def body(carry, _):
            params, best_p, best_s = carry
            score, x_vol = solve_at(params)
            better = score > best_s
            best_p = jnp.where(better, params, best_p)
            best_s = jnp.maximum(score, best_s)
            r = residual(params, x_vol)
            J = jax.jacfwd(residual)(params, x_vol)
            JtJ = J.T @ J + 1e-6 * jnp.eye(3)
            step = jnp.linalg.solve(JtJ, J.T @ r)
            params = jnp.clip(params - step, lo, hi)
            return (params, best_p, best_s), None

        init = (p01, p01, jnp.float32(-jnp.inf))
        (params, best_p, best_s), _ = jax.lax.scan(
            body, init, None, length=n_iter
        )
        # score the final GN iterate too (the loop scores pre-step)
        score, _ = solve_at(params)
        better = score > best_s
        best_p = jnp.where(better, params, best_p)
        best_s = jnp.maximum(score, best_s)
        return best_p, best_s

    return jax.vmap(one)(tw, ri, ch, cc, cv, phc, pv, p0)


def _native_refine_eligible(cfg) -> bool:
    """Configs the C++ engine (native/refine_engine.cpp) implements
    exactly: the lsq + cosine default, both interpolation modes (nn and
    trilinear — the reference UI's default). Everything else keeps the
    JAX loop (full model/metric surface)."""
    import os

    if os.environ.get("HELICON_NATIVE_REFINE", "auto") == "0":
        return False
    return (
        cfg.score_metric == "cosine"
        and cfg.model == "lsq"
        and cfg.l1_reg == 0.0
        and cfg.l2_reg == 0.0
        and cfg.thresh_fraction < 0
        and cfg.fsc_test == 0
    )


def _refine_all_native(
    lib, geom, cfg, image_region, twists, rise_pixels, tables,
    tilt0, psi0, dy0, r_range,
):
    """Drive the C++ GN engine per candidate (host CPU; see
    refine_engine.cpp for why this beats both XLA backends here).
    Returns (scores (n,), params (n, 3)) like the JAX loop."""
    import ctypes

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def fp(a):
        return a.ctypes.data_as(f32p)

    n = len(twists)
    max_iter = int(r_range.get("max_iter", 5))
    lo, hi = _pose_bounds(r_range)
    ch, cc, cv, phc, pv = (np.asarray(t) for t in tables)
    region = np.ascontiguousarray(image_region, np.float32)
    mask = np.ascontiguousarray(
        np.asarray(geom.cylindrical_mask(), np.float32)
    )
    cellok = np.ascontiguousarray(
        np.asarray(geom.cell_valid_mask(), np.float32)
    )
    lo_c = np.ascontiguousarray(lo, np.float32)
    hi_c = np.ascontiguousarray(hi, np.float32)
    p0 = np.clip(np.array([tilt0, psi0, dy0], np.float32), lo, hi)
    scores = np.zeros(n, np.float32)
    params = np.zeros((n, 3), np.float32)
    out_pose = np.zeros(3, np.float32)
    out_score = np.zeros(1, np.float32)
    for idx in range(n):
        ch_i = np.ascontiguousarray(ch[idx], np.int32)
        cc_i = np.ascontiguousarray(cc[idx], np.int32)
        cv_i = np.ascontiguousarray(cv[idx], np.uint8)
        phc_i = np.ascontiguousarray(phc[idx], np.int32)
        pv_i = np.ascontiguousarray(pv[idx], np.uint8)
        rc = lib.helicon_refine_candidate(
            fp(region), fp(mask), fp(cellok),
            int(geom.d2), int(geom.l2), int(geom.d3), int(geom.l3),
            float(geom.scale2d_to_3d), int(geom.csym),
            float(twists[idx]), float(rise_pixels[idx]),
            ch_i.ctypes.data_as(i32p), cc_i.ctypes.data_as(i32p),
            cv_i.ctypes.data_as(u8p), int(ch_i.shape[0]),
            phc_i.ctypes.data_as(i32p), pv_i.ctypes.data_as(u8p),
            int(phc_i.shape[0]),
            int(cfg.interpolation.startswith("linear")),
            int(cfg.cg_iters), int(cfg.fista_iters),
            int(cfg.power_iters), int(cfg.positive_constraint),
            float(p0[0]), float(p0[1]), float(p0[2]),
            fp(lo_c), fp(hi_c), max_iter,
            fp(out_pose), fp(out_score),
        )
        if rc != 0:
            raise RuntimeError(f"native refine engine failed (rc={rc})")
        scores[idx] = out_score[0]
        params[idx] = out_pose
    return scores, params


def refine_all_candidates(
    geom,
    cfg,
    image_region,
    twists,
    rise_pixels,
    tables,
    tilt0: float,
    psi0: float,
    dy0: float,
    r_range: dict,
    batch_size: int = 32,
):
    """Reference-parity mode: GN-refine EVERY candidate's (tilt, psi,
    dy) inside the scored grid (reconstruct_grid(refine_mode="all")).

    tables: (ch, cc, cv, phc, pv) per-candidate arrays (leading axis n)
    from grid._candidate_tables. Returns (scores (n,), params (n, 3)).

    Dispatch: the nn-lsq-cosine default runs on the native C++ engine
    when it compiles (helicon_tpu/native/refine_engine.cpp — per-pose
    CSR sampling tables + dynamic validity pruning + analytic pose
    Jacobian; HELICON_NATIVE_REFINE=0 disables); every other config, or
    a missing toolchain, takes the vmapped JAX loop below.
    """
    if _native_refine_eligible(cfg):
        from ..native import load_refine_engine

        lib = load_refine_engine()
        if lib is not None:
            return _refine_all_native(
                lib, geom, cfg, np.asarray(image_region, np.float32),
                twists, rise_pixels, tables, tilt0, psi0, dy0, r_range,
            )

    n = len(twists)
    max_iter = int(r_range.get("max_iter", 5))
    lo, hi = _pose_bounds(r_range)
    ch, cc, cv, phc, pv = tables
    region = jnp.asarray(image_region, jnp.float32)
    p0 = np.clip(
        np.broadcast_to(
            np.array([tilt0, psi0, dy0], np.float32), (n, 3)
        ),
        lo, hi,
    ).copy()
    scores = np.zeros(n, np.float32)
    params = np.zeros((n, 3), np.float32)
    for s in range(0, n, batch_size):
        e = min(n, s + batch_size)
        # pad the tail batch to the compiled batch shape
        pad = batch_size - (e - s)
        sl = np.r_[np.arange(s, e), np.full(pad, e - 1)] if pad else np.arange(s, e)
        bp, bs = _refine_batch(
            geom, cfg, region,
            jnp.asarray(twists[sl]), jnp.asarray(rise_pixels[sl]),
            jnp.asarray(ch[sl]), jnp.asarray(cc[sl]), jnp.asarray(cv[sl]),
            jnp.asarray(phc[sl]), jnp.asarray(pv[sl]),
            jnp.asarray(p0[sl]), jnp.asarray(lo), jnp.asarray(hi),
            n_iter=max_iter,
        )
        scores[s:e] = np.asarray(bs)[: e - s]
        params[s:e] = np.asarray(bp)[: e - s]
    return scores, params
