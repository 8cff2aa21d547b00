"""MXU-native separable projection/symmetry operators (tilt = psi = 0).

When the candidate pose has no out-of-plane tilt or in-plane psi (the
entire (twist, rise) grid search — app.py:2360-2363 fixes tilt=psi=dy=0),
the per-copy sampling transform factorizes:

    z' = s.i - h.rise                      (image column i only)
    (x', y') = R(theta).(-s.k, s.j - dy)   ((j, k) only)

and the ray sum over k commutes with the linear interpolation, so one
symmetry copy of the projection operator collapses to two small dense
matmuls:

    P_t(x)[i, j] = (Mz_t @ X @ Wsum_t^T)[i, j],  X = x as (l3, d3*d3)

with Mz_t (l2, l3) the 2-tap z-interpolation matrix and
Wsum_t (d2, d3*d3) the in-plane bilinear matrix *pre-summed over the ray
parameter k* (weights of invalid taps are 0, so validity is built in).
Both matrices are x-independent: they are precomputed once per candidate
(~12 MB for all copies) and every CG/FISTA matvec is then a single pair
of batched einsums on the MXU — no gathers, no scatters.

The symmetry-pair operator factorizes the same way on the volume grid but
has no ray sum; its (d3^2, d3^2) in-plane matrices are rebuilt inside the
scan (cheap VPU compares) to bound memory.

Semantics are identical to projector.build_problem with tilt = psi = 0
(tested against both the gather operators and the explicit-matrix oracle
in tests/test_denovo3d.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_problem_separable", "make_copy_wsum", "plane_shift_tables"]


def _z_interp_matrix(z_pos, l3: int, linear: bool):
    """(n_z_out, l3) interpolation matrix for positions z_pos (traced).

    linear: 2-tap floor/ceil weights, valid when floor in [0, l3-2]
    (matching the trilinear corner test along z); nn: 1-tap round, valid
    when round in [0, l3-1].
    """
    rows = z_pos.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, l3), 1)
    if linear:
        zf = jnp.floor(z_pos)
        zi = zf.astype(jnp.int32)[:, None]
        wz = (z_pos - zf)[:, None]
        ok = ((zi >= 0) & (zi <= l3 - 2)).astype(jnp.float32)
        m = (cols == zi) * (1.0 - wz) + (cols == zi + 1) * wz
        return m * ok
    zi = jnp.round(z_pos).astype(jnp.int32)[:, None]
    ok = ((zi >= 0) & (zi <= l3 - 1)).astype(jnp.float32)
    return (cols == zi).astype(jnp.float32) * ok


def plane_shift_tables(plane_ok_2d: np.ndarray) -> dict:
    """Statically shifted copies of the in-plane validity cross-section.

    For a sample whose base cell is (gy - oy, gx - ox), the plane_ok
    lookup becomes an elementwise read of shifted_ok[oy, ox] at the
    RECEIVING cell — no gathers per tap (see make_copy_wsum)."""
    d3 = plane_ok_2d.shape[0]
    tbl = {}
    for oy in (0, 1):
        for ox in (0, 1):
            sh = np.zeros((d3, d3), np.float32)
            sh[oy:, ox:] = plane_ok_2d[: d3 - oy, : d3 - ox]
            tbl[(oy, ox)] = jnp.asarray(sh.reshape(-1))
    return tbl


def make_copy_wsum(
    d2: int,
    d3: int,
    s: float,
    dy_pixel,
    linear: bool,
    plane_ok_flat,
    shift_tbl: dict,
):
    """Scatter-free Wsum builder factored out of build_problem_separable
    so the twist-grouped path (projector_grouped.py) can share it.

    Returns ``wsum_of_theta(th) -> (d2, d3*d3)`` — the in-plane bilinear
    deposit matrix pre-summed over the ray parameter, WITHOUT the
    copy-validity factor (callers multiply by cv / multiplicity weights).

    Receiving-cell evaluation: the samples of row j lie on the line
    P(kc) = C_j + kc * D with D = (-s cos, s sin), |D| = s, so the ks
    that can deposit weight into a cell g lie within a tight window of
    kc* = (g - C_j) . D / s^2; taps beyond the bound contribute exactly
    0 (see the derivation in build_problem_separable's original
    comment/git history) — no scatters (TPU scatters serialize).
    """
    if linear:
        n_taps = int(np.ceil(np.sqrt(2.0) / max(s, 1e-6) + 0.5))
    else:
        n_taps = int(np.ceil(np.sqrt(0.5) / max(s, 1e-6) + 0.5))
    gx_cell = jax.lax.broadcasted_iota(jnp.float32, (d3, d3), 1).reshape(-1)
    gy_cell = jax.lax.broadcasted_iota(jnp.float32, (d3, d3), 0).reshape(-1)
    jc_rows = jnp.arange(d2, dtype=jnp.float32) - d2 // 2

    def wsum_of_theta(th):
        cs, sn = jnp.cos(th), jnp.sin(th)
        dx, dy_ = -s * cs, s * sn
        y0j = s * jc_rows - dy_pixel  # (d2,)
        cx = y0j * sn + d3 // 2  # (d2,) X at kc=0
        cy = y0j * cs + d3 // 2
        # (d2, d3^2) projection of each cell onto each row's ray
        kc_star = (
            (gx_cell[None, :] - cx[:, None]) * dx
            + (gy_cell[None, :] - cy[:, None]) * dy_
        ) / (s * s)
        k0 = jnp.round(kc_star)
        Wsum = jnp.zeros((d2, d3 * d3), jnp.float32)
        for delta in range(-n_taps, n_taps + 1):
            kc = k0 + delta
            ink = (kc >= -(d2 // 2)) & (kc <= d2 - 1 - d2 // 2)
            X = cx[:, None] + kc * dx
            Y = cy[:, None] + kc * dy_
            if linear:
                xi = jnp.floor(X).astype(jnp.int32)
                yi = jnp.floor(Y).astype(jnp.int32)
                inb = (xi >= 0) & (xi <= d3 - 2) & (yi >= 0) & (yi <= d3 - 2)
                # base-cell validity via the statically shifted planes,
                # selected by the receiving-cell offset (gx-xi, gy-yi)
                dxi = gx_cell[None, :].astype(jnp.int32) - xi
                dyi = gy_cell[None, :].astype(jnp.int32) - yi
                cellok_val = jnp.zeros_like(X)
                for oy in (0, 1):
                    for ox in (0, 1):
                        sel = (dxi == ox) & (dyi == oy)
                        cellok_val = jnp.where(
                            sel, shift_tbl[(oy, ox)][None, :], cellok_val
                        )
                ok = inb & (cellok_val > 0.5) & ink
                w = (
                    jnp.maximum(0.0, 1.0 - jnp.abs(X - gx_cell[None, :]))
                    * jnp.maximum(0.0, 1.0 - jnp.abs(Y - gy_cell[None, :]))
                )
            else:
                xi = jnp.round(X).astype(jnp.int32)
                yi = jnp.round(Y).astype(jnp.int32)
                inb = (xi >= 0) & (xi <= d3 - 1) & (yi >= 0) & (yi <= d3 - 1)
                # exact: the sample's rounded cell must BE this cell, so
                # the mask lookup is the receiving cell's own value
                same = (xi == gx_cell[None, :].astype(jnp.int32)) & (
                    yi == gy_cell[None, :].astype(jnp.int32)
                )
                ok = inb & same & (plane_ok_flat[None, :] > 0.5) & ink
                w = jnp.ones_like(X)
            Wsum = Wsum + w * ok.astype(jnp.float32)
        return Wsum

    return wsum_of_theta


def _xy_interp_matrix(X, Y, d3: int, plane_ok_flat, linear: bool):
    """(n_pts, d3*d3) in-plane interpolation matrix at (X, Y) positions.

    plane_ok_flat (d3*d3,): per-cell validity of the cylindrical-mask
    cross-section (the mask is z-independent inside the volume), already
    the "all corners in mask" cell test for the linear path.
    Returns (matrix, point_valid).
    """
    n = X.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, d3 * d3), 1)
    if linear:
        xf = jnp.floor(X)
        yf = jnp.floor(Y)
        xi = xf.astype(jnp.int32)
        yi = yf.astype(jnp.int32)
        wx = (X - xf)[:, None]
        wy = (Y - yf)[:, None]
        inb = (xi >= 0) & (xi <= d3 - 2) & (yi >= 0) & (yi <= d3 - 2)
        xi = jnp.clip(xi, 0, d3 - 2)
        yi = jnp.clip(yi, 0, d3 - 2)
        base = (yi * d3 + xi)[:, None]
        cellok = plane_ok_flat[jnp.clip(base[:, 0], 0, d3 * d3 - 1)]
        ok = (inb.astype(jnp.float32) * cellok)[:, None]
        m = (
            (cols == base) * (1 - wy) * (1 - wx)
            + (cols == base + 1) * (1 - wy) * wx
            + (cols == base + d3) * wy * (1 - wx)
            + (cols == base + d3 + 1) * wy * wx
        )
        return m * ok, ok[:, 0] > 0
    xi = jnp.round(X).astype(jnp.int32)
    yi = jnp.round(Y).astype(jnp.int32)
    inb = (xi >= 0) & (xi <= d3 - 1) & (yi >= 0) & (yi <= d3 - 1)
    xi = jnp.clip(xi, 0, d3 - 1)
    yi = jnp.clip(yi, 0, d3 - 1)
    idx = (yi * d3 + xi)[:, None]
    ok = (inb.astype(jnp.float32) * plane_ok_flat[idx[:, 0]])[:, None]
    return (cols == idx).astype(jnp.float32) * ok, ok[:, 0] > 0


def build_problem_separable(
    geom,
    image_region,
    twist_degree,
    rise_pixel,
    copies_h,
    copies_c,
    copies_valid,
    pairs_hc,
    pairs_valid,
    dy_pixel=0.0,
    interpolation: str = "nn",
    mask=None,
    cellok=None,
    compute_dtype=None,
    pair_ops=None,
    sym_keep=None,
):
    """Assemble (P, PT, S, ST, b, row_valid, mask) — MXU formulation.

    Semantics identical to projector.build_problem with tilt = psi = 0.
    pair_ops: optional (ops_hc [O, 2], ops_valid [O], pair_idx [P, 2])
    from geometry.select_pair_ops — S then samples each distinct symmetry
    op once per matvec and combines pairs by indexing (the 10-ish pairs
    typically share ~5 ops, halving the sym-term gathers).
    sym_keep: optional (P, l3, d3, d3) bool from
    geometry.compute_sym_dedup_mask — drops duplicate voxel-pair
    constraints to match the reference's nn sym-row dedup
    (solver_linear_regression: pair_ids first-occurrence set).
    """
    d2, l2, d3, l3 = geom.d2, geom.l2, geom.d3, geom.l3
    s = geom.scale2d_to_3d
    csym = geom.csym
    linear = interpolation.startswith("linear")
    cdt = compute_dtype or jnp.float32

    mask_np = np.asarray(mask, bool)
    cell_np = np.asarray(cellok, bool)
    # the cylindrical mask/cell test is z-independent in the volume
    # interior; take the cross-section used by the sampling tests.
    if linear:
        plane_ok = cell_np[: max(1, l3 - 1)].any(axis=0)
    else:
        plane_ok = mask_np.any(axis=0)
    plane_ok_flat = jnp.asarray(plane_ok.reshape(-1), jnp.float32)
    mask_f = jnp.asarray(mask_np, jnp.float32)

    ic = jnp.arange(l2, dtype=jnp.float32) - l2 // 2  # z along the image

    theta = jnp.deg2rad(
        twist_degree * copies_h.astype(jnp.float32)
        + 360.0 * copies_c.astype(jnp.float32) / csym
    )
    dz = copies_h.astype(jnp.float32) * rise_pixel

    # --- scatter-free Wsum: receiving-cell evaluation -------------------
    # Tap-window derivation and the shifted-validity-plane trick live in
    # make_copy_wsum / plane_shift_tables (shared with the twist-grouped
    # path in projector_grouped.py, where one Wsum set serves every
    # same-twist candidate).
    plane_ok_2d = np.asarray(plane_ok, bool).reshape(d3, d3)
    _shift_tbl = plane_shift_tables(plane_ok_2d)
    _wsum_of_theta = make_copy_wsum(
        d2, d3, s, dy_pixel, linear, plane_ok_flat, _shift_tbl
    )

    def copy_wsum_direct(th, dzc, cv):
        return _wsum_of_theta(th) * cv.astype(jnp.float32)

    def copy_mats(th, dzc, cv):
        """Build (Wsum, Mz, row_valid) for one copy — fully gather-free.

        Row validity falls out of Wsum itself: row j has >= 1 valid
        sample iff its Wsum row deposits any weight (nn deposits 1 per
        valid sample; linear deposits bilinear weights summing to
        exactly 1 per valid sample — same in-bounds + base-cell-valid
        test as the per-sample formulation). The previous per-sample
        recomputation did a 784-point plane_ok gather per copy, which
        serialized on TPU and dominated the whole operator build
        (567 of 620 us/candidate, 2026-08-17 DCE-split measurement).
        """
        cvf = cv.astype(jnp.float32)
        Wsum = copy_wsum_direct(th, dzc, cv)
        Mz = _z_interp_matrix(s * ic - dzc + l3 // 2, l3, linear) * cvf
        xy_any = (jnp.sum(Wsum, axis=1) > 0) & cv  # per row j
        z_ok = jnp.sum(Mz, axis=1) > 0
        row_valid = (z_ok[:, None] & xy_any[None, :]) & cv  # (l2, d2)
        return Wsum, Mz, row_valid

    # precompute all per-copy matrices once: x-independent, reused by
    # every CG/FISTA matvec. (C, d2, d3^2) + (C, l2, l3).
    Wsum_all, Mz_all, row_valid = jax.vmap(copy_mats)(theta, dz, copies_valid)
    Wsum_c = Wsum_all.astype(cdt)
    Mz_c = Mz_all.astype(cdt)

    # Gram matrices of the z-interp factors: used to fuse P^T P into a
    # single pass (valid rows only — zero rows of Mz/Wsum already encode
    # the row validity, so no extra weighting is needed).
    Gz = jax.lax.dot_general(
        Mz_c, Mz_c, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(cdt)  # (C, l3, l3)

    def PTP(x_vol):
        """Fused normal operator of the data term: P^T(P(x)) in one pass
        (~2x cheaper than composing P with its vjp)."""
        X2 = x_vol.reshape(l3, d3 * d3).astype(cdt)
        t = jax.lax.dot_general(
            Wsum_c, X2, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (C, d2, l3)
        u = jax.lax.dot_general(
            t, Gz, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (C, d2, l3)
        # out[m, d] = sum_cj Wsum[c, j, d] * u[c, j, m]
        out = jax.lax.dot_general(
            u.reshape(-1, l3), Wsum_c.reshape(-1, d3 * d3),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (l3, d3^2)
        return out.reshape(l3, d3, d3)

    def P(x_vol):
        # Contraction order matters: collapsing the (large) d3^2 axis
        # FIRST keeps every intermediate tiny —
        #   tmp  = Wsum (C, d2, d3^2) . X (l3, d3^2)^T   -> (C, d2, l3)
        #   pred = Mz (C, l2, l3) . tmp^T                -> (C, l2, d2)
        # vs the naive (Mz @ X) @ Wsum^T whose (C, l2, d3^2) intermediate
        # is ~50 MB per matvec and HBM-bandwidth bound.
        X2 = x_vol.reshape(l3, d3 * d3).astype(cdt)
        tmp = jax.lax.dot_general(
            Wsum_c, X2, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (C, d2, l3)
        pred = jax.lax.dot_general(
            Mz_c, tmp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C, l2, d2)
        return pred

    # symmetry pairs on the volume grid: same factorization but sampled
    # with small trilinear gathers (only l3 * d3^2 points per op — cheap,
    # and avoids rebuilding (d3^2, d3^2) compare-matrices every matvec).
    from .projector import _sample_linear, _sample_nn

    zc3 = (jnp.arange(l3, dtype=jnp.float32) - l3 // 2)[:, None, None]
    yc3 = (jnp.arange(d3, dtype=jnp.float32) - d3 // 2)[None, :, None]
    xc3 = (jnp.arange(d3, dtype=jnp.float32) - d3 // 2)[None, None, :]
    gX0 = jnp.broadcast_to(xc3, (l3, d3, d3))
    gY0 = jnp.broadcast_to(yc3, (l3, d3, d3))
    gZ0 = jnp.broadcast_to(zc3, (l3, d3, d3))
    sym_sample = _sample_linear if linear else _sample_nn
    sym_aux_flat = jnp.asarray(
        (cell_np if linear else mask_np).astype(np.float32).reshape(-1)
    )
    mask_flat_f = mask_f.reshape(-1)

    def _op_sample(xf, h, c):
        th = jnp.deg2rad(
            twist_degree * h.astype(jnp.float32)
            + 360.0 * c.astype(jnp.float32) / csym
        )
        cs, sn = jnp.cos(th), jnp.sin(th)
        # forward z-rotation: (x, y) -> (x c - y s, x s + y c)
        X = (gX0 * cs - gY0 * sn) + d3 // 2
        Y = (gX0 * sn + gY0 * cs) + d3 // 2
        Z = (gZ0 + h.astype(jnp.float32) * rise_pixel) + l3 // 2
        return sym_sample(xf, sym_aux_flat, Z, Y, X, d3, l3)

    # The dense matmul-S matrices cost n_ops * d3^4 elements per
    # candidate; past ~32 MB the HBM bill (x batch) outweighs the
    # scatter savings, so fall back to the gather op-table formulation.
    n_ops_static = int(pair_ops[0].shape[0]) if pair_ops is not None else 0
    use_matmul_sym = (
        pair_ops is not None
        and n_ops_static * (d3**4) * 2 <= 32 * 1024 * 1024
    )

    if pair_ops is not None and use_matmul_sym:
        ops_hc, ops_valid, pair_idx = pair_ops

        # The symmetry ops factorize like P does: a z-shift (l3, l3)
        # matrix (x) an in-plane rotation (d3^2, d3^2) matrix, both
        # x-independent. Precomputing them turns every S and S^T matvec
        # into two dense dot_generals — NO gathers, and crucially no
        # scatters in the vjp (TPU scatters serialize and dominated the
        # CG/FISTA iteration in the gather formulation).
        yc2 = (jnp.arange(d3, dtype=jnp.float32) - d3 // 2)[:, None]
        xc2 = (jnp.arange(d3, dtype=jnp.float32) - d3 // 2)[None, :]
        pX0 = jnp.broadcast_to(xc2, (d3, d3)).reshape(-1)
        pY0 = jnp.broadcast_to(yc2, (d3, d3)).reshape(-1)
        z_pos0 = jnp.arange(l3, dtype=jnp.float32)

        def _op_mats(h, c):
            th = jnp.deg2rad(
                twist_degree * h.astype(jnp.float32)
                + 360.0 * c.astype(jnp.float32) / csym
            )
            cs, sn = jnp.cos(th), jnp.sin(th)
            Xp = (pX0 * cs - pY0 * sn) + d3 // 2
            Yp = (pX0 * sn + pY0 * cs) + d3 // 2
            Mxy, xy_ok = _xy_interp_matrix(Xp, Yp, d3, plane_ok_flat, linear)
            Mz = _z_interp_matrix(z_pos0 + h.astype(jnp.float32) * rise_pixel,
                                  l3, linear)
            z_ok = jnp.sum(Mz, axis=1) > 0
            return Mz, Mxy, z_ok, xy_ok

        Mz_ops, Mxy_ops, z_ok_ops, xy_ok_ops = jax.vmap(_op_mats)(
            ops_hc[:, 0], ops_hc[:, 1]
        )
        Mz_ops = Mz_ops.astype(cdt)
        Mxy_ops = Mxy_ops.astype(cdt)
        op_ok = (
            (z_ok_ops[:, :, None] & xy_ok_ops[:, None, :]).reshape(
                -1, l3, d3, d3
            )
            & ops_valid[:, None, None, None]
        )
        pair_ok = (
            op_ok[pair_idx[:, 0]]
            & op_ok[pair_idx[:, 1]]
            & (mask_f > 0.5)[None]
            & pairs_valid[:, None, None, None]
        )
        if sym_keep is not None:
            pair_ok = pair_ok & sym_keep
        pair_ok_f = pair_ok.astype(jnp.float32)

        def S(x_vol):
            X2 = x_vol.reshape(l3, d3 * d3).astype(cdt)
            # tmp[o, p, m'] = sum_d Mxy[o, p, d] X[m', d]
            tmp = jax.lax.dot_general(
                Mxy_ops, X2, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)  # (O, P, l3)
            # vals[o, m, p] = sum_m' Mz[o, m, m'] tmp[o, p, m']
            vals = jax.lax.dot_general(
                Mz_ops, tmp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (O, l3, P)
            vals = vals.reshape(-1, l3, d3, d3)
            v1 = vals[pair_idx[:, 0]]
            v2 = vals[pair_idx[:, 1]]
            return (v1 - v2) * pair_ok_f

    else:
        # gather formulation: used when pair_ops is absent OR the dense
        # matrices would be too large (see use_matmul_sym above)

        # sym_keep=None must not bake an all-True (P, l3, d3, d3) tensor
        # into the executable (see projector.sym_operator)
        _keep = None if sym_keep is None else jnp.asarray(sym_keep, bool)

        def S(x_vol):
            xf = x_vol.reshape(-1)

            def one(carry, hp):
                hc, pv = hp[0], hp[1]
                v1, ok1 = _op_sample(xf, hc[0], hc[1])
                v2, ok2 = _op_sample(xf, hc[2], hc[3])
                valid = ok1 & ok2 & (mask_f > 0.5) & pv
                if _keep is not None:
                    valid = valid & hp[2]
                return carry, (v1 - v2) * valid.astype(jnp.float32)

            xs = (
                (pairs_hc, pairs_valid)
                if _keep is None
                else (pairs_hc, pairs_valid, _keep)
            )
            _, res = jax.lax.scan(one, 0.0, xs)
            return res  # (n_pairs, l3, d3, d3)

    vol_shape = geom.volume_shape
    _, PT_vjp = jax.vjp(P, jnp.zeros(vol_shape, jnp.float32))
    _, ST_vjp = jax.vjp(S, jnp.zeros(vol_shape, jnp.float32))
    b = jnp.asarray(image_region, jnp.float32).T
    ops = dict(
        P=P,
        PT=lambda r: PT_vjp(r)[0],
        PTP=PTP,
        S=S,
        ST=lambda r: ST_vjp(r)[0],
        b=b,
        row_valid=row_valid,
        mask=mask_f > 0.5,
    )
    if pair_ops is not None and use_matmul_sym:
        # raw factor arrays for the fused Pallas solve kernel
        # (pallas_solver.py): the SAME tensors the closures above close
        # over, so both formulations are numerically identical inputs
        ops["factors"] = dict(
            Wsum=Wsum_c,          # (C, d2, d3^2) compute dtype
            Gz=Gz,                # (C, l3, l3) z-Gram per copy
            Mz=Mz_all,            # (C, l2, l3) f32 z-interp per copy
            Mz_ops=Mz_ops,        # (O, l3, l3)
            Mxy_ops=Mxy_ops,      # (O, d3^2, d3^2)
            pair_idx=pair_idx,    # (P, 2) int32
            pair_ok=pair_ok_f,    # (P, l3, d3, d3) f32
            mask=mask_f,          # (l3, d3, d3) f32
            plane_ok=plane_ok_flat,  # (d3^2,) f32 in-plane cell mask
        )
    return ops
