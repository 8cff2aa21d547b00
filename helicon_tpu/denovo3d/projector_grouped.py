"""Twist-grouped separable operators: one Wsum/Mxy set per twist.

The (twist, rise) grid is Cartesian in practice, so many candidates share
a twist. Every *large* x-independent operator tensor of the separable
formulation depends on the in-plane rotation angles only —

    theta_copy = twist * h + 360 c / csym      (Wsum,   ~5.7 MB/candidate)
    theta_op   = twist * h + 360 c / csym      (Mxy_ops, ~6 MB/candidate)

— while the rise enters exclusively through the SMALL z-interpolation
matrices (Mz: (C, l2, l3); Mz_ops: (O, l3, l3)) and validity masks. A
group of R same-twist candidates therefore shares one Wsum/Mxy build, and
vmapping the per-candidate solve over the group turns every data/symmetry
GEMM's tiny N = l3 output axis into N = R * l3: at the flagship geometry
(l3 = 4) that multiplies MXU lane occupancy by R and divides the
per-candidate HBM traffic for the big tensors by R. See docs/PROFILE.md
("Why MFU is still < 1 %") for the measurement that motivated this.

Exact reference semantics are preserved (reference
solver_linear_regression.py:1561-1575 Halton copy selection): candidates
at different rises select different copy lists — including Halton
repeats/omissions — so copies are expressed in a per-group canonical
(h, c) table with per-candidate MULTIPLICITY counts m[k]. A copy listed
twice is a duplicated data-row block, i.e. row weight m in the normal
equations; scaling the candidate's z-interp factor and data rows by
sqrt(m) reproduces it exactly:

    A' = diag(sqrt(m_row)) A,  b' = diag(sqrt(m_row)) b
    => A'^T A' = A^T M A,  A'^T b' = A^T M b,  cos(A'x, b') = dup-row cos

Scope: the vmapped grid-scoring hot path, all score metrics. cosine
consumes the sqrt(m)-weighted rows directly (= duplicated-row cosine);
the 2D metrics (ssim/ms_ssim/mutual_information/composite) read raw
reprojection VALUES, so the scorer divides the weighting back out and
scatters last-copy-wins by each candidate's Halton rank table
(solver._candidate_score). The fsc/ard paths re-weight rows themselves;
grid.py gates those to the per-candidate path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .projector_separable import (
    _xy_interp_matrix,
    _z_interp_matrix,
    make_copy_wsum,
    plane_shift_tables,
)

__all__ = [
    "build_group_shared",
    "build_candidate_problem_grouped",
    "build_candidate_tensors_grouped",
]


def build_group_shared(
    geom,
    twist_degree,
    copies_h_u,
    copies_c_u,
    ops_h_u,
    ops_c_u,
    dy_pixel=0.0,
    interpolation: str = "nn",
    mask=None,
    cellok=None,
    compute_dtype=None,
):
    """Build the twist-only tensors shared by every candidate in a group.

    copies_h_u/copies_c_u (C_u,): the group's canonical copy table (the
    union of the member candidates' Halton-selected copies; traced, so
    one compilation serves every group). ops_h_u/ops_c_u (O_u,): the
    canonical symmetry-op enumeration (twist-independent, static).

    Returns a dict of shared tensors consumed by
    build_candidate_problem_grouped.
    """
    d2, l2, d3, l3 = geom.d2, geom.l2, geom.d3, geom.l3
    s = geom.scale2d_to_3d
    csym = geom.csym
    linear = interpolation.startswith("linear")
    cdt = compute_dtype or jnp.float32

    mask_np = np.asarray(mask, bool)
    cell_np = np.asarray(cellok, bool)
    if linear:
        plane_ok = cell_np[: max(1, l3 - 1)].any(axis=0)
    else:
        plane_ok = mask_np.any(axis=0)
    plane_ok_flat = jnp.asarray(plane_ok.reshape(-1), jnp.float32)
    shift_tbl = plane_shift_tables(plane_ok.reshape(d3, d3))

    theta_u = jnp.deg2rad(
        twist_degree * copies_h_u.astype(jnp.float32)
        + 360.0 * copies_c_u.astype(jnp.float32) / csym
    )
    wsum_of_theta = make_copy_wsum(
        d2, d3, s, dy_pixel, linear, plane_ok_flat, shift_tbl
    )
    Wsum_u = jax.vmap(wsum_of_theta)(theta_u)  # (C_u, d2, d3^2) f32
    # in-plane row validity is twist-only: row j of copy k has a valid
    # sample iff its Wsum row deposits weight (same recovery as
    # projector_separable.copy_mats)
    xy_any_u = jnp.sum(Wsum_u, axis=2) > 0  # (C_u, d2)

    # symmetry-op in-plane matrices (canonical enumeration, twist-only)
    yc2 = (jnp.arange(d3, dtype=jnp.float32) - d3 // 2)[:, None]
    xc2 = (jnp.arange(d3, dtype=jnp.float32) - d3 // 2)[None, :]
    pX0 = jnp.broadcast_to(xc2, (d3, d3)).reshape(-1)
    pY0 = jnp.broadcast_to(yc2, (d3, d3)).reshape(-1)

    def _op_xy(h, c):
        th = jnp.deg2rad(
            twist_degree * h.astype(jnp.float32)
            + 360.0 * c.astype(jnp.float32) / csym
        )
        cs, sn = jnp.cos(th), jnp.sin(th)
        Xp = (pX0 * cs - pY0 * sn) + d3 // 2
        Yp = (pX0 * sn + pY0 * cs) + d3 // 2
        return _xy_interp_matrix(Xp, Yp, d3, plane_ok_flat, linear)

    Mxy_u, xy_ok_u = jax.vmap(_op_xy)(ops_h_u, ops_c_u)

    # Fused normal-operator operand: the data rows (Wsum, C_u*d2 of them)
    # and the symmetry rows (Mxy, O_u*d3^2) stacked into ONE (rows, d3^2)
    # matrix, so the per-iteration matvec contracts x against both terms
    # in a single GEMM (and the transpose side in a second one) instead
    # of 8-10 separate dot_generals — the matvec is dispatch-latency
    # bound at these shapes (docs/PROFILE.md). x-independent, shared by
    # the whole group.
    A_top = jnp.concatenate(
        [
            Wsum_u.astype(cdt).reshape(-1, d3 * d3),
            Mxy_u.astype(cdt).reshape(-1, d3 * d3),
        ],
        axis=0,
    )

    return dict(
        Wsum=Wsum_u.astype(cdt),
        A_top=A_top,
        xy_any=xy_any_u,
        Mxy_ops=Mxy_u.astype(cdt),
        xy_ok_ops=xy_ok_u,  # (O_u, d3^2) bool
        mask_f=jnp.asarray(mask_np, jnp.float32),
        linear=linear,
        cdt=cdt,
        copies_h_u=copies_h_u,
        ops_h_u=ops_h_u,
    )


def build_candidate_problem_grouped(
    shared,
    geom,
    image_region,
    rise_pixel,
    sqrt_m,
    pair_idx,
    pairs_valid,
):
    """Per-candidate closures over the group's shared tensors.

    rise_pixel: traced scalar. sqrt_m (C_u,): sqrt of this candidate's
    copy multiplicities in the canonical table (0 = copy not selected).
    pair_idx (P, 2): indices into the canonical op table; pairs_valid (P,).

    Returns (ops, rowv_bin) where ops matches the build_problem_separable
    contract EXCEPT that P (and hence PT/PTP and the rhs) carries the
    sqrt(m) row weighting — callers mask predictions with the BINARY
    rowv_bin and weight b with ops["row_valid"] (= rowv_bin * sqrt_m).
    Under jax.vmap over the group's candidates, every dot_general below
    keeps `shared` unbatched, fusing into single wide GEMMs.
    """
    d2, l2, d3, l3 = geom.d2, geom.l2, geom.d3, geom.l3
    s = geom.scale2d_to_3d
    linear = shared["linear"]
    cdt = shared["cdt"]
    Wsum_c = shared["Wsum"]
    Mxy_c = shared["Mxy_ops"]
    h_u = shared["copies_h_u"].astype(jnp.float32)
    ops_h = shared["ops_h_u"].astype(jnp.float32)

    ic = jnp.arange(l2, dtype=jnp.float32) - l2 // 2
    dz_u = h_u * rise_pixel  # (C_u,)
    Mz_raw = jax.vmap(
        lambda dzc: _z_interp_matrix(s * ic - dzc + l3 // 2, l3, linear)
    )(dz_u)  # (C_u, l2, l3) f32, zero rows where z invalid
    z_ok = jnp.sum(Mz_raw, axis=2) > 0  # (C_u, l2)
    sel = sqrt_m > 0
    rowv_bin = (
        (z_ok[:, :, None] & shared["xy_any"][:, None, :])
        & sel[:, None, None]
    ).astype(jnp.float32)  # (C_u, l2, d2)

    Mz_w = (Mz_raw * sqrt_m[:, None, None]).astype(cdt)
    # z-Gram per copy carries the multiplicity weight m = sqrt_m^2
    Gz = jax.lax.dot_general(
        Mz_w, Mz_w, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(cdt)  # (C_u, l3, l3)

    def P(x_vol):
        # sqrt(m)-weighted projection: rows of copy k scaled by sqrt(m_k)
        X2 = x_vol.reshape(l3, d3 * d3).astype(cdt)
        tmp = jax.lax.dot_general(
            Wsum_c, X2, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (C_u, d2, l3)
        pred = jax.lax.dot_general(
            Mz_w, tmp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (C_u, l2, d2)
        return pred

    def PTP(x_vol):
        # fused A^T M A in one pass (multiplicity weight lives in Gz)
        X2 = x_vol.reshape(l3, d3 * d3).astype(cdt)
        t = jax.lax.dot_general(
            Wsum_c, X2, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (C_u, d2, l3)
        u = jax.lax.dot_general(
            t, Gz, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (C_u, d2, l3)
        out = jax.lax.dot_general(
            u.reshape(-1, l3), Wsum_c.reshape(-1, d3 * d3),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (l3, d3^2)
        return out.reshape(l3, d3, d3)

    # --- symmetry pairs over the canonical op table ---------------------
    z_pos0 = jnp.arange(l3, dtype=jnp.float32)
    Mz_ops_raw = jax.vmap(
        lambda h: _z_interp_matrix(z_pos0 + h * rise_pixel, l3, linear)
    )(ops_h)  # (O_u, l3, l3)
    z_ok_ops = jnp.sum(Mz_ops_raw, axis=2) > 0  # (O_u, l3)
    Mz_ops_c = Mz_ops_raw.astype(cdt)

    op_ok = z_ok_ops[:, :, None] & shared["xy_ok_ops"][:, None, :]
    pair_ok = (
        op_ok[pair_idx[:, 0]]
        & op_ok[pair_idx[:, 1]]
        & (shared["mask_f"].reshape(l3, d3 * d3) > 0.5)[None]
        & pairs_valid[:, None, None]
    )
    pair_ok_f = pair_ok.astype(jnp.float32)  # (P, l3, d3^2)

    def S(x_vol):
        X2 = x_vol.reshape(l3, d3 * d3).astype(cdt)
        tmp = jax.lax.dot_general(
            Mxy_c, X2, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (O_u, d3^2, l3)
        vals = jax.lax.dot_general(
            Mz_ops_c, tmp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (O_u, l3, d3^2)
        v1 = vals[pair_idx[:, 0]]
        v2 = vals[pair_idx[:, 1]]
        return ((v1 - v2) * pair_ok_f).reshape(-1, l3, d3, d3)

    # --- fused normal operator (the matvec hot path) ---------------------
    # N0(x) = PTP(x) + ST(S(x)) computed with TWO large GEMMs against the
    # group-shared stacked operand A_top = [Wsum; Mxy] plus small-tensor
    # glue, instead of ~8 separate dot_generals and a pair gather/scatter.
    # The pair difference + its transpose collapse into an exact op-axis
    # graph Laplacian: pair_ok factorizes as a_i * a_j * mask * pv (all
    # binary), so
    #   (S^T S x)_vals[o] = mask * a_o * (vals_o * (Cn a)_o - (Cn (a*vals))_o)
    # with Cn[o,o'] = #valid pairs connecting ops o and o' (duplicated
    # pairs count twice, matching duplicated rows of S; self-pairs cancel
    # identically on both sides). Same sums as the gather/scatter vjp,
    # reassociated.
    A_top = shared["A_top"]
    C_u = Wsum_c.shape[0]
    O_u = Mxy_c.shape[0]
    a_f = (z_ok_ops[:, :, None] & shared["xy_ok_ops"][:, None, :]).astype(
        jnp.float32
    )  # (O_u, l3, d3^2)
    pv_f = pairs_valid.astype(jnp.float32)
    oi = jax.nn.one_hot(pair_idx[:, 0], O_u, dtype=jnp.float32)
    oj = jax.nn.one_hot(pair_idx[:, 1], O_u, dtype=jnp.float32)
    Cn = oi.T @ (pv_f[:, None] * oj)
    Cn = Cn + Cn.T  # symmetric pair-count matrix (O_u, O_u)
    deg = (Cn @ a_f.reshape(O_u, -1)).reshape(O_u, l3, d3 * d3)
    m2 = shared["mask_f"].reshape(l3, d3 * d3)

    def NTN(x_vol):
        X2 = x_vol.reshape(l3, d3 * d3).astype(cdt)
        t = jax.lax.dot_general(
            A_top, X2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (C_u*d2 + O_u*d3^2, l3)
        t_d = t[: C_u * d2].reshape(C_u, d2, l3)
        t_s = t[C_u * d2 :].reshape(O_u, d3 * d3, l3)
        # data term: multiplicity weight lives in Gz (as in PTP)
        u = jax.lax.dot_general(
            t_d, Gz, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # (C_u, d2, l3)
        # symmetry term: vals -> op-axis Laplacian -> transpose factors
        vals = jax.lax.dot_general(
            Mz_ops_c, t_s, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (O_u, l3, d3^2) f32
        av = a_f * vals
        Cav = (Cn @ av.reshape(O_u, -1)).reshape(O_u, l3, d3 * d3)
        L = m2[None] * (deg * av - a_f * Cav)
        tmp2 = jax.lax.dot_general(
            Mz_ops_c, L, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (O_u, l3', d3^2): Mz^T applied over the copy's l axis
        g = jnp.concatenate(
            [
                u.reshape(C_u * d2, l3),
                tmp2.transpose(0, 2, 1).reshape(O_u * d3 * d3, l3).astype(cdt),
            ],
            axis=0,
        )
        out = jax.lax.dot_general(
            A_top, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d3^2, l3)
        return out.T.reshape(l3, d3, d3)

    vol_shape = geom.volume_shape
    _, PT_vjp = jax.vjp(P, jnp.zeros(vol_shape, jnp.float32))
    _, ST_vjp = jax.vjp(S, jnp.zeros(vol_shape, jnp.float32))
    b = jnp.asarray(image_region, jnp.float32).T
    rowv_w = rowv_bin * sqrt_m[:, None, None].astype(jnp.float32)
    ops = dict(
        P=P,
        PT=lambda r: PT_vjp(r)[0],
        PTP=PTP,
        NTN=NTN,
        S=S,
        ST=lambda r: ST_vjp(r)[0],
        b=b,
        row_valid=rowv_w,  # sqrt(m)-weighted: pairs with the weighted P
        mask=shared["mask_f"] > 0.5,
        # the per-candidate TENSORS the fused NTN closes over, exported
        # for the grouped Pallas kernel (pallas_solver.solve_group_pallas)
        # so both formulations consume identical inputs
        grouped_factors=dict(
            Gz=Gz.astype(jnp.float32),      # (C_u, l3, l3), m-weighted
            Mz_w=Mz_w,                      # (C_u, l2, l3) cdt, m-weighted
            Mz_ops=Mz_ops_raw,              # (O_u, l3, l3) f32
            a_f=a_f,                        # (O_u, l3, d3^2) f32
            Cn=Cn,                          # (O_u, O_u) f32
            deg=deg,                        # (O_u, l3, d3^2) f32
        ),
    )
    return ops, rowv_bin


def build_candidate_tensors_grouped(
    shared,
    geom,
    image_region,
    rise_pixel,
    sqrt_m,
    pair_idx,
    pairs_valid,
    pid_mask=None,
):
    """Array-only variant of build_candidate_problem_grouped for the
    grouped Pallas kernel: returns the per-candidate tensors of the fused
    NTN matvec plus the solve's rhs/bounds, with no closures — vmappable
    over the group's candidates. The rhs is computed with the SAME
    weighted-P vjp the XLA path uses, so both paths solve the identical
    system.

    pid_mask (l2, d2) 0/1 float (optional): a data-row pixel-id split
    mask (solver._pid_split_masks) — the fsc half-set weighting. The
    data-term z-Gram then becomes j-DEPENDENT:
        Gz_j[c, m, n, j] = sum_i pid_mask[i, j] Mz_w[c, i, m] Mz_w[c, i, n]
    returned as a 4D `Gz` (the Pallas kernel's wide gt layout has a j
    axis anyway — the unmasked path merely broadcasts over it), with
    rhs/b_norm computed on the masked rows. The box upper bound stays
    the FULL-row one (reference: halves reuse the full ub_val).
    """
    ops, rowv_bin = build_candidate_problem_grouped(
        shared, geom, image_region, rise_pixel, sqrt_m, pair_idx,
        pairs_valid,
    )
    l3 = geom.l3
    d3sq = geom.d3 * geom.d3
    mask_f = shared["mask_f"]
    gf = ops["grouped_factors"]
    if pid_mask is None:
        b_eff = ops["b"][None] * ops["row_valid"]
        gz_out = gf["Gz"]
    else:
        w = jnp.asarray(pid_mask, jnp.float32).reshape(
            geom.l2, geom.d2
        )
        b_eff = ops["b"][None] * ops["row_valid"] * w[None]
        mzw = gf["Mz_w"].astype(jnp.float32)  # (C_u, l2, l3)
        gz_out = jnp.einsum("cim,cin,ij->cmnj", mzw, mzw, w)
    rhs = (ops["PT"](b_eff) * mask_f).reshape(l3, d3sq)
    return dict(
        Gz=gz_out,
        Mz_ops=gf["Mz_ops"],
        a_f=gf["a_f"],
        Cn=gf["Cn"],
        deg=gf["deg"],
        rhs=rhs,
        # box upper bound from the UNweighted rows (duplicates cannot
        # change a max); b_norm pairs with the weighted rows (cosine)
        ub_raw=jnp.max(ops["b"][None] * rowv_bin),
        b_norm=jnp.sqrt(jnp.sum(b_eff * b_eff)),
    )
