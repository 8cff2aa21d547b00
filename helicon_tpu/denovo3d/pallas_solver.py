"""Fused single-candidate CG+FISTA solve as ONE Pallas TPU kernel.

Motivation (docs/PROFILE.md): the XLA formulation executes each
CG/FISTA iteration as a chain of small batched GEMMs — tens of
thousands of ~10 us device ops per batch, with the per-candidate
operator tensors re-streamed between them. This kernel loads ONE
candidate's full operator set (~12 MB in bf16 for the bench geometry)
into VMEM once and runs every matvec of the solve from on-chip memory:

  N(v) = (W2^T Gz-mix (W2 v^T-ish) + sum_o Mxy_o^T Mz-mix pair-combine
          (Mxy_o v) + l2 v) * mask

with the CG warm start, the Lipschitz power iteration, and the FISTA
box/L1 proximal loop all inside the kernel (jax.lax.fori_loop bodies).
The math mirrors solver._cg/_power_iteration/_fista line for line; the
factor tensors come from projector_separable.build_problem_separable
(ops["factors"]), so both formulations consume identical inputs.

Scope: the separable matmul-symmetry path (tilt = psi = 0, dense sym
matrices within budget) — exactly the vmapped grid-scoring hot path.
Callers must check `fits_vmem(n_copies, d2, d3sq, n_ops, l3,
compute_dtype)` and fall back to the XLA closures otherwise. The v2
in-kernel operator build (`full_kernel_inputs` + `score_candidate_pallas`)
implements nearest-neighbor interpolation only; `full_kernel_inputs`
raises on anything else — use v1 (`pallas_inputs`), which consumes the
prebuilt factor tensors and is interpolation-agnostic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    "solve_candidate_pallas",
    "score_candidate_pallas",
    "solve_group_pallas",
    "grouped_pallas_inputs",
    "wide_col",
    "fits_vmem",
    "fits_vmem_grouped",
    "pallas_inputs",
    "full_kernel_inputs",
]

# v5e has 128 MiB of physical VMEM per core (Mosaic's scoped-vmem
# DEFAULT is only 16 MB; the kernels raise it via vmem_limit_bytes).
# Budget 56 MB for one candidate's resident operators, leaving the rest
# for Mosaic temporaries and double-buffering.
_VMEM_BUDGET_BYTES = 56 * 1024 * 1024


def fits_vmem(n_copies, d2, d3sq, n_ops, l3, compute_dtype) -> bool:
    """Conservative estimate: do one candidate's operators + solve
    temporaries fit the kernel's VMEM budget?"""
    itemsize = 2 if jnp.dtype(compute_dtype) == jnp.bfloat16 else 4
    w2 = 2 * n_copies * d2 * d3sq * itemsize  # both orientations
    mxy = 2 * n_ops * d3sq * d3sq * itemsize
    gz_big = l3 * l3 * n_copies * d2 * 4
    temps = (
        2 * l3 * n_copies * d2 * 4  # y, z
        + 3 * n_ops * l3 * d3sq * 4  # vals, rbar, transient
        + 10 * l3 * d3sq * 4  # x/r/p/Np/y/g/...
    )
    return (w2 + mxy + gz_big + temps) <= _VMEM_BUDGET_BYTES


def pallas_inputs(factors, cdt):
    """Reshape the projector factors into the kernel's input layout."""
    C, d2, d3sq = factors["Wsum"].shape
    O, l3, _ = factors["Mz_ops"].shape
    P = factors["pair_idx"].shape[0]
    w2 = factors["Wsum"].reshape(C * d2, d3sq).astype(cdt)
    w2t = w2.T.copy() if hasattr(w2, "copy") else jnp.transpose(w2)
    # per-copy z-Gram broadcast over d2 -> elementwise mix tables
    gz_big = jnp.repeat(
        jnp.transpose(factors["Gz"].astype(jnp.float32), (1, 2, 0)), d2, axis=2
    )  # (l3, l3, C*d2)
    mxy = factors["Mxy_ops"].astype(cdt)  # (O, d3sq, d3sq)
    mxyt = jnp.transpose(mxy, (0, 2, 1))
    mzs = factors["Mz_ops"].astype(jnp.float32)  # (O, l3, l3)
    e1 = jax.nn.one_hot(factors["pair_idx"][:, 0], O, dtype=jnp.float32)
    e2 = jax.nn.one_hot(factors["pair_idx"][:, 1], O, dtype=jnp.float32)
    # fold the per-op z-interp and the pair combination into ONE small
    # matrix: B1[p*l3+m, o*l3+n] = (e1 - e2)[p, o] * Mz_o[m, n]. The
    # kernel's sym term is then two tiny dots (B1, B1^T) around the big
    # Mxy contractions instead of ~P*O unrolled vector ops per matvec.
    de = e1 - e2  # (P, O)
    b1 = jnp.einsum("po,omn->pmon", de, mzs).reshape(P * l3, O * l3)
    b1t = b1.T
    pok = factors["pair_ok"].reshape(P * l3, d3sq).astype(jnp.float32)
    mask = factors["mask"].reshape(l3, d3sq).astype(jnp.float32)
    return w2, w2t, gz_big, mxy, mxyt, b1, b1t, pok, mask


def _kernel(
    w2_ref, w2t_ref, gz_ref, mxy_ref, mxyt_ref, b1_ref, b1t_ref,
    pok_ref, rhs_ref, mask_ref, scal_ref, x_ref, *,
    l3, d3sq, n_ops, n_pairs, cg_iters, fista_iters, power_iters, use_bf16,
):
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    w2 = w2_ref[:]  # (C*d2, d3sq) cdt (w2t_ref holds the transpose)
    gz = gz_ref[:]  # (l3, l3, C*d2) f32
    mask = mask_ref[:]  # (l3, d3sq) f32
    l2_reg = scal_ref[0, 0]
    l1_reg = scal_ref[0, 1]
    lb = scal_ref[0, 2]
    ub = scal_ref[0, 3]

    # all contractions via dot_general with explicit dims: a `.T` on a
    # VMEM-resident operand materializes a transposed COPY (the w2/mxy
    # transposes alone blew the 16 MB scoped-vmem budget)
    def _dg(a, b, a_dim, b_dim):
        return jax.lax.dot_general(
            a, b, (((a_dim,), (b_dim,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def matvec(v):  # (l3, d3sq) f32 -> (l3, d3sq) f32
        vb = v.astype(cdt)
        # data term: W2^T (Gz-mix (v W2^T)). BOTH orientations of the
        # big operands are VMEM-resident (w2/w2t, mxy/mxyt) so every
        # dot runs as (M=l3, K, N=wide): the tiny l3 axis pads sublanes
        # (cheap) and the 128-lane axis stays full — computing with the
        # stored-natural orientation instead put N=l3 on the lanes and
        # ran the MXU at l3/128 occupancy.
        y = _dg(vb, w2t_ref[:], 1, 0)  # (l3, C*d2)
        z = jnp.sum(gz * y[None, :, :], axis=1)  # (l3, C*d2)
        out = _dg(z.astype(cdt), w2, 1, 0)  # (l3, d3sq)
        # symmetry term: per-op in-plane contractions, then the folded
        # z-mix + pair-combine as two tiny dots (B1, B1^T)
        tmp = jnp.concatenate(
            [_dg(vb, mxyt_ref[o], 1, 0) for o in range(n_ops)], axis=0
        )  # (O*l3, d3sq) f32
        diff = _dg(b1_ref[:], tmp, 1, 0) * pok_ref[:]  # (P*l3, d3sq)
        ubar = _dg(b1t_ref[:], diff, 1, 0)  # (O*l3, d3sq)
        ubar_c = ubar.astype(cdt)
        sts = jnp.zeros((l3, d3sq), jnp.float32)
        for o in range(n_ops):
            sts = sts + _dg(
                ubar_c[o * l3 : (o + 1) * l3], mxy_ref[o], 1, 0
            )
        return (out + sts + l2_reg * v) * mask

    rhs = rhs_ref[:]  # already PT(b_eff) * mask

    # ---- CG from x0 = 0 (solver._cg) --------------------------------
    def cg_body(_, carry):
        x, r, p, rs = carry
        np_ = matvec(p)
        pnp = jnp.sum(p * np_)
        alpha = jnp.where(pnp > 0, rs / jnp.maximum(pnp, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * np_
        rs_new = jnp.sum(r * r)
        beta = jnp.where(rs > 0, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        p = r + beta * p
        return x, r, p, rs_new

    x0 = jnp.zeros((l3, d3sq), jnp.float32)
    x, _, _, _ = jax.lax.fori_loop(
        0, cg_iters, cg_body, (x0, rhs, rhs, jnp.sum(rhs * rhs))
    )

    if fista_iters > 0:
        # ---- Lipschitz power iteration (solver._power_iteration) ----
        v = jnp.ones((l3, d3sq), jnp.float32)
        v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), 1e-30)

        def pow_body(_, v):
            w = matvec(v)
            return w / jnp.maximum(jnp.sqrt(jnp.sum(w * w)), 1e-30)

        v = jax.lax.fori_loop(0, power_iters, pow_body, v)
        margin = 1.2 if power_iters >= 4 else (1.5 if power_iters >= 2 else 1.8)
        lips = margin * jnp.sum(v * matvec(v))
        eta = 1.0 / jnp.maximum(lips, 1e-20)

        # ---- FISTA with box projection (solver._fista) --------------
        def prox(v):
            v = jnp.sign(v) * jnp.maximum(jnp.abs(v) - eta * l1_reg, 0.0)
            return jnp.clip(v, lb, ub)

        def fista_body(_, carry):
            x, y, t = carry
            g = matvec(y) - rhs
            x_new = prox(y - eta * g)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
            return x_new, y_new, t_new

        xc = jnp.clip(x, lb, ub)
        x, _, _ = jax.lax.fori_loop(
            0, fista_iters, fista_body, (xc, xc, jnp.float32(1.0))
        )

    x_ref[:] = x * mask


@functools.partial(
    jax.jit,
    static_argnames=(
        "cg_iters", "fista_iters", "power_iters", "use_bf16", "interpret",
    ),
)
def solve_candidate_pallas(
    w2, w2t, gz_big, mxy, mxyt, b1, b1t, pok, rhs, mask, scal,
    cg_iters: int, fista_iters: int, power_iters: int,
    use_bf16: bool = True, interpret: bool = False,
):
    """Run the fused solve for one candidate; returns x (l3, d3sq) f32.

    scal: (1, 4) f32 = [l2_reg, l1_reg, lb, ub].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_ops = mxy.shape[0]
    l3 = rhs.shape[0]
    n_pairs = b1.shape[0] // l3
    d3sq = rhs.shape[1]
    kernel = functools.partial(
        _kernel,
        l3=l3, d3sq=d3sq, n_ops=n_ops, n_pairs=n_pairs,
        cg_iters=cg_iters, fista_iters=fista_iters,
        power_iters=power_iters, use_bf16=use_bf16,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    flops_mv = 2 * (
        2 * w2.shape[0] * d3sq * l3 + 2 * n_ops * d3sq * d3sq * l3
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((l3, d3sq), jnp.float32),
        in_specs=[vm, vm, vm, vm, vm, vm, vm, vm, vm, vm, sm],
        out_specs=vm,
        cost_estimate=pl.CostEstimate(
            flops=flops_mv * (cg_iters + fista_iters + power_iters + 2),
            bytes_accessed=int(
                w2.size * w2.dtype.itemsize + mxy.size * mxy.dtype.itemsize
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the resident operator set (~12.5 MB) plus mosaic
            # temporaries exceeds the 16 MB scoped-vmem DEFAULT; v5e
            # has 128 MiB physical VMEM per core
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w2, w2t, gz_big, mxy, mxyt, b1, b1t, pok, rhs, mask, scal)


# ---------------------------------------------------------------------------
# v2: FULL-PIPELINE kernel — operators built IN-KERNEL from ~1 MB of
# per-candidate tables; cosine score computed in-kernel. Nothing larger
# than the tables ever touches HBM (profiling showed the XLA grid is
# dominated by operator materialization, not solve FLOPs).
# ---------------------------------------------------------------------------


def full_kernel_inputs(geom, ops, twist_degree, rise_pixel, copies_h,
                       copies_c, copies_valid, op_hc, cdt,
                       interpolation: str = "nn"):
    """Small per-candidate tables for the v2 kernel (all host/XLA math
    on SMALL tensors; the big Wsum/Mxy never materialize here).

    ops: build_problem_separable output (for factors Gz/Mz/pair_ok and
    b/row_valid) — must have been built with interpolation="nn": the
    in-kernel W2/Mxy build rounds to the nearest cell (weight 1), so
    feeding linear-interp factors would silently solve a DIFFERENT
    operator. Returns the kernel argument tuple.
    """
    if not interpolation.startswith("nn"):
        raise NotImplementedError(
            "the v2 in-kernel operator build supports nearest-neighbor "
            "interpolation only; use the v1 kernel (pallas_inputs + "
            "solve_candidate_pallas) or the XLA closures for "
            f"interpolation={interpolation!r}"
        )
    f = ops["factors"]
    C, d2, d3sq = f["Wsum"].shape  # Wsum is NOT materialized: only shape
    O, l3, _ = f["Mz_ops"].shape
    P = f["pair_idx"].shape[0]
    d2p = ((d2 + 15) // 16) * 16  # sublane-aligned copy stride
    csym = geom.csym

    theta = jnp.deg2rad(
        twist_degree * copies_h.astype(jnp.float32)
        + 360.0 * copies_c.astype(jnp.float32) / csym
    )  # (C,)
    cvf = copies_valid.astype(jnp.float32)
    op_theta = jnp.deg2rad(
        twist_degree * op_hc[:, 0].astype(jnp.float32)
        + 360.0 * op_hc[:, 1].astype(jnp.float32) / csym
    )  # (O,)

    # z-Gram per copy, broadcast over the padded copy stride
    gz = f["Gz"].astype(jnp.float32)  # (C, l3, l3)
    gz_bigp = jnp.zeros((l3, l3, C * d2p), jnp.float32)
    src = jnp.repeat(jnp.transpose(gz, (1, 2, 0)), d2, axis=2).reshape(
        l3, l3, C, d2
    )
    gz_bigp = gz_bigp.reshape(l3, l3, C, d2p).at[:, :, :, :d2].set(src)
    gz_bigp = gz_bigp.reshape(l3, l3, C * d2p)

    # u_flat[m, c*d2p + j] = sum_i Mz[c, i, m] b_eff[c, i, j]
    rowv = ops["row_valid"].astype(jnp.float32)  # (C, l2, d2)
    b_eff = ops["b"][None] * rowv
    mz = f["Mz"].astype(jnp.float32)  # (C, l2, l3)
    u = jnp.einsum("cim,cij->mcj", mz, b_eff)  # (l3, C, d2)
    u_flat = jnp.zeros((l3, C, d2p), jnp.float32).at[:, :, :d2].set(u)
    u_flat = u_flat.reshape(l3, C * d2p)
    b_norm = jnp.sqrt(jnp.sum(b_eff * b_eff))

    de = (
        jax.nn.one_hot(f["pair_idx"][:, 0], O, dtype=jnp.float32)
        - jax.nn.one_hot(f["pair_idx"][:, 1], O, dtype=jnp.float32)
    )
    mzs = f["Mz_ops"].astype(jnp.float32)
    b1 = jnp.einsum("po,omn->pmon", de, mzs).reshape(P * l3, O * l3)
    pok = f["pair_ok"].reshape(P * l3, d3sq).astype(jnp.float32)
    mask = f["mask"].reshape(l3, d3sq).astype(jnp.float32)
    plane_ok = f["plane_ok"].astype(jnp.float32).reshape(1, d3sq)

    return (theta, cvf, op_theta, gz_bigp, u_flat, b1, b1.T, pok,
            mask, plane_ok, b_norm)


def _full_kernel(
    theta_ref, cvf_ref, opth_ref, gz_ref, u_ref, b1_ref, b1t_ref,
    pok_ref, mask_ref, pln_ref, scal_ref,
    x_ref, score_ref, w2_ref, w2t_ref, mxy_ref, mxyt_ref, *,
    C, d2, d2p, d3, l3, n_ops, n_pairs, n_taps,
    cg_iters, fista_iters, power_iters, use_bf16, scale2d_to_3d, dy_pixel,
):
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    d3sq = d3 * d3
    s = scale2d_to_3d
    l2_reg = scal_ref[0, 0]
    l1_reg = scal_ref[0, 1]
    lb = scal_ref[0, 2]
    ub = scal_ref[0, 3]
    b_norm = scal_ref[0, 4]
    pln = pln_ref[:]  # (1, d3sq)
    mask = mask_ref[:]

    # ---- build W2 (C*d2p, d3sq) + transpose in VMEM ------------------
    # per-copy fori_loop with aligned dynamic stores; the experiments in
    # docs/PROFILE.md cover the faster-looking variants that lost
    # (fully vectorized: scoped-vmem blowup; row-block tiling: lane-dim
    # dynamic stores cost more than the loop they replaced)
    gx = (
        jax.lax.broadcasted_iota(jnp.int32, (1, d3sq), 1) % d3
    ).astype(jnp.float32)
    gy = (
        jax.lax.broadcasted_iota(jnp.int32, (1, d3sq), 1) // d3
    ).astype(jnp.float32)
    jc = (
        jax.lax.broadcasted_iota(jnp.int32, (d2p, 1), 0) - d2 // 2
    ).astype(jnp.float32)
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (d2p, 1), 0) < d2
    ).astype(jnp.float32)
    gxi = gx.astype(jnp.int32)
    gyi = gy.astype(jnp.int32)

    def build_copy(c, _):
        th = theta_ref[c]
        cs = jnp.cos(th)
        sn = jnp.sin(th)
        dx = -s * cs
        dy_ = s * sn
        y0j = s * jc - dy_pixel  # (d2p, 1)
        cx = y0j * sn + d3 // 2
        cy = y0j * cs + d3 // 2
        kc_star = ((gx - cx) * dx + (gy - cy) * dy_) / (s * s)
        k0 = jnp.round(kc_star)
        acc = jnp.zeros((d2p, d3sq), jnp.float32)
        for delta in range(-n_taps, n_taps + 1):
            kc = k0 + delta
            ink = (kc >= -(d2 // 2)) & (kc <= d2 - 1 - d2 // 2)
            X = cx + kc * dx
            Y = cy + kc * dy_
            xi = jnp.round(X).astype(jnp.int32)
            yi = jnp.round(Y).astype(jnp.int32)
            inb = (xi >= 0) & (xi <= d3 - 1) & (yi >= 0) & (yi <= d3 - 1)
            same = (xi == gxi) & (yi == gyi)
            ok = inb & same & (pln > 0.5) & ink
            acc = acc + ok.astype(jnp.float32)
        wc = acc * cvf_ref[c] * row_ok
        w2_ref[pl.ds(c * d2p, d2p), :] = wc.astype(cdt)
        return _

    jax.lax.fori_loop(0, C, build_copy, 0)
    w2t_ref[:] = jnp.transpose(w2_ref[:], (1, 0))

    # ---- build Mxy / MxyT (O, d3sq, d3sq) in VMEM -------------------
    # rows = sample index i (sublanes for mxy, lanes for mxyt); the
    # plane_ok lookup at idx folds into the receiving column because
    # the one-hot is nonzero only where j == idx_i.
    px_r = (
        jax.lax.broadcasted_iota(jnp.int32, (d3sq, 1), 0) % d3 - d3 // 2
    ).astype(jnp.float32)
    py_r = (
        jax.lax.broadcasted_iota(jnp.int32, (d3sq, 1), 0) // d3 - d3 // 2
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d3sq, d3sq), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (d3sq, d3sq), 0)
    px_l = (
        jax.lax.broadcasted_iota(jnp.int32, (1, d3sq), 1) % d3 - d3 // 2
    ).astype(jnp.float32)
    py_l = (
        jax.lax.broadcasted_iota(jnp.int32, (1, d3sq), 1) // d3 - d3 // 2
    ).astype(jnp.float32)
    pln_row = jnp.transpose(pln, (1, 0))  # (d3sq, 1)

    def build_op(o, _):
        th = opth_ref[o]
        cs = jnp.cos(th)
        sn = jnp.sin(th)
        # sublane-sample orientation (for mxy[i, j])
        Xp = px_r * cs - py_r * sn + d3 // 2
        Yp = px_r * sn + py_r * cs + d3 // 2
        xi = jnp.round(Xp).astype(jnp.int32)
        yi = jnp.round(Yp).astype(jnp.int32)
        inb = (
            (xi >= 0) & (xi <= d3 - 1) & (yi >= 0) & (yi <= d3 - 1)
        ).astype(jnp.float32)
        idx = yi * d3 + xi  # (d3sq, 1)
        m = (cols == idx).astype(jnp.float32) * inb * pln
        mxy_ref[o] = m.astype(cdt)
        # lane-sample orientation (for mxyt[j, i] = mxy[i, j])
        Xl = px_l * cs - py_l * sn + d3 // 2
        Yl = px_l * sn + py_l * cs + d3 // 2
        xj = jnp.round(Xl).astype(jnp.int32)
        yj = jnp.round(Yl).astype(jnp.int32)
        inb_l = (
            (xj >= 0) & (xj <= d3 - 1) & (yj >= 0) & (yj <= d3 - 1)
        ).astype(jnp.float32)
        idx_l = yj * d3 + xj  # (1, d3sq)
        mt = (rows == idx_l).astype(jnp.float32) * inb_l * pln_row
        mxyt_ref[o] = mt.astype(cdt)
        return _

    jax.lax.fori_loop(0, n_ops, build_op, 0)

    gz = gz_ref[:]
    w2 = w2_ref[:]

    def _dg(a, b, a_dim, b_dim):
        return jax.lax.dot_general(
            a, b, (((a_dim,), (b_dim,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def data_term(v):
        vb = v.astype(cdt)
        y = _dg(vb, w2t_ref[:], 1, 0)  # (l3, C*d2p)
        z = jnp.sum(gz * y[None, :, :], axis=1)
        return _dg(z.astype(cdt), w2, 1, 0)  # (l3, d3sq)

    def matvec(v):
        vb = v.astype(cdt)
        out = data_term(v)
        tmp = jnp.concatenate(
            [_dg(vb, mxyt_ref[o], 1, 0) for o in range(n_ops)], axis=0
        )
        diff = _dg(b1_ref[:], tmp, 1, 0) * pok_ref[:]
        ubar = _dg(b1t_ref[:], diff, 1, 0).astype(cdt)
        sts = jnp.zeros((l3, d3sq), jnp.float32)
        for o in range(n_ops):
            sts = sts + _dg(ubar[o * l3 : (o + 1) * l3], mxy_ref[o], 1, 0)
        return (out + sts + l2_reg * v) * mask

    # rhs = (P^T b_eff) * mask, computed from the freshly built W2
    rhs = _dg(u_ref[:].astype(cdt), w2, 1, 0) * mask  # (l3, d3sq)

    def cg_body(_, carry):
        x, r, p, rs = carry
        np_ = matvec(p)
        pnp = jnp.sum(p * np_)
        alpha = jnp.where(pnp > 0, rs / jnp.maximum(pnp, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * np_
        rs_new = jnp.sum(r * r)
        beta = jnp.where(rs > 0, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        p = r + beta * p
        return x, r, p, rs_new

    x0 = jnp.zeros((l3, d3 * d3), jnp.float32)
    x, _, _, _ = jax.lax.fori_loop(
        0, cg_iters, cg_body, (x0, rhs, rhs, jnp.sum(rhs * rhs))
    )

    if fista_iters > 0:
        v = jnp.ones((l3, d3 * d3), jnp.float32)
        v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), 1e-30)

        def pow_body(_, v):
            w = matvec(v)
            return w / jnp.maximum(jnp.sqrt(jnp.sum(w * w)), 1e-30)

        v = jax.lax.fori_loop(0, power_iters, pow_body, v)
        margin = 1.2 if power_iters >= 4 else (1.5 if power_iters >= 2 else 1.8)
        lips = margin * jnp.sum(v * matvec(v))
        eta = 1.0 / jnp.maximum(lips, 1e-20)

        def prox(v):
            v = jnp.sign(v) * jnp.maximum(jnp.abs(v) - eta * l1_reg, 0.0)
            return jnp.clip(v, lb, ub)

        def fista_body(_, carry):
            x, y, t = carry
            g = matvec(y) - rhs
            x_new = prox(y - eta * g)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
            return x_new, y_new, t_new

        xc = jnp.clip(x, lb, ub)
        x, _, _ = jax.lax.fori_loop(
            0, fista_iters, fista_body, (xc, xc, jnp.float32(1.0))
        )

    x = x * mask
    x_ref[:] = x
    # cosine score WITHOUT materializing the reprojection:
    #   num = <P(x), b_eff> = <x, rhs>
    #   |P(x)*rowv|^2 = <x, P^T P x> = <x, data_term(x)>
    num = jnp.sum(x * rhs)
    den = jnp.sqrt(jnp.maximum(jnp.sum(x * data_term(x)), 0.0)) * b_norm
    score = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
    score_ref[0, 0] = score


@functools.partial(
    jax.jit,
    static_argnames=(
        "C", "d2", "d3", "l3", "n_taps", "cg_iters", "fista_iters",
        "power_iters", "use_bf16", "scale2d_to_3d", "dy_pixel", "interpret",
    ),
)
def score_candidate_pallas(
    theta, cvf, op_theta, gz_bigp, u_flat, b1, b1t, pok, mask,
    plane_ok, scal,
    C: int, d2: int, d3: int, l3: int, n_taps: int,
    cg_iters: int, fista_iters: int, power_iters: int,
    use_bf16: bool = True, scale2d_to_3d: float = 1.0,
    dy_pixel: float = 0.0, interpret: bool = False,
):
    """Full-pipeline fused kernel: build operators + solve + score.

    Returns (x (l3, d3sq) f32, score scalar f32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d3sq = d3 * d3
    d2p = ((d2 + 15) // 16) * 16
    n_ops = op_theta.shape[0]
    n_pairs = b1.shape[0] // l3
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    kernel = functools.partial(
        _full_kernel,
        C=C, d2=d2, d2p=d2p, d3=d3, l3=l3, n_ops=n_ops, n_pairs=n_pairs,
        n_taps=n_taps, cg_iters=cg_iters, fista_iters=fista_iters,
        power_iters=power_iters, use_bf16=use_bf16,
        scale2d_to_3d=scale2d_to_3d, dy_pixel=dy_pixel,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((l3, d3sq), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[sm, sm, sm, vm, vm, vm, vm, vm, vm, vm, sm],
        out_specs=(vm, sm),
        scratch_shapes=[
            pltpu.VMEM((C * d2p, d3sq), cdt),       # w2
            pltpu.VMEM((d3sq, C * d2p), cdt),       # w2t
            pltpu.VMEM((n_ops, d3sq, d3sq), cdt),   # mxy
            pltpu.VMEM((n_ops, d3sq, d3sq), cdt),   # mxyt
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(theta, cvf, op_theta, gz_bigp, u_flat, b1, b1t, pok, mask,
      plane_ok, scal)
    return out


# ---------------------------------------------------------------------------
# v3: GROUPED fused solve — one kernel call scores a whole twist-group.
#
# The twist-grouped XLA path (projector_grouped.py) already collapsed the
# matvec to two wide GEMMs against the group-shared stacked operand
# A_top = [Wsum; Mxy], but XLA re-streams A_top (~12 MB bf16 at the bench
# geometry) from HBM on EVERY one of the ~29 CG/power/FISTA matvecs —
# ~0.7 GB of traffic per 13-candidate group, plus a dispatch per op.
# This kernel holds BOTH orientations of A_top in VMEM for the whole
# group solve: every matvec is two MXU GEMMs
#     t = X_wide @ A_top^T        (R*l3, rows)
#     out = g @ A_top             (R*l3, d3^2)
# from on-chip memory, with the small per-candidate z-mixes (Gz Gram,
# Mz_ops pair Laplacian — the rise-dependent parts) as VPU table ops and
# tiny block GEMMs between them. CG, the Lipschitz power iteration, and
# the FISTA box loop run per candidate inside the kernel via
# slab-reductions (per-candidate alpha/beta/eta as (R, 1) scalars).
#
# The operator BUILD stays in XLA (build_group_shared /
# build_candidate_tensors_grouped) and amortizes over the group, so the
# kernel is interpolation-agnostic — nn and linear use identical code
# (this closes the v2 kernel's nearest-neighbor-only gap the cheap way:
# by not rebuilding operators in-kernel at all).
#
# Wide layout: every per-candidate tensor is flattened to rows
# (z_index * R + r) — z-major, candidate-minor — so z-slabs are static
# sublane slices of R rows (R is padded to a multiple of 8 by the
# caller). Lane-blocked sections (the data block Dd = pad128(C_u*d2) and
# each symmetry op's S1 = pad128(d3^2) block) are zero-padded to 128
# multiples so every slice in the kernel is tile-aligned.
# ---------------------------------------------------------------------------


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def fits_vmem_grouped(
    C_u, d2, d3sq, n_ops, l3, R, compute_dtype,
    budget_bytes: int = 72 * 1024 * 1024,
) -> bool:
    """Do one group's VMEM-resident tensors + temporaries fit?"""
    itemsize = 2 if jnp.dtype(compute_dtype) == jnp.bfloat16 else 4
    Dd = _pad128(C_u * d2)
    S1 = _pad128(d3sq)
    rows = Dd + n_ops * S1
    RL = R * l3
    a_top = 2 * rows * S1 * itemsize  # both orientations, lane-padded
    gt = l3 * l3 * R * Dd * 4
    sym_tabs = 3 * RL * n_ops * S1 * 4  # af / deg*mask / af*mask
    zmix = 2 * n_ops * RL * RL * 4     # bz / bzt z-shift mix operators
    cnt = RL * max(128, n_ops * n_ops) * 4  # Laplacian count table
    temps = (
        2 * RL * rows * 4          # t, g
        + RL * Dd * 4              # u
        + 4 * RL * n_ops * S1 * 4  # vals/av/cav/L
        + 10 * RL * S1 * 4         # solve state + rhs/mask/out
    )
    return (a_top + gt + sym_tabs + zmix + cnt + temps) <= budget_bytes


def grouped_pallas_inputs(shared, tens, geom, R: int):
    """Assemble the v3 kernel's wide-layout inputs.

    shared: build_group_shared output (group-shared Wsum/Mxy tensors).
    tens: build_candidate_tensors_grouped outputs stacked over the R
    candidates (leading axis R), plus 'lb'/'ub' (R,) box bounds.
    Returns (args tuple, static dict).
    """
    d2, d3, l3 = geom.d2, geom.d3, geom.l3
    d3sq = d3 * d3
    cdt = shared["cdt"]
    Wsum = shared["Wsum"]  # (C_u, d2, d3sq) cdt
    Mxy = shared["Mxy_ops"]  # (O, d3sq, d3sq) cdt
    C_u = Wsum.shape[0]
    O = Mxy.shape[0]
    Dd = _pad128(C_u * d2)
    S1 = _pad128(d3sq)
    RL = R * l3

    # A_top with tile-aligned sections: data rows zero-padded to Dd,
    # each op's rows to S1 (zero rows contribute nothing on either side)
    w_rows = Wsum.reshape(C_u * d2, d3sq)
    w_rows = jnp.pad(w_rows, ((0, Dd - C_u * d2), (0, 0)))
    m_rows = jnp.pad(Mxy, ((0, 0), (0, S1 - d3sq), (0, 0))).reshape(
        O * S1, d3sq
    )
    a_top = jnp.concatenate([w_rows, m_rows], axis=0).astype(cdt)
    a_topt = jnp.transpose(a_top, (1, 0))

    # GT[(m*l3+n)*R + r, c*d2+j] = Gz[r, c, m, n] (broadcast over j) —
    # or, for the fsc half-set solves, the j-DEPENDENT Gram
    # Gz_j[r, c, m, n, j] (build_candidate_tensors_grouped(pid_mask=...));
    # the kernel consumes both identically: its gt layout always has
    # the j axis
    gz = tens["Gz"]  # (R, C_u, l3, l3) or (R, C_u, l3, l3, d2) f32
    if gz.ndim == 5:
        gt = jnp.transpose(gz, (2, 3, 0, 1, 4)).reshape(
            l3 * l3 * R, C_u * d2
        )
    else:
        gt = jnp.broadcast_to(
            jnp.transpose(gz, (2, 3, 0, 1))[..., None],
            (l3, l3, R, C_u, d2),
        ).reshape(l3 * l3 * R, C_u * d2)
    gt = jnp.pad(gt, ((0, 0), (0, Dd - C_u * d2)))

    # BZ[o, m*R+r, n*R+r'] = delta_rr' Mz_ops[r, o, m, n]; BZT swaps m/n
    mz = tens["Mz_ops"]  # (R, O, l3, l3) f32
    eye_r = jnp.eye(R, dtype=jnp.float32)
    bz = jnp.einsum("romn,rq->omrnq", mz, eye_r).reshape(O, RL, RL)
    bzt = jnp.einsum("ronm,rq->omrnq", mz, eye_r).reshape(O, RL, RL)

    def wide_sym(x):  # (R, O, l3, d3sq) -> (RL, O*S1)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, S1 - d3sq)))
        return jnp.transpose(x, (2, 0, 1, 3)).reshape(RL, O * S1)

    m2 = shared["mask_f"].reshape(1, 1, l3, d3sq)
    af_w = wide_sym(tens["a_f"])
    degm_w = wide_sym(tens["deg"] * m2)
    afm_w = wide_sym(tens["a_f"] * m2)
    cnt = jnp.broadcast_to(
        tens["Cn"].reshape(1, R, O * O), (l3, R, O * O)
    ).reshape(RL, O * O)
    if O * O < 128:  # lane-pad: zeros are never addressed by the kernel
        cnt = jnp.pad(cnt, ((0, 0), (0, 128 - O * O)))

    def wide_cand(x):  # (R, l3, d3sq) -> (RL, d3sq)
        return jnp.transpose(x, (1, 0, 2)).reshape(RL, d3sq)

    mask_w = wide_cand(
        jnp.broadcast_to(
            shared["mask_f"].reshape(1, l3, d3sq), (R, l3, d3sq)
        )
    )
    rhs_w = wide_cand(tens["rhs"])

    # per-candidate scalars ride as 128-lane-replicated VMEM arrays:
    # narrow (x, 1) VMEM operands/outputs crash the Mosaic pipeline
    # ("limits[i] <= dim(i)" in the custom-call output prep), and the
    # minimum f32 tile is (8, 128) anyway — replication costs nothing.
    # wide_col (module level) is the ONE implementation of this layout;
    # the l1/l2 regularization columns use it too.
    lb_w = wide_col(tens["lb"], R, l3)
    ub_w = wide_col(tens["ub"], R, l3)
    bn = jnp.broadcast_to(tens["b_norm"].reshape(R, 1), (R, 128))

    args = (a_top, a_topt, gt, bz, bzt, af_w, degm_w, afm_w, cnt,
            mask_w, rhs_w, lb_w, ub_w, bn)
    static = dict(R=R, l3=l3, d3sq=d3sq, Dd=Dd, S1=S1, n_ops=O)
    return args, static


def _group_kernel(
    a_top_ref, a_topt_ref, gt_ref, bz_ref, bzt_ref, af_ref, degm_ref,
    afm_ref, cnt_ref, mask_ref, rhs_ref, lb_ref, ub_ref, bn_ref,
    l1_ref, l2_ref,
    x_ref, score_ref, *,
    R, l3, d3sq, Dd, S1, n_ops,
    cg_iters, fista_iters, power_iters, use_bf16,
    has_l1, has_l2, with_score,
):
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    RL = R * l3
    mask = mask_ref[:]
    rhs = rhs_ref[:]
    # per-candidate regularization columns (lane-replicated like lb/ub);
    # has_l1/has_l2 are STATIC so the default (unregularized) envelope
    # compiles the identical kernel it always did
    l1w = l1_ref[:, 0:1] if has_l1 else None
    l2w = l2_ref[:, 0:1] if has_l2 else None

    def _dg(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def cand_sum(A):  # (RL, cols) -> (R, 1) per-candidate reduction
        s = jnp.sum(A, axis=1, keepdims=True)
        acc = s[0:R]
        for m in range(1, l3):
            acc = acc + s[m * R : (m + 1) * R]
        return acc

    def tile_r(v):  # (R, 1) -> (RL, 1)
        if l3 == 1:
            return v
        return jnp.concatenate([v] * l3, axis=0)

    def data_mix(t_d):  # (RL, Dd) -> u (RL, Dd): per-candidate Gz Gram
        parts = []
        for m in range(l3):
            acc = gt_ref[m * l3 * R : (m * l3 + 1) * R, :] * t_d[0:R, :]
            for n in range(1, l3):
                acc = acc + (
                    gt_ref[(m * l3 + n) * R : (m * l3 + n + 1) * R, :]
                    * t_d[n * R : (n + 1) * R, :]
                )
            parts.append(acc)
        return jnp.concatenate(parts, axis=0)

    def matvec(X):  # (RL, d3sq) f32 -> (RL, d3sq) f32 = NTN(X) * mask
        # data / symmetry sections as two separate GEMMs against
        # column-slices of the refs: no (RL, rows) temporary to slice
        # and no concat+cast of [u, gs] before the transpose GEMM (the
        # split forms accumulate directly) — measured neutral on the
        # chip (12.9k vs 13.0k cand/s, inside the tunnel band); kept
        # because the epilogue's data-only GEMM drops the 35 % of that
        # dot that the fused form computed and discarded
        xb = X.astype(cdt)
        t_d = _dg(xb, a_topt_ref[:, :Dd])
        u = data_mix(t_d)
        # symmetry: per-op z-mix as small block GEMMs, then the exact
        # op-axis graph Laplacian (projector_grouped.NTN derivation)
        t_s = _dg(xb, a_topt_ref[:, Dd:])
        vals = jnp.concatenate(
            [
                _dg(bz_ref[o], t_s[:, o * S1 : (o + 1) * S1])
                for o in range(n_ops)
            ],
            axis=1,
        )  # (RL, O*S1)
        av = af_ref[:] * vals
        cav_parts = []
        for o in range(n_ops):
            acc = cnt_ref[:, o * n_ops : o * n_ops + 1] * av[:, 0:S1]
            for o2 in range(1, n_ops):
                acc = acc + (
                    cnt_ref[:, o * n_ops + o2 : o * n_ops + o2 + 1]
                    * av[:, o2 * S1 : (o2 + 1) * S1]
                )
            cav_parts.append(acc)
        cav = jnp.concatenate(cav_parts, axis=1)
        L = degm_ref[:] * av - afm_ref[:] * cav
        gs = jnp.concatenate(
            [
                _dg(bzt_ref[o], L[:, o * S1 : (o + 1) * S1])
                for o in range(n_ops)
            ],
            axis=1,
        )
        y = _dg(u.astype(cdt), a_top_ref[:Dd, :]) + _dg(
            gs.astype(cdt), a_top_ref[Dd:, :]
        )
        if has_l2:  # ridge/elasticnet term (solver: N = N0 + l2_eff v)
            y = y + l2w * X
        return y * mask

    # ---- CG from x0 = 0, per-candidate alpha/beta (solver._cg) ------
    def cg_body(_, carry):
        x, r, p, rs = carry
        Np = matvec(p)
        pNp = cand_sum(p * Np)
        alpha = jnp.where(pNp > 0, rs / jnp.maximum(pNp, 1e-30), 0.0)
        aw = tile_r(alpha)
        x = x + aw * p
        r = r - aw * Np
        rs_new = cand_sum(r * r)
        beta = jnp.where(rs > 0, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        p = r + tile_r(beta) * p
        return x, r, p, rs_new

    x0 = jnp.zeros((RL, d3sq), jnp.float32)
    x, _, _, _ = jax.lax.fori_loop(
        0, cg_iters, cg_body, (x0, rhs, rhs, cand_sum(rhs * rhs))
    )

    if fista_iters > 0:
        # ---- per-candidate Lipschitz power iteration -----------------
        # seeded from rhs, NOT the ones vector the XLA path uses
        # (solver._power_iteration): a constant seed lets Mosaic
        # constant-fold the normalize chain and its compile crashes with
        # "limits[i] <= dim(i) (2 vs. 1)" (bisected 2026-08-20, repro in
        # docs/PROFILE.md); rhs generically overlaps the top eigenvector
        # of the PSD operator, so the Rayleigh estimate converges the
        # same and the FISTA margin absorbs the seed difference
        v = rhs / tile_r(jnp.maximum(jnp.sqrt(cand_sum(rhs * rhs)), 1e-30))

        def pow_body(_, v):
            w = matvec(v)
            return w / tile_r(
                jnp.maximum(jnp.sqrt(cand_sum(w * w)), 1e-30)
            )

        v = jax.lax.fori_loop(0, power_iters, pow_body, v)
        margin = 1.2 if power_iters >= 4 else (
            1.5 if power_iters >= 2 else 1.8
        )
        lips = margin * cand_sum(v * matvec(v))
        etaw = tile_r(1.0 / jnp.maximum(lips, 1e-20))

        # ---- FISTA with box projection; l1 adds the per-candidate
        # soft-threshold before the clip (solver._fista's prox) --------
        lb = lb_ref[:, 0:1]
        ub = ub_ref[:, 0:1]

        def prox(v):
            if has_l1:
                v = jnp.sign(v) * jnp.maximum(
                    jnp.abs(v) - etaw * l1w, 0.0
                )
            return jnp.clip(v, lb, ub)

        def fista_body(_, carry):
            x, y, t = carry
            g = matvec(y) - rhs
            x_new = prox(y - etaw * g)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
            return x_new, y_new, t_new

        xc = jnp.clip(x, lb, ub)
        x, _, _ = jax.lax.fori_loop(
            0, fista_iters, fista_body, (xc, xc, jnp.float32(1.0))
        )
    else:
        x = jnp.clip(x, lb_ref[:, 0:1], ub_ref[:, 0:1])

    x = x * mask
    x_ref[:] = x
    if with_score:
        # cosine score without materializing the reprojection:
        #   num = <P x, b_eff> = <x, rhs>
        #   |P x|^2 = <x, PTP x> = <t_d, Gz-mix(t_d)>   (one GEMM + mix)
        t_d = _dg(x.astype(cdt), a_topt_ref[:, :Dd])  # data section only
        den2 = cand_sum(t_d * data_mix(t_d))
        num = cand_sum(x * rhs)
        den = jnp.sqrt(jnp.maximum(den2, 0.0)) * bn_ref[:, 0:1]
        score_ref[:] = jnp.broadcast_to(
            jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0),
            (R, 128),
        )
    else:
        # widened-envelope configs (2D metrics, thresh clip, lreg seed,
        # l1/l2 retry) score the returned x in XLA — the in-kernel
        # cosine identity does not hold for them
        score_ref[:] = jnp.zeros((R, 128), jnp.float32)


def wide_col(v, R: int, l3: int):
    """(R,) per-candidate scalars -> the kernel's lane-replicated
    (R*l3, 128) column layout (see grouped_pallas_inputs.col_r)."""
    w = jnp.broadcast_to(jnp.reshape(v, (1, R)), (l3, R)).reshape(
        R * l3, 1
    )
    return jnp.broadcast_to(w, (R * l3, 128))


def solve_group_pallas(
    args, static: dict,
    cg_iters: int, fista_iters: int, power_iters: int,
    use_bf16: bool = True, interpret: bool = False,
    l1_col=None, l2_col=None, with_score: bool = True,
):
    """Run the fused grouped solve; returns (x (R*l3, d3sq) f32,
    scores (R, 128) f32, lane-replicated — read column 0).
    args/static from grouped_pallas_inputs.

    l1_col / l2_col: optional (R*l3, 128) lane-replicated per-candidate
    regularization coefficients (wide_col). l2 adds the ridge term to
    every matvec; l1 adds the soft-threshold to the FISTA prox —
    together they cover the reference solver zoo's lreg/lasso/
    elasticnet/ridge objectives (solver_linear_regression.py:205-342).
    with_score=False skips the in-kernel cosine epilogue (callers score
    the returned x in XLA — required for 2D metrics, thresh_fraction,
    and the l1/l2 alpha-decay retry whose kept x may mix scales).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, l3, d3sq = static["R"], static["l3"], static["d3sq"]
    Dd, S1, n_ops = static["Dd"], static["S1"], static["n_ops"]
    RL = R * l3
    rows = Dd + n_ops * S1
    has_l1 = l1_col is not None
    has_l2 = l2_col is not None
    zc = jnp.zeros((RL, 128), jnp.float32)
    kernel = functools.partial(
        _group_kernel,
        R=R, l3=l3, d3sq=d3sq, Dd=Dd, S1=S1, n_ops=n_ops,
        cg_iters=cg_iters, fista_iters=fista_iters,
        power_iters=power_iters, use_bf16=use_bf16,
        has_l1=has_l1, has_l2=has_l2, with_score=with_score,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_matvec = cg_iters + (fista_iters + power_iters + 1 if fista_iters else 0)
    flops_mv = 4 * RL * rows * d3sq
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((RL, d3sq), jnp.float32),
            # 128-lane-replicated scores: narrow (R, 1) VMEM outputs
            # crash the Mosaic output-prep pass; callers take column 0
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
        ),
        in_specs=[vm] * 16,
        out_specs=(vm, vm),
        cost_estimate=pl.CostEstimate(
            flops=flops_mv * (n_matvec + 1),
            bytes_accessed=int(
                2 * rows * d3sq * (2 if use_bf16 else 4)
                + l3 * l3 * R * Dd * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args, l1_col if has_l1 else zc, l2_col if has_l2 else zc)


def validate_grouped_on_device(interpret: bool = False) -> dict:
    """Compile + run the v3 grouped kernel (the production grid path on
    TPU since round 4) against the twist-grouped XLA scorer on a small
    self-contained group, on the current default device. bench.py
    records the result next to the v1/v2 validation each round.

    Since round 5 this validates one row per WIDENED-envelope config
    (VERDICT r4 #2): default lsq/cosine, ridge (l2 in-matvec), lasso
    (l1 prox + alpha-decay retry), elasticnet, lreg seed,
    thresh_fraction clip, and the ssim 2D metric (score-in-XLA path).
    """
    from .geometry import estimate_copy_pair_counts, estimate_n_pair_ops
    from .grid import _group_tables
    from .solver import SolveConfig, _solve_group_impl
    from . import ReconstructionGeometry, select_copies
    from ..helix import simulate_helical_projection

    img = np.asarray(
        simulate_helical_projection(
            n=1, twist=29.4, rise=4.75, csym=1, helical_diameter=100.0,
            ball_radius=6.0, polymer=0, planarity=1.0,
            ny=64, nx=128, apix=2.0, rng=0,
        )
    ).squeeze()
    geom = ReconstructionGeometry(
        d2=14, l2=32, d3=12, l3=4, rmin=0.0, rmax=5.0,
        scale2d_to_3d=0.858, csym=1,
    )
    region = img[: geom.d2, : geom.l2].astype(np.float32)
    rises = np.asarray([1.0, 1.05, 1.1, 1.15, 1.2, 1.25, 1.3, 1.35],
                       np.float32)
    twist = 29.4
    n_copies, n_pairs = estimate_copy_pair_counts(
        geom, float(rises.min()), 8, rise_pixel_max=float(rises.max())
    )
    n_ops = estimate_n_pair_ops(geom, float(rises.min()))
    u = set()
    for r in rises:
        ch, cc, cv = select_copies(geom, float(r), n_copies)
        u.update(zip(ch[cv].tolist(), cc[cv].tolist()))
    rp, m, ch_u, cc_u, pidx, pval, rank = _group_tables(
        geom, twist, rises, n_copies, n_pairs, n_ops, len(u),
        len(rises), {},
    )
    configs = dict(
        default=dict(),
        fsc=dict(fsc_test=2),
        ridge=dict(model="ridge", l2_reg=0.05),
        lasso=dict(model="lasso", l1_reg=1e-4, reg_per_row=True),
        elasticnet=dict(
            model="elasticnet", l1_reg=5e-5, l2_reg=5e-5,
            reg_per_row=True,
        ),
        lreg=dict(model="lreg"),
        thresh=dict(thresh_fraction=0.1),
        ssim=dict(score_metric="ssim"),
    )
    out = {
        "device": str(jax.devices()[0].device_kind),
        "interpret": bool(interpret),
    }
    ok = True
    for name, kw in configs.items():
        cfg = SolveConfig(
            interpolation="nn", cg_iters=6, fista_iters=8,
            power_iters=2, separable=True, compute_dtype="float32",
            **kw,
        )
        common = (
            geom, cfg, jnp.asarray(region), jnp.float32(twist),
            jnp.asarray(rp), jnp.asarray(m), jnp.asarray(ch_u),
            jnp.asarray(cc_u), jnp.asarray(pidx), jnp.asarray(pval),
            jnp.asarray(rank),
        )
        s_xla = np.asarray(
            _solve_group_impl(*common, n_ops_u=n_ops, fused_ntn=True)
        )
        s_pal = np.asarray(
            _solve_group_impl(
                *common, n_ops_u=n_ops, use_pallas=True,
                pallas_interpret=interpret,
            )
        )
        err = float(np.abs(s_xla - s_pal).max())
        key = (
            "v3_score_abs_err" if name == "default"
            else f"v3_{name}_abs_err"
        )
        out[key] = err
        ok = ok and err < 5e-3
    out["ok"] = bool(ok)
    return out


def validate_on_device(interpret: bool = False) -> dict:
    """Run BOTH compiled kernels (v1 factor-consuming solve; v2
    in-kernel operator build + score) on the current default device
    against the XLA closure path, on a small self-contained problem.

    The standing on-real-chip validation (VERDICT r2 #2): bench.py
    calls this on the TPU every round and records the relative errors
    in the bench JSON; the in-suite tests cover interpret mode on CPU.
    Tolerance is 5e-3 relative: the two paths schedule their matmuls
    differently (TPU f32 matmuls run bf16-pass arithmetic), so an
    iterative CG+FISTA solve legitimately drifts ~1e-3; a Mosaic
    lowering bug produces garbage, not 1e-3.
    """
    import math

    from . import ReconstructionGeometry, select_copies, select_pair_ops
    from .projector_separable import build_problem_separable
    from .solver import _cg, _cosine, _fista, _power_iteration

    geom = ReconstructionGeometry(
        d2=12, l2=16, d3=12, l3=8, rmin=0.0, rmax=5.0,
        scale2d_to_3d=1.0, csym=1,
    )
    rng = np.random.default_rng(0)
    region = rng.random((geom.d2, geom.l2)).astype(np.float32)
    ch, cc, cv = select_copies(geom, 2.5, 6)
    ops_hc, ops_v, pair_idx, pv = select_pair_ops(geom, 30.0, 2.5, 5, 8)
    phc = np.zeros((5, 4), np.int32)
    ops = build_problem_separable(
        geom, region, jnp.float32(30.0), jnp.float32(2.5),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv), 0.0, "nn",
        geom.cylindrical_mask(), geom.cell_valid_mask(),
        compute_dtype=jnp.float32,
        pair_ops=(jnp.asarray(ops_hc), jnp.asarray(ops_v),
                  jnp.asarray(pair_idx)),
    )
    mask_f = jnp.asarray(geom.cylindrical_mask(), jnp.float32)
    rowv = ops["row_valid"].astype(jnp.float32)
    b_eff = ops["b"][None] * rowv
    rhs = ops["PT"](b_eff) * mask_f
    CG, FI, PW = 8, 10, 4
    lb, ub = 0.0, float(jnp.max(b_eff))
    PTP, S, ST = ops["PTP"], ops["S"], ops["ST"]

    out = {"device": str(jax.devices()[0].device_kind),
           "interpret": bool(interpret)}

    # ---- v1: factor-consuming solve, l2+l1 regularized
    l2_reg, l1_reg = 0.01, 0.001

    def N1(v):
        return (PTP(v) + ST(S(v))) * mask_f + l2_reg * v * mask_f

    x = _cg(N1, rhs, CG)
    lips = _power_iteration(N1, rhs.shape, PW)
    x_ref = np.asarray(
        _fista(N1, rhs, x, lb, ub, l1_reg, FI, lips) * mask_f
    ).reshape(geom.l3, -1)
    w2, w2t, gz_big, mxy, mxyt, b1, b1t, pok, maskk = pallas_inputs(
        ops["factors"], jnp.float32
    )
    scal = jnp.asarray([[l2_reg, l1_reg, lb, ub]], jnp.float32)
    x_k = np.asarray(solve_candidate_pallas(
        w2, w2t, gz_big, mxy, mxyt, b1, b1t, pok,
        jnp.asarray(rhs).reshape(geom.l3, -1), maskk, scal,
        cg_iters=CG, fista_iters=FI, power_iters=PW,
        use_bf16=False, interpret=interpret,
    ))
    out["v1_rel_err"] = float(
        np.abs(x_k - x_ref).max() / max(np.abs(x_ref).max(), 1e-30)
    )

    # ---- v2: in-kernel operator build + solve + cosine score
    def N2(v):
        return (PTP(v) + ST(S(v))) * mask_f

    x = _cg(N2, rhs, CG)
    lips = _power_iteration(N2, rhs.shape, PW)
    x2 = _fista(N2, rhs, x, lb, ub, 0.0, FI, lips) * mask_f
    pred = ops["P"](x2) * rowv
    score_ref = float(_cosine(pred.ravel(), b_eff.ravel()))
    x2_ref = np.asarray(x2).reshape(geom.l3, -1)
    inp = full_kernel_inputs(
        geom, ops, jnp.float32(30.0), jnp.float32(2.5),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(ops_hc), jnp.float32,
    )
    (theta, cvf, opth, gzb, uf, b1, b1t, pok, maskk, pln, b_norm) = inp
    scal2 = jnp.asarray(
        [[0.0, 0.0, lb, ub, float(b_norm), 0, 0, 0]], jnp.float32
    )
    n_taps = int(math.ceil(math.sqrt(2.0) / geom.scale2d_to_3d)) + 2
    x2_k, sc = score_candidate_pallas(
        theta, cvf, opth, gzb, uf, b1, b1t, pok, maskk, pln, scal2,
        C=len(theta), d2=geom.d2, d3=geom.d3, l3=geom.l3, n_taps=n_taps,
        cg_iters=CG, fista_iters=FI, power_iters=PW, use_bf16=False,
        scale2d_to_3d=geom.scale2d_to_3d, dy_pixel=0.0, interpret=interpret,
    )
    out["v2_rel_err"] = float(
        np.abs(np.asarray(x2_k) - x2_ref).max()
        / max(np.abs(x2_ref).max(), 1e-30)
    )
    out["v2_score_abs_err"] = float(
        abs(float(np.asarray(sc)[0, 0]) - score_ref)
    )
    out["ok"] = bool(
        out["v1_rel_err"] < 5e-3
        and out["v2_rel_err"] < 5e-3
        and out["v2_score_abs_err"] < 5e-3
    )
    return out
