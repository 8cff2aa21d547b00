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
Callers must check `fits_vmem(factors)` and fall back to the XLA
closures otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["solve_candidate_pallas", "fits_vmem", "pallas_inputs"]

# leave headroom out of the ~16 MB/core VMEM for temporaries
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
