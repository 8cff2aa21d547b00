#!/usr/bin/env python
"""Measured roofline for the PRODUCTION-SCALE geometry (VERDICT r4 #1).

The large bench config (d3=64, l3=18, linear interpolation, R_pad=32,
bf16) is fit-gated out of the fused grouped Pallas kernel — its
whole-group operator state exceeds VMEM at any R >= 8 — so it scores on
the XLA grouped path at ~198.8 cand/s (MFU 0.395). Round 4 recorded
that as a justification; this study supplies the MEASURED floor the
justification was missing, with the same methodology the toy config got
(docs/PROFILE.md round-4 roofline):

  1. derive the EXACT large geometry the bench run uses (same code
     path: prepare_data -> derive_task_geometry -> _pixel_geometry);
  2. build one real 32-candidate twist-group's operators;
  3. time, on the chip:
       a. pure-GEMM floor — a chained loop of ONLY the two big
          A_top GEMMs at the exact (M=R*l3, K=d3^2, N=rows) shapes;
       b. the full NTN matvec (GEMMs + Gz data-mix + per-op z-mix +
          Cn Laplacian glue), vmapped over the group like production;
       c. the complete group solve (_solve_group_impl: tensors build +
          rhs + CG/power/FISTA + score);
  4. print one JSON with TFLOP/s for each stage, the glue fraction,
     and the % of the measured floor that the end-to-end bench rate
     achieves.

Run on the real chip (one process at a time!):
    python docs/pallas_study_large.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def derive_large_group():
    """Exact large-bench geometry + one real 32-candidate twist-group's
    tables, derived by the same code path reconstruct_grid uses."""
    from bench import _large_workload
    from helicon_tpu.core.filters import down_scale
    from helicon_tpu.denovo3d import ReconstructionGeometry, select_copies
    from helicon_tpu.denovo3d.geometry import (
        estimate_copy_pair_counts,
        estimate_n_pair_ops,
    )
    from helicon_tpu.denovo3d.grid import _group_tables
    from helicon_tpu.denovo3d.pipeline import (
        _pixel_geometry,
        auto_sym_oversample,
        derive_task_geometry,
        prepare_data,
    )

    img, twists, rises, kwargs = _large_workload()
    img = np.asarray(img).squeeze()
    data = prepare_data(img, kwargs["apix"], "", -1, -1, 1)
    ny0, nx0 = data.shape
    g_rise_lo, g_rise_hi = float(np.min(rises)), float(np.max(rises))
    rise_ref = g_rise_hi
    g = derive_task_geometry(
        (ny0, nx0), kwargs["apix"], rise_ref, (g_rise_lo, g_rise_hi),
        (0.0, 0.0), -1.0, kwargs["tube_diameter"], 0.0,
        kwargs["reconstruct_length_rise"] * rise_ref,
        kwargs["target_apix2d"], kwargs["target_apix3d"], None,
    )
    target_apix2d = g["target_apix2d"]
    data = np.asarray(down_scale(data, target_apix2d, kwargs["apix"]))
    ny, nx = data.shape
    pg = _pixel_geometry(g, (ny, nx), rise_ref)
    target_apix3d = pg["target_apix3d"]
    geom = ReconstructionGeometry(
        d2=pg["d2"], l2=pg["l2"], d3=pg["d3"], l3=pg["l3"],
        rmin=pg["d3_inner"] / 2, rmax=pg["d3"] // 2 - 1,
        scale2d_to_3d=target_apix2d / target_apix3d, csym=1,
    )
    sym_oversample = auto_sym_oversample(pg["l3"], pg["d3"], pg["d3_inner"])
    rise_pixels = rises / target_apix3d
    n_copies, n_pairs = estimate_copy_pair_counts(
        geom, float(np.min(rise_pixels)), sym_oversample,
        rise_pixel_max=float(np.max(rise_pixels)),
    )
    n_ops = estimate_n_pair_ops(geom, float(np.min(rise_pixels)))
    region = data[
        ny // 2 - geom.d2 // 2 : ny // 2 + geom.d2 // 2,
        nx // 2 - geom.l2 // 2 : nx // 2 + geom.l2 // 2,
    ]

    # one real group: first twist's first 32 rises (the bench grid is
    # 32 rises/twist after the lexsort slice)
    t0 = float(twists[0])
    sel = np.where(twists == t0)[0][:32]
    rp = rise_pixels[sel].astype(np.float32)
    R = len(rp)
    u = set()
    copy_cache = {}
    for r in np.unique(rise_pixels):
        ch, cc, cv = select_copies(geom, float(r), n_copies)
        copy_cache[float(r)] = (ch, cc, cv)
        u.update(zip(ch[cv].tolist(), cc[cv].tolist()))
    C_u = len(u)
    tables = _group_tables(
        geom, t0, rp, n_copies, n_pairs, n_ops, C_u, R, copy_cache
    )
    return geom, region, t0, tables, int(n_ops), C_u, R


def _timeit(fn, reps=3):
    fn()  # compile + warm
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def main():
    from helicon_tpu.denovo3d.projector_grouped import (
        build_candidate_problem_grouped,
        build_group_shared,
    )
    from helicon_tpu.denovo3d.solver import SolveConfig, _solve_group_impl

    geom, region, twist, tables, n_ops, C_u, R = derive_large_group()
    rp, m, ch_u, cc_u, pidx, pval, rank = tables
    d2, l2, d3, l3 = geom.d2, geom.l2, geom.d3, geom.l3
    d3sq = d3 * d3
    rows = C_u * d2 + n_ops * d3sq
    RL = R * l3
    out = dict(
        device=str(jax.devices()[0].device_kind),
        geom=dict(d2=d2, l2=l2, d3=d3, l3=l3, C_u=C_u, n_ops=n_ops,
                  rows=rows, R=R, RL=RL),
    )
    cfg = SolveConfig(
        interpolation="linear", model="lsq", cg_iters=10, fista_iters=16,
        power_iters=2, separable=True, compute_dtype="bfloat16",
    )
    K_CHAIN = 16  # matvecs per timed call

    # ---- (a) pure-GEMM floor at the exact shapes ---------------------
    # NOTE: the big operands must be TRACED arguments, not closure
    # constants — baked-in constants ride the tunnel's compile request
    # and trip its body-size limit (HTTP 413) at these shapes
    a_top = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((rows, d3sq)), jnp.bfloat16
    ))

    @jax.jit
    def gemm_chain(a_top, x):  # x (RL, d3sq) f32
        def body(x, _):
            t = jax.lax.dot_general(
                x.astype(jnp.bfloat16), a_top,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (RL, rows)
            y = jax.lax.dot_general(
                t.astype(jnp.bfloat16), a_top,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (RL, d3sq)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30), None

        x, _ = jax.lax.scan(body, x, None, length=K_CHAIN)
        return x

    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((RL, d3sq)), jnp.float32
    )
    t_gemm = _timeit(lambda: jax.block_until_ready(gemm_chain(a_top, x0)))
    gemm_flops = 4.0 * RL * rows * d3sq * K_CHAIN
    out["gemm_floor_tflops"] = round(gemm_flops / t_gemm / 1e12, 2)

    # ---- (b) full NTN matvec, vmapped over the group like production -
    # build the shared operators INSIDE the jit from small traced
    # inputs (exactly how production does it): no big constants in the
    # compile payload
    region_j = jnp.asarray(region, jnp.float32)
    hmax_p = (n_ops // geom.csym - 1) // 2
    ops_h_np = np.repeat(np.arange(-hmax_p, hmax_p + 1), geom.csym)
    ops_c_np = np.tile(np.arange(geom.csym), 2 * hmax_p + 1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def ntn_chain(region_t, twist_t, ch_t, cc_t, oh_t, oc_t,
                  x_batch, rises_pixel, m_counts, pidx_b, pval_b,
                  k=16):
        shared = build_group_shared(
            geom, twist_t, ch_t, cc_t, oh_t, oc_t,
            dy_pixel=0.0, interpolation="linear",
            mask=geom.cylindrical_mask(), cellok=geom.cell_valid_mask(),
            compute_dtype=jnp.bfloat16,
        )

        def one(x, rise_pixel, m_r, pidx_r, pval_r):
            sqrt_m = jnp.sqrt(m_r.astype(jnp.float32))
            ops, _ = build_candidate_problem_grouped(
                shared, geom, region_t, rise_pixel, sqrt_m, pidx_r,
                pval_r,
            )

            def body(x, _):
                y = ops["NTN"](x.reshape(l3, d3, d3)).reshape(l3, d3sq)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30), None

            x, _ = jax.lax.scan(body, x, None, length=k)
            return x

        return jax.vmap(one)(x_batch, rises_pixel, m_counts, pidx_b, pval_b)

    xb = jnp.asarray(
        np.random.default_rng(2).standard_normal((R, l3, d3sq)), jnp.float32
    )
    args_b = (
        region_j, jnp.float32(twist), jnp.asarray(ch_u), jnp.asarray(cc_u),
        jnp.asarray(ops_h_np, jnp.int32), jnp.asarray(ops_c_np, jnp.int32),
        xb, jnp.asarray(rp), jnp.asarray(m), jnp.asarray(pidx),
        jnp.asarray(pval),
    )
    # DIFFERENCE two chain lengths: (t_24 - t_8)/16 isolates steady-state
    # matvec time from the group's one-time operator build + dispatch
    t_ntn8 = _timeit(
        lambda: jax.block_until_ready(ntn_chain(*args_b, k=8))
    )
    t_ntn24 = _timeit(
        lambda: jax.block_until_ready(ntn_chain(*args_b, k=24))
    )
    t_ntn = t_ntn24 - t_ntn8  # time of 16 extra matvecs
    out["ntn_group_build_plus_8mv_s"] = round(t_ntn8, 4)
    # analytic per-matvec flops (same accounting as PROFILE.md): the
    # two big GEMMs + Gz data-mix + two Mz_ops z-contractions
    per_mv = (
        4.0 * rows * d3sq * l3
        + 2.0 * C_u * d2 * l3 * l3
        + 4.0 * n_ops * d3sq * l3 * l3
    ) * R
    out["ntn_matvec_tflops"] = round(per_mv * K_CHAIN / t_ntn / 1e12, 2)
    out["ntn_vs_gemm_floor"] = round(
        (per_mv * K_CHAIN / t_ntn) / (gemm_flops / t_gemm), 3
    )
    out["ntn_ms_per_matvec"] = round(t_ntn / K_CHAIN * 1e3, 3)

    # ---- (c) complete group solve (prod code path) -------------------
    common = (
        geom, cfg, region_j, jnp.float32(twist), jnp.asarray(rp),
        jnp.asarray(m), jnp.asarray(ch_u), jnp.asarray(cc_u),
        jnp.asarray(pidx), jnp.asarray(pval),
    )
    solve = jax.jit(
        functools.partial(
            _solve_group_impl, n_ops_u=n_ops, fused_ntn=True
        ),
        static_argnums=(0, 1),
    )
    t_solve = _timeit(
        lambda: jax.block_until_ready(solve(*common)), reps=3
    )
    out["group_solve_s"] = round(t_solve, 4)
    out["solve_cand_per_s"] = round(R / t_solve, 1)
    n_matvec = cfg.cg_iters + cfg.fista_iters + cfg.power_iters + 1
    out["n_matvec"] = n_matvec
    out["matvec_bound_cand_per_s"] = round(
        R / (n_matvec * t_ntn / K_CHAIN), 1
    )
    # end-to-end reference (BENCH_r04): 198.8 cand/s
    out["bench_end_to_end_cand_per_s"] = 198.8
    out["bench_vs_solve_bound"] = round(198.8 / (R / t_solve), 3)
    out["bench_vs_matvec_bound"] = round(
        198.8 / (R / (n_matvec * t_ntn / K_CHAIN)), 3
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
