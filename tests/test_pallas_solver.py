"""Interpret-mode parity of the fused Pallas solve kernel vs the XLA
closures (CPU; the compiled kernel is exercised on real TPU hardware by
the bench/session tooling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy solver/parity coverage: run explicitly or without -m "not slow"

from helicon_tpu.denovo3d import (
    ReconstructionGeometry,
    select_copies,
    select_pair_ops,
)
from helicon_tpu.denovo3d.pallas_solver import (
    fits_vmem,
    pallas_inputs,
    solve_candidate_pallas,
)
from helicon_tpu.denovo3d.projector_separable import build_problem_separable
from helicon_tpu.denovo3d.solver import _cg, _fista, _power_iteration


@pytest.fixture(scope="module")
def small_problem():
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
    return geom, ops


def test_kernel_matches_xla_solve(small_problem):
    geom, ops = small_problem
    assert "factors" in ops
    mask_f = jnp.asarray(geom.cylindrical_mask(), jnp.float32)
    rowv = ops["row_valid"].astype(jnp.float32)
    b_eff = ops["b"][None] * rowv
    rhs = ops["PT"](b_eff) * mask_f
    l2_reg, l1_reg, lb, ub = 0.01, 0.001, 0.0, float(jnp.max(b_eff))
    CG, FI, PW = 8, 10, 4

    PTP, S, ST = ops["PTP"], ops["S"], ops["ST"]

    def N(v):
        return (PTP(v) + ST(S(v))) * mask_f + l2_reg * v * mask_f

    x = _cg(N, rhs, CG)
    lips = _power_iteration(N, rhs.shape, PW)
    x = _fista(N, rhs, x, lb, ub, l1_reg, FI, lips)
    x_ref = np.asarray(x * mask_f).reshape(geom.l3, -1)

    w2, w2t, gz_big, mxy, mxyt, b1, b1t, pok, maskk = pallas_inputs(
        ops["factors"], jnp.float32
    )
    scal = jnp.asarray([[l2_reg, l1_reg, lb, ub]], jnp.float32)
    x_k = np.asarray(
        solve_candidate_pallas(
            w2, w2t, gz_big, mxy, mxyt, b1, b1t, pok,
            jnp.asarray(rhs).reshape(geom.l3, -1), maskk, scal,
            cg_iters=CG, fista_iters=FI, power_iters=PW,
            use_bf16=False, interpret=True,
        )
    )
    rel = np.abs(x_k - x_ref).max() / max(np.abs(x_ref).max(), 1e-30)
    assert rel < 1e-4, rel


def test_fits_vmem_gate():
    assert fits_vmem(131, 28, 784, 5, 4, jnp.bfloat16)  # bench geometry
    assert not fits_vmem(131, 28, 44**2, 20, 24, jnp.float32)  # huge


def test_validate_on_device_harness():
    """The standing validation harness (bench.py runs it compiled on the
    real chip each round) reports ok in interpret mode too."""
    from helicon_tpu.denovo3d.pallas_solver import validate_on_device

    out = validate_on_device(interpret=True)
    assert out["ok"], out
    assert out["v1_rel_err"] < 1e-4 and out["v2_rel_err"] < 1e-4, out


def test_validate_grouped_on_device_harness():
    """Same standing harness for the v3 grouped kernel (the production
    TPU grid path since round 4)."""
    from helicon_tpu.denovo3d.pallas_solver import validate_grouped_on_device

    out = validate_grouped_on_device(interpret=True)
    assert out["ok"], out
    assert out["v3_score_abs_err"] < 1e-4, out


@pytest.mark.parametrize("interp", ["nn", "linear"])
def test_grouped_kernel_matches_xla(interp):
    """v3 grouped kernel (whole twist-group CG/power/FISTA fused in one
    kernel, A_top VMEM-resident) score-matches the twist-grouped XLA
    path in interpret mode — for BOTH interpolation modes, since the
    operator build stays in XLA (closing the v2 nn-only gap)."""
    from helicon_tpu.denovo3d.geometry import (
        estimate_copy_pair_counts,
        estimate_n_pair_ops,
    )
    from helicon_tpu.denovo3d.grid import _group_tables
    from helicon_tpu.denovo3d.solver import SolveConfig, _solve_group_impl
    from helicon_tpu.helix import simulate_helical_projection

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
    rises = np.asarray([1.0, 1.1, 1.2], np.float32)
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
        geom, twist, rises, n_copies, n_pairs, n_ops, len(u), 8, {}
    )
    cfg = SolveConfig(
        interpolation=interp, model="lsq", cg_iters=6, fista_iters=8,
        power_iters=2, separable=True, compute_dtype="float32",
    )
    common = (
        geom, cfg, jnp.asarray(region), jnp.float32(twist),
        jnp.asarray(rp), jnp.asarray(m), jnp.asarray(ch_u),
        jnp.asarray(cc_u), jnp.asarray(pidx), jnp.asarray(pval),
    )
    s_xla = np.asarray(
        _solve_group_impl(*common, n_ops_u=n_ops, fused_ntn=True)
    )
    s_pal = np.asarray(
        _solve_group_impl(
            *common, n_ops_u=n_ops, use_pallas=True, pallas_interpret=True
        )
    )
    assert np.abs(s_xla - s_pal).max() < 1e-4


def test_fits_vmem_grouped_gate():
    from helicon_tpu.denovo3d.pallas_solver import fits_vmem_grouped

    # bench-like group geometry fits; an absurdly large one does not
    assert fits_vmem_grouped(131, 28, 784, 5, 4, 16, jnp.bfloat16)
    assert not fits_vmem_grouped(
        400, 64, 44 * 44, 20, 24, 64, jnp.float32
    )


def test_full_pipeline_kernel_matches_xla(small_problem):
    """v2 kernel (in-kernel operator build + solve + cosine score)
    matches the XLA path exactly in interpret mode."""
    import math

    from helicon_tpu.denovo3d import select_copies, select_pair_ops
    from helicon_tpu.denovo3d.pallas_solver import (
        full_kernel_inputs,
        score_candidate_pallas,
    )
    from helicon_tpu.denovo3d.solver import _cosine

    geom, ops = small_problem
    mask_f = jnp.asarray(geom.cylindrical_mask(), jnp.float32)
    rowv = ops["row_valid"].astype(jnp.float32)
    b_eff = ops["b"][None] * rowv
    rhs = ops["PT"](b_eff) * mask_f
    CG, FI, PW = 8, 10, 4
    lb, ub = 0.0, float(jnp.max(b_eff))

    PTP, S, ST = ops["PTP"], ops["S"], ops["ST"]

    def N(v):
        return (PTP(v) + ST(S(v))) * mask_f

    x = _cg(N, rhs, CG)
    lips = _power_iteration(N, rhs.shape, PW)
    x = _fista(N, rhs, x, lb, ub, 0.0, FI, lips) * mask_f
    pred = ops["P"](x) * rowv
    score_ref = float(_cosine(pred.ravel(), b_eff.ravel()))
    x_ref = np.asarray(x).reshape(geom.l3, -1)

    ch, cc, cv = select_copies(geom, 2.5, 6)
    ops_hc, *_ = select_pair_ops(geom, 30.0, 2.5, 5, 8)
    inp = full_kernel_inputs(
        geom, ops, jnp.float32(30.0), jnp.float32(2.5),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(ops_hc), jnp.float32,
    )
    (theta, cvf, opth, gzb, uf, b1, b1t, pok, maskk, pln, b_norm) = inp
    scal = jnp.asarray(
        [[0.0, 0.0, lb, ub, float(b_norm), 0, 0, 0]], jnp.float32
    )
    n_taps = int(math.ceil(math.sqrt(2.0) / geom.scale2d_to_3d)) + 2
    x_k, sc = score_candidate_pallas(
        theta, cvf, opth, gzb, uf, b1, b1t, pok, maskk, pln, scal,
        C=len(theta), d2=geom.d2, d3=geom.d3, l3=geom.l3, n_taps=n_taps,
        cg_iters=CG, fista_iters=FI, power_iters=PW, use_bf16=False,
        scale2d_to_3d=geom.scale2d_to_3d, dy_pixel=0.0, interpret=True,
    )
    rel = np.abs(np.asarray(x_k) - x_ref).max() / max(
        np.abs(x_ref).max(), 1e-30
    )
    assert rel < 1e-4, rel
    assert abs(float(np.asarray(sc)[0, 0]) - score_ref) < 1e-4


def test_pallas_auto_regime_policy():
    """auto mode engages the grouped kernel only in the measured-win
    regime: bf16 compute, production-scale iteration budgets. The
    accuracy mode's float32/converged config stays on XLA (its Mosaic
    compile fails and its 1e-5 oracle contract needs XLA's "highest"
    matmul precision)."""
    from helicon_tpu.denovo3d.grid import _pallas_auto_regime
    from helicon_tpu.denovo3d.solver import SolveConfig

    bench = SolveConfig(cg_iters=10, fista_iters=16, power_iters=2,
                        compute_dtype="bfloat16", separable=True)
    assert _pallas_auto_regime(bench)
    accurate = SolveConfig(cg_iters=400, fista_iters=2000, power_iters=8,
                           compute_dtype="float32", separable=True)
    assert not _pallas_auto_regime(accurate)
    f32_short = SolveConfig(cg_iters=10, fista_iters=16, power_iters=2,
                            compute_dtype="float32", separable=True)
    assert not _pallas_auto_regime(f32_short)


# ---- widened grouped-kernel envelope (VERDICT r4 #2) ---------------------


def _grouped_case():
    """Shared group problem for the envelope parity tests (mirrors
    test_grouped_kernel_matches_xla's setup, returns rank too)."""
    from helicon_tpu.denovo3d.geometry import (
        estimate_copy_pair_counts,
        estimate_n_pair_ops,
    )
    from helicon_tpu.denovo3d.grid import _group_tables
    from helicon_tpu.helix import simulate_helical_projection

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
    rises = np.asarray([1.0, 1.1, 1.2], np.float32)
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
        geom, twist, rises, n_copies, n_pairs, n_ops, len(u), 8, {}
    )
    common = (
        geom, jnp.asarray(region), jnp.float32(twist),
        jnp.asarray(rp), jnp.asarray(m), jnp.asarray(ch_u),
        jnp.asarray(cc_u), jnp.asarray(pidx), jnp.asarray(pval),
    )
    return common, jnp.asarray(rank), n_ops


ENVELOPE_CONFIGS = dict(
    fsc=dict(fsc_test=2),
    ridge=dict(model="ridge", l2_reg=0.05),
    lasso=dict(model="lasso", l1_reg=1e-4, reg_per_row=True),
    elasticnet=dict(
        model="elasticnet", l1_reg=5e-5, l2_reg=5e-5, reg_per_row=True
    ),
    lreg=dict(model="lreg"),
    thresh=dict(thresh_fraction=0.1),
    ssim=dict(score_metric="ssim"),
    mutual_information=dict(score_metric="mutual_information"),
)


@pytest.mark.parametrize("name", sorted(ENVELOPE_CONFIGS))
def test_grouped_kernel_widened_envelope_matches_xla(name):
    """Every widened-envelope config (l1/l2 solver zoo, thresh clip,
    lreg seed, 2D metrics) score-matches the XLA grouped path in
    interpret mode — the kernel solves, XLA scores where the in-kernel
    cosine identity does not hold."""
    from helicon_tpu.denovo3d.solver import SolveConfig, _solve_group_impl

    common, rank, n_ops = _grouped_case()
    geom = common[0]
    cfg = SolveConfig(
        interpolation="nn", cg_iters=6, fista_iters=8, power_iters=2,
        separable=True, compute_dtype="float32",
        **ENVELOPE_CONFIGS[name],
    )
    args = (geom, cfg) + common[1:]
    s_xla = np.asarray(
        _solve_group_impl(*args, rank, n_ops_u=n_ops, fused_ntn=True)
    )
    s_pal = np.asarray(
        _solve_group_impl(
            *args, rank, n_ops_u=n_ops, use_pallas=True,
            pallas_interpret=True,
        )
    )
    assert np.all(np.isfinite(s_pal)), s_pal
    # iterative solves + reassociated scoring: small float drift only
    assert np.abs(s_xla - s_pal).max() < 5e-4, (name, s_xla, s_pal)


def test_pallas_group_compat_envelope():
    """The gate accepts the widened solver-zoo configs and still
    rejects fsc/ard/non-separable."""
    from helicon_tpu.denovo3d.grid import _pallas_group_compat
    from helicon_tpu.denovo3d.solver import SolveConfig

    for kw in ENVELOPE_CONFIGS.values():
        assert _pallas_group_compat(SolveConfig(separable=True, **kw)), kw
    # fsc rides the kernel only on the default lsq+cosine config
    assert not _pallas_group_compat(
        SolveConfig(separable=True, fsc_test=2, model="ridge", l2_reg=0.1)
    )
    assert not _pallas_group_compat(
        SolveConfig(separable=True, fsc_test=2, score_metric="ssim")
    )
    assert not _pallas_group_compat(SolveConfig(separable=True, model="ard"))
    assert not _pallas_group_compat(SolveConfig(separable=False))


def test_pallas_fallback_is_logged(caplog):
    """VERDICT r4 #2: falling off the fused kernel is never silent."""
    import logging

    from helicon_tpu.denovo3d import grid as grid_mod

    grid_mod._pallas_fallback_logged.clear()
    with caplog.at_level(logging.INFO, logger="helicon"):
        grid_mod._log_pallas_fallback("test-reason")
        grid_mod._log_pallas_fallback("test-reason")  # deduplicated
    msgs = [r for r in caplog.records if "test-reason" in r.message]
    assert len(msgs) == 1
