"""Direct numerical parity against the ACTUAL reference solver.

Imports the reference package from /root/reference/src (read-only) with
its unavailable heavy deps stubbed out (numba.jit -> identity, etc. — the
reference's pure-Python kernel semantics are unchanged), runs its real
``lsq_reconstruct`` (webApps/denovo3D/solver_linear_regression.py:31) and
ours on identical inputs, and asserts:

- scores agree within 5e-3 at default iteration counts (the residual gap
  is CG/FISTA-vs-LSMR convergence detail; with the nn sym-row dedup mask
  the measured diffs are 3.5e-4 .. 3.7e-3), and
- the candidate ORDERING over a small (twist, rise) set is identical —
  the property the grid search actually depends on, and
- our converged solution achieves a LOWER least-squares objective than
  the reference's on the identical (deduped) equation set — the
  remaining score gap is the reference's own early termination
  (scipy lsq_linear tol=1e-2, solver_linear_regression.py:240-268),
  measured J(ours)=70.14 vs J(ref)=72.13 on the probe problem.

Skipped when /root/reference is not present.
"""

import os
import sys
import types
import warnings

import numpy as np
import pytest

REF = "/root/reference/src"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference checkout not available"
    ),
    # imports + runs the ACTUAL reference solver per test
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def ref_solver():
    sys.path.insert(0, REF)
    for name in [
        "mrcfile",
        "starfile",
        "numba",
        "finufft",
        "quaternionic",
        "xmltodict",
        "shiny",
        "tqdm",
        "numba.core",
        "numba.core.errors",
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))
    nb = sys.modules["numba"]

    def _jit(*a, **k):
        def deco(f):
            return f

        return deco

    if not hasattr(nb, "jit"):
        nb.jit = _jit
        nb.njit = _jit
        nb.prange = range
        nb.set_num_threads = lambda n: None
    if not hasattr(sys.modules["numba.core.errors"], "NumbaPendingDeprecationWarning"):
        sys.modules["numba.core.errors"].NumbaPendingDeprecationWarning = Warning
    if not hasattr(sys.modules["tqdm"], "tqdm"):
        sys.modules["tqdm"].tqdm = lambda x, **k: x
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from helicon.webApps.denovo3D import solver_linear_regression as ref

    return ref


COMMON = dict(
    scale2d_to_3d=1.0,
    csym=1,
    reconstruct_diameter_2d_pixel=20,
    reconstruct_diameter_3d_pixel=20,
    reconstruct_length_2d_pixel=32,
    reconstruct_length_3d_pixel=12,
    # large enough that both sides include ALL symmetry copies/pairs —
    # removes equation-subset-selection differences from the comparison
    sym_oversample=1000,
    interpolation="nn",
    fsc_test=0,
    verbose=0,
)


@pytest.fixture(scope="module")
def test_image():
    import helicon_tpu as ht

    imgs = ht.simulate_helical_projection(
        n=1,
        twist=30,
        rise=6,
        csym=1,
        helical_diameter=40,
        ball_radius=5,
        polymer=0,
        planarity=1,
        ny=32,
        nx=48,
        apix=2,
        rng=0,
    )
    return np.squeeze(np.asarray(imgs)).astype(np.float32)


def test_scores_match_reference(ref_solver, test_image):
    from helicon_tpu.denovo3d.solver import lsq_reconstruct as mine

    candidates = [(30.0, 3.0), (29.0, 3.0), (30.0, 2.6), (25.0, 3.4)]
    s_ref, s_mine = [], []
    for tw, ri in candidates:
        _, sr = ref_solver.lsq_reconstruct(
            projection_image=test_image, twist_degree=tw, rise_pixel=ri, **COMMON
        )
        _, sm = mine(
            projection_image=test_image, twist_degree=tw, rise_pixel=ri, **COMMON
        )
        s_ref.append(sr)
        s_mine.append(sm)
    s_ref = np.asarray(s_ref)
    s_mine = np.asarray(s_mine)
    # absolute agreement (measured diffs 3.5e-4 .. 3.7e-3)
    np.testing.assert_allclose(s_mine, s_ref, atol=5e-3)
    # and — the property the grid search depends on — identical ordering
    assert list(np.argsort(s_mine)) == list(np.argsort(s_ref))


def test_csym2_scores_match_reference(ref_solver):
    """csym > 1 parity (measured diffs 3.6-3.7e-3 at default iterations,
    same regime as csym=1)."""
    import helicon_tpu as ht
    from helicon_tpu.denovo3d.solver import lsq_reconstruct as mine

    imgs = ht.simulate_helical_projection(
        n=1, twist=30, rise=6, csym=2, helical_diameter=40, ball_radius=5,
        polymer=0, planarity=1, ny=32, nx=48, apix=2, rng=1,
    )
    img = np.squeeze(np.asarray(imgs)).astype(np.float32)
    common = dict(COMMON)
    common["csym"] = 2
    for tw, ri in [(30.0, 3.0), (25.0, 3.4)]:
        _, s_ref = ref_solver.lsq_reconstruct(
            projection_image=img, twist_degree=tw, rise_pixel=ri, **common
        )
        _, s_mine = mine(
            projection_image=img, twist_degree=tw, rise_pixel=ri, **common
        )
        assert abs(s_mine - s_ref) < 8e-3, (tw, ri, s_mine, s_ref)


def test_linear_interpolation_scores_match_reference(ref_solver, test_image):
    """Trilinear path parity (measured 5.1e-3 / 9.4e-3 at default
    iterations — looser than nn because the reference's linear kernel
    has no row dedup and its lsq_linear under-converges; orderings still
    track)."""
    from helicon_tpu.denovo3d.solver import lsq_reconstruct as mine

    common = dict(COMMON)
    common["interpolation"] = "linear"
    for tw, ri in [(30.0, 3.0), (25.0, 3.4)]:
        _, s_ref = ref_solver.lsq_reconstruct(
            projection_image=test_image, twist_degree=tw, rise_pixel=ri,
            **common,
        )
        _, s_mine = mine(
            projection_image=test_image, twist_degree=tw, rise_pixel=ri,
            **common,
        )
        assert abs(s_mine - s_ref) < 2e-2, (tw, ri, s_mine, s_ref)


def test_objective_beats_reference(ref_solver, test_image):
    """On the identical deduped equation set, our bounded-LSQ solution
    must reach an objective at least as low as the reference's (whose
    lsq_linear stops at tol=1e-2)."""
    import jax.numpy as jnp

    from helicon_tpu.denovo3d import (
        ReconstructionGeometry,
        compute_sym_dedup_mask,
        select_copies,
        select_pairs,
    )
    from helicon_tpu.denovo3d.geometry import estimate_copy_pair_counts
    from helicon_tpu.denovo3d.projector_separable import build_problem_separable
    from helicon_tpu.denovo3d.solver import lsq_reconstruct as mine

    tw, ri = 30.0, 3.0
    (v_ref, _, _), _ = ref_solver.lsq_reconstruct(
        projection_image=test_image, twist_degree=tw, rise_pixel=ri, **COMMON
    )
    (v_mine, _, _), _ = mine(
        projection_image=test_image, twist_degree=tw, rise_pixel=ri, **COMMON
    )

    geom = ReconstructionGeometry(
        d2=20, l2=32, d3=20, l3=12, rmin=0.0, rmax=9.0,
        scale2d_to_3d=1.0, csym=1,
    )
    nc, npair = estimate_copy_pair_counts(geom, ri, 1000)
    ch, cc, cv = select_copies(geom, ri, nc)
    phc, pv = select_pairs(geom, tw, ri, npair)
    keep = compute_sym_dedup_mask(geom, tw, ri, phc, pv)
    ny, nx = test_image.shape
    region = test_image[ny // 2 - 10 : ny // 2 + 10, nx // 2 - 16 : nx // 2 + 16]
    ops = build_problem_separable(
        geom, region, jnp.float32(tw), jnp.float32(ri),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv), 0.0, "nn",
        geom.cylindrical_mask(), geom.cell_valid_mask(),
        sym_keep=jnp.asarray(keep),
    )
    rowv = np.asarray(ops["row_valid"], np.float32)
    b = np.asarray(ops["b"], np.float32)

    def objective(v):
        v = jnp.asarray(np.asarray(v, np.float32))
        rd = (np.asarray(ops["P"](v)) - b[None]) * rowv
        rs = np.asarray(ops["S"](v))
        return float((rd**2).sum() + (rs**2).sum())

    assert float(np.min(v_mine)) >= 0.0
    assert objective(v_mine) <= objective(v_ref) * 1.001


def test_converged_scores_match_to_1e5(ref_solver, test_image):
    """With BOTH solvers driven to convergence (reference: lsq_linear
    tol=1e-12; ours: cg=400/fista=2000) the scores agree to ~1e-5 on
    non-degenerate candidates — measured 7.8e-7 at (29, 3) and 6.6e-6 at
    (25, 3.4), volume correlations 1.00000 / 0.99987. (At the fully
    degenerate (30, 3) — twist divides 360 — the reference stays ~2e-3
    higher with a WORSE objective even at tol=1e-12: its inner LSMR is
    capped at 1000 iterations; excluded here.)"""
    import scipy.optimize as so

    import helicon_tpu.denovo3d.solver as sol

    orig_lsq = so.lsq_linear

    def tight(*a, **k):
        k["tol"] = 1e-12
        k["max_iter"] = 2000
        return orig_lsq(*a, **k)

    orig_cfg = sol.SolveConfig

    class CFG(orig_cfg):
        def __new__(cls, **kw):
            kw.setdefault("cg_iters", 400)
            kw.setdefault("fista_iters", 2000)
            kw.setdefault("power_iters", 20)
            return orig_cfg.__new__(orig_cfg, **kw)

    so.lsq_linear = tight
    sol.SolveConfig = CFG
    try:
        for tw, ri, tol in [(29.0, 3.0, 1e-5), (25.0, 3.4, 3e-5)]:
            _, s_ref = ref_solver.lsq_reconstruct(
                projection_image=test_image, twist_degree=tw,
                rise_pixel=ri, **COMMON,
            )
            _, s_mine = sol.lsq_reconstruct(
                projection_image=test_image, twist_degree=tw,
                rise_pixel=ri, **COMMON,
            )
            assert abs(s_mine - s_ref) < tol, (tw, ri, s_mine, s_ref)
    finally:
        so.lsq_linear = orig_lsq
        sol.SolveConfig = orig_cfg


@pytest.mark.parametrize(
    "metric", ["ssim", "ms_ssim", "mutual_information", "composite"]
)
def test_score_metric_zoo_matches_reference(ref_solver, test_image, metric):
    """2D score metrics (solver:484-525) against the actual reference
    pipeline. skimage is absent in this image, so the reference's metric
    callables are patched with our eager skimage-matched implementations
    (ssim oracle-tested in test_analysis.py); what this test pins is the
    REPROJECTION SCORING PIPELINE: pred construction, 2D scatter, metric
    application. Our pred2d is the per-pixel mean over valid symmetry
    copies instead of the reference's Halton-order last-write
    (solver:507-516) — at convergence every copy predicts the same pixel
    target, measured diffs below are the residual of that deviation plus
    solver convergence."""
    import helicon

    import helicon_tpu as ht
    from helicon_tpu.denovo3d.solver import lsq_reconstruct as mine

    patches = {
        "ssim_score": ht.ssim_score,
        "ms_ssim_score": ht.ms_ssim_score,
        "mutual_information_score": ht.mutual_information_score,
    }
    saved = {k: getattr(helicon, k, None) for k in patches}
    for k, v in patches.items():
        setattr(helicon, k, v)
    try:
        s_ref, s_mine = [], []
        for tw, ri in [(30.0, 3.0), (29.0, 3.0), (25.0, 3.4)]:
            _, sr = ref_solver.lsq_reconstruct(
                projection_image=test_image, twist_degree=tw, rise_pixel=ri,
                score_metric=metric, **COMMON,
            )
            _, sm = mine(
                projection_image=test_image, twist_degree=tw, rise_pixel=ri,
                score_metric=metric, **COMMON,
            )
            s_ref.append(sr)
            s_mine.append(sm)
    finally:
        for k, v in saved.items():
            setattr(helicon, k, v)
    s_ref = np.asarray(s_ref)
    s_mine = np.asarray(s_mine)
    # measured diffs <= 1.1e-2 across the four metrics (solver-convergence
    # residual of the two pipelines)
    np.testing.assert_allclose(s_mine, s_ref, atol=0.02)
    # the property the grid search depends on: pairwise ordering agreement
    # for candidates the reference itself separates beyond convergence
    # noise (near-ties within 1e-2 may flip)
    for i in range(len(s_ref)):
        for j in range(len(s_ref)):
            if s_ref[i] - s_ref[j] > 1e-2:
                assert s_mine[i] > s_mine[j], (i, j, s_mine, s_ref)


def test_unknown_score_metric_raises(test_image):
    from helicon_tpu.denovo3d.solver import lsq_reconstruct as mine

    with pytest.raises(ValueError, match="score_metric"):
        mine(
            projection_image=test_image, twist_degree=30.0, rise_pixel=3.0,
            score_metric="nope", **COMMON,
        )


def test_volume_correlates_with_reference(ref_solver, test_image):
    from helicon_tpu.denovo3d.solver import lsq_reconstruct as mine

    (v_ref, _, _), _ = ref_solver.lsq_reconstruct(
        projection_image=test_image, twist_degree=30.0, rise_pixel=3.0, **COMMON
    )
    (v_mine, _, _), _ = mine(
        projection_image=test_image, twist_degree=30.0, rise_pixel=3.0, **COMMON
    )
    a = np.asarray(v_ref, np.float64).ravel()
    b = np.asarray(v_mine, np.float64).ravel()
    cc = np.dot(a - a.mean(), b - b.mean()) / (
        np.linalg.norm(a - a.mean()) * np.linalg.norm(b - b.mean()) + 1e-30
    )
    assert cc > 0.95, cc


def test_ard_em_matches_sklearn_ard():
    """model="ard" parity: the matrix-free EM ARD (solver.ard_em — Hutchinson
    posterior diagonal + warm CG) against sklearn ARDRegression configured
    exactly as the reference does (solver_linear_regression.py:316-327:
    alpha_1 = alpha_2 = 1e-6; the fit_intercept deviation is documented in
    solver.py — here fit_intercept=False isolates algorithm parity)."""
    skl = pytest.importorskip("sklearn.linear_model")
    import jax
    import jax.numpy as jnp

    from helicon_tpu.denovo3d.solver import ard_em

    rng = np.random.default_rng(0)
    n, p = 300, 40
    X = rng.normal(size=(n, p)).astype(np.float32)
    w_true = np.zeros(p, np.float32)
    w_true[rng.choice(p, 8, replace=False)] = 2 * rng.normal(size=8).astype(np.float32)
    y = X @ w_true + 0.05 * rng.normal(size=n).astype(np.float32)

    sk = skl.ARDRegression(
        alpha_1=1e-6, alpha_2=1e-6, lambda_1=1e-6, lambda_2=1e-6,
        fit_intercept=False, tol=1e-4, max_iter=300,
    )
    sk.fit(X, y)

    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    w = np.asarray(
        ard_em(
            lambda v: Xj.T @ (Xj @ v), Xj.T @ yj, float(y @ y), float(n),
            jnp.ones(p, jnp.float32), jax.random.PRNGKey(0),
            iters=20, probes=8, inner_cg=60,
        )
    )
    # measured: corr 0.9999976, max|dw| 0.0056 on coefficients of scale ~2
    assert np.corrcoef(w, sk.coef_)[0, 1] > 0.999
    assert np.max(np.abs(w - sk.coef_)) < 0.05
    # ARD's defining behavior: true-zero coefficients are driven to ~0
    assert np.max(np.abs(w[w_true == 0])) < 0.05


def test_ard_model_end_to_end():
    """model="ard" runs through lsq_reconstruct (no ridge fallback) and
    reconstructs the simulated helix with a high score."""
    from helicon_tpu.denovo3d.solver import lsq_reconstruct
    from helicon_tpu.helix import simulate_helical_projection

    img = simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=30.0,
        ball_radius=4.0, polymer=0, planarity=1.0, ny=32, nx=48, apix=2.0,
        rng=0,
    )
    (rec, _, _), score = lsq_reconstruct(
        projection_image=np.asarray(img, np.float32), scale2d_to_3d=1.0,
        twist_degree=30.0, rise_pixel=3.0, csym=1, sym_oversample=1,
        interpolation="nn", algorithm=dict(model="ard"), target_apix2d=2.0,
    )
    assert score > 0.99  # measured 0.9992
    assert np.isfinite(rec).all() and np.max(rec) > 0


@pytest.mark.parametrize("interp", ["nn", "linear"])
def test_sym_matrix_matches_reference_exactly(ref_solver, interp):
    """build_A_helical_sym_matrix oracle parity: identical CSR systems
    (values AND row order) against the actual reference builder
    (solver_linear_regression.py:847-1303) for both kernels — pins the
    separation filter, the rounded-pair dedup, the 110-tap weight quirk,
    and the unconditional row_count >= min_sym_pairs break."""
    from helicon_tpu.webApps.denovo3D.solver_linear_regression import (
        build_A_helical_sym_matrix as mine,
    )

    kw = dict(
        nz=16, ny=16, nx=16, twist_degree=91.3, rise_pixel=4.0, csym=1,
        rmin=0.0, rmax=6.0, min_sym_pairs=4000, interpolation=interp,
        verbose=0,
    )
    A_ref, b_ref = ref_solver.build_A_helical_sym_matrix(**kw)
    A_my, b_my = mine(**kw)
    assert (A_ref is None) == (A_my is None)
    assert A_ref is not None, "parameters produced an empty system"
    assert A_ref.shape == A_my.shape
    d = (A_ref - A_my)
    assert abs(d).max() < 1e-6 if d.nnz else True
    np.testing.assert_allclose(b_my, b_ref)


def test_sym_matrix_nonpositive_min_pairs_stops_after_first_pair(ref_solver):
    """min_sym_pairs <= 0: the reference's break fires after the very
    first pair regardless of rows (solver_linear_regression.py:1286)."""
    from helicon_tpu.webApps.denovo3D.solver_linear_regression import (
        build_A_helical_sym_matrix as mine,
    )

    kw = dict(
        nz=16, ny=16, nx=16, twist_degree=91.3, rise_pixel=4.0, csym=1,
        rmin=0.0, rmax=6.0, min_sym_pairs=0, interpolation="nn", verbose=0,
    )
    A_ref, _ = ref_solver.build_A_helical_sym_matrix(**kw)
    A_my, _ = mine(**kw)
    assert (A_ref is None) == (A_my is None)
    if A_ref is not None:
        assert A_ref.shape == A_my.shape
        assert abs(A_ref - A_my).max() < 1e-6 if (A_ref - A_my).nnz else True


@pytest.mark.parametrize(
    "interp,tilt,psi,dy",
    [
        ("nn", 0.0, 0.0, 0.0),
        ("nn", 2.5, -3.0, 0.7),
        ("linear", 0.0, 0.0, 0.0),
        ("linear", 2.5, -3.0, 0.7),
    ],
)
def test_data_matrix_matches_reference_exactly(ref_solver, interp, tilt, psi, dy):
    """build_A_data_matrix oracle parity: identical CSR systems, b vectors
    and pixel ids against the actual reference builder
    (solver_linear_regression.py:1304-1656) for both kernels — pins the
    numeric R_y(90) back-projection noise, int() truncation (not floor)
    in the linear kernel, Halton copy order, and the after-every-copy
    n_b > min_projection_lines break."""
    from helicon_tpu.webApps.denovo3D.solver_linear_regression import (
        build_A_data_matrix as mine,
    )

    rng = np.random.default_rng(0)
    img = rng.standard_normal((32, 48)).astype(np.float32)
    kw = dict(
        image=img, scale2d_to_3d=1.0, twist_degree=91.3, rise_pixel=4.0,
        csym=1, tilt_degree=tilt, psi_degree=psi, dy_pixel=dy,
        reconstruct_diameter_2d_pixel=24, reconstruct_length_2d_pixel=40,
        reconstruct_diameter_3d_pixel=24,
        reconstruct_diameter_3d_inner_pixel=0,
        reconstruct_length_3d_pixel=16, min_projection_lines=2000,
        interpolation=interp, verbose=0,
    )
    A_ref, b_ref, pid_ref = ref_solver.build_A_data_matrix(**kw)
    A_my, b_my, pid_my = mine(**kw)
    assert A_ref.shape == A_my.shape
    d = A_ref - A_my
    # one f32 ulp of slack: scipy sums duplicate (row, col) taps in
    # insertion order, which differs between the two builders
    assert (abs(d).max() if d.nnz else 0.0) < 5e-7
    np.testing.assert_allclose(b_my, b_ref)
    np.testing.assert_array_equal(np.asarray(pid_my), pid_ref)


def test_data_matrix_csym_scale_matches_reference(ref_solver):
    """csym=2 + anisotropic scale + inner mask radius: the Halton copy
    ordering and scaled back-projection still match the reference
    bit-for-bit (solver_linear_regression.py:1560-1575, 1694-1746)."""
    from helicon_tpu.webApps.denovo3D.solver_linear_regression import (
        build_A_data_matrix as mine,
    )

    rng = np.random.default_rng(0)
    img = rng.standard_normal((32, 48)).astype(np.float32)
    for interp in ("nn", "linear"):
        kw = dict(
            image=img, scale2d_to_3d=0.75, twist_degree=-36.9,
            rise_pixel=2.5, csym=2, tilt_degree=1.0, psi_degree=0.5,
            dy_pixel=-0.3, reconstruct_diameter_2d_pixel=28,
            reconstruct_length_2d_pixel=44,
            reconstruct_diameter_3d_pixel=20,
            reconstruct_diameter_3d_inner_pixel=4,
            reconstruct_length_3d_pixel=18, min_projection_lines=3000,
            interpolation=interp, verbose=0,
        )
        A_ref, b_ref, pid_ref = ref_solver.build_A_data_matrix(**kw)
        A_my, b_my, pid_my = mine(**kw)
        assert A_ref.shape == A_my.shape, interp
        d = A_ref - A_my
        assert (abs(d).max() if d.nnz else 0.0) < 5e-7, interp
        np.testing.assert_allclose(b_my, b_ref)
        np.testing.assert_array_equal(np.asarray(pid_my), pid_ref)


def test_back_project_facade_matches_reference_bitwise(ref_solver):
    """The facade's back_project_2d_coords_to_3d_coords reproduces the
    reference's numeric-R_y(90) coordinates BIT-for-bit (including the
    ~1e-15 rotation noise that downstream int()/round() depends on),
    unlike the library's exact axis-swap version."""
    from helicon_tpu.webApps.denovo3D.solver_linear_regression import (
        back_project_2d_coords_to_3d_coords as mine,
    )

    rng = np.random.default_rng(1)
    img = rng.standard_normal((30, 40)).astype(np.float32)
    for scale, d2, l2 in [(1.0, -1, -1), (0.75, 24, 36), (1.25, 21, 33)]:
        (Xr, Yr, Zr), pv_r = ref_solver.back_project_2d_coords_to_3d_coords(
            image=img, scale2d_to_3d=scale,
            reconstruct_diameter_2d_pixel=d2,
            reconstruct_length_2d_pixel=l2,
        )
        (Xm, Ym, Zm), pv_m = mine(
            image=img, scale2d_to_3d=scale,
            reconstruct_diameter_2d_pixel=d2,
            reconstruct_length_2d_pixel=l2,
        )
        np.testing.assert_array_equal(Xm, Xr)
        np.testing.assert_array_equal(Ym, Yr)
        np.testing.assert_array_equal(Zm, Zr)
        np.testing.assert_array_equal(pv_m, pv_r)
