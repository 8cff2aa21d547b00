"""Matrix-free bounded least-squares solver for denovo3D candidates.

Reference: solver_linear_regression.py lsq_reconstruct (31-547) +
solve_equations (205-342). The explicit sparse system is replaced by the
operators in :mod:`projector`; the solve is conjugate gradients on the
normal equations followed by FISTA (projected accelerated gradient with
an optional L1 prox), which handles the reference's solver zoo:

  model        reference                     here
  -----        ---------                     ----
  lsq          scipy lsq_linear [0, max b]   CG + FISTA with box projection
  lreg         sklearn LinearRegression      CG (lambda1 = lambda2 = 0)
  ridge        sklearn Ridge(alpha)          CG with lambda2 = alpha
  lasso        sklearn Lasso(alpha)          FISTA, lambda1 = n*alpha
  elasticnet   sklearn ElasticNet            FISTA, l1/l2 split as sklearn
  ard          sklearn ARDRegression         matrix-free EM ARD (ard_em):
                                             Hutchinson posterior diag +
                                             warm CG, jittable/vmappable

Deviations (documented): no fit_intercept (the reference centers via
sklearn; the data here is background-subtracted so the intercept is ~0);
equation subsets chosen by copy/pair count instead of exact row count.
Symmetry-pair rows ARE dedup'd like the reference's nn kernel when a
sym_keep mask from geometry.compute_sym_dedup_mask is supplied
(lsq_reconstruct and the grid's final re-solve do; the vmapped grid
scoring pass skips it — ranking is dedup-invariant, verified).

Scores use the reference's definitions verbatim: cosine(A.x, b) over the
data rows (solver:484-530), optional FSC half-splits by pixel id with
combined score s0/2 + (s1+s2)/4 (solver:527-530).
"""

from __future__ import annotations

import functools
import os
import threading
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import (
    ReconstructionGeometry,
    estimate_copy_pair_counts,
    select_copies,
    select_pairs,
)
from .projector import build_problem

__all__ = ["SolveConfig", "lsq_reconstruct", "solve_candidate"]


def regularization_from_algorithm(algorithm: dict, n_rows: int):
    """(l1_reg, l2_reg) matching the sklearn objectives of the reference
    solver zoo (solver:205-342): lasso/elasticnet scale alpha by the
    equation count (sklearn divides the data term by n); ridge does not.
    """
    model = algorithm.get("model", "lsq")
    l1 = l2 = 0.0
    if model in ("lasso", "elasticnet"):
        alpha = float(algorithm.get("alpha", 1e-4))
        l1_ratio = 1.0 if model == "lasso" else float(algorithm.get("l1_ratio", 0.5))
        l1 = alpha * l1_ratio * n_rows
        l2 = alpha * (1.0 - l1_ratio) * n_rows
    elif model == "ridge":
        l2 = float(algorithm.get("alpha", 1.0))
    # "ard": no fixed penalty — per-voxel precisions are learned by
    # evidence maximization (ard_em); the algorithm's alpha becomes the
    # Gamma hyperprior (SolveConfig.ard_prior), as in the reference's
    # ARDRegression(alpha_1=alpha_2=alpha).
    return l1, l2


class SolveConfig(NamedTuple):
    """Static solver configuration (hashable -> jit static arg)."""

    interpolation: str = "nn"
    model: str = "lsq"
    cg_iters: int = 120
    fista_iters: int = 120
    power_iters: int = 8
    fsc_test: int = 0
    score_metric: str = "cosine"
    thresh_fraction: float = -1.0
    positive_constraint: int = -1
    l2_reg: float = 0.0  # lambda2 (absolute, already scaled)
    l1_reg: float = 0.0  # lambda1 (absolute, already scaled)
    separable: bool = False  # MXU path; requires tilt = psi = 0
    compute_dtype: str = "float32"  # "bfloat16" for 2-4x MXU throughput
    # True: l1_reg/l2_reg are PER-ROW coefficients, multiplied inside the
    # jitted solve by the candidate's own data-row count (d2*l2*valid
    # copies). The vmapped grid needs this: a static n_copies-based
    # product would over-regularize candidates whose valid copies are
    # fewer than the padded table size, diverging from lsq_reconstruct.
    reg_per_row: bool = False
    # ARD (model="ard") evidence-maximization loop extents + prior
    # (reference: sklearn ARDRegression alpha_1 = alpha_2 = algorithm.alpha)
    ard_iters: int = 12
    ard_probes: int = 4
    ard_prior: float = 1e-6


SCORE_METRICS = ("cosine", "ssim", "ms_ssim", "mutual_information", "composite")


def _cosine(a, b):
    num = jnp.vdot(a, b)
    den = jnp.linalg.norm(a) * jnp.linalg.norm(b)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)


def _candidate_score(
    pred, b_eff, b2d, rowv, cfg: SolveConfig, copy_rank=None, inv_w=None
):
    """Score the reprojection per cfg.score_metric (solver:484-525).

    cosine compares the full row stack A.x vs b. The 2D metrics
    (ssim/ms_ssim/mutual_information) compare a reprojection image against
    the input region; the reference scatters rows into pixels with
    last-copy-wins semantics over its Halton-ordered copy list
    (solver:507-516). select_copies reproduces that exact order, so the
    per-pixel value from the LAST valid copy covering the pixel is the
    same quantity. composite = mean(cosine, ssim, ms_ssim, mi).

    The twist-grouped path stores copies in a CANONICAL (sorted) table
    with sqrt(multiplicity) row weights, so it supplies
      copy_rank (C,): each canonical copy's last position in the
        candidate's Halton-ordered list (-1 = unselected) — restores the
        reference's last-copy-wins choice despite the reordering;
      inv_w (C,): 1/sqrt(m) to undo the row weighting, since the 2D
        metrics read raw reprojection VALUES (duplicates must not scale
        them). cosine still uses the weighted rows: that IS the
        duplicated-row cosine.
    """
    metric = cfg.score_metric
    cos = _cosine(pred.ravel(), b_eff.ravel())
    if metric == "cosine":
        return cos
    from ..core.analysis import (
        ms_ssim_score_traced,
        mutual_information_score_traced,
        ssim_score_traced,
    )

    if copy_rank is None:
        c_last = (rowv.shape[0] - 1) - jnp.argmax(rowv[::-1] > 0, axis=0)
    else:
        eff = jnp.where(rowv > 0, copy_rank[:, None, None], jnp.int32(-1))
        c_last = jnp.argmax(eff, axis=0)
    pred_src = pred if inv_w is None else pred * inv_w[:, None, None]
    pred2d = jnp.take_along_axis(
        pred_src.astype(jnp.float32), c_last[None], axis=0
    )[0] * (jnp.max(rowv, axis=0) > 0)
    ref2d = b2d.astype(jnp.float32)
    if metric == "ssim":
        return ssim_score_traced(pred2d, ref2d)
    if metric == "ms_ssim":
        return ms_ssim_score_traced(pred2d, ref2d)
    if metric == "mutual_information":
        return mutual_information_score_traced(pred2d, ref2d)
    if metric == "composite":
        parts = jnp.stack(
            [
                cos,
                ssim_score_traced(pred2d, ref2d),
                ms_ssim_score_traced(pred2d, ref2d),
                mutual_information_score_traced(pred2d, ref2d),
            ]
        )
        return jnp.mean(parts)
    raise ValueError(
        f"Unknown score_metric {metric!r}; supported: {SCORE_METRICS}"
    )


def _cg_from(N, rhs, x0, iters: int, x0_is_zero: bool = False):
    """Fixed-iteration conjugate gradients for N x = rhs, warm-started.

    x0_is_zero=True skips the initial N(x0) residual application (XLA
    does NOT fold N(0) away — leaving it in measurably inflated the grid
    solve: +0.8 GFLOP/candidate, a 39% bench throughput loss).
    """
    r0 = rhs if x0_is_zero else rhs - N(x0)
    p0 = r0
    rs0 = jnp.vdot(r0, r0)

    def body(carry, _):
        x, r, p, rs = carry
        Np = N(p)
        pNp = jnp.vdot(p, Np)
        alpha = jnp.where(pNp > 0, rs / jnp.maximum(pNp, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * Np
        rs_new = jnp.vdot(r, r)
        beta = jnp.where(rs > 0, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rs0), None, length=iters)
    return x


def _cg(N, rhs, iters: int):
    """Fixed-iteration conjugate gradients for N x = rhs, x0 = 0."""
    return _cg_from(N, rhs, jnp.zeros_like(rhs), iters, x0_is_zero=True)


def ard_em(
    N0,
    rhs,
    b_sq,
    n_rows,
    mask_f,
    key,
    iters: int = 12,
    probes: int = 4,
    inner_cg: int = 40,
    prior: float = 1e-6,
    threshold_lambda: float = 1e4,
):
    """Matrix-free ARD (sparse Bayesian) regression by evidence maximization.

    The TPU-native analog of sklearn ARDRegression as the reference calls
    it (solver_linear_regression.py:316-327: alpha_1 = alpha_2 =
    algorithm.alpha, tol 1e-2, max_iter 200 — on a DENSIFIED design
    matrix). Here the design matrix never materializes: each EM step is

      coef  = (alpha A^T A + diag(lam))^-1  alpha A^T b      (CG, warm)
      S_ii  ~ Hutchinson diag of the same inverse (Rademacher probes,
              one warm CG solve per probe)
      gamma = 1 - lam * S_ii                                 (MacKay)
      lam   = (gamma + 2 prior) / (coef^2 + 2 prior)
      alpha = (n_rows - sum gamma + 2 prior) / (|b - A coef|^2 + 2 prior)

    with sklearn's pruning rule: coefficients whose precision exceeds
    threshold_lambda are clamped to zero. All loop extents are static, so
    the whole fit jits and vmaps like the other models.

    N0(v) must be the UNregularized normal operator A^T A v (data + sym
    rows); rhs = A^T b; b_sq = |b|^2; n_rows = total equation count.
    """
    mask_b = mask_f > 0.5
    alpha0 = jnp.float32(n_rows) / jnp.maximum(b_sq, 1e-30)
    lam0 = mask_f  # unit precision on in-mask voxels
    coef0 = jnp.zeros_like(rhs)

    def em(carry, it):
        coef, lam, alpha, diag_prev = carry
        # probes are generated per EM step (folded key): materializing
        # all iters*probes volumes up front multiplies per-candidate
        # memory ~iters*probes-fold under vmap
        z_i = (
            jax.random.rademacher(
                jax.random.fold_in(key, it), (probes,) + rhs.shape,
                jnp.float32,
            )
            * mask_f
        )
        keep = mask_b & (lam < threshold_lambda)
        keep_f = keep.astype(jnp.float32)
        # pruned voxels get a huge on-diagonal term so CG leaves them ~0
        lam_eff = jnp.where(keep, lam, threshold_lambda)

        def M(v):
            return (alpha * N0(v) + lam_eff * v) * mask_f

        coef = _cg_from(M, alpha * rhs * mask_f, coef * keep_f, inner_cg) * keep_f

        def probe(d, z):
            # warm-start each probe solve from the previous EM step's
            # solution direction: diag_prev * z approximates M^-1 z
            sol = _cg_from(M, z, diag_prev * z, inner_cg)
            return d + z * sol, None

        diag_sum, _ = jax.lax.scan(probe, jnp.zeros_like(rhs), z_i)
        diag = jnp.clip(diag_sum / probes, 0.0, None)
        gamma = jnp.clip(1.0 - lam_eff * diag, 0.0, 1.0) * keep_f
        lam_new = (gamma + 2.0 * prior) / (coef * coef + 2.0 * prior)
        lam_new = jnp.where(mask_b, lam_new, 0.0)
        rmse = jnp.maximum(
            b_sq - 2.0 * jnp.vdot(coef, rhs) + jnp.vdot(coef, N0(coef)), 0.0
        )
        alpha_new = (n_rows - jnp.sum(gamma) + 2.0 * prior) / (rmse + 2.0 * prior)
        return (coef, lam_new, alpha_new, diag), None

    (coef, _, _, _), _ = jax.lax.scan(
        em, (coef0, lam0, alpha0, mask_f), jnp.arange(iters)
    )
    return coef


def _power_iteration(N, shape, iters: int):
    """Largest eigenvalue of the PSD operator N (for the FISTA step)."""
    v = jnp.ones(shape, jnp.float32)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

    def body(v, _):
        w = N(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30), None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    # Rayleigh quotient underestimates the top eigenvalue; pad it so the
    # FISTA step 1/L stays inside the stable region. Fewer iterations
    # need a larger pad (rankings identical down to iters=1/margin=1.8
    # on the 147-candidate study; an over-padded L only shrinks steps).
    margin = 1.2 if iters >= 4 else (1.5 if iters >= 2 else 1.8)
    return margin * jnp.vdot(v, N(v))


def _fista(N, rhs, x0, lb, ub, l1, iters: int, lipschitz):
    """FISTA on 0.5 x.N.x - rhs.x + l1 |x|_1 with box projection."""
    eta = 1.0 / jnp.maximum(lipschitz, 1e-20)

    def prox(v):
        v = jnp.sign(v) * jnp.maximum(jnp.abs(v) - eta * l1, 0.0)
        return jnp.clip(v, lb, ub)

    def body(carry, _):
        x, y, t = carry
        g = N(y) - rhs
        x_new = prox(y - eta * g)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, y_new, t_new), None

    (x, _, _), _ = jax.lax.scan(
        body, (jnp.clip(x0, lb, ub), jnp.clip(x0, lb, ub), 1.0), None, length=iters
    )
    return x


def _use_fused_ntn() -> bool:
    """Fused normal-operator matvec (projector_grouped.NTN). Read at
    trace time; HELICON_FUSED_NTN=0 falls back to the separate
    PTP + ST(S(.)) closures (comparison / debugging)."""
    return os.environ.get("HELICON_FUSED_NTN", "1") != "0"


def _solve_one_weighting(
    ops, rowv, mask_f, cfg: SolveConfig, positive, ub_val, full_rows=False,
    key=None, reg_scale=1.0, pred_rowv=None, copy_rank=None, inv_w=None,
    fused_ntn=None,
):
    """Solve with the given data-row weighting; return (x, score).

    fused_ntn: explicit choice of the fused normal operator; None falls
    back to the HELICON_FUSED_NTN env var. Callers that cache compiled
    variants (grid._vgsolve_cached) MUST pass this explicitly so the
    traced behavior matches the cache key even if the env var changes
    between fetch and first trace.

    full_rows=True (rowv is exactly the row-validity mask) lets the data
    term use the fused P^T P operator — the zero rows of the separable
    factors already encode that weighting.

    pred_rowv: optional separate mask for the scored prediction. The
    twist-grouped path passes rowv = binary * sqrt(multiplicity) (so
    b_eff is sqrt(m)-weighted to pair with its sqrt(m)-weighted P) but
    masks the prediction with the BINARY validity — P already carries
    the other sqrt(m) factor (projector_grouped.py).

    copy_rank / inv_w: grouped-path scoring context for the 2D metrics
    (see _candidate_score).
    """
    P, PT, S, ST = ops["P"], ops["PT"], ops["S"], ops["ST"]
    b_eff = ops["b"][None] * rowv

    if fused_ntn is None:
        fused_ntn = _use_fused_ntn()
    if full_rows and "NTN" in ops and fused_ntn:
        NTN = ops["NTN"]

        def N0(v):
            return NTN(v) * mask_f

    elif full_rows and "PTP" in ops:
        PTP = ops["PTP"]

        def N0(v):
            return (PTP(v) + ST(S(v))) * mask_f

    else:

        def N0(v):
            return (PT(P(v) * rowv) + ST(S(v))) * mask_f

    l1_eff = cfg.l1_reg * reg_scale
    l2_eff = cfg.l2_reg * reg_scale

    def N(v):
        out = N0(v)
        if cfg.l2_reg:  # static skip: coefficient 0 means no ridge term
            out = out + l2_eff * v * mask_f
        return out

    rhs = PT(b_eff) * mask_f

    if cfg.model == "ard":
        # equation count: valid data rows + valid symmetry rows. A row of
        # S is structurally zero iff it is invalid (or its two ends hit
        # the same voxel, which contributes nothing either way). Probing
        # with TWO independent random volumes and OR-ing the nonzero
        # masks makes a per-row miscount need a float32 value collision
        # in both probes (~1e-14): an arange-based "injective" probe is
        # NOT injective in float32 past ~2^23 voxels (consecutive
        # indices collapse to identical fractional values).
        if key is None:
            key = jax.random.PRNGKey(0)
        kp1, kp2 = jax.random.split(jax.random.fold_in(key, 7))
        p1 = jax.random.uniform(kp1, rhs.shape, jnp.float32, 1.0, 2.0) * mask_f
        p2 = jax.random.uniform(kp2, rhs.shape, jnp.float32, 1.0, 2.0) * mask_f
        n_sym = jnp.sum((S(p1) != 0.0) | (S(p2) != 0.0))
        n_rows = jnp.sum(rowv) + n_sym
        b_sq = jnp.vdot(b_eff, b_eff)
        x = ard_em(
            N0,
            rhs,
            b_sq,
            n_rows,
            mask_f,
            key,
            iters=cfg.ard_iters,
            probes=cfg.ard_probes,
            inner_cg=max(8, cfg.cg_iters // 3),
            prior=cfg.ard_prior,
        )
        pred = P(x) * (rowv if pred_rowv is None else pred_rowv)
        if cfg.thresh_fraction >= 0:
            pred = jnp.clip(pred, 0.0, None)
        score = _candidate_score(
            pred, b_eff, ops["b"], rowv, cfg, copy_rank, inv_w
        )
        return x, score

    # note: Jacobi-PCG (diag(PTP) is computable elementwise) was tried
    # and gave NO convergence gain on this system — the binding budget
    # is the FISTA phase that enforces the box constraint, so the
    # iteration split favors FISTA (see bench.py defaults).
    lb = jnp.where(positive, 0.0, -jnp.inf)
    ub = jnp.where(positive, ub_val, jnp.inf)

    def run(scale):
        # one CG warm start + FISTA pass at regularization (l1, l2)*scale
        if cfg.l2_reg:
            def Ns(v):
                return N0(v) + l2_eff * scale * v * mask_f
        else:
            Ns = N
        x = _cg(Ns, rhs, cfg.cg_iters) if cfg.cg_iters > 0 else jnp.zeros_like(rhs)
        if cfg.fista_iters > 0:
            L = _power_iteration(Ns, rhs.shape, cfg.power_iters)
            x = _fista(Ns, rhs, x, lb, ub, l1_eff * scale, cfg.fista_iters, L)
        else:
            # no FISTA phase: still honor the box constraint the
            # reference's solvers always enforce (positive=True /
            # lsq_linear bounds) by projecting the CG solution
            x = jnp.clip(x, lb, ub)
        return x * mask_f

    x = run(jnp.float32(1.0))
    if cfg.l1_reg > 0 or cfg.l2_reg > 0:
        # reference solver:330-337: an all-zero fit retries with
        # alpha *= 0.1 until some coefficient survives (bounded here so
        # a structurally-zero problem cannot loop forever)
        def _zero_cond(c):
            xx, s = c
            return jnp.logical_and(~jnp.any(xx != 0.0), s > 1e-7)

        def _zero_body(c):
            _, s = c
            s = s * 0.1
            return run(s), s

        x, _ = jax.lax.while_loop(_zero_cond, _zero_body, (x, jnp.float32(1.0)))
    elif cfg.model == "lreg":
        # reference solver:331-332: lreg seeds the center voxel so a
        # degenerate all-zero solution still scores deterministically
        seed = (
            jnp.zeros_like(x).ravel().at[x.size // 2].set(1.0).reshape(x.shape)
        )
        x = jnp.where(jnp.any(x != 0.0), x, seed)

    pred = P(x) * (rowv if pred_rowv is None else pred_rowv)
    if cfg.thresh_fraction >= 0:
        pred = jnp.clip(pred, 0.0, None)
    score = _candidate_score(
        pred, b_eff, ops["b"], rowv, cfg, copy_rank, inv_w
    )
    return x, score


def _solve_group_impl(
    geom: ReconstructionGeometry,
    cfg: SolveConfig,
    image_region,
    twist_degree,
    rises_pixel,
    m_counts,
    copies_h_u,
    copies_c_u,
    pair_idx,
    pairs_valid,
    copy_rank=None,
    n_ops_u: int = 0,
    dy_pixel=0.0,
    fused_ntn=None,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Score one twist-group: R same-twist candidates sharing operators.

    rises_pixel (R,), m_counts (R, C_u) canonical copy multiplicities,
    copies_h_u/copies_c_u (C_u,) the group's canonical copy table,
    pair_idx (R, P, 2) canonical-op indices, pairs_valid (R, P),
    copy_rank (R, C_u) each copy's last Halton position per candidate
    (-1 unselected; consumed by the 2D score metrics' last-copy-wins
    scatter — cosine ignores it).
    n_ops_u (static): canonical op-table size (2*hmax+1)*csym — grid.py
    packs pair indices for exactly this enumeration. Returns scores (R,).

    Restricted to the configurations where sqrt(multiplicity) row
    weighting is exactly the duplicated-row semantics (see
    projector_grouped.py): any score metric; fsc half-set splits run
    grouped since round 5 (the pixel-id mask multiplies the z-Gram
    j-dependently for the normal operator, and the half solves use the
    explicit P/PT closures — unregularized models only); ard stays
    per-candidate (its row count reads unweighted equations). grid.py
    gates accordingly; the asserts here are the backstop.
    """
    assert cfg.separable, "grouped path requires tilt = psi = 0"
    assert cfg.model != "ard"
    if cfg.fsc_test != 0:
        assert cfg.l1_reg == 0.0 and cfg.l2_reg == 0.0, (
            "grouped fsc supports unregularized models only"
        )
    assert n_ops_u > 0, "grid.py must pass the canonical op-table size"
    from .projector_grouped import (
        build_candidate_problem_grouped,
        build_group_shared,
    )

    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    mask_f = jnp.asarray(mask, jnp.float32)

    # canonical op enumeration: k = (h + hmax) * csym + c
    hmax_p = (n_ops_u // geom.csym - 1) // 2
    hs = np.repeat(np.arange(-hmax_p, hmax_p + 1), geom.csym)
    cs = np.tile(np.arange(geom.csym), 2 * hmax_p + 1)
    ops_h_u = jnp.asarray(hs, jnp.int32)
    ops_c_u = jnp.asarray(cs, jnp.int32)

    shared = build_group_shared(
        geom,
        twist_degree,
        copies_h_u,
        copies_c_u,
        ops_h_u,
        ops_c_u,
        dy_pixel=dy_pixel,
        interpolation=cfg.interpolation,
        mask=mask,
        cellok=cellok,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
    )

    if use_pallas:
        # fused grouped Pallas solve: the whole group's CG/power/FISTA
        # runs inside ONE kernel with A_top VMEM-resident
        # (pallas_solver.solve_group_pallas). Envelope (grid.py gates,
        # this is the backstop): everything the XLA grouped path solves —
        # l1/l2 regularization and the alpha-decay retry run in/around
        # the kernel; thresh_fraction, the lreg seed, and the 2D score
        # metrics score the kernel's x in XLA; fsc half-set splits run
        # as three kernel solves with j-dependent z-Grams (default
        # lsq+cosine config only — grid gates the rest to XLA grouped).
        assert cfg.model != "ard"
        if cfg.fsc_test != 0:
            assert (
                cfg.model == "lsq" and cfg.score_metric == "cosine"
                and cfg.l1_reg == 0.0 and cfg.l2_reg == 0.0
                and cfg.thresh_fraction < 0
            ), "pallas fsc covers the default lsq+cosine config only"
        return _solve_group_pallas(
            shared, geom, cfg, image_region, twist_degree, rises_pixel,
            m_counts, pair_idx, pairs_valid, pallas_interpret,
            copy_rank=copy_rank,
        )

    fsc_masks = None
    if cfg.fsc_test >= 1:
        fsc_masks = _pid_split_masks(
            geom, cfg.fsc_test, jax.random.PRNGKey(0)
        )

    def one(rise_pixel, m_r, pidx_r, pval_r, rank_r):
        sqrt_m = jnp.sqrt(m_r.astype(jnp.float32))
        ops, rowv_bin = build_candidate_problem_grouped(
            shared, geom, image_region, rise_pixel, sqrt_m, pidx_r, pval_r
        )
        rowv_w = ops["row_valid"]
        pitch_pixel = jnp.round(rise_pixel * 360.0 / jnp.abs(twist_degree))
        positive = jnp.where(
            cfg.positive_constraint > 0,
            True,
            jnp.where(
                cfg.positive_constraint < 0, pitch_pixel > 2 * geom.l3, False
            ),
        )
        # box upper bound from the UNweighted data rows (reference takes
        # max over the stacked b, which duplicates cannot change)
        ub_val = jnp.max(ops["b"][None] * rowv_bin)
        reg_scale = (
            jnp.float32(geom.d2 * geom.l2)
            * jnp.maximum(1.0, jnp.sum(m_r.astype(jnp.float32)))
            if cfg.reg_per_row
            else 1.0
        )
        inv_w = jnp.where(
            sqrt_m > 0, 1.0 / jnp.maximum(sqrt_m, 1e-30), 0.0
        )
        _, score = _solve_one_weighting(
            ops, rowv_w, mask_f, cfg, positive, ub_val, full_rows=True,
            key=jax.random.PRNGKey(0), reg_scale=reg_scale,
            pred_rowv=rowv_bin, copy_rank=rank_r, inv_w=inv_w,
            fused_ntn=fused_ntn,
        )
        if fsc_masks is None:
            return score

        # fsc half-set solves at grouped weighting: the grouped P/PT
        # carry sqrt(multiplicity) ONCE each, so the half's normal
        # operator uses the BINARY row mask x pid split (two sqrt_m
        # factors -> m), while rhs/b_eff take the sqrt_m-weighted rows
        # x pid split (A'^T b' = A^T m b). Mirrors the per-candidate
        # half solves (solver:953-962) under the duplicated-row
        # equivalence.
        lb_h = jnp.where(positive, 0.0, -jnp.inf)
        ub_h = jnp.where(positive, ub_val, jnp.inf)
        P, PT, S, ST = ops["P"], ops["PT"], ops["S"], ops["ST"]

        def solve_half(mh):
            rv_bin_h = rowv_bin * mh
            b_eff_h = ops["b"][None] * rowv_w * mh
            rhs = PT(b_eff_h) * mask_f

            def N(v):
                return (PT(P(v) * rv_bin_h) + ST(S(v))) * mask_f

            x = (
                _cg(N, rhs, cfg.cg_iters)
                if cfg.cg_iters > 0
                else jnp.zeros_like(rhs)
            )
            if cfg.fista_iters > 0:
                L = _power_iteration(N, rhs.shape, cfg.power_iters)
                x = _fista(N, rhs, x, lb_h, ub_h, 0.0, cfg.fista_iters, L)
            else:
                x = jnp.clip(x, lb_h, ub_h)
            x = x * mask_f
            pred = P(x) * rv_bin_h
            if cfg.thresh_fraction >= 0:
                pred = jnp.clip(pred, 0.0, None)
            return _candidate_score(
                pred, b_eff_h, ops["b"], rowv_w * mh, cfg, rank_r, inv_w
            )

        s1 = solve_half(fsc_masks[0])
        s2 = solve_half(fsc_masks[1])
        # reference combined score (solver:527-530)
        return score / 2 + (s1 + s2) / 4

    if copy_rank is None:
        # cosine never reads ranks; the 2D metrics need the true Halton
        # ordering (a zero table would scatter first-copy-wins)
        assert cfg.score_metric == "cosine", (
            "2D score metrics on the grouped path require copy_rank"
        )
        copy_rank = jnp.zeros(m_counts.shape, jnp.int32)
    return jax.vmap(one)(
        rises_pixel, m_counts, pair_idx, pairs_valid, copy_rank
    )


def _solve_group_pallas(
    shared, geom, cfg: SolveConfig, image_region, twist_degree,
    rises_pixel, m_counts, pair_idx, pairs_valid, interpret: bool,
    copy_rank=None,
):
    """Grouped Pallas branch of _solve_group_impl: build the
    per-candidate tensors in XLA (vmapped, sharing the group's
    operators), assemble the wide-layout kernel inputs, and run the
    fused on-chip solve. Returns scores (R,).

    Envelope (VERDICT r4 #2): beyond the original plain-lsq + cosine
    config, this path now covers the reference solver zoo's
    default-adjacent configs —
      * l1/l2 regularization (lreg/lasso/elasticnet/ridge, incl.
        reg_per_row scaling): per-candidate coefficient columns feed
        the kernel's matvec ridge term and FISTA soft-threshold; the
        reference's alpha-decay retry on all-zero fits
        (solver_linear_regression.py:330-337) runs as a lax.while_loop
        of whole-group kernel calls with per-candidate first-success
        freezing — identical per-candidate semantics to the XLA path's
        vmapped retry.
      * thresh_fraction >= 0, the lreg center-voxel seed, and the 2D
        score metrics (ssim/ms_ssim/mutual_information/composite):
        the SOLVE stays in-kernel; the returned x is scored in XLA via
        the same build_candidate_problem_grouped closures +
        _candidate_score the XLA grouped path uses (one extra P
        application per candidate, ~1/29 of the solve's matvecs).
    Only fsc splits remain outside (they re-weight data rows by pixel
    id, which the grouped Gram factorization cannot express — the same
    reason the XLA grouped path gates them to per-candidate scoring).
    """
    from .pallas_solver import (
        grouped_pallas_inputs,
        solve_group_pallas,
        wide_col,
    )
    from .projector_grouped import (
        build_candidate_problem_grouped,
        build_candidate_tensors_grouped,
    )

    l3, d3 = geom.l3, geom.d3
    d3sq = d3 * d3
    regularized = cfg.l1_reg > 0 or cfg.l2_reg > 0  # static
    score_in_kernel = (
        cfg.score_metric == "cosine"
        and cfg.thresh_fraction < 0
        and not regularized
        and cfg.model != "lreg"
    )

    def tensors_one(rise_pixel, m_r, pidx_r, pval_r, pid_mask=None):
        sqrt_m = jnp.sqrt(m_r.astype(jnp.float32))
        td = build_candidate_tensors_grouped(
            shared, geom, image_region, rise_pixel, sqrt_m, pidx_r,
            pval_r, pid_mask=pid_mask,
        )
        pitch_pixel = jnp.round(
            rise_pixel * 360.0 / jnp.abs(twist_degree)
        )
        positive = jnp.where(
            cfg.positive_constraint > 0,
            True,
            jnp.where(
                cfg.positive_constraint < 0, pitch_pixel > 2 * geom.l3,
                False,
            ),
        )
        td["lb"] = jnp.where(positive, 0.0, -jnp.inf)
        td["ub"] = jnp.where(positive, td.pop("ub_raw"), jnp.inf)
        # per-candidate regularization scale (mirrors the XLA branch)
        reg_scale = (
            jnp.float32(geom.d2 * geom.l2)
            * jnp.maximum(1.0, jnp.sum(m_r.astype(jnp.float32)))
            if cfg.reg_per_row
            else jnp.float32(1.0)
        )
        td["l1_eff"] = cfg.l1_reg * reg_scale
        td["l2_eff"] = cfg.l2_reg * reg_scale
        return td

    tens = jax.vmap(tensors_one)(
        rises_pixel, m_counts, pair_idx, pairs_valid
    )
    R = int(rises_pixel.shape[0])
    l1v = tens.pop("l1_eff")
    l2v = tens.pop("l2_eff")
    args, static = grouped_pallas_inputs(shared, tens, geom, R)
    run_kw = dict(
        cg_iters=cfg.cg_iters, fista_iters=cfg.fista_iters,
        power_iters=cfg.power_iters,
        use_bf16=jnp.dtype(cfg.compute_dtype) == jnp.bfloat16,
        # compiled Mosaic needs a TPU; any other backend (tests, forced
        # HELICON_PALLAS_GROUPED=1 on CPU) runs the interpreter
        interpret=interpret or jax.default_backend() != "tpu",
    )

    if cfg.fsc_test >= 1:
        # three kernel solves: full + two pixel-id half-sets. The ONLY
        # input difference per half is the j-dependent z-Gram (gt), the
        # rhs, and b_norm (build_candidate_tensors_grouped(pid_mask=));
        # lb/ub stay the full-row bounds, matching the per-candidate
        # halves. Scores combine per the reference (solver:527-530).
        _, s_full = solve_group_pallas(
            args, static, with_score=True, **run_kw
        )
        m1, m2 = _pid_split_masks(
            geom, cfg.fsc_test, jax.random.PRNGKey(0)
        )
        halves = []
        for mh in (m1, m2):
            w = mh.reshape(geom.l2, geom.d2)
            tens_h = jax.vmap(
                functools.partial(tensors_one, pid_mask=w)
            )(rises_pixel, m_counts, pair_idx, pairs_valid)
            tens_h.pop("l1_eff")
            tens_h.pop("l2_eff")
            args_h, static_h = grouped_pallas_inputs(
                shared, tens_h, geom, R
            )
            _, s_h = solve_group_pallas(
                args_h, static_h, with_score=True, **run_kw
            )
            halves.append(s_h[:, 0].reshape(R))
        return (
            s_full[:, 0].reshape(R) / 2 + (halves[0] + halves[1]) / 4
        )

    if not regularized:
        x_w, scores = solve_group_pallas(
            args, static, with_score=score_in_kernel, **run_kw
        )
    else:
        def solve_at(scale):
            return solve_group_pallas(
                args, static, with_score=False,
                l1_col=(
                    wide_col(l1v * scale, R, l3) if cfg.l1_reg else None
                ),
                l2_col=(
                    wide_col(l2v * scale, R, l3) if cfg.l2_reg else None
                ),
                **run_kw,
            )[0]

        def nonzero(x_w):  # (R,) any-nonzero per candidate
            return jnp.any(
                x_w.reshape(l3, R, d3sq) != 0.0, axis=(0, 2)
            )

        def tile_found(f):  # (R,) -> (R*l3, 1) wide row mask
            return jnp.broadcast_to(
                jnp.reshape(f, (1, R)), (l3, R)
            ).reshape(R * l3, 1)

        # reference solver:330-337 alpha-decay retry, whole-group form:
        # every iteration re-solves the group at the decayed scale and
        # freezes candidates at their FIRST nonzero solution
        x0 = solve_at(jnp.float32(1.0))
        found0 = nonzero(x0)

        def cond(c):
            _, found, scale = c
            return jnp.logical_and(~jnp.all(found), scale > 1e-7)

        def body(c):
            x, found, scale = c
            scale = scale * 0.1
            x_new = solve_at(scale)
            x = jnp.where(tile_found(found), x, x_new)
            return x, found | nonzero(x_new), scale

        x_w, _, _ = jax.lax.while_loop(
            cond, body, (x0, found0, jnp.float32(1.0))
        )
        scores = None

    if cfg.model == "lreg" and not regularized:
        # reference solver:331-332: lreg seeds the center voxel when
        # the fit degenerates to all-zero (flat volume index n//2)
        mid = (l3 * d3sq) // 2
        seed = (
            jnp.zeros((l3, d3sq), jnp.float32)
            .ravel().at[mid].set(1.0).reshape(l3, d3sq)
        )
        x_c = x_w.reshape(l3, R, d3sq)
        nz = jnp.any(x_c != 0.0, axis=(0, 2))  # (R,)
        x_c = jnp.where(nz[None, :, None], x_c, seed[:, None, :])
        x_w = x_c.reshape(R * l3, d3sq)

    if score_in_kernel:
        return scores[:, 0].reshape(R)

    # ---- score the kernel's x in XLA (same code path as the XLA
    # grouped scorer: weighted P + _candidate_score) ------------------
    x_cand = jnp.transpose(
        x_w.reshape(l3, R, d3sq), (1, 0, 2)
    )  # (R, l3, d3sq)
    if copy_rank is None:
        assert cfg.score_metric == "cosine", (
            "2D score metrics on the grouped Pallas path require "
            "copy_rank"
        )
        copy_rank = jnp.zeros(m_counts.shape, jnp.int32)

    def score_one(x_r, rise_pixel, m_r, pidx_r, pval_r, rank_r):
        sqrt_m = jnp.sqrt(m_r.astype(jnp.float32))
        ops, rowv_bin = build_candidate_problem_grouped(
            shared, geom, image_region, rise_pixel, sqrt_m, pidx_r,
            pval_r,
        )
        x_vol = x_r.reshape(l3, d3, d3)
        pred = ops["P"](x_vol) * rowv_bin
        if cfg.thresh_fraction >= 0:
            pred = jnp.clip(pred, 0.0, None)
        b_eff = ops["b"][None] * ops["row_valid"]
        inv_w = jnp.where(
            sqrt_m > 0, 1.0 / jnp.maximum(sqrt_m, 1e-30), 0.0
        )
        return _candidate_score(
            pred, b_eff, ops["b"], ops["row_valid"], cfg, rank_r, inv_w
        )

    return jax.vmap(score_one)(
        x_cand, rises_pixel, m_counts, pair_idx, pairs_valid, copy_rank
    )


def _pid_split_masks(geom: ReconstructionGeometry, mode: int, key):
    """Data-row pixel-id split masks of shape (1, l2, d2) (solver:176-203).

    pid = i * d2 + j; mode 1 random, 2 even/odd, 3 halves,
    4 outer-thirds vs center.
    """
    l2, d2 = geom.l2, geom.d2
    pid = jnp.arange(l2 * d2).reshape(l2, d2)
    n = l2 * d2
    if mode == 1:
        perm = jax.random.permutation(key, n)
        rank = jnp.zeros(n, jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
        set1 = (rank < n // 2).reshape(l2, d2)
    elif mode == 2:
        set1 = pid % 2 == 0
    elif mode == 3:
        set1 = pid < n // 2
    else:
        set1 = (pid < n // 3) | (pid >= 2 * n // 3)
    return set1[None].astype(jnp.float32), (~set1[None]).astype(jnp.float32)


def _solve_candidate_impl(
    geom: ReconstructionGeometry,
    cfg: SolveConfig,
    image_region,
    twist_degree,
    rise_pixel,
    copies_h,
    copies_c,
    copies_valid,
    pairs_hc,
    pairs_valid,
    tilt_degree=0.0,
    psi_degree=0.0,
    dy_pixel=0.0,
    key=None,
    pair_ops=None,
    sym_keep=None,
):
    """Jitted single-candidate reconstruction. vmap over the array args
    (twist/rise/copies/pairs[/tilt/psi/dy]) for a candidate grid.

    pair_ops: optional (ops_hc, ops_valid, pair_idx) op-table from
    geometry.select_pair_ops (separable path only).
    sym_keep: optional (P, l3, d3, d3) bool dedup mask
    (geometry.compute_sym_dedup_mask) dropping duplicate voxel-pair
    constraints, matching the reference's nn sym-row dedup.
    Returns dict(rec3d, rec3d_half1, rec3d_half2, score, scores).
    """
    if cfg.score_metric not in SCORE_METRICS:
        raise ValueError(
            f"Unknown score_metric {cfg.score_metric!r}; supported: {SCORE_METRICS}"
        )
    mask = geom.cylindrical_mask()  # numpy at trace time -> jit constant
    cellok = geom.cell_valid_mask()
    if key is None:
        key = jax.random.PRNGKey(0)

    if cfg.separable:
        # tilt/psi must be 0 on this path (grid.py guards this)
        from .projector_separable import build_problem_separable

        ops = build_problem_separable(
            geom,
            image_region,
            twist_degree,
            rise_pixel,
            copies_h,
            copies_c,
            copies_valid,
            pairs_hc,
            pairs_valid,
            dy_pixel,
            cfg.interpolation,
            mask,
            cellok,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            pair_ops=pair_ops,
            sym_keep=sym_keep,
        )
    else:
        ops = build_problem(
            geom,
            image_region,
            twist_degree,
            rise_pixel,
            copies_h,
            copies_c,
            copies_valid,
            pairs_hc,
            pairs_valid,
            tilt_degree,
            psi_degree,
            dy_pixel,
            cfg.interpolation,
            mask,
            cellok,
            sym_keep=sym_keep,
        )
    mask_f = jnp.asarray(mask, jnp.float32)
    rowv = ops["row_valid"].astype(jnp.float32)

    # positivity: explicit flag, or auto when pitch > 2 * volume length
    # (solver:351-356)
    pitch_pixel = jnp.round(rise_pixel * 360.0 / jnp.abs(twist_degree))
    positive = jnp.where(
        cfg.positive_constraint > 0,
        True,
        jnp.where(
            cfg.positive_constraint < 0, pitch_pixel > 2 * geom.l3, False
        ),
    )
    b_eff_full = ops["b"][None] * rowv
    ub_val = jnp.max(b_eff_full)

    # per-candidate regularization scale (see SolveConfig.reg_per_row):
    # data-row count with the candidate's OWN valid copies, as
    # lsq_reconstruct computes it (max(1, cv.sum()))
    reg_scale = (
        jnp.float32(geom.d2 * geom.l2)
        * jnp.maximum(1, jnp.sum(copies_valid)).astype(jnp.float32)
        if cfg.reg_per_row
        else 1.0
    )

    x, score = _solve_one_weighting(
        ops, rowv, mask_f, cfg, positive, ub_val, full_rows=True, key=key,
        reg_scale=reg_scale,
    )
    scores = [score]
    halves = []
    if cfg.fsc_test >= 1:
        m1, m2 = _pid_split_masks(geom, cfg.fsc_test, key)
        for hi, m in enumerate((m1, m2)):
            xh, sh = _solve_one_weighting(
                ops, rowv * m, mask_f, cfg, positive, ub_val,
                key=jax.random.fold_in(key, hi + 1), reg_scale=reg_scale,
            )
            halves.append(xh)
            scores.append(sh)
        combined = scores[0] / 2 + (scores[1] + scores[2]) / 4
    else:
        combined = score
        halves = [jnp.zeros_like(x), jnp.zeros_like(x)]

    return dict(
        rec3d=x,
        rec3d_half1=halves[0],
        rec3d_half2=halves[1],
        score=combined,
        scores=jnp.stack(scores),
    )


solve_candidate = functools.partial(
    jax.jit, static_argnames=("geom", "cfg")
)(_solve_candidate_impl)


# Refined-pose side channel. The reference smuggles (tilt, psi, dy) out
# of lsq_reconstruct via a mutable function attribute (solver:431-439) —
# shared state that races when tasks fan out over threads. The attribute
# is kept for API parity, but in-repo callers (pipeline.process_one_task)
# read the THREAD-LOCAL copy via consume_refined_params().
_refined_tls = threading.local()


def consume_refined_params() -> dict:
    """Pop this thread's refined (tilt, psi, dy) from the last
    lsq_reconstruct call; {} when that call did not refine."""
    params = getattr(_refined_tls, "params", None) or {}
    _refined_tls.params = {}
    return params


def lsq_reconstruct(
    projection_image,
    scale2d_to_3d,
    twist_degree,
    rise_pixel,
    csym: int = 1,
    tilt_degree: float = 0,
    psi_degree: float = 0,
    dy_pixel: float = 0,
    thresh_fraction: float = -1,
    positive_constraint: int = -1,
    reconstruct_diameter_3d_inner_pixel: int = 0,
    reconstruct_diameter_2d_pixel: int = -1,
    reconstruct_diameter_3d_pixel: int = -1,
    reconstruct_length_2d_pixel: int = -1,
    reconstruct_length_3d_pixel: int = -1,
    sym_oversample: int = 1,
    interpolation: str = "nn",
    fsc_test: int = 0,
    score_metric: str = "cosine",
    target_apix2d: float = 5.0,
    verbose: int = 0,
    algorithm=None,
    refine_tilt_psi_dy_range=None,
    cpu: int = 1,
):
    """Reference-compatible entry point (solver_linear_regression.py:31).

    Host-side wrapper: derives the static geometry, selects symmetry
    copies/pairs, calls the jitted solve_candidate, and reassembles
    (rec3d, rec3d_half1, rec3d_half2), score. ``cpu`` is accepted and
    ignored (XLA owns threading).
    """
    algorithm = algorithm or dict(model="lsq")
    # clear the refined-pose side channels up front: a previous refined
    # call must not leak its pose into an unrefined call's readers
    lsq_reconstruct._refined_params = {}
    _refined_tls.params = {}
    img = np.asarray(projection_image, np.float32)
    ny, nx = img.shape
    d2 = int(reconstruct_diameter_2d_pixel) if reconstruct_diameter_2d_pixel > 0 else ny
    l2 = int(reconstruct_length_2d_pixel) if reconstruct_length_2d_pixel > 0 else nx
    d3 = (
        int(reconstruct_diameter_3d_pixel)
        if reconstruct_diameter_3d_pixel > 0
        else int(round(d2 * scale2d_to_3d))
    )
    l3 = (
        int(reconstruct_length_3d_pixel)
        if reconstruct_length_3d_pixel > 0
        else int(round(l2 * scale2d_to_3d))
    )
    geom = ReconstructionGeometry(
        d2=d2,
        l2=l2,
        d3=d3,
        l3=l3,
        rmin=reconstruct_diameter_3d_inner_pixel / 2,
        rmax=d3 // 2 - 1,
        scale2d_to_3d=float(scale2d_to_3d),
        csym=int(csym),
    )

    n_copies, n_pairs = estimate_copy_pair_counts(
        geom, float(rise_pixel), int(max(1, sym_oversample))
    )
    ch, cc, cv = select_copies(geom, float(rise_pixel), n_copies)
    phc, pv = select_pairs(geom, float(twist_degree), float(rise_pixel), n_pairs)

    # exactly d2 x l2 pixels centered like the reference's
    # np.ix_(arange(d2) - d2//2 + ny//2, ...) (solver:366-372) — a plain
    # half-open slice drops a row/column for odd sizes
    r0 = ny // 2 - d2 // 2
    c0 = nx // 2 - l2 // 2
    if r0 < 0 or c0 < 0 or r0 + d2 > ny or c0 + l2 > nx:
        from ..utils.exceptions import HeliconError

        raise HeliconError(
            f"reconstruction region {d2}x{l2} does not fit inside the "
            f"{ny}x{nx} projection image"
        )
    region = img[r0 : r0 + d2, c0 : c0 + l2]

    model = algorithm.get("model", "lsq")
    l1, l2_reg = regularization_from_algorithm(
        algorithm, geom.d2 * geom.l2 * max(1, int(cv.sum()))
    )

    cfg = SolveConfig(
        interpolation=interpolation,
        model=model,
        fsc_test=int(fsc_test),
        score_metric=score_metric,
        thresh_fraction=float(thresh_fraction),
        positive_constraint=int(positive_constraint),
        l1_reg=float(l1),
        l2_reg=float(l2_reg),
        separable=(tilt_degree == 0 and psi_degree == 0),
        ard_prior=float(algorithm.get("alpha", 1e-6)),
    )

    tilt, psi, dy = float(tilt_degree), float(psi_degree), float(dy_pixel)
    if refine_tilt_psi_dy_range:
        from .refine import refine_tilt_psi_dy

        # refinement explores nonzero tilt/psi -> must use the general
        # (non-separable) operators
        refine_cfg = cfg._replace(separable=False)
        tilt, psi, dy = refine_tilt_psi_dy(
            geom,
            refine_cfg,
            region,
            float(twist_degree),
            float(rise_pixel),
            (ch, cc, cv),
            (phc, pv),
            tilt,
            psi,
            dy,
            refine_tilt_psi_dy_range,
        )
        refined_out = dict(tilt=tilt, psi=psi, dy=dy)
        lsq_reconstruct._refined_params = refined_out  # reference-compat
        _refined_tls.params = dict(refined_out)  # race-free channel
        # the separable fast path is only valid at tilt = psi = 0
        cfg = cfg._replace(separable=(tilt == 0 and psi == 0))

    # pair-op tables feed only the separable fast path; building them is
    # a host-side Python loop over every pair row, so skip it otherwise
    pair_ops = None
    if cfg.separable:
        from .geometry import estimate_n_pair_ops, select_pair_ops

        n_ops = estimate_n_pair_ops(geom, float(rise_pixel))
        ops_hc, ops_v, pair_idx, _ = select_pair_ops(
            geom, float(twist_degree), float(rise_pixel), n_pairs, n_ops
        )
        pair_ops = (
            jnp.asarray(ops_hc), jnp.asarray(ops_v), jnp.asarray(pair_idx)
        )

    # reference's nn sym kernel dedups duplicate voxel-pair rows
    # (pair_ids first-occurrence); reproduce via a host-built keep mask
    sym_keep = None
    if interpolation == "nn":
        from .geometry import compute_sym_dedup_mask

        sym_keep = jnp.asarray(
            compute_sym_dedup_mask(
                geom, float(twist_degree), float(rise_pixel), phc, pv
            )
        )

    out = solve_candidate(
        geom,
        cfg,
        jnp.asarray(region),
        jnp.float32(twist_degree),
        jnp.float32(rise_pixel),
        jnp.asarray(ch),
        jnp.asarray(cc),
        jnp.asarray(cv),
        jnp.asarray(phc),
        jnp.asarray(pv),
        jnp.float32(tilt),
        jnp.float32(psi),
        jnp.float32(dy),
        pair_ops=pair_ops,
        sym_keep=sym_keep,
    )
    rec3d = np.asarray(out["rec3d"])
    score = float(out["score"])
    if fsc_test >= 1:
        return (
            rec3d,
            np.asarray(out["rec3d_half1"]),
            np.asarray(out["rec3d_half2"]),
        ), score
    return (rec3d, None, None), score
