"""Twist-grouped grid scoring (projector_grouped.py / grid._grouped_scoring).

The grouped path must reproduce the per-candidate path's scores exactly
(up to float reassociation): same Halton copy multisets — including
duplicates, expressed as sqrt(multiplicity) row weights — same pair
tables, same solver flow.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy solver/parity coverage: run explicitly or without -m "not slow"

from helicon_tpu.denovo3d import reconstruct_grid
from helicon_tpu.denovo3d.geometry import (
    ReconstructionGeometry,
    estimate_copy_pair_counts,
    estimate_n_pair_ops,
    select_copies,
)
from helicon_tpu.denovo3d.grid import _group_tables
from helicon_tpu.helix import simulate_helical_projection


@pytest.fixture(scope="module")
def image():
    return simulate_helical_projection(
        n=1, twist=29.4, rise=4.75, csym=1, helical_diameter=100.0,
        ball_radius=6.0, polymer=0, planarity=1.0,
        ny=64, nx=128, apix=2.0, rng=0,
    )


GRID_KW = dict(
    apix=2.0, target_apix2d=4.0, tube_diameter=110.0,
    reconstruct_length_rise=3.0, cg_iters=10, fista_iters=16,
    power_iters=2, compute_dtype="float32", batch_size=16,
    return_best_volume=False,
)


def _run(image, tw, ri, grouped, monkeypatch, **overrides):
    monkeypatch.setenv("HELICON_GRID_GROUPED", "1" if grouped else "0")
    kw = dict(GRID_KW, **overrides)
    return reconstruct_grid(image, twists=tw, rises=ri, **kw)


def test_grouped_matches_percandidate_scores(image, monkeypatch):
    # unequal group sizes: 5 + 3 + 1 candidates (padding exercised)
    tw = np.asarray([25.0] * 5 + [29.4] * 3 + [33.0], np.float32)
    ri = np.asarray(
        [4.3, 4.45, 4.6, 4.75, 4.9, 4.4, 4.7, 5.0, 4.75], np.float32
    )
    r0 = _run(image, tw, ri, False, monkeypatch)
    r1 = _run(image, tw, ri, True, monkeypatch)
    assert np.all(np.isfinite(r1.scores))
    np.testing.assert_allclose(r1.scores, r0.scores, atol=2e-5)
    assert np.array_equal(np.argsort(-r0.scores), np.argsort(-r1.scores))


def test_grouped_matches_percandidate_linear_interp(image, monkeypatch):
    tw = np.repeat([27.0, 31.0], 3).astype(np.float32)
    ri = np.tile([4.4, 4.7, 5.0], 2).astype(np.float32)
    r0 = _run(image, tw, ri, False, monkeypatch, interpolation="linear")
    r1 = _run(image, tw, ri, True, monkeypatch, interpolation="linear")
    # linear Wsum is denser than nn, so the grouped path's reordered
    # f32 reductions drift more over the ~29 iterations (~1e-4 observed)
    np.testing.assert_allclose(r1.scores, r0.scores, atol=5e-4)
    assert np.array_equal(np.argsort(-r0.scores), np.argsort(-r1.scores))


def test_grouped_bfloat16_preserves_ranking(image, monkeypatch):
    """The production default is compute_dtype='bfloat16'; the grouped
    path reassociates its reductions R-wide and stores sqrt(m) weights
    in bf16, so the bf16 ranking-preservation claim must be re-checked
    for THIS path, not only for the per-candidate one (docs/PROFILE.md).
    Criterion (as established for bf16): identical ranking vs the f32
    per-candidate oracle, scores within bf16 tolerance."""
    tw = np.repeat([23.0, 27.0, 29.4, 33.0], 4).astype(np.float32)
    ri = np.tile([4.3, 4.55, 4.75, 4.95], 4).astype(np.float32)
    r0 = _run(image, tw, ri, False, monkeypatch, compute_dtype="float32")
    r1 = _run(image, tw, ri, True, monkeypatch, compute_dtype="bfloat16")
    np.testing.assert_allclose(r1.scores, r0.scores, atol=5e-3)
    assert np.array_equal(np.argsort(-r0.scores), np.argsort(-r1.scores))


def test_grouped_matches_percandidate_lasso(image, monkeypatch):
    tw = np.repeat([29.4], 4).astype(np.float32)
    ri = np.asarray([4.4, 4.6, 4.75, 4.9], np.float32)
    algo = dict(model="lasso", alpha=1e-4)
    r0 = _run(image, tw, ri, False, monkeypatch, algorithm=algo)
    r1 = _run(image, tw, ri, True, monkeypatch, algorithm=algo)
    np.testing.assert_allclose(r1.scores, r0.scores, atol=2e-5)


def test_group_tables_multiset_parity_with_duplicates():
    """Halton selection repeats entries at realistic copy counts; the
    canonical multiplicity table must reproduce the exact multiset."""
    geom = ReconstructionGeometry(
        d2=28, l2=126, d3=28, l3=4, rmin=0.0, rmax=13.0,
        scale2d_to_3d=0.858, csym=1,
    )
    rises = np.asarray([0.86, 1.0, 1.03], np.float32)
    n_copies, n_pairs = estimate_copy_pair_counts(
        geom, float(rises.min()), 32, rise_pixel_max=float(rises.max())
    )
    n_ops = estimate_n_pair_ops(geom, float(rises.min()))
    cache = {}
    rp, m, ch_u, cc_u, pidx, pval, rank = _group_tables(
        geom, 29.4, rises, n_copies, n_pairs, n_ops, 260, len(rises), cache
    )
    assert (m > 1).any(), "fixture must exercise duplicate copies"
    # rank table invariants: selected <=> rank >= 0, and rank is the LAST
    # Halton position of that copy (duplicates keep the later index)
    for ri, r in enumerate(rises):
        ch, cc, cv = select_copies(geom, float(r), n_copies)
        last = {}
        for pos, (h, c) in enumerate(zip(ch[cv].tolist(), cc[cv].tolist())):
            last[(h, c)] = pos
        for k in range(len(ch_u)):
            key = (int(ch_u[k]), int(cc_u[k]))
            if m[ri, k] > 0:
                assert rank[ri, k] == last[key]
            else:
                assert rank[ri, k] == -1
    for ri, r in enumerate(rises):
        ch, cc, cv = select_copies(geom, float(r), n_copies)
        ref = {}
        for h, c in zip(ch[cv].tolist(), cc[cv].tolist()):
            ref[(h, c)] = ref.get((h, c), 0) + 1
        got = {
            (int(ch_u[k]), int(cc_u[k])): int(m[ri, k])
            for k in range(len(ch_u))
            if m[ri, k] > 0
        }
        assert got == ref


def test_grouped_scores_with_duplicate_copies(image, monkeypatch):
    """End-to-end parity in a regime where multiplicities > 1 occur
    (sym_oversample high enough that Halton repeats enter the list)."""
    tw = np.repeat([29.4, 26.0], 3).astype(np.float32)
    ri = np.tile([4.55, 4.75, 4.95], 2).astype(np.float32)
    r0 = _run(image, tw, ri, False, monkeypatch, sym_oversample=32)
    r1 = _run(image, tw, ri, True, monkeypatch, sym_oversample=32)
    np.testing.assert_allclose(r1.scores, r0.scores, atol=2e-5)
    assert np.array_equal(np.argsort(-r0.scores), np.argsort(-r1.scores))


@pytest.mark.parametrize(
    "metric", ["ssim", "ms_ssim", "mutual_information", "composite"]
)
def test_grouped_matches_percandidate_2d_metrics(image, metric, monkeypatch):
    """The 2D metrics read raw reprojection values scattered
    last-copy-wins in Halton order; the grouped path reconstructs both
    (inv-weighting + rank table) and must agree with the per-candidate
    oracle. Duplicate multiplicities are exercised via sym_oversample."""
    tw = np.repeat([29.4, 26.0], 3).astype(np.float32)
    ri = np.tile([4.55, 4.75, 4.95], 2).astype(np.float32)
    kw = dict(score_metric=metric, sym_oversample=32)
    r0 = _run(image, tw, ri, False, monkeypatch, **kw)
    r1 = _run(image, tw, ri, True, monkeypatch, **kw)
    assert np.all(np.isfinite(r1.scores))
    np.testing.assert_allclose(r1.scores, r0.scores, atol=2e-5)
    assert np.array_equal(np.argsort(-r0.scores), np.argsort(-r1.scores))


def test_ineligible_configs_use_percandidate_path(image, monkeypatch):
    """ard counts unweighted equations and REGULARIZED fsc bypasses the
    grouped reg_scale bookkeeping — the grid must keep those on the
    per-candidate path even when grouping is force-enabled.
    (Unregularized fsc runs GROUPED since round 5 — covered by
    test_grouped_fsc_matches_percandidate.)"""
    from helicon_tpu.denovo3d import grid as grid_mod

    def _boom(*a, **k):  # pragma: no cover - failure reporter
        raise AssertionError("grouped path must not run for this config")

    monkeypatch.setattr(grid_mod, "_grouped_scoring", _boom)
    monkeypatch.setenv("HELICON_GRID_GROUPED", "1")
    tw = np.repeat([29.4], 2).astype(np.float32)
    ri = np.asarray([4.6, 4.9], np.float32)
    r = reconstruct_grid(
        image, twists=tw, rises=ri, fsc_test=2,
        algorithm=dict(model="ridge", alpha=0.05), **GRID_KW,
    )
    assert np.all(np.isfinite(r.scores))
    r = reconstruct_grid(
        image, twists=tw, rises=ri,
        algorithm=dict(model="ard"), **GRID_KW,
    )
    assert np.all(np.isfinite(r.scores))


def test_grouped_fsc_matches_percandidate(image, monkeypatch):
    """fsc half-set splits run grouped since round 5: the pixel-id mask
    enters the normal operator through a j-dependent z-Gram / explicit
    P-PT closures. Scores must match the per-candidate fsc path."""
    tw = np.repeat([27.0, 29.4], 3).astype(np.float32)
    ri = np.tile([4.5, 4.75, 5.0], 2).astype(np.float32)
    for mode in (2, 3):
        r0 = _run(image, tw, ri, False, monkeypatch, fsc_test=mode)
        r1 = _run(image, tw, ri, True, monkeypatch, fsc_test=mode)
        np.testing.assert_allclose(
            r1.scores, r0.scores, atol=5e-4, err_msg=f"mode {mode}"
        )
        assert np.array_equal(
            np.argsort(-r0.scores), np.argsort(-r1.scores)
        ), f"mode {mode}"


def test_auto_mode_skips_grouping_for_unique_twists(image, monkeypatch):
    """With no twist repetition there is nothing to share; auto mode
    must stay on the per-candidate path."""
    from helicon_tpu.denovo3d import grid as grid_mod

    called = {}

    def _spy(*a, **k):  # pragma: no cover - failure reporter
        called["grouped"] = True
        raise AssertionError("auto mode grouped a twist-unique grid")

    monkeypatch.setattr(grid_mod, "_grouped_scoring", _spy)
    monkeypatch.setenv("HELICON_GRID_GROUPED", "-1")
    tw = np.asarray([25.0, 27.0, 29.0, 31.0], np.float32)
    ri = np.asarray([4.6, 4.7, 4.8, 4.9], np.float32)
    r = reconstruct_grid(image, twists=tw, rises=ri, **GRID_KW)
    assert np.all(np.isfinite(r.scores))
    assert "grouped" not in called


def test_grouped_progress_and_abort(image, monkeypatch):
    """Incremental mode: scores stream per group-batch; abort keeps the
    already-scored prefix at real values and the rest at -inf."""
    tw = np.repeat(np.linspace(20.0, 34.0, 8).astype(np.float32), 2)
    ri = np.tile([4.6, 4.9], 8).astype(np.float32)
    import jax

    monkeypatch.setenv("HELICON_GRID_GROUPED", "1")
    # deterministic dispatch granularity (abort/progress fire per
    # dispatched batch): one device and 2 groups per call — under the
    # conftest's 8-device mesh the auto sizing packs all 8 groups into
    # a single call and there is nothing left to abort
    monkeypatch.setenv("HELICON_GRID_GROUP_CHUNK", "2")
    one_dev = jax.devices()[:1]
    calls = []
    r = reconstruct_grid(
        image, twists=tw, rises=ri, devices=one_dev,
        progress_callback=lambda done, n, s: calls.append(done),
        **dict(GRID_KW, batch_size=4),
    )
    assert calls and calls[-1] == len(tw)
    assert np.all(np.isfinite(r.scores))

    aborts = iter([False, True, True, True, True, True, True, True])
    r2 = reconstruct_grid(
        image, twists=tw, rises=ri, devices=one_dev,
        should_abort=lambda: next(aborts),
        **dict(GRID_KW, batch_size=4),
    )
    assert np.isneginf(r2.scores).any()  # aborted before completion
    scored = r2.scores[np.isfinite(r2.scores)]
    assert len(scored) and np.all(np.abs(scored) <= 1.0 + 1e-6)


def test_grouped_explicit_batch_size_not_inflated_by_inner_chunk(
    image, monkeypatch
):
    """HELICON_GRID_INNER (the accelerator default) must not inflate an
    explicit batch_size on the grouped path: inner_chunk divisibility is
    a per-candidate-path constraint, and batch_size is the caller's
    dispatch/abort granularity contract."""
    tw = np.repeat(np.linspace(20.0, 34.0, 8).astype(np.float32), 2)
    ri = np.tile([4.6, 4.9], 8).astype(np.float32)
    import jax

    monkeypatch.setenv("HELICON_GRID_GROUPED", "1")
    monkeypatch.setenv("HELICON_GRID_GROUP_CHUNK", "2")
    monkeypatch.setenv("HELICON_GRID_INNER", "8")  # accelerator default
    one_dev = jax.devices()[:1]
    calls = []
    r = reconstruct_grid(
        image, twists=tw, rises=ri, devices=one_dev,
        progress_callback=lambda done, n, s: calls.append(done),
        **dict(GRID_KW, batch_size=4),
    )
    assert calls and calls[-1] == len(tw)
    increments = np.diff([0] + calls)
    assert increments.max() <= 4, calls
    assert np.all(np.isfinite(r.scores))


def test_copy_block_cache_keys_do_not_collide():
    """_copy_block memoizes the rise-only table half on the rise tuple:
    same rises -> one shared (read-only) block regardless of twist;
    different rises / R_pad -> distinct entries with correct content."""
    from helicon_tpu.denovo3d.geometry import ReconstructionGeometry
    from helicon_tpu.denovo3d.grid import _group_tables

    geom = ReconstructionGeometry(
        d2=12, l2=24, d3=12, l3=4, rmin=0.0, rmax=5.0,
        scale2d_to_3d=1.0, csym=1,
    )
    cache = {}
    r_a = np.array([1.0, 1.25], np.float32)
    r_b = np.array([1.0, 1.5], np.float32)
    out1 = _group_tables(geom, 30.0, r_a, 8, 4, 5, 20, 2, cache)
    out2 = _group_tables(geom, 31.0, r_a, 8, 4, 5, 20, 2, cache)
    out3 = _group_tables(geom, 30.0, r_b, 8, 4, 5, 20, 2, cache)
    # same rises, different twist: the rise-only arrays are THE SAME
    # cached (read-only) objects; pair tables may differ
    for k in (0, 1, 6):  # rises_pad, m, rank
        assert out1[k] is out2[k]
        assert not out1[k].flags.writeable
    # different rises: fresh content, not a collision
    assert not np.array_equal(out1[0], out3[0])
    # padding path (R < R_pad) also cached consistently
    p1 = _group_tables(geom, 30.0, r_a[:1], 8, 4, 5, 20, 3, cache)
    p2 = _group_tables(geom, 77.0, r_a[:1], 8, 4, 5, 20, 3, cache)
    assert p1[1] is p2[1]
    np.testing.assert_array_equal(p1[1][0], p1[1][2])  # padded rows repeat


def _tiny_grouped_ops(pair_idx, pairs_valid, sqrt_m=None):
    """Eagerly build a small grouped problem (no jit/vmap) so the
    operator closures can be compared directly."""
    import jax.numpy as jnp

    from helicon_tpu.denovo3d.projector_grouped import (
        build_candidate_problem_grouped,
        build_group_shared,
    )

    geom = ReconstructionGeometry(
        d2=8, l2=12, d3=8, l3=4, rmin=0.0, rmax=3.0,
        scale2d_to_3d=1.0, csym=1,
    )
    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    shared = build_group_shared(
        geom, 29.4,
        jnp.asarray([-1, 0, 1], jnp.int32), jnp.asarray([0, 0, 0], jnp.int32),
        jnp.asarray([-1, 0, 1], jnp.int32), jnp.asarray([0, 0, 0], jnp.int32),
        interpolation="nn", mask=mask, cellok=cellok,
    )
    if sqrt_m is None:
        sqrt_m = jnp.asarray([1.0, np.sqrt(2.0), 1.0], jnp.float32)
    region = np.random.default_rng(5).normal(size=(geom.d2, geom.l2))
    ops, rowv = build_candidate_problem_grouped(
        shared, geom, region, 1.3, sqrt_m,
        jnp.asarray(pair_idx, jnp.int32), jnp.asarray(pairs_valid, bool),
    )
    return geom, ops


def test_fused_ntn_matches_separate_operators():
    """ops['NTN'] must equal PTP + ST(S(.)): the op-axis Laplacian is an
    exact reassociation of the pair gather/scatter, and the stacked
    [Wsum; Mxy] GEMMs compute the same row contractions."""
    import jax
    import jax.numpy as jnp

    geom, ops = _tiny_grouped_ops(
        [[0, 1], [1, 2], [0, 2]], [True, True, False]
    )
    for seed in range(3):
        v = jax.random.normal(jax.random.PRNGKey(seed), geom.volume_shape)
        ref = ops["PTP"](v) + ops["ST"](ops["S"](v))
        fused = ops["NTN"](v)
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), atol=1e-4 * scale
        )


def test_fused_ntn_duplicate_and_self_pairs():
    """A duplicated pair row is a duplicated equation (counts twice in
    S^T S); a self-pair (i == i) contributes exactly nothing."""
    import jax
    import jax.numpy as jnp

    geom, dup = _tiny_grouped_ops(
        [[0, 1], [0, 1], [2, 2]], [True, True, True]
    )
    _, single = _tiny_grouped_ops([[0, 1], [0, 1], [2, 2]],
                                  [True, False, False])
    v = jax.random.normal(jax.random.PRNGKey(7), geom.volume_shape)
    sts_dup = dup["NTN"](v) - dup["PTP"](v)
    sts_one = single["NTN"](v) - single["PTP"](v)
    scale = float(jnp.max(jnp.abs(sts_one))) or 1.0
    np.testing.assert_allclose(
        np.asarray(sts_dup), np.asarray(2.0 * sts_one), atol=1e-4 * scale
    )


def test_fused_ntn_env_flag_scores_match(image, monkeypatch):
    """HELICON_FUSED_NTN=0 (separate closures) and =1 (fused) must give
    the same grouped grid scores up to f32 reassociation."""
    tw = np.repeat([27.0, 29.4], 3).astype(np.float32)
    ri = np.tile([4.4, 4.7, 5.0], 2).astype(np.float32)
    monkeypatch.setenv("HELICON_FUSED_NTN", "0")
    r0 = _run(image, tw, ri, True, monkeypatch)
    monkeypatch.setenv("HELICON_FUSED_NTN", "1")
    r1 = _run(image, tw, ri, True, monkeypatch)
    np.testing.assert_allclose(r1.scores, r0.scores, atol=2e-5)
    assert np.array_equal(np.argsort(-r0.scores), np.argsort(-r1.scores))
