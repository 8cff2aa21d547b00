"""Native C++ GN refine engine (helicon_tpu/native/refine_engine.cpp)
vs the JAX loop (refine.py::_refine_batch) — VERDICT r4 #6.

The engine must reproduce the JAX path's refined poses and scores on
the default (nn-lsq-cosine) config; tolerance covers float
reassociation over an iterative solve: poses to 5e-3 (deg / pixel),
scores to 5e-4. The measured speedup (75x per candidate on the small
fixture, 349x -> 0.8x cost ratio on the amyloid fixture) is recorded
in PARITY.md section 10.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # heavy solver/parity coverage


@pytest.fixture(scope="module")
def refine_problem():
    """Capture the exact inputs reconstruct_grid hands the refine stage
    on a small tilted-helix workload."""
    import helicon_tpu.denovo3d.refine as R
    from helicon_tpu.denovo3d import build_candidate_grid
    from helicon_tpu.denovo3d.grid import reconstruct_grid
    from helicon_tpu.helix import simulate_helical_projection

    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=48, nx=96,
        apix=2.0, tilt=4.0, rng=0,
    )))
    tw, ri = build_candidate_grid(26.0, 34.0, 2.0, 5.4, 6.6, 0.3,
                                  handedness="right")
    captured = {}
    orig = R.refine_all_candidates

    def spy(geom, cfg, region, twists, rises, tables, t0, p0, d0, rr,
            batch_size=32):
        captured.update(geom=geom, cfg=cfg, region=region, twists=twists,
                        rises=rises, tables=tables, rr=rr)
        n = len(twists)
        return np.zeros(n, np.float32), np.zeros((n, 3), np.float32)

    R.refine_all_candidates = spy
    try:
        reconstruct_grid(
            img, apix=2.0, twists=tw, rises=ri, tilt=0.0,
            tube_diameter=44.0, cg_iters=8, fista_iters=10,
            power_iters=2, compute_dtype="float32", batch_size=16,
            return_best_volume=False, refine_mode="all",
            refine_tilt_psi_dy_range=dict(
                tilt=8.0, psi=3.0, dy=1.0, max_iter=3
            ),
        )
    finally:
        R.refine_all_candidates = orig
    return captured


def test_engine_loads():
    from helicon_tpu.native import load_refine_engine

    assert load_refine_engine() is not None


def test_native_matches_jax_poses_and_scores(refine_problem):
    from helicon_tpu.denovo3d.refine import (
        _pose_bounds,
        _refine_all_native,
        _refine_batch,
    )
    from helicon_tpu.native import load_refine_engine

    c = refine_problem
    lib = load_refine_engine()
    geom, cfg = c["geom"], c["cfg"]
    region = np.asarray(c["region"], np.float32)
    B = 6
    sl = np.arange(B)
    tabs = tuple(np.asarray(t)[sl] for t in c["tables"])
    s_nat, p_nat = _refine_all_native(
        lib, geom, cfg, region, c["twists"][sl], c["rises"][sl], tabs,
        0.0, 0.0, 0.0, c["rr"],
    )
    lo, hi = _pose_bounds(c["rr"])
    ch, cc, cv, phc, pv = tabs
    p_jax, s_jax = _refine_batch(
        geom, cfg, jnp.asarray(region),
        jnp.asarray(c["twists"][sl]), jnp.asarray(c["rises"][sl]),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        jnp.asarray(np.zeros((B, 3), np.float32)),
        jnp.asarray(lo), jnp.asarray(hi), n_iter=3,
    )
    np.testing.assert_allclose(p_nat, np.asarray(p_jax), atol=5e-3)
    np.testing.assert_allclose(s_nat, np.asarray(s_jax), atol=5e-4)


def test_refine_all_dispatches_to_native(refine_problem, monkeypatch):
    """reconstruct_grid(refine_mode='all') on the default config must
    use the engine (observable: the JAX batch path never runs)."""
    import helicon_tpu.denovo3d.refine as R
    from helicon_tpu.denovo3d.refine import refine_all_candidates

    c = refine_problem
    called = {"jax": 0}

    def boom(*a, **k):
        called["jax"] += 1
        raise AssertionError("JAX refine batch ran despite native engine")

    monkeypatch.setattr(R, "_refine_batch", boom)
    scores, params = refine_all_candidates(
        c["geom"], c["cfg"], np.asarray(c["region"], np.float32),
        c["twists"][:3], c["rises"][:3],
        tuple(np.asarray(t)[:3] for t in c["tables"]),
        0.0, 0.0, 0.0, c["rr"],
    )
    assert called["jax"] == 0
    assert np.all(np.isfinite(scores))


def test_refine_all_fallback_without_native(refine_problem, monkeypatch):
    """HELICON_NATIVE_REFINE=0 (and any ineligible config) must fall
    back to the JAX loop and still produce finite results."""
    from helicon_tpu.denovo3d.refine import refine_all_candidates

    c = refine_problem
    monkeypatch.setenv("HELICON_NATIVE_REFINE", "0")
    scores, params = refine_all_candidates(
        c["geom"], c["cfg"], np.asarray(c["region"], np.float32),
        c["twists"][:2], c["rises"][:2],
        tuple(np.asarray(t)[:2] for t in c["tables"]),
        0.0, 0.0, 0.0, dict(c["rr"], max_iter=1),
        batch_size=2,
    )
    assert np.all(np.isfinite(scores))
    assert params.shape == (2, 3)


def test_native_matches_jax_from_offset_start_pose(refine_problem):
    """The analytic rotation-derivative matrices must agree with the
    autodiff Jacobian away from the origin too: start the GN loop at a
    deliberately wrong, NONZERO pose (3 deg tilt, 1 deg psi, 0.5 px dy)
    so the linearization point exercises all three derivative paths at
    finite angles."""
    from helicon_tpu.denovo3d.refine import (
        _pose_bounds,
        _refine_all_native,
        _refine_batch,
    )
    from helicon_tpu.native import load_refine_engine

    c = refine_problem
    lib = load_refine_engine()
    geom, cfg = c["geom"], c["cfg"]
    region = np.asarray(c["region"], np.float32)
    B = 4
    sl = np.arange(B)
    tabs = tuple(np.asarray(t)[sl] for t in c["tables"])
    s_nat, p_nat = _refine_all_native(
        lib, geom, cfg, region, c["twists"][sl], c["rises"][sl], tabs,
        3.0, 1.0, 0.5, c["rr"],
    )
    lo, hi = _pose_bounds(c["rr"])
    p0 = np.clip(
        np.broadcast_to(np.array([3.0, 1.0, 0.5], np.float32), (B, 3)),
        lo, hi,
    ).copy()
    ch, cc, cv, phc, pv = tabs
    p_jax, s_jax = _refine_batch(
        geom, cfg, jnp.asarray(region),
        jnp.asarray(c["twists"][sl]), jnp.asarray(c["rises"][sl]),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        jnp.asarray(p0), jnp.asarray(lo), jnp.asarray(hi), n_iter=3,
    )
    np.testing.assert_allclose(p_nat, np.asarray(p_jax), atol=2e-2)
    np.testing.assert_allclose(s_nat, np.asarray(s_jax), atol=1e-3)


def test_native_matches_jax_linear_interpolation(refine_problem):
    """The engine's trilinear CSR path (interp_linear=1) — the
    reference UI's DEFAULT interpolation — must match the JAX loop with
    cfg.interpolation='linear' (solve and Jacobian both trilinear)."""
    from helicon_tpu.denovo3d.refine import (
        _pose_bounds,
        _refine_all_native,
        _refine_batch,
    )
    from helicon_tpu.native import load_refine_engine

    c = refine_problem
    lib = load_refine_engine()
    geom = c["geom"]
    cfg = c["cfg"]._replace(interpolation="linear")
    region = np.asarray(c["region"], np.float32)
    B = 4
    sl = np.arange(B)
    tabs = tuple(np.asarray(t)[sl] for t in c["tables"])
    s_nat, p_nat = _refine_all_native(
        lib, geom, cfg, region, c["twists"][sl], c["rises"][sl], tabs,
        0.0, 0.0, 0.0, c["rr"],
    )
    lo, hi = _pose_bounds(c["rr"])
    ch, cc, cv, phc, pv = tabs
    p_jax, s_jax = _refine_batch(
        geom, cfg, jnp.asarray(region),
        jnp.asarray(c["twists"][sl]), jnp.asarray(c["rises"][sl]),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        jnp.asarray(np.zeros((B, 3), np.float32)),
        jnp.asarray(lo), jnp.asarray(hi), n_iter=3,
    )
    np.testing.assert_allclose(p_nat, np.asarray(p_jax), atol=1e-2)
    np.testing.assert_allclose(s_nat, np.asarray(s_jax), atol=1e-3)


def test_native_matches_jax_with_csym2():
    """csym > 1 exercises the engine's 360*c/csym angle terms in both
    the data-copy and symmetry-op builds — untouched by the csym=1
    fixtures above."""
    import helicon_tpu.denovo3d.refine as R
    from helicon_tpu.denovo3d import build_candidate_grid
    from helicon_tpu.denovo3d.grid import reconstruct_grid
    from helicon_tpu.denovo3d.refine import (
        _pose_bounds,
        _refine_all_native,
        _refine_batch,
    )
    from helicon_tpu.helix import simulate_helical_projection
    from helicon_tpu.native import load_refine_engine

    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=2, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=48, nx=96,
        apix=2.0, tilt=3.0, rng=0,
    )))
    tw, ri = build_candidate_grid(28.0, 32.0, 2.0, 5.7, 6.3, 0.3,
                                  handedness="right")
    captured = {}
    orig = R.refine_all_candidates

    def spy(geom, cfg, region, twists, rises, tables, t0, p0, d0, rr,
            batch_size=32):
        captured.update(geom=geom, cfg=cfg, region=region, twists=twists,
                        rises=rises, tables=tables, rr=rr)
        n = len(twists)
        return np.zeros(n, np.float32), np.zeros((n, 3), np.float32)

    R.refine_all_candidates = spy
    try:
        reconstruct_grid(
            img, apix=2.0, twists=tw, rises=ri, csym=2, tilt=0.0,
            tube_diameter=44.0, cg_iters=8, fista_iters=10,
            power_iters=2, compute_dtype="float32", batch_size=8,
            return_best_volume=False, refine_mode="all",
            refine_tilt_psi_dy_range=dict(
                tilt=6.0, psi=2.0, dy=1.0, max_iter=2
            ),
        )
    finally:
        R.refine_all_candidates = orig
    assert captured["geom"].csym == 2
    lib = load_refine_engine()
    B = 4
    sl = np.arange(B)
    tabs = tuple(np.asarray(t)[sl] for t in captured["tables"])
    region = np.asarray(captured["region"], np.float32)
    s_nat, p_nat = _refine_all_native(
        lib, captured["geom"], captured["cfg"], region,
        captured["twists"][sl], captured["rises"][sl], tabs,
        0.0, 0.0, 0.0, captured["rr"],
    )
    lo, hi = _pose_bounds(captured["rr"])
    ch, cc, cv, phc, pv = tabs
    p_jax, s_jax = _refine_batch(
        captured["geom"], captured["cfg"], jnp.asarray(region),
        jnp.asarray(captured["twists"][sl]),
        jnp.asarray(captured["rises"][sl]),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        jnp.asarray(np.zeros((B, 3), np.float32)),
        jnp.asarray(lo), jnp.asarray(hi), n_iter=2,
    )
    np.testing.assert_allclose(p_nat, np.asarray(p_jax), atol=1e-2)
    np.testing.assert_allclose(s_nat, np.asarray(s_jax), atol=1e-3)
