"""Tests for the denovo3D solver stack.

The key oracle: tiny geometries where the reference's sparse system can be
built explicitly with plain numpy loops (same semantics as the numba
kernels in solver_linear_regression.py:1403-1654 and 844-1298); the
matrix-free operators must reproduce A.x exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from helicon_tpu.denovo3d import (
    ReconstructionGeometry,
    lsq_reconstruct,
    select_copies,
    select_pairs,
)
from helicon_tpu.denovo3d.projector import build_problem
from helicon_tpu.denovo3d.solver import SolveConfig, _pid_split_masks


def small_geom():
    return ReconstructionGeometry(
        d2=8, l2=12, d3=8, l3=8, rmin=0.0, rmax=3.0, scale2d_to_3d=1.0, csym=1
    )


def explicit_data_matrix(geom, twist, rise, copies, interpolation, mask):
    """Reference-convention rows: for each copy (h, c) and 2D pixel
    (i_len, j), sum interpolation weights along the ray k."""
    d2, l2, d3, l3 = geom.d2, geom.l2, geom.d3, geom.l3
    s = geom.scale2d_to_3d
    csym = geom.csym
    nvox = l3 * d3 * d3
    rows = []
    row_valid = []
    for (h, c) in copies:
        ang = np.deg2rad(twist * h + 360.0 * c / csym)
        ca, sa = np.cos(ang), np.sin(ang)
        for i in range(l2):
            for j in range(d2):
                w = np.zeros(nvox)
                any_valid = False
                for k in range(d2):
                    x = -s * (k - d2 // 2)
                    y = s * (j - d2 // 2)
                    z = s * (i - l2 // 2)
                    xr = x * ca + y * sa
                    yr = -x * sa + y * ca
                    zr = z - h * rise
                    X = xr + d3 // 2
                    Y = yr + d3 // 2
                    Z = zr + l3 // 2
                    if interpolation == "nn":
                        zi, yi, xi = round(Z), round(Y), round(X)
                        if not (0 <= zi <= l3 - 1 and 0 <= yi <= d3 - 1 and 0 <= xi <= d3 - 1):
                            continue
                        if not mask[zi, yi, xi]:
                            continue
                        any_valid = True
                        w[(zi * d3 + yi) * d3 + xi] += 1.0
                    else:
                        zi, yi, xi = int(np.floor(Z)), int(np.floor(Y)), int(np.floor(X))
                        if not (0 <= zi <= l3 - 2 and 0 <= yi <= d3 - 2 and 0 <= xi <= d3 - 2):
                            continue
                        ok = True
                        for dz in (0, 1):
                            for dy_ in (0, 1):
                                for dx in (0, 1):
                                    if not mask[zi + dz, yi + dy_, xi + dx]:
                                        ok = False
                        if not ok:
                            continue
                        any_valid = True
                        fz, fy, fx = Z - zi, Y - yi, X - xi
                        for dz in (0, 1):
                            for dy_ in (0, 1):
                                for dx in (0, 1):
                                    wt = (
                                        (fz if dz else 1 - fz)
                                        * (fy if dy_ else 1 - fy)
                                        * (fx if dx else 1 - fx)
                                    )
                                    w[((zi + dz) * d3 + yi + dy_) * d3 + xi + dx] += wt
                rows.append(w)
                row_valid.append(any_valid)
    return np.asarray(rows), np.asarray(row_valid)


@pytest.mark.parametrize("interpolation", ["nn", "linear"])
def test_data_operator_matches_explicit_matrix(interpolation):
    geom = small_geom()
    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    twist, rise = 35.0, 2.3
    copies = [(0, 0), (1, 0), (-1, 0), (2, 0)]
    ch = np.array([h for h, _ in copies], np.int32)
    cc = np.array([c for _, c in copies], np.int32)
    cv = np.ones(len(copies), bool)
    phc = np.zeros((1, 4), np.int32)
    pv = np.zeros(1, bool)

    rng = np.random.default_rng(0)
    region = rng.random((geom.d2, geom.l2)).astype(np.float32)
    x = rng.random(geom.volume_shape).astype(np.float32) * mask

    ops = build_problem(
        geom, region, jnp.float32(twist), jnp.float32(rise),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        interpolation=interpolation, mask=mask, cellok=cellok,
    )
    pred = np.asarray(ops["P"](jnp.asarray(x)))  # (C, l2, d2)

    A, rv = explicit_data_matrix(geom, twist, rise, copies, interpolation, mask)
    expected = (A @ x.ravel()).reshape(len(copies), geom.l2, geom.d2)
    np.testing.assert_allclose(pred, expected, atol=1e-4)

    got_rv = np.asarray(ops["row_valid"]).reshape(-1)
    np.testing.assert_array_equal(got_rv, rv)


@pytest.mark.parametrize("interpolation", ["nn", "linear"])
def test_adjoint_consistency(interpolation):
    geom = small_geom()
    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    ch, cc, cv = select_copies(geom, 2.0, 5)
    phc, pv = select_pairs(geom, 30.0, 2.0, 4)
    rng = np.random.default_rng(1)
    region = rng.random((geom.d2, geom.l2)).astype(np.float32)
    ops = build_problem(
        geom, region, jnp.float32(30.0), jnp.float32(2.0),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        interpolation=interpolation, mask=mask, cellok=cellok,
    )
    x = jnp.asarray(rng.random(geom.volume_shape), jnp.float32)
    y = jnp.asarray(rng.random((5, geom.l2, geom.d2)), jnp.float32)
    lhs = float(jnp.vdot(ops["P"](x), y))
    rhs = float(jnp.vdot(x, ops["PT"](y)))
    assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs))

    r = jnp.asarray(rng.random((4,) + geom.volume_shape), jnp.float32)
    lhs = float(jnp.vdot(ops["S"](x), r))
    rhs = float(jnp.vdot(x, ops["ST"](r)))
    assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs))


def test_sym_operator_zero_on_symmetric_volume():
    """A perfectly symmetric volume must satisfy every constraint row."""
    geom = ReconstructionGeometry(
        d2=10, l2=12, d3=10, l3=12, rmin=0.0, rmax=4.0, scale2d_to_3d=1.0, csym=1
    )
    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    twist, rise = 90.0, 3.0  # exact twist for a grid-friendly check

    # build a volume invariant under (twist=90deg, rise=3px)
    zc = np.arange(geom.l3) - geom.l3 // 2
    yc = np.arange(geom.d3) - geom.d3 // 2
    xc = np.arange(geom.d3) - geom.d3 // 2
    Z, Y, X = np.meshgrid(zc, yc, xc, indexing="ij")
    phi = np.arctan2(Y, X)
    r = np.sqrt(X * X + Y * Y)
    helical_phase = phi - np.deg2rad(twist) * Z / rise
    vol = (np.cos(helical_phase) * np.exp(-((r - 2.5) ** 2))).astype(np.float32)

    phc, pv = select_pairs(geom, twist, rise, 6)
    ch = np.zeros(1, np.int32); cc = np.zeros(1, np.int32); cv = np.ones(1, bool)
    region = np.zeros((geom.d2, geom.l2), np.float32)
    ops = build_problem(
        geom, region, jnp.float32(twist), jnp.float32(rise),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        interpolation="linear", mask=mask, cellok=cellok,
    )
    res = np.asarray(ops["S"](jnp.asarray(vol)))
    assert np.abs(res).max() < 0.15  # trilinear interp error only
    # a random volume must violate the constraints much more
    rnd = np.random.default_rng(0).random(vol.shape).astype(np.float32)
    res_rnd = np.asarray(ops["S"](jnp.asarray(rnd)))
    assert np.abs(res_rnd).max() > 3 * np.abs(res).max()


def test_select_copies_pairs_static_shapes():
    geom = small_geom()
    ch, cc, cv = select_copies(geom, 2.0, 7)
    assert ch.shape == (7,) and cc.shape == (7,) and cv.shape == (7,)
    assert cv.any()
    phc, pv = select_pairs(geom, 30.0, 2.0, 9)
    assert phc.shape == (9, 4) and pv.shape == (9,)
    assert pv.any()
    # determinism
    ch2, cc2, cv2 = select_copies(geom, 2.0, 7)
    np.testing.assert_array_equal(ch, ch2)


def test_pid_split_masks_modes():
    geom = small_geom()
    import jax

    key = jax.random.PRNGKey(0)
    for mode in (1, 2, 3, 4):
        m1, m2 = _pid_split_masks(geom, mode, key)
        tot = np.asarray(m1 + m2)
        np.testing.assert_allclose(tot, 1.0)
        frac = float(np.asarray(m1).mean())
        assert 0.3 < frac < 0.7


def test_lsq_reconstruct_recovers_truth():
    from helicon_tpu.helix import simulate_helical_projection

    img = simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=64, apix=2.0,
        rng=0,
    )
    kwargs = dict(
        projection_image=img, scale2d_to_3d=1.0, csym=1,
        reconstruct_diameter_2d_pixel=24, reconstruct_diameter_3d_pixel=24,
        reconstruct_length_2d_pixel=48, reconstruct_length_3d_pixel=16,
        sym_oversample=2, interpolation="nn",
    )
    (_, _, _), score_true = lsq_reconstruct(
        twist_degree=30.0, rise_pixel=3.0, **kwargs
    )
    (_, _, _), score_wrong = lsq_reconstruct(
        twist_degree=55.0, rise_pixel=2.0, **kwargs
    )
    assert score_true > 0.9
    assert score_true > score_wrong + 0.01


def test_fsc_test_returns_halves():
    from helicon_tpu.helix import simulate_helical_projection

    img = simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=64, apix=2.0,
        rng=0,
    )
    (rec, h1, h2), score = lsq_reconstruct(
        projection_image=img, scale2d_to_3d=1.0, twist_degree=30.0,
        rise_pixel=3.0, csym=1,
        reconstruct_diameter_2d_pixel=24, reconstruct_diameter_3d_pixel=24,
        reconstruct_length_2d_pixel=48, reconstruct_length_3d_pixel=16,
        sym_oversample=2, interpolation="nn", fsc_test=2,
    )
    assert h1 is not None and h2 is not None
    assert h1.shape == rec.shape
    # the two half-maps should correlate (same underlying structure)
    from helicon_tpu.core.analysis import cross_correlation_coefficient

    cc = float(cross_correlation_coefficient(h1, h2))
    assert cc > 0.2


@pytest.mark.parametrize("interpolation", ["nn", "linear"])
@pytest.mark.slow
def test_separable_matches_gather_path(interpolation):
    """The MXU (matmul) formulation must agree with the gather operators."""
    from helicon_tpu.denovo3d.projector_separable import build_problem_separable

    geom = small_geom()
    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    ch, cc, cv = select_copies(geom, 2.3, 6)
    phc, pv = select_pairs(geom, 35.0, 2.3, 5)
    rng = np.random.default_rng(0)
    region = rng.random((geom.d2, geom.l2)).astype(np.float32)
    x = (rng.random(geom.volume_shape) * mask).astype(np.float32)
    args = (
        geom, region, jnp.float32(35.0), jnp.float32(2.3),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
    )
    ops_g = build_problem(*args, 0.0, 0.0, 0.7, interpolation, mask, cellok)
    ops_s = build_problem_separable(*args, 0.7, interpolation, mask, cellok)
    np.testing.assert_allclose(
        np.asarray(ops_s["P"](jnp.asarray(x))),
        np.asarray(ops_g["P"](jnp.asarray(x))),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(ops_s["row_valid"]), np.asarray(ops_g["row_valid"])
    )
    np.testing.assert_allclose(
        np.asarray(ops_s["S"](jnp.asarray(x))),
        np.asarray(ops_g["S"](jnp.asarray(x))),
        atol=1e-5,
    )
    r = jnp.asarray(rng.random((6, geom.l2, geom.d2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ops_s["PT"](r)), np.asarray(ops_g["PT"](r)), atol=1e-4
    )


@pytest.mark.parametrize("interpolation", ["nn", "linear"])
@pytest.mark.parametrize("scale", [0.4, 0.7, 1.3, 1.8])
def test_separable_tap_window_across_scales(interpolation, scale):
    """The tight receiving-cell tap window (projector_separable.py:166-176)
    and the Wsum-derived row validity must stay exact for every
    scale2d_to_3d: n_taps shrinks with s (1 tap at s >= ~1.4 nn) and grows
    below 1, and a dropped tap or a missed deposit would show up as a P/
    row_valid mismatch vs the per-sample gather formulation."""
    from helicon_tpu.denovo3d.projector_separable import build_problem_separable

    geom = ReconstructionGeometry(
        d2=8, l2=12, d3=10, l3=8, rmin=0.0, rmax=4.0,
        scale2d_to_3d=scale, csym=1,
    )
    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    ch, cc, cv = select_copies(geom, 1.7, 6)
    phc, pv = select_pairs(geom, 27.0, 1.7, 5)
    rng = np.random.default_rng(42)
    region = rng.random((geom.d2, geom.l2)).astype(np.float32)
    x = (rng.random(geom.volume_shape) * mask).astype(np.float32)
    args = (
        geom, region, jnp.float32(27.0), jnp.float32(1.7),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
    )
    ops_g = build_problem(*args, 0.0, 0.0, 0.3, interpolation, mask, cellok)
    ops_s = build_problem_separable(*args, 0.3, interpolation, mask, cellok)
    np.testing.assert_allclose(
        np.asarray(ops_s["P"](jnp.asarray(x))),
        np.asarray(ops_g["P"](jnp.asarray(x))),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(ops_s["row_valid"]), np.asarray(ops_g["row_valid"])
    )
    r = jnp.asarray(rng.random((len(ch), geom.l2, geom.d2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ops_s["PT"](r)), np.asarray(ops_g["PT"](r)), atol=1e-4
    )


@pytest.mark.slow
def test_pair_ops_table_matches_pairs():
    """The op-table S (shared op sampling) must equal the per-pair S."""
    from helicon_tpu.denovo3d.geometry import select_pair_ops
    from helicon_tpu.denovo3d.projector_separable import build_problem_separable

    geom = small_geom()
    mask = geom.cylindrical_mask()
    cellok = geom.cell_valid_mask()
    ch, cc, cv = select_copies(geom, 2.3, 4)
    phc, pv = select_pairs(geom, 35.0, 2.3, 6)
    ops_hc, ops_v, pair_idx, pv2 = select_pair_ops(geom, 35.0, 2.3, 6, 12)
    np.testing.assert_array_equal(pv, pv2)
    # pair table reconstructed from ops must match phc
    np.testing.assert_array_equal(ops_hc[pair_idx[:, 0]][pv], phc[pv, 0:2])
    np.testing.assert_array_equal(ops_hc[pair_idx[:, 1]][pv], phc[pv, 2:4])

    rng = np.random.default_rng(0)
    region = rng.random((geom.d2, geom.l2)).astype(np.float32)
    x = (rng.random(geom.volume_shape) * mask).astype(np.float32)
    args = (
        geom, region, jnp.float32(35.0), jnp.float32(2.3),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
    )
    kw = dict(interpolation="linear", mask=mask, cellok=cellok)
    ops_a = build_problem_separable(*args, 0.0, **kw)
    ops_b = build_problem_separable(
        *args, 0.0,
        pair_ops=(jnp.asarray(ops_hc), jnp.asarray(ops_v), jnp.asarray(pair_idx)),
        **kw,
    )
    np.testing.assert_allclose(
        np.asarray(ops_b["S"](jnp.asarray(x))),
        np.asarray(ops_a["S"](jnp.asarray(x))),
        atol=1e-6,
    )


def test_sorted_pairs_reference_format():
    """Reference return format (tests/test_denovo3D_solver.py:9-25)."""
    from helicon_tpu.denovo3d import sorted_hsym_csym_pairs

    result = sorted_hsym_csym_pairs(twist=30, rise_pixel=5, csym=1, nz=20)
    assert isinstance(result, list) and len(result) > 0
    assert len(result[0]) >= 5
    assert all(0 <= e[0] <= 180 for e in result)
    r2 = sorted_hsym_csym_pairs(twist=30, rise_pixel=5, csym=2, nz=20)
    assert len(r2) >= len(result)


def test_back_project_2d_coords():
    """Reference semantics (tests/test_denovo3D_solver.py:27-60)."""
    from helicon_tpu.denovo3d.geometry import back_project_2d_coords_to_3d_coords

    image = np.arange(16, dtype=np.float32).reshape(4, 4)
    (X, Y, Z), pv = back_project_2d_coords_to_3d_coords(image, scale2d_to_3d=1.0)
    assert X.shape == (4, 4, 4) and pv.shape == (4, 4)
    assert X[:, :, 0].shape[::-1] == pv.shape
    # helical axis along the first (swapped) axis: Z varies with i_len
    assert np.all(np.isfinite(X))
    (_, _, _), pv2 = back_project_2d_coords_to_3d_coords(
        image, 1.0, reconstruct_diameter_2d_pixel=2, reconstruct_length_2d_pixel=2
    )
    assert pv2.shape == (2, 2)
    (Xs, Ys, Zs), _ = back_project_2d_coords_to_3d_coords(image, scale2d_to_3d=0.5)
    np.testing.assert_allclose(Xs, X * 0.5)


def test_sym_dedup_mask_properties():
    """compute_sym_dedup_mask: each unordered voxel-pair constraint kept
    exactly once (reference solver_linear_regression pair_ids dedup)."""
    from helicon_tpu.denovo3d import (
        ReconstructionGeometry,
        compute_sym_dedup_mask,
        select_pairs,
    )

    geom = ReconstructionGeometry(
        d2=16, l2=20, d3=16, l3=12, rmin=0.0, rmax=7.0,
        scale2d_to_3d=1.0, csym=1,
    )
    twist, rise = 30.0, 2.0
    phc, pv = select_pairs(geom, twist, rise, 12)
    keep = compute_sym_dedup_mask(geom, twist, rise, phc, pv)
    assert keep.shape == (len(phc),) + geom.volume_shape
    assert keep.dtype == bool
    # dedup only DROPS rows relative to the undeduped operator
    assert keep.sum() > 0
    # rebuild the pair ids exactly as the mask builder does and assert
    # global uniqueness of kept ids
    mask = geom.cylindrical_mask()
    nz = np.nonzero(mask)
    n_x = len(nz[0])
    nz_idx = np.zeros(mask.shape, np.int64) - 1
    nz_idx[nz] = np.arange(n_x)
    seen = set()
    for p in range(len(phc)):
        if not pv[p]:
            assert not keep[p].any()
            continue
        kz, ky, kx = np.nonzero(keep[p])
        for z, y, x in zip(kz, ky, kx):
            ids = []
            for (h, c) in (phc[p, :2], phc[p, 2:]):
                th = np.deg2rad(twist * h + 360.0 * c / geom.csym)
                x0 = x - geom.d3 // 2
                y0 = y - geom.d3 // 2
                xi = int(round(x0 * np.cos(th) - y0 * np.sin(th) + geom.d3 // 2))
                yi = int(round(x0 * np.sin(th) + y0 * np.cos(th) + geom.d3 // 2))
                zi = int(round(z - geom.l3 // 2 + h * rise + geom.l3 // 2))
                assert 0 <= zi < geom.l3 and 0 <= yi < geom.d3 and 0 <= xi < geom.d3
                ids.append(int(nz_idx[zi, yi, xi]))
            assert ids[0] >= 0 and ids[1] >= 0
            pid = (min(ids), max(ids))
            assert pid not in seen, (p, z, y, x, pid)
            seen.add(pid)


def test_sym_keep_threads_through_solver():
    """solve_candidate(sym_keep=...) changes only the sym rows: scores
    shift slightly, output stays finite and well-shaped."""
    import jax.numpy as jnp

    from helicon_tpu.denovo3d import (
        ReconstructionGeometry,
        compute_sym_dedup_mask,
        select_copies,
        select_pairs,
    )
    from helicon_tpu.denovo3d.solver import SolveConfig, solve_candidate

    geom = ReconstructionGeometry(
        d2=12, l2=16, d3=12, l3=10, rmin=0.0, rmax=5.0,
        scale2d_to_3d=1.0, csym=1,
    )
    cfg = SolveConfig(cg_iters=15, fista_iters=8, power_iters=4, separable=True)
    rng = np.random.default_rng(1)
    region = rng.random((geom.d2, geom.l2)).astype(np.float32)
    twist, rise = 30.0, 2.0
    ch, cc, cv = select_copies(geom, rise, 5)
    phc, pv = select_pairs(geom, twist, rise, 6)
    keep = compute_sym_dedup_mask(geom, twist, rise, phc, pv)
    args = (
        jnp.asarray(region), jnp.float32(twist), jnp.float32(rise),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
    )
    out0 = solve_candidate(geom, cfg, *args)
    out1 = solve_candidate(geom, cfg, *args, sym_keep=jnp.asarray(keep))
    assert np.isfinite(float(out1["score"]))
    assert out1["rec3d"].shape == geom.volume_shape
    # with duplicates present the solutions should differ (weights change)
    assert not np.allclose(
        np.asarray(out0["rec3d"]), np.asarray(out1["rec3d"])
    ) or not keep.all()


def _sim_img(twist=30.0, rise=6.0, csym=1, tilt=0, rng=0):
    from helicon_tpu.helix import simulate_helical_projection

    return simulate_helical_projection(
        n=1, twist=twist, rise=rise, csym=csym, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=64, apix=2.0,
        rng=rng,
    )


_LSQ_KW = dict(
    scale2d_to_3d=1.0,
    reconstruct_diameter_2d_pixel=24, reconstruct_diameter_3d_pixel=24,
    reconstruct_length_2d_pixel=48, reconstruct_length_3d_pixel=16,
    sym_oversample=2, interpolation="nn",
)


def test_lsq_reconstruct_with_inner_diameter():
    """rmin > 0 zeroes the tube core (reference solver test
    test_with_inner_diameter)."""
    img = _sim_img()
    (rec, _, _), score = lsq_reconstruct(
        projection_image=img, twist_degree=30.0, rise_pixel=3.0, csym=1,
        reconstruct_diameter_3d_inner_pixel=8, **_LSQ_KW,
    )
    assert score > 0
    nz, ny, nx = rec.shape
    core = rec[:, ny // 2 - 1 : ny // 2 + 2, nx // 2 - 1 : nx // 2 + 2]
    assert float(np.abs(core).max()) == pytest.approx(0.0, abs=1e-6)


def test_lsq_reconstruct_with_csym2():
    img = _sim_img(csym=2, rng=1)
    (rec, _, _), score = lsq_reconstruct(
        projection_image=img, twist_degree=30.0, rise_pixel=3.0, csym=2,
        **_LSQ_KW,
    )
    assert 0 < score <= 1 and np.isfinite(rec).all()


def test_lsq_reconstruct_with_tilt_psi_general_path():
    """Nonzero tilt/psi forces the general (non-separable) operators."""
    img = _sim_img()
    (rec, _, _), score = lsq_reconstruct(
        projection_image=img, twist_degree=30.0, rise_pixel=3.0, csym=1,
        tilt_degree=3.0, psi_degree=1.0, **_LSQ_KW,
    )
    assert 0 < score <= 1 and np.isfinite(rec).all()


class TestRefineTiltPsiDy:
    def _setup(self):
        from helicon_tpu.denovo3d import (
            ReconstructionGeometry,
            select_copies,
            select_pairs,
        )
        from helicon_tpu.denovo3d.solver import SolveConfig

        img = np.squeeze(np.asarray(_sim_img()))
        geom = ReconstructionGeometry(
            d2=24, l2=48, d3=24, l3=16, rmin=0.0, rmax=11.0,
            scale2d_to_3d=1.0, csym=1,
        )
        cfg = SolveConfig(
            cg_iters=20, fista_iters=10, power_iters=4, separable=False
        )
        region = img[
            img.shape[0] // 2 - 12 : img.shape[0] // 2 + 12,
            img.shape[1] // 2 - 24 : img.shape[1] // 2 + 24,
        ]
        ch, cc, cv = select_copies(geom, 3.0, 5)
        phc, pv = select_pairs(geom, 30.0, 3.0, 6)
        return geom, cfg, region, (ch, cc, cv), (phc, pv)

    def test_returns_pose_within_bounds(self):
        from helicon_tpu.denovo3d.refine import refine_tilt_psi_dy

        geom, cfg, region, copies, pairs = self._setup()
        tilt, psi, dy = refine_tilt_psi_dy(
            geom, cfg, region, 30.0, 3.0, copies, pairs, 0.0, 0.0, 0.0,
            dict(tilt=5.0, psi=5.0, dy=2.0, max_iter=2),
        )
        assert -5.0 <= tilt <= 5.0
        assert -5.0 <= psi <= 5.0
        assert -2.0 <= dy <= 2.0
        assert np.isfinite([tilt, psi, dy]).all()

    def test_zero_range_keeps_pose(self):
        from helicon_tpu.denovo3d.refine import refine_tilt_psi_dy

        geom, cfg, region, copies, pairs = self._setup()
        tilt, psi, dy = refine_tilt_psi_dy(
            geom, cfg, region, 30.0, 3.0, copies, pairs, 0.0, 0.0, 0.0,
            dict(tilt=0.0, psi=0.0, dy=0.0, max_iter=1),
        )
        assert tilt == pytest.approx(0.0, abs=1e-6)
        assert psi == pytest.approx(0.0, abs=1e-6)
        assert dy == pytest.approx(0.0, abs=1e-6)

    def test_integrated_with_lsq_reconstruct(self):
        img = _sim_img()
        (rec, _, _), score = lsq_reconstruct(
            projection_image=img, twist_degree=30.0, rise_pixel=3.0, csym=1,
            refine_tilt_psi_dy_range=dict(tilt=3.0, psi=3.0, dy=1.0, max_iter=1),
            **_LSQ_KW,
        )
        assert 0 < score <= 1 and np.isfinite(rec).all()
        refined = getattr(lsq_reconstruct, "_refined_params", None)
        assert refined is not None
        assert abs(refined["tilt"]) <= 3.0 and abs(refined["psi"]) <= 3.0


@pytest.mark.slow
def test_sym_keep_with_gather_fallback():
    """sym_keep must thread through the big-geometry gather fallback of
    the op-table S (use_matmul_sym False past the 32MB threshold)."""
    import jax.numpy as jnp

    from helicon_tpu.denovo3d import (
        ReconstructionGeometry,
        compute_sym_dedup_mask,
        select_copies,
        select_pair_ops,
        select_pairs,
    )
    from helicon_tpu.denovo3d.projector_separable import build_problem_separable

    geom = ReconstructionGeometry(
        d2=48, l2=32, d3=48, l3=10, rmin=0.0, rmax=23.0,
        scale2d_to_3d=1.0, csym=1,
    )
    assert 8 * (48**4) * 2 > 32 * 1024 * 1024  # fallback regime
    rng = np.random.default_rng(0)
    region = rng.random((geom.d2, geom.l2)).astype(np.float32)
    ch, cc, cv = select_copies(geom, 3.0, 4)
    phc, pv = select_pairs(geom, 30.0, 3.0, 5)
    oh, ov, pi, _ = select_pair_ops(geom, 30.0, 3.0, 5, 8)
    keep = compute_sym_dedup_mask(geom, 30.0, 3.0, phc, pv)
    x = rng.random(geom.volume_shape).astype(np.float32)
    args = (
        geom, region, jnp.float32(30.0), jnp.float32(3.0),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv), 0.0, "nn",
        geom.cylindrical_mask(), geom.cell_valid_mask(),
    )
    kw = dict(pair_ops=(jnp.asarray(oh), jnp.asarray(ov), jnp.asarray(pi)))
    s_all = np.asarray(
        build_problem_separable(*args, **kw)["S"](jnp.asarray(x))
    )
    s_kept = np.asarray(
        build_problem_separable(*args, sym_keep=jnp.asarray(keep), **kw)["S"](
            jnp.asarray(x)
        )
    )
    # dedup only ZEROES rows; kept rows identical
    mask = np.asarray(keep)
    np.testing.assert_allclose(s_kept[mask], s_all[mask], atol=1e-6)
    dropped = (~mask) & (s_all != 0)
    assert (s_kept[~mask] == 0).all()
    assert dropped.any()  # the mask actually removed duplicate rows


@pytest.mark.slow
def test_equation_counts_reach_reference_target():
    """The static (n_copies, n_pairs) estimate must deliver the
    reference's equation budget in ACTUAL valid rows (solver:1286
    accumulates until the real count reaches the target), whenever the
    op universe allows it. A best-case estimate once under-built the
    symmetry system by 2x for large-rise candidates."""
    import jax.numpy as jnp

    from helicon_tpu.denovo3d import (
        ReconstructionGeometry,
        select_copies,
        select_pairs,
    )
    from helicon_tpu.denovo3d.geometry import estimate_copy_pair_counts
    from helicon_tpu.denovo3d.projector import build_problem

    for (l3, rise_px, twist) in [(24, 3.0, 29.4), (16, 2.0, 170.0)]:
        geom = ReconstructionGeometry(
            d2=24, l2=32, d3=24, l3=l3, rmin=0.0, rmax=11,
            scale2d_to_3d=1.0, csym=1,
        )
        so = 2
        n_copies, n_pairs = estimate_copy_pair_counts(geom, rise_px, so)
        ch, cc, cv = select_copies(geom, rise_px, n_copies)
        phc, pv = select_pairs(geom, twist, rise_px, n_pairs)
        ops = build_problem(
            geom, np.zeros((24, 32), np.float32), jnp.float32(twist),
            jnp.float32(rise_px), jnp.asarray(ch), jnp.asarray(cc),
            jnp.asarray(cv), jnp.asarray(phc), jnp.asarray(pv),
            mask=geom.cylindrical_mask(), cellok=geom.cell_valid_mask(),
        )
        probe = jnp.asarray(
            np.random.default_rng(0).random(geom.volume_shape), jnp.float32
        )
        n_sym = int(np.sum(np.asarray(ops["S"](probe)) != 0))
        target = int(geom.cylindrical_mask().sum()) * so
        assert n_sym >= target, (l3, rise_px, n_sym, target)


def _sim_helix_img():
    from helicon_tpu.helix import simulate_helical_projection

    return simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=64, apix=2.0,
        rng=0,
    )


@pytest.mark.slow
def test_lasso_all_zero_solution_retries_with_smaller_alpha():
    """Reference solver:330-337: an all-zero fit retries with alpha*0.1
    until coefficients survive — a huge alpha must not return a zero
    volume / zero score."""
    img = _sim_helix_img()
    kwargs = dict(
        projection_image=img, scale2d_to_3d=1.0, csym=1,
        reconstruct_diameter_2d_pixel=24, reconstruct_diameter_3d_pixel=24,
        reconstruct_length_2d_pixel=48, reconstruct_length_3d_pixel=16,
        sym_oversample=2, interpolation="nn",
    )
    (rec, _, _), score = lsq_reconstruct(
        twist_degree=30.0, rise_pixel=3.0,
        algorithm=dict(model="lasso", alpha=1e4), **kwargs
    )
    assert np.any(np.asarray(rec) != 0)
    assert score > 0


@pytest.mark.slow
def test_positivity_honored_without_fista():
    """fista_iters=0 must still honor the box constraint the reference
    always enforces (positive=True solvers): the CG solution is
    projected rather than returned unconstrained."""
    from helicon_tpu.denovo3d import (
        ReconstructionGeometry,
        select_copies,
        select_pair_ops,
        select_pairs,
    )
    from helicon_tpu.denovo3d.solver import _solve_candidate_impl

    geom = ReconstructionGeometry(
        d2=12, l2=16, d3=12, l3=12, rmin=0.0, rmax=5.0,
        scale2d_to_3d=1.0, csym=1,
    )
    cfg = SolveConfig(
        interpolation="nn", cg_iters=10, fista_iters=0, power_iters=0,
        separable=True, positive_constraint=1,
    )
    rng = np.random.default_rng(0)
    region = rng.standard_normal((geom.d2, geom.l2)).astype(np.float32)
    ch, cc, cv = select_copies(geom, 2.5, 5)
    phc, pv = select_pairs(geom, 30.0, 2.5, 5)
    oh, ov, pi, _ = select_pair_ops(geom, 30.0, 2.5, 5, 8)
    out = _solve_candidate_impl(
        geom, cfg, jnp.asarray(region), jnp.float32(29.4), jnp.float32(2.5),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        pair_ops=(jnp.asarray(oh), jnp.asarray(ov), jnp.asarray(pi)),
    )
    rec = np.asarray(out["rec3d"])
    assert rec.min() >= 0.0
    # the unconstrained CG solution on noise must have negatives —
    # otherwise this test exercises nothing
    cfg_unc = cfg._replace(positive_constraint=0)
    out_unc = _solve_candidate_impl(
        geom, cfg_unc, jnp.asarray(region), jnp.float32(29.4),
        jnp.float32(2.5),
        jnp.asarray(ch), jnp.asarray(cc), jnp.asarray(cv),
        jnp.asarray(phc), jnp.asarray(pv),
        pair_ops=(jnp.asarray(oh), jnp.asarray(ov), jnp.asarray(pi)),
    )
    assert np.asarray(out_unc["rec3d"]).min() < 0.0


def test_lsq_reconstruct_odd_region_sizes():
    """Odd diameter/length must extract a full d2 x l2 region (the
    reference's np.ix_ indexing handles odd sizes; solver:366-372)."""
    img = _sim_helix_img()
    (rec, _, _), score = lsq_reconstruct(
        projection_image=img, scale2d_to_3d=1.0, twist_degree=30.0,
        rise_pixel=3.0, csym=1,
        reconstruct_diameter_2d_pixel=23, reconstruct_diameter_3d_pixel=23,
        reconstruct_length_2d_pixel=47, reconstruct_length_3d_pixel=15,
        sym_oversample=2, interpolation="nn",
    )
    assert np.isfinite(score)
    assert np.asarray(rec).shape[0] == 15  # l3 slices


def test_lsq_reconstruct_region_too_large_raises():
    from helicon_tpu.utils.exceptions import HeliconError

    img = _sim_helix_img()  # 32 x 64
    with pytest.raises(HeliconError):
        lsq_reconstruct(
            projection_image=img, scale2d_to_3d=1.0, twist_degree=30.0,
            rise_pixel=3.0, csym=1,
            reconstruct_diameter_2d_pixel=64,  # > ny=32
            reconstruct_diameter_3d_pixel=24,
            reconstruct_length_2d_pixel=48, reconstruct_length_3d_pixel=16,
            sym_oversample=2, interpolation="nn",
        )
