"""Layer-line indexing (native HILL core, helicon_tpu/helix/indexing.py)
against simulated ground truth. The reference ships hill only as a
runtime-download launcher (reference commands/hill.py:14-24); the
layer-line physics it builds on is compute_power_spectra
(transforms.py:771-820) — these tests validate the native
detection/indexing chain end-to-end on simulate_helical_projection
outputs with known (twist, rise).
"""

import numpy as np
import pytest

import helicon_tpu as ht
from helicon_tpu.helix import (
    bessel_first_peak_x,
    detect_layer_lines,
    estimate_bessel_order,
    estimate_helical_parameters,
)


def _sim(twist, rise, ball_radius, seed=0):
    imgs = ht.simulate_helical_projection(
        n=1, twist=twist, rise=rise, csym=1, helical_diameter=80,
        ball_radius=ball_radius, polymer=0, planarity=1,
        ny=128, nx=256, apix=1.5, rng=seed,
    )
    # transpose: indexing expects the filament axis vertical
    return np.squeeze(np.asarray(imgs)).T


class TestBesselOrder:
    def test_first_peak_positions(self):
        from scipy.special import jv

        x = np.linspace(0, 30, 30000)
        for n in [1, 2, 3, 5, 10]:
            x_num = x[np.argmax(np.abs(jv(n, x)))]
            assert abs(bessel_first_peak_x(n) - x_num) < 0.05 * x_num

    def test_j0_peaks_at_zero(self):
        assert bessel_first_peak_x(0) == 0.0

    def test_estimate_inverts_first_peak(self):
        R = 40.0
        for n in [0, 1, 2, 3, 6]:
            r_peak = bessel_first_peak_x(n) / (2 * np.pi * R)
            assert estimate_bessel_order(r_peak, R) == n


class TestDetectLayerLines:
    def test_pitch_line_detected(self):
        img = _sim(30, 8, ball_radius=3)
        pwr, _ = ht.compute_power_spectra(img, apix=1.5)
        lines = detect_layer_lines(np.asarray(pwr), apix=1.5, radius=40.0)
        P = 360 / 30 * 8  # 96 A
        assert any(abs(l.Z - 1 / P) < 0.004 for l in lines), [l.Z for l in lines]

    def test_rise_line_detected_meridional(self):
        img = _sim(30, 8, ball_radius=3)
        pwr, _ = ht.compute_power_spectra(img, apix=1.5)
        lines = detect_layer_lines(np.asarray(pwr), apix=1.5, radius=40.0)
        merid = [l for l in lines if l.meridional]
        assert any(abs(l.Z - 1 / 8.0) < 0.004 for l in merid), [
            (l.Z, l.meridional) for l in lines
        ]

    def test_no_lines_in_noise(self):
        rng = np.random.default_rng(0)
        img = rng.normal(0, 1, (256, 128)).astype(np.float32)
        pwr, _ = ht.compute_power_spectra(img, apix=1.5)
        lines = detect_layer_lines(np.asarray(pwr), apix=1.5, min_prominence=6.0)
        assert len(lines) <= 2  # noise should produce (almost) nothing

    def test_batch_matches_single(self):
        """detect_layer_lines_batch (device profiles, one fused pull)
        returns the same lines as per-image detect_layer_lines."""
        from helicon_tpu.helix import detect_layer_lines_batch

        img1 = _sim(30, 8, ball_radius=3)
        img2 = _sim(22, 5, ball_radius=3)
        pwrs = np.stack(
            [np.asarray(ht.compute_power_spectra(i, apix=1.5)[0]) for i in (img1, img2)]
        )
        batch = detect_layer_lines_batch(pwrs, apix=1.5, radius=40.0)
        assert len(batch) == 2
        for i in range(2):
            single = detect_layer_lines(pwrs[i], apix=1.5, radius=40.0)
            assert len(batch[i]) == len(single)
            for a, b in zip(batch[i], single):
                assert a.Z == b.Z and a.meridional == b.meridional
                assert a.bessel_order == b.bessel_order
                assert a.intensity == pytest.approx(b.intensity, rel=1e-5)
                assert a.r_peak == pytest.approx(b.r_peak, abs=1e-9)


class TestEstimateParameters:
    def test_recovers_truth_twist30_rise8(self):
        img = _sim(30, 8, ball_radius=3)
        res = estimate_helical_parameters(
            img, apix=1.5, diameter=80.0, radius_factor=1.0
        )
        top = res["candidates"][:3]
        assert any(
            abs(c["twist"] - 30) < 2 and abs(c["rise"] - 8) < 0.5 for c in top
        ), top

    def test_recovers_truth_twist65_rise475(self):
        img = _sim(65, 4.75, ball_radius=2.5)
        res = estimate_helical_parameters(
            img, apix=1.5, diameter=80.0, radius_factor=1.0
        )
        top = res["candidates"][:3]
        assert any(
            abs(c["twist"] - 65) < 3 and abs(c["rise"] - 4.75) < 0.3 for c in top
        ), top

    def test_pitch_reported_when_rise_unresolved(self):
        # big balls damp the 1/rise line below detectability: the result
        # must still carry the correct pitch with rise marked nan
        img = _sim(30, 6, ball_radius=6)
        res = estimate_helical_parameters(
            img, apix=1.5, diameter=80.0, radius_factor=1.0
        )
        assert res["candidates"], "expected pitch-only candidates"
        best = res["candidates"][0]
        assert abs(best["pitch"] - 72.0) < 4.0
        assert np.isnan(best["rise"]) and np.isnan(best["twist"])

    def test_twist_folded_into_relion_range(self):
        img = _sim(65, 4.75, ball_radius=2.5)
        res = estimate_helical_parameters(
            img, apix=1.5, diameter=80.0, radius_factor=1.0
        )
        for c in res["candidates"]:
            if not np.isnan(c["twist"]):
                assert 0 <= c["twist"] <= 180.0

    def test_requires_image_or_pwr(self):
        with pytest.raises(ValueError):
            estimate_helical_parameters(apix=1.5)

    def test_precomputed_pwr_path(self):
        img = _sim(30, 8, ball_radius=3)
        pwr, _ = ht.compute_power_spectra(img, apix=1.5)
        res = estimate_helical_parameters(
            pwr=np.asarray(pwr), apix=1.5, diameter=80.0, radius_factor=1.0
        )
        assert res["candidates"]


class TestPitchEstimation:
    """Native HelicalPitch core (helicon_tpu/helix/pitch.py)."""

    def test_recovers_pitch_from_distances(self):
        rng = np.random.default_rng(0)
        P = 180.0
        d = np.concatenate(
            [k * P + rng.normal(0, 3.0, 200) for k in (1, 2, 3)]
        )
        from helicon_tpu.helix import estimate_pitch_from_pair_distances

        out = estimate_pitch_from_pair_distances(d, bins=120)
        assert out["pitch"] == pytest.approx(P, rel=0.03)

    def test_csym_scales_pitch(self):
        rng = np.random.default_rng(1)
        d = 90.0 + rng.normal(0, 2.0, 300)  # peak at pitch/csym = 90
        from helicon_tpu.helix import estimate_pitch_from_pair_distances

        out = estimate_pitch_from_pair_distances(d, csym=2, rise=4.75)
        assert out["pitch"] == pytest.approx(180.0, rel=0.05)
        assert out["twist"] == pytest.approx(360 * 4.75 / 180.0, rel=0.05)

    def test_too_few_distances(self):
        from helicon_tpu.helix import estimate_pitch_from_pair_distances

        out = estimate_pitch_from_pair_distances([100.0, 200.0])
        assert out["pitch"] is None

    def test_end_to_end_from_class2d(self):
        """Segments whose class repeats every P along the filament."""
        import pandas as pd

        rng = np.random.default_rng(2)
        P, step = 190.0, 47.5
        rows = []
        for tube in range(1, 5):
            for seg in range(40):
                pos = seg * step
                cls = 1 if (pos % P) < step else 2
                rows.append(
                    dict(
                        rlnImageName=f"{len(rows) + 1:06d}@s.mrcs",
                        rlnMicrographName=f"m{tube}.mrc",
                        rlnHelicalTubeID=tube,
                        rlnHelicalTrackLengthAngst=pos,
                        rlnClassNumber=cls,
                        rlnCoordinateX=pos,
                        rlnCoordinateY=100.0,
                        rlnAnglePsi=5.0,
                    )
                )
        params = pd.DataFrame(rows)
        from helicon_tpu.helix import estimate_pitch_from_class2d

        out = estimate_pitch_from_class2d(
            params, class_indices=[0], csym=1, rise=4.75, bins=150
        )
        assert out["pitch"] == pytest.approx(P, rel=0.05), out["pitch"]


class TestHelicalLattice:
    """Native helicalLattice core (helicon_tpu/helix/lattice.py)."""

    def test_round_trip_parameters(self):
        from helicon_tpu.helix import (
            lattice_vectors_from_parameters,
            parameters_from_lattice_vectors,
        )

        for tw, ri, cs in [(29.4, 4.75, 1), (-50.0, 2.4, 3), (179.4, 2.35, 1)]:
            v = lattice_vectors_from_parameters(tw, ri, radius=50.0, csym=cs)
            tw2, ri2, cs2 = parameters_from_lattice_vectors(v[0], v[1], 50.0)
            assert cs2 == cs
            assert ri2 == pytest.approx(ri)
            # twist recovered modulo the csym wedge and sign convention
            period = 360.0 / cs
            d = (tw2 - tw) % period
            assert min(d, period - d) < 1e-6, (tw, tw2)

    def test_lattice_points_on_helix(self):
        from helicon_tpu.helix import helical_lattice_points

        pts = helical_lattice_points(30.0, 4.75, radius=50.0, csym=2,
                                     length=50.0)
        assert pts.shape[1] == 2
        circ = 2 * np.pi * 50.0
        assert (pts[:, 0] >= 0).all() and (pts[:, 0] <= circ).all()
        assert np.abs(pts[:, 1]).max() <= 25.0
        # z levels are multiples of the rise; each level holds csym points
        levels, counts = np.unique(np.round(pts[:, 1], 6), return_counts=True)
        assert (counts == 2).all()
        spacing = np.diff(np.sort(levels))
        assert np.allclose(spacing, 4.75)

    def test_incommensurate_v2_rejected(self):
        from helicon_tpu.helix import parameters_from_lattice_vectors

        circ = 2 * np.pi * 50.0
        with pytest.raises(ValueError):
            parameters_from_lattice_vectors(
                [10.0, 4.75], [circ / 2.37, 0.0], 50.0
            )


def test_layer_line_positions_dominant_lowest_order():
    """Each layer line is labeled with its DOMINANT (lowest |n|) Bessel
    order, and layer_line_bessel_orders lists the full allowed set
    sorted by |n| (a scan-order dedup once labeled the pitch line of a
    twist=180 helix n=11)."""
    from helicon_tpu.core.ctf import (
        layer_line_bessel_orders,
        layer_line_positions,
    )

    lines = layer_line_positions(180.0, 4.75, 1, 5)
    z_pitch = 1.0 / (360.0 / 180.0 * 4.75)
    pitch_line = min(lines[1:], key=lambda t: abs(t[0] - z_pitch))
    assert pitch_line[1] == 1 and pitch_line[2] == 0
    orders = layer_line_bessel_orders(180.0, 4.75, 1, 5)
    z_key = round(z_pitch, 8)
    assert orders[z_key][0] in (1, -1)  # dominant order first
    assert len(orders[z_key]) > 1  # full allowed set, not one survivor


def test_harmonic_support_excludes_equator_neighbors():
    """A detected line whose k = Z*pitch rounds to 0 must not count as
    harmonic support (the 0th harmonic is the equator)."""
    from helicon_tpu.helix.indexing import LayerLine, _harmonic_support

    spur = LayerLine(Z=0.01, intensity=100.0, r_peak=0.01)  # k = 0.1 -> 0
    h2 = LayerLine(Z=0.2, intensity=5.0, r_peak=0.01)       # k = 2 exactly
    assert _harmonic_support(10.0, [spur]) == 0.0
    assert _harmonic_support(10.0, [spur, h2]) == 5.0


def test_rise_only_candidates_mark_twist_unresolved():
    """When only meridional (rise) lines are detected, the twist is NOT
    measured: candidates must carry NaN, not a fake definite 0.0."""
    import math

    from helicon_tpu.helix.indexing import estimate_helical_parameters

    ny = nx = 64
    apix = 1.0
    rng = np.random.default_rng(0)
    pwr = rng.random((ny, nx)) * 0.01 + 1.0
    sy = np.fft.fftshift(np.fft.fftfreq(ny, d=apix))
    p = int(np.argmin(np.abs(sy - 1.0 / 4.0)))  # rise = 4 A line
    cx = nx // 2
    pwr[p, cx] = 50.0
    pwr[ny - p, cx] = 50.0
    out = estimate_helical_parameters(pwr=pwr, apix=apix)
    assert out["candidates"], "rise line should yield a candidate"
    c = out["candidates"][0]
    assert math.isnan(c["twist"]) and math.isnan(c["pitch"])
    assert c["rise"] == pytest.approx(4.0, rel=0.05)


def test_lattice_degenerate_rise_raises():
    from helicon_tpu.helix.lattice import helical_lattice_points
    from helicon_tpu.utils.exceptions import HeliconValueError

    with pytest.raises(HeliconValueError, match="degenerate"):
        helical_lattice_points(twist=30.0, rise=0.0, radius=50.0,
                               length=100.0)
