"""Tests for helicon_tpu.core.analysis (FSC/FRC, scores, geometry, metadata)."""

import numpy as np
import pytest

import helicon_tpu as ht


class TestFSC:
    def test_identical_maps(self, rng):
        m = rng.normal(size=(16, 16, 16)).astype(np.float32)
        fsc = ht.calc_fsc(m, m, apix=1.0)
        assert fsc.shape[1] == 2
        assert np.allclose(fsc[:, 1], 1.0, atol=1e-4)

    def test_matches_numpy_oracle(self, rng):
        m1 = rng.normal(size=(16, 16, 16)).astype(np.float32)
        m2 = (m1 + rng.normal(size=m1.shape).astype(np.float32)).astype(np.float32)
        got = ht.calc_fsc(m1, m2, apix=2.0)

        n = 16
        F1, F2 = np.fft.rfftn(m1), np.fft.rfftn(m2)
        k2 = np.fft.fftfreq(n) ** 2
        kr2 = np.fft.rfftfreq(n) ** 2
        shell = np.clip(
            np.round(np.sqrt(k2[:, None, None] + k2[None, :, None] + kr2) * n).astype(int),
            0, n // 2,
        ).ravel()
        num = np.bincount(shell, weights=np.real(F1 * np.conj(F2)).ravel(), minlength=n // 2 + 1)
        d1 = np.bincount(shell, weights=(np.abs(F1) ** 2).ravel(), minlength=n // 2 + 1)
        d2 = np.bincount(shell, weights=(np.abs(F2) ** 2).ravel(), minlength=n // 2 + 1)
        want = np.where(np.sqrt(d1 * d2) > 0, num / np.sqrt(d1 * d2), 1.0)
        saxis = np.arange(n // 2 + 1) / (2.0 * n)
        sel = saxis <= np.fft.rfftfreq(n).max()
        assert np.allclose(got[:, 0], saxis[sel], atol=1e-8)
        assert np.allclose(got[:, 1], want[sel], atol=1e-4)

    def test_per_shell(self, rng):
        m = rng.normal(size=(12, 12, 12)).astype(np.float32)
        fsc = ht.calc_fsc_per_shell(m, m, apix=1.0)
        assert len(fsc) == 7
        assert np.allclose(fsc, 1.0, atol=1e-4)

    def test_frc_2d(self, rng):
        a = rng.normal(size=(32, 32)).astype(np.float32)
        saxis, frc = ht.calc_frc_2d(a, a, apix=1.0)
        assert np.allclose(frc, 1.0, atol=1e-4)
        with pytest.raises(ValueError):
            ht.calc_frc_2d(a, a[:16], apix=1.0)

    def test_frc_score_degrades_with_noise(self, rng):
        a = rng.normal(size=(32, 32)).astype(np.float32)
        s_same = ht.frc_score(a, a, apix=1.0)
        s_noisy = ht.frc_score(a, a + 5 * rng.normal(size=a.shape).astype(np.float32), apix=1.0)
        assert s_same > 0.99 and s_noisy < s_same


class TestScores:
    def test_ssim_self(self, rng):
        a = rng.normal(size=(32, 32)).astype(np.float32)
        assert ht.ssim_score(a, a) > 0.999

    def test_ssim_ordering(self, rng):
        a = rng.normal(size=(32, 32)).astype(np.float32)
        near = a + 0.1 * rng.normal(size=a.shape).astype(np.float32)
        far = a + 2.0 * rng.normal(size=a.shape).astype(np.float32)
        assert ht.ssim_score(a, near) > ht.ssim_score(a, far)

    def test_ssim_matches_skimage_formula(self, rng):
        """Oracle: direct uniform-window SSIM computation in numpy."""
        from scipy.ndimage import uniform_filter

        a = rng.normal(size=(24, 24)).astype(np.float64)
        b = a + 0.5 * rng.normal(size=a.shape)
        dr = max(a.max() - a.min(), b.max() - b.min())
        win = 7
        NP = win * win
        cov_norm = NP / (NP - 1)
        ux = uniform_filter(a, win)
        uy = uniform_filter(b, win)
        vx = cov_norm * (uniform_filter(a * a, win) - ux * ux)
        vy = cov_norm * (uniform_filter(b * b, win) - uy * uy)
        vxy = cov_norm * (uniform_filter(a * b, win) - ux * uy)
        C1, C2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
        pad = (win - 1) // 2
        want = S[pad:-pad, pad:-pad].mean()
        got = ht.ssim_score(a.astype(np.float32), b.astype(np.float32))
        assert abs(got - want) < 1e-3

    def test_ms_ssim(self, rng):
        a = rng.normal(size=(64, 64)).astype(np.float32)
        assert ht.ms_ssim_score(a, a) > 0.999
        noisy = a + rng.normal(size=a.shape).astype(np.float32)
        assert 0 <= ht.ms_ssim_score(a, noisy) < 1.0

    def test_mutual_information(self, rng):
        a = rng.normal(size=(64, 64)).astype(np.float32)
        b = rng.normal(size=(64, 64)).astype(np.float32)
        assert ht.mutual_information_score(a, a) > 0.5
        assert ht.mutual_information_score(a, b) < 0.2

    def test_r_factor(self, rng):
        a = rng.uniform(size=(16, 16)).astype(np.float32)
        assert np.isclose(ht.r_factor_score(a, a), 1.0)

    @pytest.mark.slow

    def test_traced_metrics_match_eager(self, rng):
        """The jittable metric variants (used inside the denovo3D scorer)
        agree with the eager reference implementations."""
        import jax
        from helicon_tpu.core.analysis import (
            ms_ssim_score_traced,
            mutual_information_score_traced,
            ssim_score_traced,
        )

        a = rng.normal(size=(32, 48)).astype(np.float32)
        b = a + 0.5 * rng.normal(size=a.shape).astype(np.float32)
        assert abs(float(jax.jit(ssim_score_traced)(a, b)) - ht.ssim_score(a, b)) < 1e-4
        assert (
            abs(float(jax.jit(ms_ssim_score_traced)(a, b)) - ht.ms_ssim_score(a, b))
            < 1e-4
        )
        assert (
            abs(
                float(jax.jit(mutual_information_score_traced)(a, b))
                - ht.mutual_information_score(a, b)
            )
            < 1e-4
        )
        assert ht.r_factor_score(a * 0, a) == pytest.approx(0.5)
        assert ht.r_factor_score(a, a * 0) == 0.0

    def test_cosine_similarity(self):
        assert ht.cosine_similarity(np.array([1.0, 0.0]), np.array([1.0, 0.0])) == pytest.approx(1.0)
        assert ht.cosine_similarity(np.array([1.0, 0.0]), np.array([0.0, 1.0])) == pytest.approx(0.0)
        assert ht.cosine_similarity(np.zeros(3), np.ones(3)) == 0

    def test_cross_correlation(self, rng):
        a = rng.normal(size=100)
        assert ht.cross_correlation_coefficient(a, a) == pytest.approx(1.0, abs=1e-5)
        assert ht.cross_correlation_coefficient(a, -a) == pytest.approx(-1.0, abs=1e-5)
        assert ht.cross_correlation_coefficient(a, np.ones(100)) == 0


class TestGeometry:
    def test_cylindrical_mask(self):
        mask = ht.get_cylindrical_mask(4, 16, 16, rmin=2, rmax=6)
        assert mask.shape == (4, 16, 16)
        assert mask[0, 8, 8] == False  # noqa: E712  (inside rmin)
        assert mask[0, 8, 12] == True  # noqa: E712  (r=4)
        assert mask[0, 8, 15] == False  # noqa: E712  (r=7 > rmax-1)
        m2, (Z, Y, X) = ht.get_cylindrical_mask(4, 8, 8, return_xyz=True)
        assert Z.shape == (4, 8, 8)

    def test_estimate_helix_rotation(self):
        img = np.zeros((64, 64), np.float32)
        img[28:36, 8:56] = 1.0  # horizontal band, centered
        rot, shift, diam = ht.estimate_helix_rotation_center_diameter(img)
        assert abs(rot) < 2.0
        assert abs(shift) < 1.5
        assert 6 <= diam <= 10

    def test_estimate_helix_rotation_tilted(self):
        img = np.zeros((64, 64), np.float32)
        for i in range(64):
            j = int(round(32 + (i - 32) * np.tan(np.deg2rad(10))))
            if 2 <= j < 62:
                img[j - 2 : j + 3, i] = 1.0
        rot, shift, diam = ht.estimate_helix_rotation_center_diameter(img)
        assert abs(abs(rot) - 10.0) < 3.0

    def test_find_elbow(self):
        curve = np.concatenate([np.linspace(10, 1, 10), np.linspace(1, 0.9, 10)])
        idx = ht.find_elbow_point(curve)
        assert 7 <= idx <= 12

    def test_line_fit_projection(self):
        x = np.linspace(0, 10, 11)
        y = 2 * x + 1 + np.random.default_rng(0).normal(0, 0.01, 11)
        pos, xy = ht.line_fit_projection(x, y, return_xy_fit=True)
        assert pos[0] == pytest.approx(0.0, abs=1e-6)
        spacing = np.diff(pos)
        assert np.allclose(spacing, spacing[0], atol=0.05)
        # fitted points lie on a line
        v = xy[-1] - xy[0]
        v = v / np.linalg.norm(v)
        resid = (xy - xy[0]) - np.outer((xy - xy[0]) @ v, v)
        assert np.abs(resid).max() < 0.05

    def test_is_3d(self, rng):
        assert ht.is_3d(np.zeros((8, 8, 8)))
        assert ht.is_3d(np.zeros((16, 8, 8)))
        assert not ht.is_3d(np.zeros((8, 16, 8)))
        assert not ht.is_3d(np.zeros((8, 8)))

    def test_twist2pitch(self):
        assert ht.twist2pitch(10.0, 4.75) == pytest.approx(171.0)
        assert ht.twist2pitch(10.0, 4.75, return_pitch_for_4p75Angstrom_rise=False) == pytest.approx(171.0)
        # rise 2.375 with twist t should fold 2 subunits -> rise 4.75
        assert ht.twist2pitch(5.0, 2.375) == pytest.approx(2.375 * 2 * 360 / 10.0)


class TestHelicalMetadata:
    def test_estimate_inter_segment_distance(self, relion_df):
        med, mean, std, n_max = ht.estimate_inter_segment_distance(relion_df)
        assert med == pytest.approx(47.5)
        assert mean == pytest.approx(47.5)
        assert std == pytest.approx(0.0, abs=1e-5)
        assert n_max == 16

    def test_estimate_missing_columns(self, relion_df):
        df = relion_df.drop(columns=["rlnHelicalTrackLengthAngst"])
        assert ht.estimate_inter_segment_distance(df) == (None, None, None, None)

    def test_estimate_tube_length(self, relion_df):
        out = ht.estimate_helicalTube_length(relion_df)
        assert "rlnHelicalTubeLength" in out
        assert np.allclose(out["rlnHelicalTubeLength"], 142.5)

    def test_reset_inter_segment_distance(self, relion_df):
        out = ht.reset_inter_segment_distance(
            relion_df, new_inter_segment_distance=23.75, apix_micrograph=1.0
        )
        med, *_ = ht.estimate_inter_segment_distance(out)
        assert med == pytest.approx(23.75, rel=0.01)
        assert len(out) > len(relion_df)


def test_batched_xcorr_chunking_invariant():
    """lax.map segment chunking must not change results (and bounds the
    (C, chunk, ny, nx) intermediate instead of materializing (C, S, ...))."""
    from helicon_tpu.core.xcorr import batched_cross_correlation

    rng = np.random.default_rng(0)
    cls = rng.normal(0, 1, (3, 16, 16)).astype(np.float32)
    seg = rng.normal(0, 1, (7, 16, 16)).astype(np.float32)
    c1, s1 = batched_cross_correlation(cls, seg, chunk=2)
    c2, s2 = batched_cross_correlation(cls, seg, chunk=7)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
