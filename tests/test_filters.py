"""Golden tests for helicon_tpu.core.filters against numpy oracles."""

import numpy as np
import pytest

import helicon_tpu as ht


class TestNormalize:
    def test_min_max(self, rng):
        x = rng.normal(size=(8, 8))
        out = np.asarray(ht.normalize_min_max(x, min=0, max=1))
        assert np.isclose(out.min(), 0) and np.isclose(out.max(), 1)

    def test_min_max_constant(self):
        x = np.full((4, 4), 3.0, np.float32)
        assert np.allclose(np.asarray(ht.normalize_min_max(x)), x)

    def test_mean_std(self, rng):
        x = rng.normal(loc=5, scale=3, size=(32, 32))
        out = np.asarray(ht.normalize_mean_std(x))
        assert abs(out.mean()) < 1e-5 and abs(out.std() - 1) < 1e-5

    def test_percentile(self, rng):
        x = rng.normal(size=(32, 32)).astype(np.float32)
        out = np.asarray(ht.normalize_percentile(x, percentile=(10, 90)))
        want_lo, want_hi = np.percentile(x, (10, 90))
        want = (x - want_lo) / (want_hi - want_lo)
        assert np.allclose(out, want, atol=1e-5)

    def test_threshold_fraction(self, rng):
        x = rng.uniform(size=(16, 16)).astype(np.float32)
        out = np.asarray(ht.threshold_data(x, thresh_fraction=0.5))
        thr = x.max() * 0.5
        want = np.clip(x, thr, None) - thr
        assert np.allclose(out, want, atol=1e-6)

    def test_threshold_value(self, rng):
        x = rng.normal(size=(8, 8)).astype(np.float32)
        out = np.asarray(ht.threshold_data(x, thresh_value=0.2))
        assert np.allclose(out, np.clip(x, 0.2, None) - 0.2, atol=1e-6)

    def test_threshold_noop(self, rng):
        x = rng.normal(size=(4, 4)).astype(np.float32)
        assert np.allclose(np.asarray(ht.threshold_data(x)), x)


class TestLowHighPass:
    def np_oracle(self, data, lp, hp):
        fft = np.fft.fftn(data)
        shape = data.shape
        axes = [(np.arange(n, dtype=np.float32) - n // 2) / (n // 2) for n in shape]
        if data.ndim == 2:
            R2 = axes[0][:, None] ** 2 + axes[1][None, :] ** 2
        else:
            R2 = (
                axes[0][:, None, None] ** 2
                + axes[1][None, :, None] ** 2
                + axes[2][None, None, :] ** 2
            )
        if 0 < lp < 1:
            fft *= np.fft.fftshift(np.exp(-np.log(2) / lp**2 * R2))
        if 0 < hp < 1:
            fft *= np.fft.fftshift(1 - np.exp(-np.log(2) / hp**2 * R2))
        return np.real(np.fft.ifftn(fft))

    def test_2d(self, rng):
        x = rng.normal(size=(24, 32)).astype(np.float32)
        got = np.asarray(ht.low_high_pass_filter(x, 0.3, 0.05))
        want = self.np_oracle(x.astype(np.float64), 0.3, 0.05)
        assert np.abs(got - want).max() < 1e-4

    def test_3d(self, rng):
        x = rng.normal(size=(12, 12, 12)).astype(np.float32)
        got = np.asarray(ht.low_high_pass_filter(x, low_pass_fraction=0.5))
        want = self.np_oracle(x.astype(np.float64), 0.5, 0)
        assert np.abs(got - want).max() < 1e-4

    def test_noop(self, rng):
        x = rng.normal(size=(8, 8)).astype(np.float32)
        assert np.allclose(np.asarray(ht.low_high_pass_filter(x)), x, atol=1e-5)

    def test_1d_raises(self):
        with pytest.raises(ValueError):
            ht.low_high_pass_filter(np.zeros(8))


class TestStructuralFactor:
    def np_oracle(self, data, apix):
        F = np.fft.fftn(data)
        amp2 = F.real**2 + F.imag**2
        grids = [np.fft.fftfreq(n) ** 2 for n in data.shape]
        qr = np.sqrt(grids[0][:, None] + grids[1][None, :]) / apix
        qmax, qstep = qr.max(), qr[qr > 0].min()
        nbins = int(qmax / qstep) // 2 * 2
        qbins = np.linspace(0, nbins * qstep, nbins)
        labels = np.searchsorted(qbins, qr, "right") - 1
        sf = np.array([amp2[labels == i].sum() for i in range(nbins)])
        return qbins, sf

    def test_matches_oracle(self, rng):
        x = rng.normal(size=(16, 16)).astype(np.float32)
        qbins, sf = ht.calculate_structural_factor(x, apix=1.2)
        want_q, want_sf = self.np_oracle(x.astype(np.float64), 1.2)
        assert np.allclose(qbins, want_q, atol=1e-6)
        assert np.allclose(np.asarray(sf), want_sf, rtol=1e-3)

    def test_match_to_self_preserves_binned_freqs(self, rng):
        """Self-match is identity except corner frequencies beyond the last
        radial bin, which are zeroed (interp fill, as in the reference)."""
        a = rng.normal(size=(16, 16)).astype(np.float32)
        matched = np.asarray(ht.match_structural_factors(a, 1.0, a, 1.0))
        Fa = np.fft.fft2(a)
        Fm = np.fft.fft2(matched)
        q = np.fft.fftfreq(16)
        qr = np.sqrt(q[:, None] ** 2 + q[None, :] ** 2)
        qbins, _ = ht.calculate_structural_factor(a, 1.0)
        covered = qr <= qbins[-1]
        assert np.allclose(Fm[covered], Fa[covered], atol=2e-3 * np.abs(Fa).max())

    def test_match_structural_factors(self, rng):
        """Mid-frequency bins approach the target (per-pixel interpolated
        ratios make per-bin matching approximate, as in the reference)."""
        a = rng.normal(size=(16, 16)).astype(np.float32)
        b = rng.normal(size=(16, 16)).astype(np.float32) * 3
        matched = np.asarray(ht.match_structural_factors(a, 1.0, b, 1.0))
        _, sf_m = ht.calculate_structural_factor(matched, 1.0)
        _, sf_b = ht.calculate_structural_factor(b, 1.0)
        sf_m, sf_b = np.asarray(sf_m), np.asarray(sf_b)
        mid = slice(3, 8)
        ratio = sf_m[mid] / sf_b[mid]
        assert np.all((ratio > 0.6) & (ratio < 1.6)), ratio


class TestTaper:
    def test_all_ones_when_disabled(self):
        f = np.asarray(ht.generate_tapering_filter((16, 16), fraction_start=(1.5, 1.5)))
        assert np.allclose(f, 1.0)

    def test_taper_shape(self):
        f = np.asarray(ht.generate_tapering_filter((32, 32), fraction_start=(0.5, 0.5), fraction_slope=0.2))
        assert f.shape == (32, 32)
        assert np.isclose(f[16, 16], 1.0)
        assert f[0, 16] < 0.01 and f[16, 0] < 0.01
        assert np.all((f >= 0) & (f <= 1))


class TestRandomizePhases:
    def test_amplitudes_preserved_low_phases_kept(self, rng):
        import jax

        x = rng.normal(size=(16, 16, 16)).astype(np.float32)
        F0 = np.fft.rfftn(x)
        out = np.asarray(
            ht.randomize_phases_lowpass(x, apix=1.0, cutoff_res=4.0, key=jax.random.PRNGKey(0))
        )
        F1 = np.fft.rfftn(out)
        # rfftn DC/Nyquist planes along x carry Hermitian self-symmetry that
        # arbitrary random phases break (irfftn re-symmetrizes); exclude them.
        interior = np.zeros(F0.shape, bool)
        interior[:, :, 1:-1] = True
        assert np.allclose(
            np.abs(F1)[interior], np.abs(F0)[interior], atol=1e-2 * np.abs(F0).max()
        )
        k2 = np.fft.fftfreq(16) ** 2
        kr2 = np.fft.rfftfreq(16) ** 2
        kk = k2[:, None, None] + k2[None, :, None] + kr2[None, None, :]
        keep = (kk < (1.0 / 4.0) ** 2) & interior
        keep &= np.abs(F0) > 1e-3
        assert np.allclose(np.angle(F0)[keep], np.angle(F1)[keep], atol=1e-3)


class TestDownScale:
    def test_shape_and_content(self, rng):
        x = rng.normal(size=(64, 80)).astype(np.float32)
        x[28:36, 30:50] += 10.0
        out = np.asarray(ht.down_scale(x, target_apix=2.0, apix_orig=1.0))
        assert out.shape == (32, 40)
        peak = np.unravel_index(np.argmax(out), out.shape)
        assert abs(peak[0] - 16) <= 2 and 14 <= peak[1] <= 25

    def test_noop_when_upscaling(self, rng):
        x = rng.normal(size=(16, 16)).astype(np.float32)
        assert np.allclose(np.asarray(ht.down_scale(x, 0.5, 1.0)), x)


def test_denoise_wavelet_small_image_caps_levels():
    """Images smaller than 2**levels must denoise (skimage caps the
    level), not crash on an empty Haar slice."""
    from helicon_tpu.core.denoise import denoise_wavelet

    img = np.random.default_rng(0).normal(0, 1, (4, 4)).astype(np.float32)
    out = np.asarray(denoise_wavelet(img))
    assert out.shape == (4, 4) and np.isfinite(out).all()


def test_denoise_image_unknown_method_is_noop():
    """Reference pipeline.py:189-201 silently ignores unknown denoise
    names; a crash turned an option typo into a dead task."""
    from helicon_tpu.core.denoise import denoise_image

    img = np.ones((8, 8), np.float32)
    out = np.asarray(denoise_image(img, method="not-a-method"))
    np.testing.assert_allclose(out, img)


def test_denoise_nl_means_reference_defaults():
    import inspect

    from helicon_tpu.core.denoise import denoise_nl_means

    sig = inspect.signature(denoise_nl_means)
    assert sig.parameters["patch_size"].default == 7
    assert sig.parameters["search_radius"].default == 11
    assert sig.parameters["h"].default == 0.1
