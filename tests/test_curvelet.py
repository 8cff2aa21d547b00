"""Curvelet denoising behavior tests, modeled on the reference's
tests/test_curvelet.py coverage (76 tests there: FDCT/UDCT/MCT x
{single, batch, 3D, tiled}, MAD scaling, elbow mode, odd sizes,
dynamic-range preservation, Riesz properties). Here FDCT and UDCT map to
the same native tight-frame transform (helicon_tpu/core/curvelet.py),
so their tests collapse onto one backend plus the aliases.
"""

import numpy as np
import pytest

from helicon_tpu.core.curvelet import (
    _elbow_threshold,
    _mad_sigma,
    curvelet_denoise_3d_mct,
    curvelet_denoise_3d_udct,
    curvelet_denoise_3d_udct_tiled,
    curvelet_denoise_batch_fdct,
    curvelet_denoise_batch_mct,
    curvelet_denoise_batch_udct,
    curvelet_denoise_fdct,
    curvelet_denoise_mct,
    curvelet_denoise_udct,
    curvelet_denoise_udct_tiled,
    curvelet_inverse_2d,
    curvelet_transform_2d,
    denoise_curvelet_2d,
    denoise_curvelet_2d_tiled,
    denoise_curvelet_3d,
    riesz_transform_2d,
)


def _structured_image(ny=64, nx=64, noise=0.0, seed=0):
    """A smooth ridge pattern plus optional Gaussian noise."""
    y, x = np.mgrid[0:ny, 0:nx]
    img = np.sin(2 * np.pi * x / 16.0) * np.exp(-((y - ny / 2) ** 2) / 200.0)
    if noise:
        img = img + np.random.default_rng(seed).normal(0, noise, img.shape)
    return img.astype(np.float32)


class TestDenoise2D:
    def test_square_image(self):
        img = _structured_image(64, 64, noise=0.3)
        out = np.asarray(curvelet_denoise_udct(img))
        assert out.shape == img.shape
        assert np.isfinite(out).all()

    def test_non_square_image(self):
        img = _structured_image(48, 80, noise=0.3)
        out = np.asarray(curvelet_denoise_udct(img))
        assert out.shape == img.shape

    def test_odd_size(self):
        img = _structured_image(63, 77, noise=0.3)
        out = np.asarray(curvelet_denoise_udct(img))
        assert out.shape == img.shape
        assert np.isfinite(out).all()

    def test_preserves_dynamic_range(self):
        img = _structured_image(64, 64)
        out = np.asarray(curvelet_denoise_udct(img, threshold_sigma=1.0))
        assert out.min() >= img.min() - 0.5
        assert out.max() <= img.max() + 0.5

    def test_improves_mse_for_noisy_structure(self):
        clean = _structured_image(64, 64)
        noisy = _structured_image(64, 64, noise=0.5)
        den = np.asarray(curvelet_denoise_udct(noisy, threshold_sigma=3.0))
        assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)

    def test_fdct_alias_matches_udct(self):
        img = _structured_image(64, 64, noise=0.3)
        a = np.asarray(curvelet_denoise_fdct(img))
        b = np.asarray(curvelet_denoise_udct(img))
        np.testing.assert_allclose(a, b)

    def test_constant_image_preserved(self):
        img = np.full((64, 64), 3.5, np.float32)
        out = np.asarray(curvelet_denoise_udct(img))
        np.testing.assert_allclose(out, img, atol=1e-3)

    def test_higher_sigma_retains_less(self):
        noisy = _structured_image(64, 64, noise=0.5)
        lo = np.asarray(curvelet_denoise_udct(noisy, threshold_sigma=1.0))
        hi = np.asarray(curvelet_denoise_udct(noisy, threshold_sigma=6.0))
        # stronger thresholding removes more energy relative to input
        assert np.linalg.norm(noisy - hi) > np.linalg.norm(noisy - lo)


class TestElbowMode:
    def test_elbow_threshold_monotone(self):
        v = np.concatenate([np.random.default_rng(0).normal(0, 1, 1000),
                            [50.0, 60.0, 70.0]]).astype(np.float32)
        thr = float(_elbow_threshold(np.abs(v)))
        assert 0 < thr < 70.0

    def test_sigma_zero_uses_elbow(self):
        noisy = _structured_image(64, 64, noise=0.5)
        out = np.asarray(curvelet_denoise_udct(noisy, threshold_sigma=0.0))
        # elbow mode must actually threshold (not a no-op round trip)
        assert not np.allclose(out, noisy, atol=1e-4)
        assert np.isfinite(out).all()

    def test_elbow_improves_mse(self):
        clean = _structured_image(64, 64)
        noisy = _structured_image(64, 64, noise=0.5)
        den = np.asarray(curvelet_denoise_udct(noisy, threshold_sigma=0.0))
        assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)

    def test_mct_sigma_zero_uses_elbow(self):
        noisy = _structured_image(64, 64, noise=0.5)
        out = np.asarray(curvelet_denoise_mct(noisy, threshold_sigma=0.0))
        assert not np.allclose(out, noisy, atol=1e-4)


class TestMadStd:
    def test_mad_std_scales_with_noise_level(self):
        rng = np.random.default_rng(0)
        a = float(_mad_sigma(rng.normal(0, 1.0, 4096).astype(np.float32)))
        b = float(_mad_sigma(rng.normal(0, 3.0, 4096).astype(np.float32)))
        assert 2.0 < b / a < 4.0

    def test_mad_std_gaussian_calibration(self):
        rng = np.random.default_rng(1)
        s = float(_mad_sigma(rng.normal(0, 2.0, 65536).astype(np.float32)))
        assert abs(s - 2.0) < 0.1


class TestMCT:
    def test_riesz_transform_properties(self):
        img = _structured_image(64, 64)
        rx, ry = riesz_transform_2d(img)
        rx, ry = np.asarray(rx), np.asarray(ry)
        assert rx.shape == img.shape and ry.shape == img.shape
        # Riesz kernels are odd: zero DC response
        assert abs(rx.mean()) < 1e-4 and abs(ry.mean()) < 1e-4

    def test_riesz_constant_zero(self):
        const = np.full((32, 32), 7.0, np.float32)
        rx, ry = riesz_transform_2d(const)
        assert np.allclose(np.asarray(rx), 0, atol=1e-4)
        assert np.allclose(np.asarray(ry), 0, atol=1e-4)

    def test_riesz_orthogonality(self):
        """Horizontal structure -> energy in x-Riesz, not y-Riesz."""
        y, x = np.mgrid[0:64, 0:64]
        vert_edges = np.sin(2 * np.pi * x / 8.0).astype(np.float32)
        rx, ry = riesz_transform_2d(vert_edges)
        assert np.linalg.norm(np.asarray(rx)) > 10 * np.linalg.norm(np.asarray(ry))

    def test_mct_denoise_single(self):
        noisy = _structured_image(64, 64, noise=0.4)
        out = np.asarray(curvelet_denoise_mct(noisy))
        assert out.shape == noisy.shape and np.isfinite(out).all()

    def test_mct_denoise_odd_size(self):
        noisy = _structured_image(61, 67, noise=0.4)
        out = np.asarray(curvelet_denoise_mct(noisy))
        assert out.shape == noisy.shape

    def test_mct_improves_mse(self):
        clean = _structured_image(64, 64)
        noisy = _structured_image(64, 64, noise=0.5)
        den = np.asarray(curvelet_denoise_mct(noisy, threshold_sigma=3.0))
        assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)

    def test_mct_vs_udct_not_identical(self):
        noisy = _structured_image(64, 64, noise=0.5)
        a = np.asarray(curvelet_denoise_mct(noisy, threshold_sigma=3.0))
        b = np.asarray(curvelet_denoise_udct(noisy, threshold_sigma=3.0))
        assert not np.allclose(a, b, atol=1e-6)

    def test_mct_constant_image_preserved(self):
        img = np.full((64, 64), 2.0, np.float32)
        out = np.asarray(curvelet_denoise_mct(img))
        np.testing.assert_allclose(out, img, atol=1e-3)


class TestBatch:
    def test_batch_udct(self):
        stack = np.stack([_structured_image(48, 48, noise=0.3, seed=s) for s in range(3)])
        out = np.asarray(curvelet_denoise_batch_udct(stack))
        assert out.shape == stack.shape
        single = np.asarray(curvelet_denoise_udct(stack[1]))
        np.testing.assert_allclose(out[1], single, atol=1e-5)

    def test_batch_fdct(self):
        stack = np.stack([_structured_image(48, 48, noise=0.3, seed=s) for s in range(2)])
        out = np.asarray(curvelet_denoise_batch_fdct(stack))
        assert out.shape == stack.shape

    def test_batch_mct(self):
        stack = np.stack([_structured_image(48, 48, noise=0.3, seed=s) for s in range(2)])
        out = np.asarray(curvelet_denoise_batch_mct(stack))
        assert out.shape == stack.shape


class Test3D:
    def test_small_volume(self):
        rng = np.random.default_rng(0)
        vol = rng.normal(0, 1, (24, 24, 24)).astype(np.float32)
        out = np.asarray(curvelet_denoise_3d_udct(vol))
        assert out.shape == vol.shape and np.isfinite(out).all()

    def test_preserves_dynamic_range_3d(self):
        z, y, x = np.mgrid[0:24, 0:24, 0:24]
        vol = np.sin(2 * np.pi * z / 8.0).astype(np.float32)
        out = np.asarray(curvelet_denoise_3d_udct(vol, threshold_sigma=1.0))
        assert out.min() >= vol.min() - 0.5 and out.max() <= vol.max() + 0.5

    def test_elbow_mode_3d(self):
        rng = np.random.default_rng(1)
        vol = rng.normal(0, 1, (20, 20, 20)).astype(np.float32)
        out = np.asarray(curvelet_denoise_3d_udct(vol, threshold_sigma=0.0))
        assert not np.allclose(out, vol, atol=1e-4)

    def test_mct_3d_alias(self):
        rng = np.random.default_rng(2)
        vol = rng.normal(0, 1, (16, 16, 16)).astype(np.float32)
        out = np.asarray(curvelet_denoise_3d_mct(vol))
        assert out.shape == vol.shape

    def test_3d_odd_size(self):
        rng = np.random.default_rng(3)
        vol = rng.normal(0, 1, (15, 21, 17)).astype(np.float32)
        out = np.asarray(denoise_curvelet_3d(vol))
        assert out.shape == vol.shape and np.isfinite(out).all()

    def test_3d_directional_tight_frame(self):
        """Directional 3D windows stay an exact tight frame (sum U^2 = 1)
        and reconstruct perfectly (VERDICT r2 #9 done-criterion)."""
        import jax.numpy as jnp

        from helicon_tpu.core import fft as hfft
        from helicon_tpu.core.curvelet import curvelet_bands_3d

        U, meta = curvelet_bands_3d((16, 16, 16), n_scales=3, n_dirs=6)
        s = np.asarray((U**2).sum(0))
        assert s.min() > 0.999999 and s.max() < 1.000001
        # wedge count doubles every other scale (parabolic scaling)
        per_scale = {j: sum(1 for sc, _ in meta if sc == j) for j in range(3)}
        assert per_scale[0] == 6 and per_scale[2] == 12
        rng = np.random.default_rng(5)
        vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
        F = hfft.fftn(jnp.asarray(vol))
        coeffs = hfft.ifftn(F[None] * U, axes=(-3, -2, -1))
        Fk = hfft.fftn(coeffs, axes=(-3, -2, -1))
        rec = np.asarray(
            jnp.real(hfft.ifftn(jnp.sum(Fk * U, axis=0), axes=(-3, -2, -1)))
        )
        np.testing.assert_allclose(rec, vol, atol=1e-4)

    def test_3d_directional_beats_isotropic_on_anisotropic_noise(self):
        """Orientation selectivity pays: Fourier-wedge streak noise on a
        z-filament denoises measurably better with wedges than with the
        isotropic radial bands (VERDICT r2 #9 done-criterion)."""
        rng = np.random.default_rng(0)
        n = 32
        ax = np.linspace(-1, 1, n)
        _, Y, X = np.meshgrid(ax, ax, ax, indexing="ij")
        signal = (np.exp(-((Y**2 + X**2) / 0.05)) * 3.0).astype(np.float32)
        noise = rng.standard_normal((n, n, n)).astype(np.float32)
        f1 = np.fft.fftfreq(n)
        fz, fy, fx = np.meshgrid(f1, f1, f1, indexing="ij")
        r = np.sqrt(fz**2 + fy**2 + fx**2)
        wedge = (np.abs(fx / np.where(r > 0, r, 1)) > 0.9) & (r > 0.05)
        noise = np.real(np.fft.ifftn(np.fft.fftn(noise) * wedge)).astype(np.float32)
        noise /= noise.std()
        noisy = signal + noise

        def mse(a):
            return float(((a - signal) ** 2).mean())

        d_dir = np.asarray(
            denoise_curvelet_3d(noisy, threshold_sigma=3.0, n_scales=3, n_dirs=6)
        )
        d_iso = np.asarray(
            denoise_curvelet_3d(noisy, threshold_sigma=3.0, n_scales=3, n_dirs=0)
        )
        assert mse(d_dir) < mse(noisy) / 10
        assert mse(d_dir) < 0.8 * mse(d_iso), (mse(d_dir), mse(d_iso))


class TestTiled:
    def test_tiled_vs_untiled_small(self):
        """Under the tile size, the tiled path is exactly the untiled one."""
        img = _structured_image(64, 64, noise=0.3)
        a = np.asarray(curvelet_denoise_udct_tiled(img, tile_size=128))
        b = np.asarray(curvelet_denoise_udct(img))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_tiled_large_consistent(self):
        img = _structured_image(96, 96, noise=0.3)
        tiled = np.asarray(
            denoise_curvelet_2d_tiled(img, tile_size=64, overlap=16)
        )
        untiled = np.asarray(denoise_curvelet_2d(img))
        assert tiled.shape == img.shape
        # same structure recovered: high correlation, not exact equality
        c = np.corrcoef(tiled.ravel(), untiled.ravel())[0, 1]
        assert c > 0.95, c

    def test_tiled_odd_size(self):
        img = _structured_image(97, 103, noise=0.3)
        out = np.asarray(denoise_curvelet_2d_tiled(img, tile_size=64, overlap=16))
        assert out.shape == img.shape and np.isfinite(out).all()

    def test_tiled_3d(self):
        rng = np.random.default_rng(4)
        vol = rng.normal(0, 1, (40, 16, 16)).astype(np.float32)
        out = np.asarray(
            curvelet_denoise_3d_udct_tiled(vol, tile_size=24, overlap=8)
        )
        assert out.shape == vol.shape and np.isfinite(out).all()

    def test_tiled_mean_preserved(self):
        img = _structured_image(96, 96) + 5.0
        out = np.asarray(denoise_curvelet_2d_tiled(img, tile_size=64, overlap=16))
        assert abs(out.mean() - img.mean()) < 0.2


class TestTransformRoundTrip:
    def test_perfect_reconstruction(self):
        img = _structured_image(64, 64, noise=0.2)
        coeffs = curvelet_transform_2d(img)
        rec = np.asarray(curvelet_inverse_2d(coeffs))
        np.testing.assert_allclose(rec, img, atol=1e-4)

    def test_reconstruction_non_square(self):
        img = _structured_image(48, 80, noise=0.2)
        coeffs = curvelet_transform_2d(img)
        rec = np.asarray(curvelet_inverse_2d(coeffs))
        np.testing.assert_allclose(rec, img, atol=1e-4)


class TestFeatureFlags:
    def test_public_api_flags(self):
        import helicon_tpu as ht

        # native transform always available; torch-GPU path intentionally N/A
        assert ht.has_curvelet_fdct() is True
        assert ht.has_curvelet_udct() is True
        assert ht.has_curvelet_udct_gpu() is False


class TestDenoisers:
    """core/denoise.py (TV-Chambolle, Haar wavelet, NL-means) — the
    pipeline's denoise= option backends (reference pipeline.py:180-229)."""

    def _noisy(self, sigma=0.4, seed=0):
        clean = _structured_image(48, 48)
        rng = np.random.default_rng(seed)
        return clean, (clean + rng.normal(0, sigma, clean.shape)).astype(
            np.float32
        )

    def test_tv_improves_mse(self):
        from helicon_tpu.core.denoise import denoise_tv_chambolle

        clean, noisy = self._noisy()
        den = np.asarray(denoise_tv_chambolle(noisy, weight=0.2))
        assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)

    def test_wavelet_improves_mse(self):
        from helicon_tpu.core.denoise import denoise_wavelet

        clean, noisy = self._noisy()
        den = np.asarray(denoise_wavelet(noisy))
        assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)

    def test_nl_means_improves_mse(self):
        from helicon_tpu.core.denoise import denoise_nl_means

        clean, noisy = self._noisy()
        den = np.asarray(denoise_nl_means(noisy, patch_size=3, search_radius=4))
        assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)

    def test_denoise_image_dispatch(self):
        from helicon_tpu.core.denoise import denoise_image

        _, noisy = self._noisy()
        for method in ("tv", "wavelet", "nl_mean"):
            out = np.asarray(denoise_image(noisy, method=method))
            assert out.shape == noisy.shape and np.isfinite(out).all()
        # reference pipeline.py:189-201 silently ignores unknown names
        out = np.asarray(denoise_image(noisy, method="nope"))
        np.testing.assert_allclose(out, noisy)

    def test_constant_image_stable(self):
        from helicon_tpu.core.denoise import denoise_tv_chambolle

        img = np.full((32, 32), 2.0, np.float32)
        out = np.asarray(denoise_tv_chambolle(img))
        np.testing.assert_allclose(out, img, atol=1e-4)


def test_mct_tiled_differs_from_udct_tiled():
    """curvelet_denoise_mct_tiled must actually run the monogenic
    transform (a dropped transform= kwarg once made it identical to the
    UDCT tiled path)."""
    from helicon_tpu.core.curvelet import (
        curvelet_denoise_mct_tiled,
        curvelet_denoise_udct_tiled,
    )

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (48, 48)).astype(np.float32)
    img[20:28] += 3.0
    a = np.asarray(curvelet_denoise_mct_tiled(img, tile_size=32, overlap=8))
    b = np.asarray(curvelet_denoise_udct_tiled(img, tile_size=32, overlap=8))
    assert not np.allclose(a, b)


def test_3d_tiled_forwards_n_scales():
    """n_scales reaches every chunk of the 3D tiled denoiser."""
    from helicon_tpu.core.curvelet import curvelet_denoise_3d_udct_tiled

    rng = np.random.default_rng(0)
    vol = rng.normal(0, 1, (40, 16, 16)).astype(np.float32)
    a = np.asarray(
        curvelet_denoise_3d_udct_tiled(vol, tile_size=24, overlap=8, n_scales=2)
    )
    b = np.asarray(
        curvelet_denoise_3d_udct_tiled(vol, tile_size=24, overlap=8, n_scales=5)
    )
    assert not np.allclose(a, b)
