"""Cross-validation of native redesigns against the reference's external
backends (VERDICT r3 #6 and #10). Every test is env-gated: it runs only
when the optional package is installed (none are baked into this image),
and skips otherwise — the margins asserted here are the documented
parity claims in PARITY.md section "External-backend cross-checks".

- Curvelet: the native Meyer-window JAX transform (core/curvelet.py)
  serves the fdct/udct API the reference drives through curvepy-fdct
  (/root/reference/src/helicon/lib/curvelet.py:202-379). Cross-check:
  denoising PSNR within 2 dB of curvepy's on the fixture images, and
  coarse-band energy fraction within 0.15.
- Ptycho: the native parallax + ePIE engine (core/ptycho.py) replaces
  the py4DSTEM driver (/root/reference/src/helicon/lib/ptycho.py:54-239).
  Cross-check: parallax defocus estimates within 30% of each other, and
  both reconstructions correlate > 0.8 with the known phase object.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")


def _psnr(clean, x):
    mse = float(np.mean((np.asarray(clean) - np.asarray(x)) ** 2))
    rng = float(clean.max() - clean.min())
    return 10.0 * np.log10(rng * rng / max(mse, 1e-30))


@pytest.fixture()
def noisy_pair():
    from helicon_tpu.helix import simulate_helical_projection

    clean = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=80.0,
        ball_radius=6.0, polymer=0, planarity=1.0, ny=128, nx=128,
        apix=2.0, rng=0,
    ))).astype(np.float64)
    rng = np.random.default_rng(1)
    noisy = clean + rng.normal(scale=0.3 * clean.std(), size=clean.shape)
    return clean, noisy


def _frac_coarse(coeffs):
    """Energy fraction of the first (lowpass) band of a nested coeff
    structure — layout-agnostic across backends."""
    flat = []

    def walk(c):
        if isinstance(c, (list, tuple)):
            for x in c:
                walk(x)
        else:
            flat.append(float(np.sum(np.abs(np.asarray(c)) ** 2)))

    walk(coeffs)
    return flat[0] / max(sum(flat), 1e-30)


class TestCurveletVsCurvepy:
    def test_denoise_psnr_within_margin(self, noisy_pair):
        pytest.importorskip("curvepy")
        clean, noisy = noisy_pair
        # the reference's own wrapper drives curvepy
        # (lib/curvelet.py:202-259); import it with light stubs
        import sys
        import types

        sys.path.insert(0, "/root/reference/src")
        for name in ["numba", "tqdm"]:
            sys.modules.setdefault(name, types.ModuleType(name))
        from helicon.lib.curvelet import curvelet_denoise_fdct as ref_denoise

        theirs = np.asarray(ref_denoise(noisy, sigma=3.0))

        from helicon_tpu.core.curvelet import curvelet_denoise_fdct

        ours = np.asarray(curvelet_denoise_fdct(noisy, threshold_sigma=3.0))
        # documented margin (PARITY.md): within 2 dB of curvepy's PSNR
        assert _psnr(clean, ours) > _psnr(clean, theirs) - 2.0, (
            _psnr(clean, ours), _psnr(clean, theirs)
        )

    def test_coarse_band_energy_fraction(self, noisy_pair):
        pytest.importorskip("curvepy")
        from curvepy.curvepy import CurveletFrequencyGrid

        clean, _ = noisy_pair
        grid = CurveletFrequencyGrid(clean.shape, num_scales=4)
        theirs = _frac_coarse(grid.forward_transform(clean))

        from helicon_tpu.core.curvelet import curvelet_transform_2d

        ours = _frac_coarse(
            [np.asarray(c) for c in curvelet_transform_2d(clean, 4, 8)]
        )
        # documented margin (PARITY.md): band-structure agreement 0.15
        assert abs(ours - theirs) < 0.15, (ours, theirs)


class TestPtychoVsPy4dstem:
    def test_parallax_defocus_and_reconstruction(self, tmp_path):
        py4DSTEM = pytest.importorskip("py4DSTEM")
        import h5py  # noqa: F401

        from tests.test_aux_modules import _make_ptycho_fixture

        f = tmp_path / "scan4d.h5"
        V, pad_gen = _make_ptycho_fixture(f, defocus=-600.0)

        from helicon_tpu.core.ptycho import (
            electron_wavelength_angstrom,
            estimate_defocus_parallax,
            load_h5_file,
            reconstruct_ptychography,
        )

        data, vacuum, acc_v, semi, r_pix = load_h5_file(str(f))
        data = np.asarray(data)
        lam = electron_wavelength_angstrom(acc_v)
        ours_c1 = estimate_defocus_parallax(
            data, lam, semi / 8.0, r_pix, 8.0, (16.0, 16.0)
        )

        dataset = py4DSTEM.DataCube(data=data)
        dataset.calibration.set_Q_pixel_size(semi / 8.0)
        dataset.calibration.set_Q_pixel_units("mrad")
        dataset.calibration.set_R_pixel_size(r_pix)
        dataset.calibration.set_R_pixel_units("A")
        parallax = py4DSTEM.process.phase.Parallax(
            energy=acc_v, datacube=dataset,
            verbose=False, device="cpu",
        ).preprocess(
            plot_average_bf=False, defocus_guess=None, rotation_guess=0.0
        )
        parallax.reconstruct(min_alignment_bin=16, num_iter_at_min_bin=16)
        parallax.aberration_fit()
        theirs_c1 = float(parallax.aberration_C1)

        assert np.sign(ours_c1) == np.sign(theirs_c1)
        assert abs(ours_c1 - theirs_c1) < 0.3 * abs(theirs_c1), (
            ours_c1, theirs_c1
        )

        pot = reconstruct_ptychography(
            str(f), com_rotation_force=0.0, crop_margin=0,
            num_iter=50, step_size=1.0, batch_size=1,
        )
        scan, step_px, det = 12, 2, 32
        tru = np.zeros_like(pot)
        oy, ox = V.shape
        tru[16 - pad_gen : 16 - pad_gen + oy,
            16 - pad_gen : 16 - pad_gen + ox] = V
        span = (scan - 1) * step_px + det
        m = 10
        r = pot[16 + m : 16 + span - m, 16 + m : 16 + span - m]
        t = tru[16 + m : 16 + span - m, 16 + m : 16 + span - m]
        r, t = r - r.mean(), t - t.mean()
        cc = float((r * t).sum() / np.sqrt((r * r).sum() * (t * t).sum()))
        assert cc > 0.8, cc
