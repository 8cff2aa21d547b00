"""Unit tests for the trueFSC command internals (reference
commands/trueFSC.py:102-910: resolution crossing, Fermi/Butterworth
curve fit, EMAN-style Otsu threshold, adaptive mask seed-and-grow,
cosine soft edge, phase randomization). The CLI end-to-end run lives in
tests/test_cli.py.
"""

import argparse

import numpy as np
import pytest

from helicon_tpu.commands.trueFSC import (
    _find_resolution,
    _fit_fsc_curve,
    _generate_adaptive_mask,
    _otsu_threshold_eman,
    _soft_mask,
)


class TestFindResolution:
    def test_interpolated_crossing(self):
        s = np.linspace(0.01, 0.5, 50)
        fsc = 1.0 - 3.0 * s  # crosses 0.143 at s = 0.2857
        res = _find_resolution(s, fsc, 0.143)
        assert res == pytest.approx(1.0 / 0.2857, rel=0.02)

    def test_never_crossed_returns_999(self):
        s = np.linspace(0.01, 0.5, 50)
        assert _find_resolution(s, np.ones(50), 0.143) == 999.0

    def test_crossed_at_first_shell(self):
        s = np.linspace(0.01, 0.5, 50)
        fsc = np.zeros(50)
        res = _find_resolution(s, fsc, 0.143)
        assert res == pytest.approx(1.0 / s[0])


class TestFitFscCurve:
    def test_fermi_like_curve_recovered(self):
        s = np.linspace(0.005, 0.5, 60)
        true = 1.0 / (np.exp((s - 0.25) / 0.02) + 1.0)
        true /= true[0]
        s_fit, f_fit, res = _fit_fsc_curve(s, true)
        # resolution at 0.143 of the true curve
        res_true = _find_resolution(s, true, 0.143)
        assert res == pytest.approx(res_true, rel=0.05)

    def test_noisy_curve_fit_smooths(self):
        rng = np.random.default_rng(0)
        s = np.linspace(0.005, 0.5, 60)
        true = 1.0 / (np.exp((s - 0.2) / 0.03) + 1.0)
        noisy = true + rng.normal(0, 0.05, 60)
        s_fit, f_fit, res = _fit_fsc_curve(s, noisy)
        assert np.isfinite(res)
        assert 1.0 / 0.3 < res < 1.0 / 0.1

    def test_too_few_points_falls_back(self):
        s = np.array([0.1, 0.2])
        fsc = np.array([1.0, 0.0])
        _, _, res = _fit_fsc_curve(s, fsc)
        assert np.isfinite(res)


class TestOtsuThreshold:
    def test_bimodal_separation(self):
        rng = np.random.default_rng(0)
        vol = np.concatenate(
            [rng.normal(0.0, 0.1, 8000), rng.normal(5.0, 0.1, 2000)]
        ).reshape(10, 10, 100)
        t = _otsu_threshold_eman(vol, ignore_zero=False)
        # threshold separates the two modes (0.0 and 5.0)
        assert 0.2 < t < 4.8

    def test_constant_volume(self):
        vol = np.full((8, 8, 8), 2.0)
        t = _otsu_threshold_eman(vol, ignore_zero=False)
        assert np.isfinite(t)


def _mask_args(**kw):
    ns = argparse.Namespace(
        maskFractionThresh=0.0, maskThresh=[0.0], maskMass=0.0,
        maskSoftWidth=0.0,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


class TestAdaptiveMask:
    def _blob_volume(self):
        z, y, x = np.mgrid[0:32, 0:32, 0:32]
        r2 = (z - 16) ** 2 + (y - 16) ** 2 + (x - 16) ** 2
        return np.exp(-r2 / 30.0).astype(np.float64)

    def test_masks_the_blob(self):
        vol = self._blob_volume()
        mask = _generate_adaptive_mask(vol, apix=1.0, cutoff_res=4.0,
                                       args=_mask_args())
        assert mask[16, 16, 16] == 1.0
        assert mask[0, 0, 0] == 0.0
        assert 0 < mask.sum() < mask.size

    def test_fraction_threshold(self):
        vol = self._blob_volume()
        m_small = _generate_adaptive_mask(
            vol, 1.0, 4.0, _mask_args(maskFractionThresh=0.5)
        )
        m_large = _generate_adaptive_mask(
            vol, 1.0, 4.0, _mask_args(maskFractionThresh=0.1)
        )
        assert m_large.sum() > m_small.sum()

    def test_seed_and_grow_keeps_connected_component(self):
        vol = self._blob_volume()
        # a small detached bright speck far from the main blob, below the
        # brightest-voxel seeds: must NOT survive seed-and-grow
        vol[2, 2, 2] = 0.4
        mask = _generate_adaptive_mask(vol, 1.0, 4.0,
                                       args=_mask_args(maskFractionThresh=0.3))
        assert mask[2, 2, 2] == 0.0

    def test_soft_mask_cosine_edge(self):
        vol = self._blob_volume()
        mask = _generate_adaptive_mask(vol, 1.0, 4.0, args=_mask_args())
        soft = _soft_mask(mask, soft_width=4.0)
        assert soft.min() >= 0.0 and soft.max() <= 1.0 + 1e-9
        # soft edge adds intermediate values
        assert ((soft > 0.05) & (soft < 0.95)).any()
        # zero width = hard mask
        np.testing.assert_allclose(_soft_mask(mask, 0.0), mask)


class TestPhaseRandomization:
    def test_randomized_phases_keep_power(self):
        from helicon_tpu.core.filters import randomize_phases_lowpass

        rng = np.random.default_rng(0)
        vol = rng.normal(0, 1, (24, 24, 24)).astype(np.float32)
        out = np.asarray(randomize_phases_lowpass(vol, apix=1.0, cutoff_res=4.0))
        assert out.shape == vol.shape
        # power spectrum magnitude is preserved (phases-only change)
        p_in = np.abs(np.fft.rfftn(vol))
        p_out = np.abs(np.fft.rfftn(out))
        np.testing.assert_allclose(
            np.sort(p_in.ravel())[-50:], np.sort(p_out.ravel())[-50:],
            rtol=0.1,
        )
        # low-frequency content differs (phases randomized below cutoff)
        assert not np.allclose(out, vol, atol=1e-3)


def test_randomized_unmasked_output_and_refine_default(tmp_path):
    """Reference trueFSC writes '<prefix>.randomized-unmasked.txt'
    (trueFSC.py:158) and defaults --refineMask to 1."""
    import argparse

    from helicon_tpu.commands import trueFSC as cmd

    parser = argparse.ArgumentParser()
    cmd.add_args(parser)
    args = parser.parse_args(["a.mrc", "b.mrc", "fsc.png"])
    assert args.refineMask == 1
