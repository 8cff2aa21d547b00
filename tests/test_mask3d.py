"""core/mask3d: on-device adaptive-mask chain vs host scipy oracles
(reference semantics: /root/reference/src/helicon/commands/trueFSC.py:608-783)."""

import numpy as np
import pytest

from helicon_tpu.core.mask3d import (
    adaptive_mask_3d,
    euclidean_distance_outside,
    gaussian_lowpass_3d,
    grow_from_seeds,
    otsu_threshold_3d,
    soft_cosine_mask,
)


def _blob(n=24, centers=((12, 12, 12),), r=4.0):
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float64)
    v = np.zeros((n, n, n))
    for cz, cy, cx in centers:
        v += np.exp(-(((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2) / r**2))
    return v


def test_gaussian_lowpass_matches_scipy_reflect():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    v = rng.standard_normal((20, 24, 16)).astype(np.float32)
    for sigma in (0.8, 1.7, 3.0):
        ours = np.asarray(gaussian_lowpass_3d(v, sigma))
        ref = gaussian_filter(v.astype(np.float64), sigma=sigma, mode="reflect")
        np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_otsu_matches_bruteforce_eman_variant():
    rng = np.random.default_rng(1)
    v = np.concatenate(
        [rng.normal(0.1, 0.05, 4000), rng.normal(1.0, 0.1, 1000)]
    ).reshape(10, 10, 50)

    # brute-force EMAN2 variant oracle (independent of both codebases)
    def oracle(vol, n_bins=256):
        lo, hi = vol.min(), vol.max()
        hist, _ = np.histogram(vol[vol != 0], bins=n_bins, range=(lo, hi))
        best_t, best_v = 0, -1.0
        total = hist.sum()
        for t in range(1, n_bins):
            w0 = hist[: t + 1].sum() / total
            w1 = 1 - w0
            if w0 == 0 or w1 == 0:
                continue
            mu0 = (np.arange(t + 1) * hist[: t + 1]).sum() / max(
                hist[: t + 1].sum(), 1
            )
            mu1 = (np.arange(t + 1, n_bins) * hist[t + 1 :]).sum() / max(
                hist[t + 1 :].sum(), 1
            )
            var = w0 * w1 * (mu0 - mu1) ** 2
            if var > best_v:
                best_v, best_t = var, t
        return lo + (best_t + 1) * (hi - lo) / n_bins

    ours = float(otsu_threshold_3d(v))
    ref = oracle(v)
    width = (v.max() - v.min()) / 256
    assert abs(ours - ref) <= width + 1e-6
    # threshold separates the modes (between N(0.1, .05) and N(1, .1))
    assert 0.2 < ours < 0.9


def test_grow_from_seeds_matches_label_components():
    from scipy.ndimage import label

    rng = np.random.default_rng(2)
    above = rng.random((18, 18, 18)) > 0.7
    # seed only inside one specific voxel's component
    seeds = np.zeros_like(above)
    zyx = tuple(np.argwhere(above)[0])
    seeds[zyx] = True
    ours = np.asarray(grow_from_seeds(above, seeds))
    labeled, _ = label(above, structure=np.ones((3, 3, 3), bool))
    ref = labeled == labeled[zyx]
    np.testing.assert_array_equal(ours, ref)


def test_euclidean_distance_exact():
    from scipy.ndimage import distance_transform_edt

    rng = np.random.default_rng(3)
    mask = rng.random((14, 15, 16)) > 0.9
    mask[7, 7, 7] = True  # ensure non-empty
    ours = np.asarray(euclidean_distance_outside(mask))
    ref = distance_transform_edt(~mask)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_soft_cosine_mask_profile():
    mask = np.zeros((16, 16, 16), bool)
    mask[8, 8, 8] = True
    soft = np.asarray(soft_cosine_mask(mask, soft_width=4.0))
    assert soft[8, 8, 8] == 1.0
    assert soft[8, 8, 10] == pytest.approx((np.cos(2 / 4 * np.pi) + 1) / 2)
    assert soft[8, 8, 13] == 0.0  # beyond the soft zone
    # zero width: binary passthrough
    np.testing.assert_array_equal(
        np.asarray(soft_cosine_mask(mask, 0.0)), mask.astype(np.float32)
    )


def test_adaptive_mask_keeps_seeded_blob_only():
    # a bright blob and a dim far blob: seeds live in the bright one
    v = _blob(centers=((8, 8, 8),)) + 0.25 * _blob(centers=((18, 18, 18),), r=2.0)
    mask, level, v_lp = adaptive_mask_3d(v, apix=1.0, cutoff_res=4.0)
    mask = np.asarray(mask)
    assert mask[8, 8, 8]
    assert mask.sum() < (np.asarray(v_lp) > float(level)).sum() + 1


def test_adaptive_mask_threshold_precedence():
    v = _blob()
    m_frac, lv_frac, _ = adaptive_mask_3d(
        v, 1.0, 4.0, thresh_fraction=0.5, thresh_absolute=0.01, mass_kda=5.0
    )
    assert float(lv_frac) == pytest.approx(0.5 * float(np.asarray(
        gaussian_lowpass_3d(v, 4.0 / 3.81)).max()), rel=1e-5)
    m_abs, lv_abs, _ = adaptive_mask_3d(v, 1.0, 4.0, thresh_absolute=0.123)
    assert float(lv_abs) == pytest.approx(0.123)
    # mass mode: threshold encloses ~ the requested voxel count
    m_mass, lv_mass, v_lp = adaptive_mask_3d(v, 1.0, 4.0, mass_kda=0.81)
    n_req = int(0.81e3 / 0.81)
    assert abs(int((np.asarray(v_lp) > float(lv_mass)).sum()) - n_req) <= 2
