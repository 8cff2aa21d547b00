"""Fourier filters, normalizations, and structural-factor matching (JAX).

Parity map (reference: /root/reference/src/helicon/lib/filters.py):
  calculate_structural_factor .. rotational average of |F|^2 (22-95)
  set/match_structural_factors .. radial amplitude rescaling (98-208)
  normalize_* / threshold_data .. (211-311)
  low_high_pass_filter         .. Gaussian Fourier filter (314-372)
  down_scale                   .. anti-aliased rescale (375-412)
  generate_tapering_filter     .. cosine edge taper (415-466)
  randomize_phases_lowpass     .. true-FSC noise substitution (469-520)
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as hfft

logger = logging.getLogger(__name__)

__all__ = [
    "calculate_structural_factor",
    "down_scale",
    "generate_tapering_filter",
    "low_high_pass_filter",
    "match_structural_factors",
    "normalize_mean_std",
    "normalize_min_max",
    "normalize_percentile",
    "randomize_phases_lowpass",
    "set_structural_factors",
    "threshold_data",
]


def _fftfreq_radius(shape, apix):
    """|q| grid (1/Angstrom) in fft layout for a 2D/3D shape."""
    grids = [np.fft.fftfreq(n) ** 2 for n in shape]
    if len(shape) == 2:
        qr2 = grids[0][:, None] + grids[1][None, :]
    else:
        qr2 = grids[0][:, None, None] + grids[1][None, :, None] + grids[2][None, None, :]
    return np.sqrt(qr2) / apix


def calculate_structural_factor(
    data, apix: float, thresh=None, mask=None, return_fft: bool = False
):
    """1D structural factor: rotational sum of |F|^2 over radial q bins."""
    data = jnp.asarray(data, jnp.float32)
    work = threshold_data(data, thresh_value=thresh) if thresh else data
    if mask is not None:
        work = work * jnp.asarray(mask, jnp.float32)
    F = hfft.fftn(work)
    amp2 = F.real**2 + F.imag**2

    qr = _fftfreq_radius(work.shape, apix)
    qmax = qr.max()
    qstep = qr[qr > 0].min()
    nbins = int(qmax / qstep) // 2 * 2
    qbins = np.linspace(0, nbins * qstep, nbins)
    labels = np.searchsorted(qbins, qr, "right") - 1

    sf = jnp.zeros(nbins, jnp.float32).at[jnp.asarray(labels.ravel())].add(amp2.ravel())
    if return_fft:
        return qbins, sf, F
    return qbins, sf


def _interp_fill0(xq, xp, fp):
    """np.interp with fill_value=0 outside the range (scipy interp1d-like)."""
    y = jnp.interp(xq, jnp.asarray(xp, jnp.float32), jnp.asarray(fp, jnp.float32))
    inside = (xq >= xp[0]) & (xq <= xp[-1])
    return jnp.where(inside, y, 0.0)


def set_structural_factors(
    data, apix: float, target_bins, target_structural_factors, thresh=None, mask=None
):
    """Rescale radial amplitudes so the structural factor matches a target."""
    data = jnp.asarray(data, jnp.float32)
    qbins, sf, fft = calculate_structural_factor(
        data, apix, thresh=thresh, mask=mask, return_fft=True
    )
    if mask is not None:
        fft = hfft.fftn(data)

    target_interp = _interp_fill0(
        jnp.asarray(qbins, jnp.float32),
        np.asarray(target_bins, np.float32),
        np.asarray(target_structural_factors, np.float32),
    )
    ratio = jnp.where(sf > 0, jnp.sqrt(jnp.maximum(target_interp, 0.0) / jnp.where(sf > 0, sf, 1.0)), 0.0)

    qr = jnp.asarray(_fftfreq_radius(data.shape, apix), jnp.float32)
    ratio_grid = _interp_fill0(qr, np.asarray(qbins, np.float32), ratio)
    return jnp.real(hfft.ifftn(fft * ratio_grid))


def match_structural_factors(
    data, apix: float, data_target, apix_target: float, thresh=None, thresh_target=None, mask=None
):
    """Match the structural factor of *data* to that of *data_target*."""
    tb, tsf = calculate_structural_factor(
        data_target, apix_target, thresh=thresh_target, mask=mask
    )
    return set_structural_factors(
        data, apix, np.asarray(tb), np.asarray(tsf), thresh=thresh, mask=mask
    )


def normalize_min_max(data, min: float = 0, max: float = 1):
    data = jnp.asarray(data)
    lo, hi = jnp.min(data), jnp.max(data)
    return jnp.where(hi == lo, data, (max - min) * (data - lo) / jnp.where(hi == lo, 1.0, hi - lo))


def normalize_mean_std(data, mean: float = 0, std: float = 1):
    data = jnp.asarray(data)
    s = jnp.std(data)
    return jnp.where(s == 0, data, (data - jnp.mean(data)) / jnp.where(s == 0, 1.0, s))


def normalize_percentile(data, percentile=(0, 100)):
    data = jnp.asarray(data)
    p0, p1 = percentile
    v = jnp.percentile(data, jnp.asarray([p0, p1], jnp.float32))
    vmin, vmax = jnp.min(v), jnp.max(v)
    return jnp.where(
        vmax == vmin, data, (data - vmin) / jnp.where(vmax == vmin, 1.0, vmax - vmin)
    )


def threshold_data(data, thresh_fraction=None, thresh_value=None):
    """Zero values below a threshold and shift so the threshold maps to 0."""
    data = jnp.asarray(data)
    if thresh_fraction is not None and thresh_fraction >= 0:
        thresh = jnp.max(data) * thresh_fraction
    elif thresh_value is not None:
        thresh = thresh_value
    else:
        return data
    return jnp.clip(data, thresh, None) - thresh


def _normalized_r2(shape):
    """Squared radius grid normalized to half-axis, centered layout."""
    axes = [
        (np.arange(n, dtype=np.float32) - n // 2) / (n // 2) for n in shape
    ]
    if len(shape) == 2:
        return axes[0][:, None] ** 2 + axes[1][None, :] ** 2
    return (
        axes[0][:, None, None] ** 2
        + axes[1][None, :, None] ** 2
        + axes[2][None, None, :] ** 2
    )


def low_high_pass_filter(data, low_pass_fraction: float = 0, high_pass_fraction: float = 0):
    """Gaussian low/high-pass in Fourier space (fractions of Nyquist)."""
    data = jnp.asarray(data, jnp.float32)
    if data.ndim not in (2, 3):
        raise ValueError("Input data must be a 2D or 3D array.")
    fft = hfft.fftn(data)
    R2 = jnp.asarray(_normalized_r2(data.shape))
    if 0 < low_pass_fraction < 1:
        f2 = np.log(2) / (low_pass_fraction**2)
        fft = fft * jnp.fft.fftshift(jnp.exp(-f2 * R2))
    if 0 < high_pass_fraction < 1:
        f2 = np.log(2) / (high_pass_fraction**2)
        fft = fft * jnp.fft.fftshift(1.0 - jnp.exp(-f2 * R2))
    return jnp.real(hfft.ifftn(fft))


def _gaussian_blur(data, sigmas):
    """Separable FFT-domain Gaussian blur (anti-alias prefilter)."""
    fft = hfft.fftn(jnp.asarray(data, jnp.float32))
    for ax, sigma in enumerate(sigmas):
        if sigma <= 0:
            continue
        f = np.fft.fftfreq(data.shape[ax]).astype(np.float32)
        g = np.exp(-2 * (np.pi * f * sigma) ** 2)
        shape = [1] * data.ndim
        shape[ax] = -1
        fft = fft * jnp.asarray(g).reshape(shape)
    return jnp.real(hfft.ifftn(fft))


def down_scale(data, target_apix: float, apix_orig: float):
    """Anti-aliased down-scale of a 2D image to a larger pixel size.

    Gaussian anti-alias prefilter (sigma matching skimage's
    ``(1/scale - 1)/2``) followed by cubic resampling, then zero-padded to
    even dimensions (reference filters.py:375-412).
    """
    if target_apix == apix_orig:
        return jnp.asarray(data)
    if target_apix < apix_orig:
        logger.warning(
            "the input image pixel size (%s) is larger than --target_apix2d=%s. "
            "Down-scaling skipped",
            apix_orig,
            target_apix,
        )
        return jnp.asarray(data)

    scale = apix_orig / target_apix
    ny0, nx0 = data.shape
    # one jitted executable: eagerly, the cubic-spline prefilter's
    # lax.scan dispatches per step and this whole resample cost ~0.5 s
    # on a 128x256 image; jitted it is ~ms (cached on shape + scale)
    return _down_scale_jit(int(ny0), int(nx0), float(scale))(
        jnp.asarray(data)
    )


@functools.lru_cache(maxsize=64)
def _down_scale_jit(ny0: int, nx0: int, scale: float):
    from .interp import map_coordinates
    from .transforms import pad_to_size

    ny1 = int(round(ny0 * scale))
    nx1 = int(round(nx0 * scale))
    sigma = (1.0 / scale - 1.0) / 2.0
    ny2, nx2 = ny1 + ny1 % 2, nx1 + nx1 % 2

    def f(data):
        blurred = _gaussian_blur(data, (sigma, sigma))
        rr = (jnp.arange(ny1, dtype=jnp.float32) + 0.5) / scale - 0.5
        cc = (jnp.arange(nx1, dtype=jnp.float32) + 0.5) / scale - 0.5
        R, C = jnp.meshgrid(rr, cc, indexing="ij")
        out = map_coordinates(blurred, (R, C), order=3, mode="mirror")
        return pad_to_size(out, (ny2, nx2))

    return jax.jit(f)


def generate_tapering_filter(image_size, fraction_start=(0.8, 0.8), fraction_slope: float = 0.1):
    """Cosine edge taper: 1 inside fraction_start, cosine falloff outside."""
    ny, nx = image_size
    fy, fx = fraction_start
    if not (0 < fy < 1 or 0 < fx < 1):
        return jnp.ones((ny, nx), jnp.float32)
    Y = jnp.abs((jnp.arange(ny, dtype=jnp.float32) - ny // 2) / (ny // 2))[:, None]
    X = jnp.abs((jnp.arange(nx, dtype=jnp.float32) - nx // 2) / (nx // 2))[None, :]
    filt = jnp.ones((ny, nx), jnp.float32)
    if 0 < fy < 1:
        t = (Y - fy) / fraction_slope
        w = (1.0 + jnp.cos(t * jnp.pi)) / 2.0
        w = jnp.where(Y < fy, 1.0, jnp.where(Y > fy + fraction_slope, 0.0, w))
        filt = filt * w
    if 0 < fx < 1:
        t = (X - fx) / fraction_slope
        w = (1.0 + jnp.cos(t * jnp.pi)) / 2.0
        w = jnp.where(X < fx, 1.0, jnp.where(X > fx + fraction_slope, 0.0, w))
        filt = filt * w
    return filt


def randomize_phases_lowpass(data, apix: float, cutoff_res: float, return_fft: bool = False, key=None):
    """Randomize phases beyond a resolution cutoff, keeping amplitudes.

    Chen et al. 2013 phase randomization for true-FSC estimation
    (reference filters.py:469-520). Pass a jax PRNG *key* for
    reproducibility; otherwise a fresh seed is drawn from numpy.
    """
    data = jnp.asarray(data, jnp.float32)
    F = hfft.rfftn(data)
    amp = jnp.abs(F)
    phase = jnp.angle(F)

    cutoff2 = (apix / cutoff_res) ** 2
    n = data.shape[-1]
    k2 = np.fft.fftfreq(n) ** 2
    kr2 = np.fft.rfftfreq(n) ** 2
    mask = (
        k2[:, None, None] + k2[None, :, None] + kr2[None, None, :]
    ) >= cutoff2
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    rand = jax.random.uniform(key, phase.shape, minval=0.0, maxval=2 * np.pi)
    rand = jnp.angle(jnp.exp(1j * rand))
    phase = jnp.where(jnp.asarray(mask), rand, phase)
    F2 = amp * jnp.exp(1j * phase)
    if return_fft:
        return F2
    return hfft.irfftn(F2, s=data.shape)
