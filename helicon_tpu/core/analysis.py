"""Quality metrics and geometric analysis (JAX + host-side pandas ops).

Parity map (reference: /root/reference/src/helicon/lib/analysis.py):
  calc_fsc / calc_fsc_from_fft / calc_fsc_per_shell .. shell-binned FSC
  calc_frc_2d / frc_score  .. 2D Fourier ring correlation (293-484)
  ssim/ms_ssim/mutual_information/r_factor scores .. (487-642), native
      implementations here (skimage is not a dependency of this build)
  estimate_helix_rotation_center_diameter .. weighted moments (645-728)
  get_cylindrical_mask     .. (731-774)
  cosine/xcorr/elbow/line_fit .. (777-911)
  helical-tube metadata ops .. (914-1134), pandas host-side
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as hfft

import logging

logger = logging.getLogger(__name__)

__all__ = [
    "calc_fsc",
    "calc_fsc_from_fft",
    "calc_fsc_per_shell",
    "calc_frc_2d",
    "cosine_similarity",
    "cross_correlation_coefficient",
    "estimate_helix_rotation_center_diameter",
    "find_elbow_point",
    "frc_score",
    "get_cylindrical_mask",
    "is_3d",
    "is_amyloid",
    "line_fit_projection",
    "ms_ssim_score",
    "ms_ssim_score_traced",
    "mutual_information_score",
    "mutual_information_score_traced",
    "ssim_score_traced",
    "r_factor_score",
    "ssim_score",
    "twist2pitch",
    "estimate_inter_segment_distance",
    "estimate_helicalTube_length",
    "reset_inter_segment_distance",
]


def is_3d(data) -> bool:
    """True for cubic or z-elongated rectangular 3D volumes."""
    if data.ndim != 3:
        return False
    nz, ny, nx = data.shape
    return (nz == ny == nx) or (nz > ny and ny == nx)


def is_amyloid(emdb_id) -> bool:
    """True when the EMDB ID appears in the amyloid atlas."""
    if not isinstance(emdb_id, str):
        return False
    from ..io.dataset import EMDB

    return emdb_id.split("-")[-1].split("_")[-1] in EMDB().amyloid_atlas_ids()


def twist2pitch(twist: float, rise: float, return_pitch_for_4p75Angstrom_rise: bool = True) -> float:
    """Helical pitch from twist/rise, optionally re-expressed at rise≈4.75Å."""
    from ..angular import set_angle_range

    if not return_pitch_for_4p75Angstrom_rise:
        return rise * 360 / abs(twist)
    rise_star = abs(rise)
    twist_star = abs(twist)
    for n in range(10, 1, -1):
        cond = (rise * n < 5) and (4.5 < rise * n)
        tmp_twist = abs(set_angle_range(twist_star * n, range=(-180, 180)))
        cond = cond and (tmp_twist < 90)
        if cond:
            twist_star = tmp_twist
            rise_star = rise_star * n
            break
    return rise_star * 360 / twist_star


# ---------------------------------------------------------------------------
# FSC / FRC
# ---------------------------------------------------------------------------


def _shell_labels_3d(n: int) -> np.ndarray:
    k2 = np.fft.fftfreq(n) ** 2
    kr2 = np.fft.rfftfreq(n) ** 2
    shell = np.round(
        np.sqrt(k2[:, None, None] + k2[None, :, None] + kr2[None, None, :]) * n
    ).astype(np.int32)
    return np.clip(shell, 0, n // 2)


def _binned_fsc(F1, F2, labels, nshells):
    """Shell sums in float64 numpy bincount, matching the reference's
    float64 binning (analysis.py calc_fsc): float32 scatter-adds over
    ~1e7 coefficients spanning many orders (the DC term dominates) lose
    enough precision to move FSC values near the 0.143 threshold. All
    callers consume the result on the host."""
    labels = np.asarray(labels).ravel()
    p = np.asarray(F1).ravel().astype(np.complex128)
    q = np.asarray(F2).ravel().astype(np.complex128)
    num = np.bincount(labels, weights=np.real(p * np.conj(q)), minlength=nshells)[:nshells]
    d1 = np.bincount(labels, weights=np.abs(p) ** 2, minlength=nshells)[:nshells]
    d2 = np.bincount(labels, weights=np.abs(q) ** 2, minlength=nshells)[:nshells]
    denom = np.sqrt(d1 * d2)
    return np.where(denom > 0, num / np.where(denom > 0, denom, 1.0), 1.0)


def calc_fsc(map1, map2, apix, F1=None, F2=None, shell_flat=None, n=None):
    """FSC between two 3D maps: columns (spatial freq 1/Å, fsc)."""
    if n is None:
        n = map1.shape[0] if F1 is None else F1.shape[0]
    df = 1.0 / (apix * n)
    if shell_flat is None:
        labels = _shell_labels_3d(n)
    else:
        labels = np.asarray(shell_flat).reshape((n, n, n // 2 + 1))
    if F1 is None:
        F1 = hfft.rfftn(jnp.asarray(map1, jnp.float32))
    if F2 is None:
        F2 = hfft.rfftn(jnp.asarray(map2, jnp.float32))
    fsc = np.asarray(_binned_fsc(jnp.asarray(F1), jnp.asarray(F2), labels, n // 2 + 1))
    qx_max = np.fft.rfftfreq(n).max()
    saxis = np.arange(n // 2 + 1) * df
    idx = saxis <= qx_max
    return np.vstack((saxis[idx], fsc[idx])).T


def calc_fsc_from_fft(F1, F2, n, apix):
    """FSC from precomputed rfftn arrays."""
    return calc_fsc(None, None, apix, F1=F1, F2=F2, n=n)


def calc_fsc_per_shell(map1, map2, apix):
    """EMAN2-style per-shell FSC over the full (fftn) grid; index = shell."""
    n = map1.shape[0]
    F1 = hfft.fftn(jnp.asarray(map1, jnp.float32))
    F2 = hfft.fftn(jnp.asarray(map2, jnp.float32))
    k2 = np.fft.fftfreq(n) ** 2
    shell = np.round(
        np.sqrt(k2[:, None, None] + k2[None, :, None] + k2[None, None, :]) * n
    ).astype(np.int32)
    shell = np.clip(shell, 0, n // 2)
    return np.asarray(_binned_fsc(F1, F2, shell, n // 2 + 1))


def calc_frc_2d(img1, img2, apix):
    """2D Fourier ring correlation: (spatial freqs 1/Å, frc curve)."""
    if img1.shape != img2.shape:
        raise ValueError(f"Image shapes must match: {img1.shape} vs {img2.shape}")
    h, w = img1.shape
    n_shells = min(h, w) // 2
    F1 = hfft.fft2(jnp.asarray(img1, jnp.float32))
    F2 = hfft.fft2(jnp.asarray(img2, jnp.float32))
    kx = np.fft.fftfreq(w) ** 2
    ky = np.fft.fftfreq(h) ** 2
    kr = np.sqrt(ky[:, None] + kx[None, :])
    shell = np.clip(np.round(kr * n_shells).astype(np.int32), 0, n_shells)
    fsc = np.asarray(_binned_fsc(F1, F2, shell, n_shells + 1))
    saxis = np.arange(n_shells + 1) / (min(h, w) * apix)
    return saxis, fsc


def _fit_frc_curve(saxis, fsc):
    """Fit a Fermi or Butterworth falloff to an FRC curve (host-side)."""
    from scipy.optimize import minimize

    mask = np.isfinite(fsc) & (fsc >= -0.1) & (fsc <= 1.1)
    s_fit, f_fit = saxis[mask], fsc[mask]
    if len(s_fit) < 3:
        return saxis, fsc

    def fermi(mu, T, x):
        return 1.0 / (np.exp((x - mu) / T) + 1.0)

    def score_fermi(p):
        mu, T = p
        if T <= 0:
            return 1e10
        a = 1.0 / fermi(mu, T, 0.0)
        return np.mean(np.abs(f_fit - a * fermi(mu, T, s_fit)))

    def score_bw(p):
        omega, order = p
        if omega <= 0 or order <= 0:
            return 1e10
        return np.mean(np.abs(f_fit - 1.0 / (1.0 + (s_fit / omega) ** order)))

    x0 = s_fit[len(s_fit) // 2]
    best_err, best = np.inf, (s_fit.copy(), f_fit.copy())
    rf = minimize(score_fermi, x0=[x0, 0.01], method="Nelder-Mead",
                  options={"maxiter": 1000, "xatol": 1e-6})
    if rf.fun < best_err:
        best_err = rf.fun
        mu, T = rf.x
        a = 1.0 / fermi(mu, T, 0.0)
        s_fine = np.linspace(saxis[1], saxis[-1], 500)
        best = (s_fine, np.clip(a * fermi(mu, T, s_fine), -1, 1))
    rb = minimize(score_bw, x0=[x0, 2.0], method="Nelder-Mead",
                  options={"maxiter": 1000, "xatol": 1e-6})
    if rb.fun < best_err:
        omega, order = rb.x
        s_fine = np.linspace(saxis[1], saxis[-1], 500)
        best = (s_fine, np.clip(1.0 / (1.0 + (s_fine / omega) ** order), -1, 1))
    return best


def frc_score(img1, img2, apix, use_fit: bool = False) -> float:
    """Scalar similarity from the FRC curve (mean or fitted-area)."""
    saxis, fsc = calc_frc_2d(img1, img2, apix)
    if use_fit:
        s_fine, f_fine = _fit_frc_curve(saxis, fsc)
        valid = np.isfinite(f_fine) & (f_fine >= -1) & (f_fine <= 1)
        if valid.sum() == 0:
            return 0.0
        area = np.trapezoid(f_fine[valid], s_fine[valid])
        span = s_fine[valid][-1] - s_fine[valid][0]
        return float(area / span) if span > 0 else 0.0
    valid = np.isfinite(fsc) & (fsc >= -1) & (fsc <= 1)
    return float(np.mean(fsc[valid])) if valid.sum() else 0.0


# ---------------------------------------------------------------------------
# image similarity scores (native implementations)
# ---------------------------------------------------------------------------


def _uniform_filter(x, size: int = 7):
    """Separable box filter with reflect padding (scipy uniform_filter)."""
    pad = size // 2
    for ax in range(x.ndim):
        xp = jnp.moveaxis(x, ax, 0)
        padded = jnp.pad(xp, [(pad, pad)] + [(0, 0)] * (x.ndim - 1), mode="reflect")
        csum = jnp.cumsum(
            jnp.concatenate([jnp.zeros_like(padded[:1]), padded], axis=0), axis=0
        )
        out = (csum[size:] - csum[:-size]) / size
        x = jnp.moveaxis(out, 0, ax)
    return x


def _ssim_map(img1, img2, data_range, win_size: int = 7):
    """SSIM map matching skimage structural_similarity defaults."""
    K1, K2 = 0.01, 0.03
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    ux = _uniform_filter(img1, win_size)
    uy = _uniform_filter(img2, win_size)
    uxx = _uniform_filter(img1 * img1, win_size)
    uyy = _uniform_filter(img2 * img2, win_size)
    uxy = _uniform_filter(img1 * img2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    num = (2 * ux * uy + C1) * (2 * vxy + C2)
    den = (ux**2 + uy**2 + C1) * (vx + vy + C2)
    return num / den


def ssim_score(img1, img2) -> float:
    """Mean SSIM, skimage-compatible (win=7, uniform windows, edge crop)."""
    if img1.shape != img2.shape:
        raise ValueError(f"Image shapes must match: {img1.shape} vs {img2.shape}")
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    data_range = float(
        max(float(jnp.max(a) - jnp.min(a)), float(jnp.max(b) - jnp.min(b)))
    )
    if data_range == 0:
        return 0.0
    win = 7
    if min(img1.shape) < win:
        return 0.0
    smap = _ssim_map(a, b, data_range, win)
    pad = (win - 1) // 2
    core = smap[pad:-pad, pad:-pad] if pad else smap
    return float(jnp.mean(core))


def _rescale_half(img):
    """Anti-aliased 0.5x rescale (gaussian sigma=0.5 + bilinear)."""
    from .filters import _gaussian_blur
    from .interp import map_coordinates

    blurred = _gaussian_blur(img, (0.5, 0.5))
    ny, nx = img.shape
    my, mx = int(round(ny * 0.5)), int(round(nx * 0.5))
    rr = (jnp.arange(my, dtype=jnp.float32) + 0.5) * 2.0 - 0.5
    cc = (jnp.arange(mx, dtype=jnp.float32) + 0.5) * 2.0 - 0.5
    R, C = jnp.meshgrid(rr, cc, indexing="ij")
    return map_coordinates(blurred, (R, C), order=1, mode="mirror")


def ms_ssim_score(img1, img2) -> float:
    """Multi-scale SSIM: per-scale SSIM combined with standard weights."""
    if img1.shape != img2.shape:
        raise ValueError(f"Image shapes must match: {img1.shape} vs {img2.shape}")
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    all_weights = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    min_size = 8
    values = []
    for i in range(len(all_weights)):
        h, w = a.shape
        if h < min_size or w < min_size:
            break
        data_range = float(max(float(jnp.max(a) - jnp.min(a)), float(jnp.max(b) - jnp.min(b))))
        if data_range == 0:
            break
        values.append(max(ssim_score(a, b), 0.0))
        if i < len(all_weights) - 1:
            a = _rescale_half(a)
            b = _rescale_half(b)
    if not values:
        return 0.0
    weights = all_weights[: len(values)]
    weights = weights / weights.sum()
    result = 1.0
    for s, w in zip(values, weights):
        result *= s**w
    return float(result)


def mutual_information_score(img1, img2, bins: int = 64) -> float:
    """Normalized mutual information (Studholme 1999) minus 1, in [0, 1]."""
    if img1.shape != img2.shape:
        raise ValueError(f"Image shapes must match: {img1.shape} vs {img2.shape}")
    a = np.asarray(img1, np.float64).ravel()
    b = np.asarray(img2, np.float64).ravel()
    hist, _, _ = np.histogram2d(a, b, bins=bins)
    pxy = hist / hist.sum()
    px = pxy.sum(axis=1)
    py = pxy.sum(axis=0)

    def H(p):
        p = p[p > 0]
        return -np.sum(p * np.log(p))

    hxy = H(pxy.ravel())
    if hxy == 0:
        return 0.0
    nmi = (H(px) + H(py)) / hxy
    return float(nmi - 1.0)


def ssim_score_traced(img1, img2):
    """Jittable mean SSIM (traced data_range; same windows/crop as
    :func:`ssim_score`). Returns a jnp scalar; constant images score 0."""
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    win = 7
    if min(a.shape) < win:
        return jnp.float32(0.0)
    dr = jnp.maximum(jnp.max(a) - jnp.min(a), jnp.max(b) - jnp.min(b))
    smap = _ssim_map(a, b, jnp.maximum(dr, 1e-30), win)
    pad = (win - 1) // 2
    core = smap[pad:-pad, pad:-pad] if pad else smap
    return jnp.where(dr > 0, jnp.mean(core), 0.0)


def ms_ssim_score_traced(img1, img2):
    """Jittable multi-scale SSIM. The scale count is static (set by the
    image shape); a constant image at any scale scores that scale 0, which
    zeroes the product (the eager version truncates the scale list instead
    — a measure-zero edge case)."""
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    all_weights = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    min_size = 8
    values = []
    for i in range(len(all_weights)):
        h, w = a.shape
        if h < min_size or w < min_size:
            break
        values.append(jnp.maximum(ssim_score_traced(a, b), 0.0))
        if i < len(all_weights) - 1:
            a = _rescale_half(a)
            b = _rescale_half(b)
    if not values:
        return jnp.float32(0.0)
    weights = all_weights[: len(values)]
    weights = weights / weights.sum()
    result = jnp.float32(1.0)
    for s, wgt in zip(values, weights):
        result = result * s ** jnp.float32(wgt)
    return result


def mutual_information_score_traced(img1, img2, bins: int = 64):
    """Jittable normalized mutual information minus 1 (cf. the eager
    :func:`mutual_information_score`; float32 histogram instead of f64)."""
    a = jnp.asarray(img1, jnp.float32).ravel()
    b = jnp.asarray(img2, jnp.float32).ravel()
    hist, _, _ = jnp.histogram2d(a, b, bins=bins)
    pxy = hist / jnp.maximum(hist.sum(), 1e-30)
    px = pxy.sum(axis=1)
    py = pxy.sum(axis=0)

    def H(p):
        return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0))

    hxy = H(pxy.ravel())
    nmi = (H(px) + H(py)) / jnp.maximum(hxy, 1e-30)
    return jnp.where(hxy > 0, nmi - 1.0, 0.0)


def r_factor_score(img1, img2) -> float:
    """1/(1+R) with crystallographic R = sum|a-b| / sum|b|."""
    if img1.shape != img2.shape:
        raise ValueError(f"Shapes must match: {img1.shape} vs {img2.shape}")
    denom = float(jnp.sum(jnp.abs(jnp.asarray(img2))))
    if denom == 0:
        return 0.0
    r = float(jnp.sum(jnp.abs(jnp.asarray(img1) - jnp.asarray(img2)))) / denom
    return float(1.0 / (1.0 + r))


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def _binary_closing(mask: np.ndarray) -> np.ndarray:
    """Binary closing with a 3x3 cross (edge values kept, skimage-like)."""
    from scipy import ndimage as ndi

    structure = ndi.generate_binary_structure(2, 1)
    dil = ndi.binary_dilation(mask, structure=structure)
    return ndi.binary_erosion(dil, structure=structure, border_value=1)


def estimate_helix_rotation_center_diameter(
    data, estimate_rotation: bool = True, estimate_center: bool = True, threshold: float = 0
):
    """Grayscale-moment estimate of helix rotation, y-shift, and diameter.

    Mirrors reference analysis.py:645-728: threshold+closing mask, then
    intensity-weighted second moments give the principal axis angle; the
    image is rotated level and the centroid/extent measured again.
    Returns (rotation_deg, shift_y, diameter_px).
    """
    from .transforms import transform_image
    from ..angular import set_to_periodic_range

    data = np.asarray(data, np.float32)
    ny, nx = data.shape

    def weighted_params(mask, intensity):
        ys, xs = np.where(mask)
        if len(ys) < 2:
            return 0.0, 0.0, ny
        w = intensity[ys, xs].astype(np.float64)
        w = w - w.min() + 1e-8
        cw = w.sum()
        cy = (ys * w).sum() / cw
        cx = (xs * w).sum() / cw
        uy = ys - cy
        ux = xs - cx
        i_yy = (uy * uy * w).sum() / cw
        i_xx = (ux * ux * w).sum() / cw
        i_xy = (uy * ux * w).sum() / cw
        theta = 0.5 * math.atan2(2.0 * i_xy, i_yy - i_xx)
        angle = math.degrees(theta) + 90.0
        if abs(angle) > 90.0:
            angle -= 180.0
        diameter = int(ys.max() - ys.min() + 1)
        shift = ny // 2 - cy if estimate_center else 0.0
        return angle, shift, diameter

    mask = _binary_closing(data > threshold)
    if not mask.any():
        return 0.0, 0.0, ny

    if estimate_rotation:
        rotation, _, _ = weighted_params(mask, data)
        rotation = set_to_periodic_range(rotation, min=-180, max=180)
        data_rot = np.asarray(transform_image(data, rotation=rotation))
    else:
        rotation = 0.0
        data_rot = data

    mask_rot = _binary_closing(data_rot > threshold)
    if not mask_rot.any():
        return rotation, 0.0, ny
    _, shift_y, diameter = weighted_params(mask_rot, data_rot)
    return rotation, shift_y, diameter


def get_cylindrical_mask(nz, ny, nx, rmin=0, rmax=-1, return_xyz: bool = False):
    """Boolean cylinder mask (axis = Z); optionally the (Z, Y, X) grids."""
    k = np.arange(nz, dtype=np.int32) - nz // 2
    j = np.arange(ny, dtype=np.int32) - ny // 2
    i = np.arange(nx, dtype=np.int32) - nx // 2
    Z, Y, X = np.meshgrid(k, j, i, indexing="ij")
    if rmax < 0:
        rmax = ny // 2 - 1
    mask = X * X + Y * Y < rmax * rmax
    if 0 < rmin < rmax:
        mask &= X * X + Y * Y >= rmin * rmin
    if return_xyz:
        return mask, (Z, Y, X)
    return mask


def cross_correlation_coefficient(a, b) -> float:
    """Pearson cross-correlation of two arrays (0 for constant inputs)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    da = a - jnp.mean(a)
    db = b - jnp.mean(b)
    norm = jnp.sqrt(jnp.sum(da**2) * jnp.sum(db**2))
    return float(jnp.where(norm == 0, 0.0, jnp.sum(da * db) / jnp.where(norm == 0, 1.0, norm)))


def cosine_similarity(a, b):
    """Cosine similarity of two vectors (0 when either is zero)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    norm = jnp.linalg.norm(a) * jnp.linalg.norm(b)
    return float(jnp.where(norm == 0, 0.0, jnp.sum(a * b) / jnp.where(norm == 0, 1.0, norm)))


def find_elbow_point(curve) -> int:
    """Index of max distance from the first-to-last chord (knee point)."""
    curve = np.asarray(curve, np.float64)
    n = len(curve)
    pts = np.stack([np.arange(n), curve], axis=1)
    vec = pts[-1] - pts[0]
    vec = vec / np.linalg.norm(vec)
    rel = pts - pts[0]
    proj = rel @ vec
    perp = rel - np.outer(proj, vec)
    return int(np.argmax(np.linalg.norm(perp, axis=1)))


def line_fit_projection(x, y, w=None, ref_i: int = 0, return_xy_fit: bool = False):
    """Project points onto a total-least-squares line; signed positions.

    Equivalent to the reference's scipy-ODR unilinear fit
    (analysis.py:857-911): orthogonal regression of a line is the
    principal axis of the (weighted) covariance.
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    weights = np.ones_like(x) if w is None else np.asarray(w, np.float64)
    wsum = weights.sum()
    cx = (x * weights).sum() / wsum
    cy = (y * weights).sum() / wsum
    dx, dy = x - cx, y - cy
    sxx = (weights * dx * dx).sum()
    syy = (weights * dy * dy).sum()
    sxy = (weights * dx * dy).sum()
    theta = 0.5 * math.atan2(2 * sxy, sxx - syy)
    v = np.array([math.cos(theta), math.sin(theta)])
    t = dx * v[0] + dy * v[1]
    x2 = cx + t * v[0]
    y2 = cy + t * v[1]
    v0 = np.array([x2[-1] - x2[0], y2[-1] - y2[0]])
    v0 = v0 / np.linalg.norm(v0)
    pos = (x2 - x2[ref_i]) * v0[0] + (y2 - y2[ref_i]) * v0[1]
    if return_xy_fit:
        return pos, np.vstack((x2, y2)).T
    return pos


# ---------------------------------------------------------------------------
# helical-tube metadata ops (pandas host-side)
# ---------------------------------------------------------------------------


def estimate_inter_segment_distance(data):
    """(median, mean, std, n_max) of inter-segment distances per tube."""
    for attr in ("rlnImageName", "rlnHelicalTubeID", "rlnHelicalTrackLengthAngst"):
        if attr not in data:
            return None, None, None, None
    df = data.copy()
    parts = df["rlnImageName"].str.split("@", expand=True)
    df["pid"] = parts.iloc[:, 0].astype(int)
    df["micrograph"] = parts.iloc[:, 1]
    df = df.sort_values(["micrograph", "pid"]).reset_index(drop=True)

    dists_all, lengths = [], []
    for _, particles in df.groupby(["micrograph", "rlnHelicalTubeID"], sort=False):
        track = particles["rlnHelicalTrackLengthAngst"].astype(np.float32).values
        lengths.append(track.max())
        if len(particles) < 2:
            continue
        srt = np.sort(track)
        dists_all.append(srt[1:] - srt[:-1])
    if not dists_all:
        return None, None, None, None
    dists_all = np.hstack(dists_all)
    med = np.median(dists_all)
    n_max = int(np.sum(np.round(np.array(lengths) / med) + 1))
    return med, float(np.mean(dists_all)), float(np.std(dists_all)), n_max


def reset_inter_segment_distance(
    data, new_inter_segment_distance, apix_micrograph,
    current_inter_segment_distance=-1, verbose: int = 0,
):
    """Resample segment picks along each fitted filament line so segments
    are *new_inter_segment_distance* apart (reference analysis.py:969-1075)."""
    import pandas as pd

    if (
        current_inter_segment_distance > 0
        and new_inter_segment_distance == current_inter_segment_distance
    ):
        return data
    for attr in ("rlnHelicalTubeID", "rlnCoordinateX", "rlnCoordinateY"):
        if attr not in data:
            return None
    if "rlnImageName" not in data:
        return None
    parts = data["rlnImageName"].str.split("@", expand=True)
    data = data.copy()
    data["risd_pid"] = parts.iloc[:, 0].astype(int)
    data["risd_filename"] = parts.iloc[:, 1]
    filename = "rlnMicrographName" if "rlnMicrographName" in data else "risd_filename"

    if current_inter_segment_distance <= 0:
        current_inter_segment_distance = estimate_inter_segment_distance(data)[0]
    if new_inter_segment_distance == current_inter_segment_distance:
        return data.drop(columns=["risd_filename", "risd_pid"])

    cdist = current_inter_segment_distance / apix_micrograph
    ndist = new_inter_segment_distance / apix_micrograph

    chunks = []
    for _, particles in data.groupby([filename, "rlnHelicalTubeID"], sort=False):
        if len(particles) < 2:
            chunks.append(particles.reset_index(drop=True))
            continue
        srt = particles.sort_values("risd_pid").reset_index(drop=True)
        x = srt["rlnCoordinateX"].astype(float).values
        y = srt["rlnCoordinateY"].astype(float).values
        pos, xy_fit = line_fit_projection(x, y, ref_i=0, return_xy_fit=True)
        n0 = len(pos)
        unit = (xy_fit[-1] - xy_fit[0]) / (pos[-1] - pos[0])
        right = np.arange(pos[0], pos[-1] + cdist / 2 + 0.1, ndist)
        left = np.arange(pos[0] - ndist, pos[0] - cdist / 2, -ndist)
        pos_new = np.hstack((np.sort(left), right)) if len(left) else right
        n = len(pos_new)
        xy_new = xy_fit[0] + pos_new.reshape((n, 1)) * unit
        if n <= n0:
            chunk = srt.iloc[:n].reset_index(drop=True)
        else:
            chunk = srt.iloc[:n0].reset_index(drop=True)
            repeats = chunk.iloc[[len(chunk) - 1] * (n - n0)]
            chunk = pd.concat([chunk, repeats], ignore_index=True)
        chunk.loc[:, "rlnCoordinateX"] = xy_new[:, 0]
        chunk.loc[:, "rlnCoordinateY"] = xy_new[:, 1]
        if "rlnHelicalTrackLengthAngst" in chunk:
            chunk.loc[:, "rlnHelicalTrackLengthAngst"] = (
                pos_new - pos_new[0]
            ) * apix_micrograph
        chunks.append(chunk)

    # pandas 3 propagates attrs through concat and compares them with
    # `==`, which raises on DataFrame-valued attrs (the optics table);
    # strip before concat and restore after.
    attrs = dict(data.attrs)
    for c in chunks:
        c.attrs = {}
    out = pd.concat(chunks).drop(columns=["risd_filename", "risd_pid"])
    out.attrs.update(attrs)
    return out


def estimate_helicalTube_length(data, inter_segment_distance=-1, verbose: int = 0):
    """Add ``rlnHelicalTubeLength`` (Å) per filament to the dataframe."""
    for attr in ("rlnHelicalTubeID", "rlnCoordinateX", "rlnCoordinateY"):
        if attr not in data:
            return None
    if "rlnImageName" not in data:
        return None
    parts = data["rlnImageName"].str.split("@", expand=True)
    data = data.copy()
    data["ehl_pid"] = parts.iloc[:, 0].astype(int)
    data["ehl_filename"] = parts.iloc[:, 1]
    filename = "rlnMicrographName" if "rlnMicrographName" in data else "ehl_filename"

    if inter_segment_distance is not None and inter_segment_distance <= 0:
        inter_segment_distance = estimate_inter_segment_distance(data)[0]
    # (the reference crashes here when the distance is inestimable —
    # rlnHelicalTrackLengthAngst absent, reference analysis.py:1116-1130;
    # fall back to the coordinate path length instead)
    apix = None
    if inter_segment_distance is None:
        from ..io.metadata import getPixelSize

        apix = getPixelSize(data)
        if apix is None:
            logger.warning(
                "no rlnHelicalTrackLengthAngst and no pixel size: "
                "rlnHelicalTubeLength will be in PIXELS, not Angstrom"
            )
            apix = 1.0

    for _, particles in data.groupby([filename, "rlnHelicalTubeID"], sort=False):
        if "rlnHelicalTrackLengthAngst" in particles:
            length = round(particles["rlnHelicalTrackLengthAngst"].max(), 1)
        elif inter_segment_distance is not None:
            pids = particles["ehl_pid"].astype(int).values
            length = round((pids.max() - pids.min() + 1) * inter_segment_distance, 1)
        else:
            srt = particles.sort_values("ehl_pid")
            dx = np.diff(srt["rlnCoordinateX"].astype(float).values)
            dy = np.diff(srt["rlnCoordinateY"].astype(float).values)
            length = round(float(np.hypot(dx, dy).sum()) * apix, 1)
        data.loc[particles.index, "rlnHelicalTubeLength"] = length

    return data.drop(columns=["ehl_filename", "ehl_pid"])
