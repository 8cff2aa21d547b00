"""Curvelet transforms + denoising (JAX, FFT-based tight frame).

Reference: lib/curvelet.py (2291 LoC) wraps three external engines
(curvepy-fdct FDCT, the `curvelets` UDCT package with optional torch GPU,
and a monogenic MCT via Riesz transforms) plus tiling machinery with
cosine tapers. None of those packages exist here, so this module builds a
native uniform discrete curvelet-style transform:

* frequency-domain windows = (Meyer-like radial annuli) x (smooth angular
  wedges), numerically normalized so sum_k U_k^2 = 1 — an exact tight
  frame, so  x = sum_k IFFT(FFT(c_k) . U_k)  reconstructs perfectly;
* number of wedges doubles every other scale (parabolic scaling, as
  curvelets require);
* denoising thresholds each band at threshold_sigma times the band's
  noise level (MAD estimate on the finest scale, scaled by the window
  norms), mirroring the reference's MAD-sigma per-band thresholding
  (curvelet.py:99-200);
* MCT: monogenic extension via Riesz x/y kernels (curvelet.py:789-1006);
* 3D maps use directional windows: radial annuli x antipodally-symmetric
  spherical-cap wedges around Fibonacci-spread directions, doubling every
  other scale — the native analog of the UDCT 3D orientation selectivity
  (curvelet.py:1407-2291); n_dirs=0 selects cheap isotropic radial bands;
* tiled variants apply the 2D transform on overlapping tiles blended
  with cosine tapers (curvelet.py:1008-1405).

All transforms route through core.fft (TPU matmul-DFT fallback).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as hfft

__all__ = [
    "curvelet_bands_2d",
    "curvelet_bands_3d",
    "curvelet_transform_2d",
    "curvelet_inverse_2d",
    "denoise_curvelet_2d",
    "denoise_curvelet_3d",
    "denoise_curvelet_2d_tiled",
    "riesz_transform_2d",
]


def _meyer_ramp(t):
    """Smooth 0->1 ramp (C^1) on [0, 1]."""
    t = np.clip(t, 0.0, 1.0)
    return t * t * (3 - 2 * t)


@functools.lru_cache(maxsize=16)
def _windows_2d(ny: int, nx: int, n_scales: int, n_angles_coarse: int):
    """Tight-frame window stack (K, ny, nx) in UNSHIFTED fft layout
    (np.fft.fftfreq ordering: DC at index [0, 0]) — multiply directly
    against an unshifted fft2 spectrum.

    Band 0 is the lowpass; then per scale j (fine to coarse ordering of
    radius), n_angles_coarse * 2^(j//2) angular wedges.
    """
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    r = np.sqrt(fy * fy + fx * fx) / 0.5  # normalized radius, 1 = Nyquist
    theta = np.arctan2(fy, fx)  # [-pi, pi]

    # radial annuli: geometric scales between r=1 and r=2^-n_scales
    edges = [2.0 ** (-(n_scales - j)) for j in range(n_scales + 1)]  # low->high
    raws = []
    # lowpass
    lp = 1.0 - _meyer_ramp((r - 0.5 * edges[0]) / (0.5 * edges[0] + 1e-12))
    raws.append(lp)
    meta = [(-1, 0)]  # (scale, wedge)
    for j in range(n_scales):
        lo, hi = edges[j], edges[j + 1]
        rad = _meyer_ramp((r - 0.5 * lo) / (0.5 * lo)) * (
            1.0 - _meyer_ramp((r - hi) / hi)
        )
        n_ang = max(1, n_angles_coarse * (2 ** (j // 2)))
        if n_ang == 1:
            raws.append(rad)
            meta.append((j, 0))
            continue
        width = 2 * np.pi / n_ang
        for a in range(n_ang):
            center = -np.pi + (a + 0.5) * width
            # wedge support spans 2*width so adjacent wedges overlap
            # smoothly (no zeros at shared boundaries -> true tight frame)
            d = np.angle(np.exp(1j * (theta - center)))  # wrapped distance
            ang = np.cos(np.clip(d / (2 * width), -0.5, 0.5) * np.pi) ** 2
            # include the antipodal wedge (real images: Hermitian symmetry)
            d2 = np.angle(np.exp(1j * (theta - center - np.pi)))
            ang = ang + np.cos(np.clip(d2 / (2 * width), -0.5, 0.5) * np.pi) ** 2
            raws.append(rad * ang)
            meta.append((j, a))
    raw = np.stack(raws)
    norm = np.sqrt(np.sum(raw * raw, axis=0))
    norm = np.where(norm > 1e-12, norm, 1.0)
    # cache NUMPY only (jnp arrays cached inside a jit trace leak tracers)
    U = (raw / norm).astype(np.float32)
    return U, meta


def curvelet_bands_2d(shape, n_scales: int = 4, n_angles: int = 8):
    """The (K, ny, nx) tight-frame window stack and band metadata."""
    ny, nx = shape
    U, meta = _windows_2d(ny, nx, n_scales, n_angles)
    return jnp.asarray(U), meta


def curvelet_transform_2d(image, n_scales: int = 4, n_angles: int = 8):
    """Forward transform: (K, ny, nx) complex band coefficients."""
    img = jnp.asarray(image, jnp.float32)
    U, _ = _windows_2d(img.shape[0], img.shape[1], n_scales, n_angles)
    F = hfft.fft2(img)
    return hfft.ifftn(F[None] * U, axes=(-2, -1))


def curvelet_inverse_2d(coeffs, n_scales: int = 4, n_angles: int = 8):
    """Inverse of curvelet_transform_2d (tight frame: apply U again, sum)."""
    ny, nx = coeffs.shape[-2:]
    U, _ = _windows_2d(ny, nx, n_scales, n_angles)
    F = hfft.fftn(coeffs, axes=(-2, -1))
    return jnp.real(hfft.ifftn(jnp.sum(F * U, axis=0), axes=(-2, -1)))


def _mad_sigma(x):
    med = jnp.median(x)
    return jnp.median(jnp.abs(x - med)) * 1.4826


def _elbow_threshold(mags):
    """Auto threshold at the elbow of the sorted-magnitude curve
    (reference curvelet.py:99-200: sigma=0 -> find_elbow_point on the
    sorted coefficient magnitudes)."""
    v = jnp.sort(mags.reshape(-1))
    n = v.shape[0]
    t = jnp.arange(n, dtype=jnp.float32) / jnp.maximum(1, n - 1)
    # distance of each point of the normalized curve from the chord
    vn = (v - v[0]) / jnp.maximum(v[-1] - v[0], 1e-12)
    d = vn - t
    return v[jnp.argmax(jnp.abs(d))]


def denoise_curvelet_2d(
    image,
    transform: str = "udct",
    threshold_sigma: float = 3.0,
    n_scales: int = 4,
    n_angles: int = 8,
):
    """Hard-threshold curvelet denoising of a 2D image.

    transform: "udct" (plain) or "mct" (monogenic: the modulus of the
    Riesz triple is thresholded; phase preserved).
    threshold_sigma <= 0 selects the threshold automatically at the
    elbow of the sorted coefficient magnitudes (reference sigma=0 mode).
    """
    img = jnp.asarray(image, jnp.float32)
    if transform == "mct":
        # monogenic thresholding (curvelet.py:789-1006 analog): the keep
        # decision uses the modulus of the Riesz triple per band — edges
        # whose energy lives in the odd (Riesz) components survive even
        # when the even component alone is sub-threshold.
        rx, ry = riesz_transform_2d(img)
        c0 = curvelet_transform_2d(img, n_scales, n_angles)
        cx = curvelet_transform_2d(rx, n_scales, n_angles)
        cy = curvelet_transform_2d(ry, n_scales, n_angles)
        mono = jnp.sqrt(jnp.abs(c0) ** 2 + jnp.abs(cx) ** 2 + jnp.abs(cy) ** 2)
        sigma = _mad_sigma(jnp.real(c0[-1]))
        _, meta = _windows_2d(img.shape[0], img.shape[1], n_scales, n_angles)
        kept = []
        for k, (scale, _) in enumerate(meta):
            if scale == -1:
                kept.append(c0[k])
                continue
            if threshold_sigma <= 0:
                thr = _elbow_threshold(mono[k])
            else:
                thr = threshold_sigma * sigma
            kept.append(jnp.where(mono[k] >= thr, c0[k], 0.0))
        return curvelet_inverse_2d(jnp.stack(kept), n_scales, n_angles)
    return _threshold_bands(img, threshold_sigma, n_scales, n_angles)


def _threshold_bands(img, threshold_sigma, n_scales, n_angles):
    coeffs = curvelet_transform_2d(img, n_scales, n_angles)
    mags = jnp.abs(coeffs)
    # noise level per band estimated from the finest-scale coefficients
    sigma = _mad_sigma(jnp.real(coeffs[-1]))
    U, meta = _windows_2d(img.shape[0], img.shape[1], n_scales, n_angles)
    kept = []
    for k, (scale, _) in enumerate(meta):
        if scale == -1:  # never threshold the lowpass
            kept.append(coeffs[k])
            continue
        if threshold_sigma <= 0:
            thr = _elbow_threshold(mags[k])
        else:
            thr = threshold_sigma * sigma
        kept.append(jnp.where(mags[k] >= thr, coeffs[k], 0.0))
    return curvelet_inverse_2d(jnp.stack(kept), n_scales, n_angles)


def riesz_transform_2d(image):
    """Riesz x/y components (monogenic signal, curvelet.py:789-1006)."""
    img = jnp.asarray(image, jnp.float32)
    ny, nx = img.shape
    fy = jnp.asarray(np.fft.fftfreq(ny))[:, None]
    fx = jnp.asarray(np.fft.fftfreq(nx))[None, :]
    norm = jnp.sqrt(fy * fy + fx * fx)
    norm = jnp.where(norm > 0, norm, 1.0)
    F = hfft.fft2(img)
    rx = jnp.real(hfft.ifftn(F * (-1j) * fx / norm, axes=(-2, -1)))
    ry = jnp.real(hfft.ifftn(F * (-1j) * fy / norm, axes=(-2, -1)))
    return rx, ry


@functools.lru_cache(maxsize=8)
def _radial_bands_3d(nz: int, ny: int, nx: int, n_scales: int):
    fz = np.fft.fftfreq(nz)[:, None, None]
    fy = np.fft.fftfreq(ny)[None, :, None]
    fx = np.fft.fftfreq(nx)[None, None, :]
    r = np.sqrt(fz * fz + fy * fy + fx * fx) / 0.5
    edges = [2.0 ** (-(n_scales - j)) for j in range(n_scales + 1)]
    raws = [1.0 - _meyer_ramp((r - 0.5 * edges[0]) / (0.5 * edges[0] + 1e-12))]
    for j in range(n_scales):
        lo, hi = edges[j], edges[j + 1]
        raws.append(
            _meyer_ramp((r - 0.5 * lo) / (0.5 * lo))
            * (1.0 - _meyer_ramp((r - hi) / hi))
        )
    raw = np.stack(raws)
    norm = np.sqrt(np.sum(raw * raw, axis=0))
    norm = np.where(norm > 1e-12, norm, 1.0)
    # cache NUMPY only (jnp arrays cached inside a jit trace leak tracers)
    return (raw / norm).astype(np.float32)


def _fibonacci_hemisphere(n: int) -> np.ndarray:
    """n well-spread unit directions on the upper hemisphere (the lower
    half is implied by the antipodal |u.d| symmetry of real volumes)."""
    i = np.arange(n, dtype=np.float64)
    z = (i + 0.5) / n  # (0, 1): stays off the equator plane and the pole
    phi = i * np.pi * (3.0 - np.sqrt(5.0))  # golden angle
    s = np.sqrt(1.0 - z * z)
    return np.stack([z, s * np.sin(phi), s * np.cos(phi)], axis=1)  # (n, 3) zyx


@functools.lru_cache(maxsize=8)
def _directional_bands_3d(
    nz: int, ny: int, nx: int, n_scales: int, n_dirs: int
):
    """Directional 3D tight-frame windows: (Meyer radial annuli) x
    (antipodally-symmetric cos^2 spherical caps around Fibonacci-spread
    directions), numerically normalized so sum_k U_k^2 = 1 exactly —
    the 3D analog of _windows_2d and the native replacement for the
    reference's UDCT 3D wedges (reference curvelet.py:1407-2291).

    Wedge count doubles every other scale (parabolic scaling). Returns
    (U, meta) with meta[k] = (scale, wedge); scale -1 is the lowpass.
    """
    fz = np.fft.fftfreq(nz)[:, None, None]
    fy = np.fft.fftfreq(ny)[None, :, None]
    fx = np.fft.fftfreq(nx)[None, None, :]
    r = np.sqrt(fz * fz + fy * fy + fx * fx) / 0.5
    r_safe = np.where(r > 1e-12, r, 1.0)
    u = np.stack([fz / (0.5 * r_safe), fy / (0.5 * r_safe), fx / (0.5 * r_safe)])

    edges = [2.0 ** (-(n_scales - j)) for j in range(n_scales + 1)]
    raws = [1.0 - _meyer_ramp((r - 0.5 * edges[0]) / (0.5 * edges[0] + 1e-12))]
    meta = [(-1, 0)]
    for j in range(n_scales):
        lo, hi = edges[j], edges[j + 1]
        rad = _meyer_ramp((r - 0.5 * lo) / (0.5 * lo)) * (
            1.0 - _meyer_ramp((r - hi) / hi)
        )
        n_d = max(1, n_dirs * (2 ** (j // 2)))
        if n_d == 1:
            raws.append(rad)
            meta.append((j, 0))
            continue
        dirs = _fibonacci_hemisphere(n_d)
        # |cos| of the angle to each center: antipodal pairs share a
        # window (real volumes: Hermitian symmetry), same move as the
        # 2D wedges' theta +/- pi pair
        cosang = np.abs(np.einsum("kd,dzyx->kzyx", dirs, u)).clip(0.0, 1.0)
        alpha = np.arccos(cosang)  # (n_d, nz, ny, nx), in [0, pi/2]
        # cap radius ~ mean inter-center spacing (hemisphere area 2*pi
        # split n_d ways); widen until the caps cover the sphere with
        # no hole — a hole would zero the signal there (the numeric
        # normalization can only rescale nonzero sums)
        width = 1.5 * np.sqrt(2.0 * np.pi / n_d)
        on_shell = rad > 1e-3
        for _ in range(8):
            ang = np.cos(np.clip(alpha / width, 0.0, 1.0) * (np.pi / 2)) ** 2
            cover = (ang.sum(axis=0) > 1e-6) | ~on_shell
            if cover.all():
                break
            width *= 1.2
        for a in range(n_d):
            raws.append(rad * ang[a])
            meta.append((j, a))
    raw = np.stack(raws)
    norm = np.sqrt(np.sum(raw * raw, axis=0))
    norm = np.where(norm > 1e-12, norm, 1.0)
    # cache NUMPY only (jnp arrays cached inside a jit trace leak tracers)
    return (raw / norm).astype(np.float32), meta


def curvelet_bands_3d(shape, n_scales: int = 4, n_dirs: int = 6):
    """The (K, nz, ny, nx) directional 3D window stack and metadata.
    n_dirs=0 selects the isotropic radial-only bands."""
    nz, ny, nx = shape
    if n_dirs <= 0:
        U = _radial_bands_3d(nz, ny, nx, n_scales)
        meta = [(-1, 0)] + [(j, 0) for j in range(n_scales)]
        return jnp.asarray(U), meta
    U, meta = _directional_bands_3d(nz, ny, nx, n_scales, n_dirs)
    return jnp.asarray(U), meta


def denoise_curvelet_3d(
    volume,
    threshold_sigma: float = 3.0,
    n_scales: int = 4,
    n_dirs: int = 6,
    **kwargs,
):
    """Directional-band threshold denoising of a 3D map.

    n_dirs > 0 (default): radial annuli x spherical-cap wedges — the
    native analog of the reference's 3D UDCT orientation selectivity
    (reference curvelet.py:1407-2291). n_dirs=0 falls back to the
    cheaper isotropic radial bands (the pre-r3 behavior; useful for
    very large volumes where the window stack would not fit).
    """
    vol = jnp.asarray(volume, jnp.float32)
    U, _ = curvelet_bands_3d(vol.shape, n_scales=n_scales, n_dirs=n_dirs)
    F = hfft.fftn(vol)
    coeffs = hfft.ifftn(F[None] * U, axes=(-3, -2, -1))
    kept = [coeffs[0]]
    for k in range(1, coeffs.shape[0]):
        if threshold_sigma <= 0:
            thr = _elbow_threshold(jnp.abs(coeffs[k]))
        else:
            # per-band MAD: with directional wedges the noise level is
            # orientation-dependent (that selectivity is the point), and
            # sparse signal barely moves a median-based estimate
            thr = threshold_sigma * _mad_sigma(jnp.real(coeffs[k]))
        kept.append(jnp.where(jnp.abs(coeffs[k]) >= thr, coeffs[k], 0.0))
    Fk = hfft.fftn(jnp.stack(kept), axes=(-3, -2, -1))
    return jnp.real(hfft.ifftn(jnp.sum(Fk * U, axis=0), axes=(-3, -2, -1)))


def denoise_curvelet_2d_tiled(
    image,
    tile_size: int = 512,
    overlap: int = 64,
    threshold_sigma: float = 3.0,
    **kwargs,
):
    """Overlap-add tiled denoising with cosine tapers for large images
    (curvelet.py:1008-1405)."""
    img = np.asarray(image, np.float32)
    ny, nx = img.shape
    if max(ny, nx) <= tile_size:
        return np.asarray(
            denoise_curvelet_2d(img, threshold_sigma=threshold_sigma, **kwargs)
        )
    step = tile_size - overlap
    out = np.zeros_like(img)
    wsum = np.zeros_like(img)
    ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(overlap) / overlap)

    def _taper(n, at_lo_edge, at_hi_edge):
        # no taper on the image boundary (no neighbor covers it there)
        t = np.ones(n)
        if not at_lo_edge:
            t[:overlap] = ramp[:n]
        if not at_hi_edge:
            t[-overlap:] = ramp[::-1][-n:]
        return t

    for y0 in range(0, max(1, ny - overlap), step):
        for x0 in range(0, max(1, nx - overlap), step):
            y1 = min(y0 + tile_size, ny)
            x1 = min(x0 + tile_size, nx)
            y0a, x0a = max(0, y1 - tile_size), max(0, x1 - tile_size)
            tile = img[y0a:y1, x0a:x1]
            den = np.asarray(
                denoise_curvelet_2d(tile, threshold_sigma=threshold_sigma, **kwargs)
            )
            ty = (
                _taper(y1 - y0a, y0a == 0, y1 == ny)[:, None]
                * _taper(x1 - x0a, x0a == 0, x1 == nx)[None, :]
            )
            out[y0a:y1, x0a:x1] += den * ty
            wsum[y0a:y1, x0a:x1] += ty
    return out / np.maximum(wsum, 1e-8)


# ---------------------------------------------------------------------------
# reference-compatible aliases (reference lib/curvelet.py exports:
# curvelet_denoise_{fdct,udct,mct}[_tiled], _batch_* and 3D variants).
# FDCT/UDCT both map to the native tight-frame transform here.
# ---------------------------------------------------------------------------


def curvelet_denoise_udct(data, threshold_sigma: float = 3.0, **kwargs):
    return denoise_curvelet_2d(
        data, transform="udct", threshold_sigma=threshold_sigma, **kwargs
    )


def curvelet_denoise_fdct(data, threshold_sigma: float = 3.0, **kwargs):
    return denoise_curvelet_2d(
        data, transform="udct", threshold_sigma=threshold_sigma, **kwargs
    )


def curvelet_denoise_mct(data, threshold_sigma: float = 3.0, **kwargs):
    return denoise_curvelet_2d(
        data, transform="mct", threshold_sigma=threshold_sigma, **kwargs
    )


def _tiled(transform):
    def wrapper(data, tile_size: int = 512, overlap: int = 64, **kwargs):
        kwargs.setdefault("transform", transform)
        return denoise_curvelet_2d_tiled(
            data, tile_size=tile_size, overlap=overlap, **kwargs
        )

    return wrapper


curvelet_denoise_udct_tiled = _tiled("udct")
curvelet_denoise_fdct_tiled = _tiled("udct")
curvelet_denoise_mct_tiled = _tiled("mct")


def _batch(fn):
    def wrapper(stack, **kwargs):
        if isinstance(stack, (list, tuple)):
            # e.g. micrographs of differing sizes: denoise each and
            # stack only when the shapes agree
            outs = [fn(jnp.asarray(img), **kwargs) for img in stack]
            if len({o.shape for o in outs}) == 1:
                return jnp.stack(outs)
            return outs
        return jnp.stack([fn(img, **kwargs) for img in jnp.asarray(stack)])

    return wrapper


curvelet_denoise_batch_udct = _batch(curvelet_denoise_udct)
curvelet_denoise_batch_fdct = _batch(curvelet_denoise_fdct)
curvelet_denoise_batch_mct = _batch(curvelet_denoise_mct)


def curvelet_denoise_3d_udct(data, threshold_sigma: float = 3.0, **kwargs):
    return denoise_curvelet_3d(data, threshold_sigma=threshold_sigma, **kwargs)


def curvelet_denoise_3d_mct(data, threshold_sigma: float = 3.0, **kwargs):
    return denoise_curvelet_3d(data, threshold_sigma=threshold_sigma, **kwargs)


def curvelet_denoise_3d_udct_tiled(
    data, tile_size: int = 128, overlap: int = 16, threshold_sigma: float = 3.0,
    **kwargs,
):
    """Overlap-add z-chunked 3D denoising (curvelet.py:1641-2291 analog)."""
    vol = np.asarray(data, np.float32)
    nz = vol.shape[0]
    if nz <= tile_size:
        return np.asarray(
            denoise_curvelet_3d(vol, threshold_sigma=threshold_sigma, **kwargs)
        )
    step = tile_size - overlap
    out = np.zeros_like(vol)
    wsum = np.zeros(nz, np.float32)
    ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(overlap) / overlap)
    for z0 in range(0, max(1, nz - overlap), step):
        z1 = min(z0 + tile_size, nz)
        z0a = max(0, z1 - tile_size)
        den = np.asarray(
            denoise_curvelet_3d(
                vol[z0a:z1], threshold_sigma=threshold_sigma, **kwargs
            )
        )
        n = z1 - z0a
        t = np.ones(n, np.float32)
        if z0a > 0:  # taper only where a neighboring chunk overlaps
            t[:overlap] = ramp[:n]
        if z1 < nz:
            t[-overlap:] = ramp[::-1][-n:]
        out[z0a:z1] += den * t[:, None, None]
        wsum[z0a:z1] += t
    return out / np.maximum(wsum, 1e-8)[:, None, None]


curvelet_denoise_3d_mct_tiled = curvelet_denoise_3d_udct_tiled

__all__ += [
    "curvelet_denoise_3d_mct",
    "curvelet_denoise_3d_mct_tiled",
    "curvelet_denoise_3d_udct",
    "curvelet_denoise_3d_udct_tiled",
    "curvelet_denoise_batch_fdct",
    "curvelet_denoise_batch_mct",
    "curvelet_denoise_batch_udct",
    "curvelet_denoise_fdct",
    "curvelet_denoise_fdct_tiled",
    "curvelet_denoise_mct",
    "curvelet_denoise_mct_tiled",
    "curvelet_denoise_udct",
    "curvelet_denoise_udct_tiled",
]
