"""Image denoisers (JAX): TV-Chambolle, wavelet soft-threshold, NL-means.

The reference delegates to skimage.restoration (webApps/denovo3D/
pipeline.py:190-202: denoise_nl_means / denoise_tv_chambolle /
denoise_wavelet). These are native JAX implementations of the same
algorithms so the prepare step stays on-device.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "denoise_image",
    "denoise_nl_means",
    "denoise_tv_chambolle",
    "denoise_wavelet",
]


@functools.partial(jax.jit, static_argnames=("n_iter",))
def denoise_tv_chambolle(image, weight: float = 0.1, n_iter: int = 50):
    """Chambolle 2004 dual projection algorithm (as skimage's default)."""
    img = jnp.asarray(image, jnp.float32)
    tau = 0.25

    def grad(u):
        gx = jnp.diff(u, axis=0, append=u[-1:, :])
        gy = jnp.diff(u, axis=1, append=u[:, -1:])
        return gx, gy

    def div(px, py):
        fx = px - jnp.roll(px, 1, axis=0)
        fx = fx.at[0].set(px[0])
        fx = fx.at[-1].set(-px[-2])
        fy = py - jnp.roll(py, 1, axis=1)
        fy = fy.at[:, 0].set(py[:, 0])
        fy = fy.at[:, -1].set(-py[:, -2])
        return fx + fy

    def body(carry, _):
        px, py = carry
        u = img - weight * div(px, py)
        gx, gy = grad(u)
        norm = jnp.sqrt(gx * gx + gy * gy)
        denom = 1.0 + (tau / weight) * norm
        # Chambolle 2004 dual ascent: p <- (p - (tau/lambda) grad u) /
        # (1 + (tau/lambda)|grad u|)  — note the MINUS sign
        # (p^{n+1} = (p + tau grad(div p - f/lambda)) / (...), and
        # grad(div p - f/lambda) = -grad(u)/lambda)
        px = (px - (tau / weight) * gx) / denom
        py = (py - (tau / weight) * gy) / denom
        return (px, py), None

    (px, py), _ = jax.lax.scan(
        body, (jnp.zeros_like(img), jnp.zeros_like(img)), None, length=n_iter
    )
    return img - weight * div(px, py)


def _haar_fwd(x):
    a = (x[0::2] + x[1::2]) / jnp.sqrt(2.0)
    d = (x[0::2] - x[1::2]) / jnp.sqrt(2.0)
    return a, d


def _haar_inv(a, d):
    e = (a + d) / jnp.sqrt(2.0)
    o = (a - d) / jnp.sqrt(2.0)
    out = jnp.stack([e, o], axis=1).reshape(-1, *a.shape[1:])
    return out


def denoise_wavelet(image, sigma: float | None = None, levels: int = 3):
    """Haar-wavelet VisuShrink soft threshold (skimage denoise_wavelet
    analog; BayesShrink replaced by the simpler universal threshold).
    The decomposition depth is capped so both dimensions keep at least
    one block (skimage caps the level for small images too)."""
    ny, nx = jnp.asarray(image).shape
    max_levels = max(1, int(math.floor(math.log2(max(2, min(ny, nx))))) - 1)
    return _denoise_wavelet_impl(image, sigma, min(levels, max_levels))


@functools.partial(jax.jit, static_argnames=("levels",))
def _denoise_wavelet_impl(image, sigma: float | None = None, levels: int = 3):
    img = jnp.asarray(image, jnp.float32)
    ny, nx = img.shape
    py = ny - ny % (2**levels) if ny % (2**levels) else ny
    px = nx - nx % (2**levels) if nx % (2**levels) else nx
    work = img[:py, :px]

    # noise sigma from the finest diagonal detail (MAD estimator)
    d = (work[0::2, 0::2] - work[1::2, 0::2] - work[0::2, 1::2] + work[1::2, 1::2]) / 2
    est = jnp.median(jnp.abs(d - jnp.median(d))) / 0.6745
    s = est if sigma is None else jnp.float32(sigma)
    thresh = s * jnp.sqrt(2.0 * jnp.log(max(py * px, 2)))

    def soft(v):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - thresh, 0.0)

    def fwd2(u):
        a, dv = _haar_fwd(u)
        a = a.T
        dv = dv.T
        aa, ad = _haar_fwd(a)
        da, dd = _haar_fwd(dv)
        return aa.T, ad.T, da.T, dd.T

    def inv2(aa, ad, da, dd):
        a = _haar_inv(aa.T, ad.T).T
        dv = _haar_inv(da.T, dd.T).T
        return _haar_inv(a, dv)

    stack = []
    u = work
    for _ in range(levels):
        aa, ad, da, dd = fwd2(u)
        stack.append((soft(ad), soft(da), soft(dd)))
        u = aa
    for ad, da, dd in reversed(stack):
        u = inv2(u, ad, da, dd)
    return img.at[:py, :px].set(u) if (py, px) != (ny, nx) else u


@functools.partial(jax.jit, static_argnames=("patch_size", "search_radius"))
def denoise_nl_means(
    image, h: float = 0.1, patch_size: int = 7, search_radius: int = 11
):
    """Non-local means with a square search window (skimage analog).

    Defaults match skimage.restoration.denoise_nl_means as the reference
    pipeline calls it (pipeline.py:190-193: patch_size 7, patch_distance
    11, h 0.1 absolute — near-identity on raw-intensity micrographs,
    which IS the reference behavior).

    Patch distances are computed with box-filtered squared differences of
    shifted images — O(window^2) shifted passes, fully vectorized.
    """
    img = jnp.asarray(image, jnp.float32)
    p = patch_size // 2

    def boxsum(x):
        k = patch_size
        c = jnp.cumsum(jnp.pad(x, ((1, 0), (0, 0))), axis=0)
        x = c[k:] - c[:-k]
        c = jnp.cumsum(jnp.pad(x, ((0, 0), (1, 0))), axis=1)
        return c[:, k:] - c[:, :-k]

    pad = p + search_radius
    padded = jnp.pad(img, pad, mode="reflect")
    ny, nx = img.shape

    shifts = [
        (dy, dx)
        for dy in range(-search_radius, search_radius + 1)
        for dx in range(-search_radius, search_radius + 1)
    ]

    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    h2 = jnp.maximum(h * h, 1e-12)
    for dy, dx in shifts:
        shifted = padded[pad + dy : pad + dy + ny, pad + dx : pad + dx + nx]
        diff2 = (
            padded[pad + dy - p : pad + dy + ny + p, pad + dx - p : pad + dx + nx + p]
            - padded[pad - p : pad + ny + p, pad - p : pad + nx + p]
        ) ** 2
        dist = boxsum(diff2) / (patch_size * patch_size)
        w = jnp.exp(-dist / h2)
        num = num + w * shifted
        den = den + w
    return num / jnp.maximum(den, 1e-12)


def denoise_image(image, method: str = "tv", **kwargs):
    """Dispatch by method name as the reference pipeline does
    (pipeline.py:190-202): nl_mean | tv | wavelet."""
    if method in ("nl_mean", "nl_means"):
        return denoise_nl_means(image, **kwargs)
    if method == "tv":
        return denoise_tv_chambolle(image, **kwargs)
    if method == "wavelet":
        return denoise_wavelet(image, **kwargs)
    # reference pipeline.py:189-201 silently ignores unknown names; warn
    # but do not kill the task
    import logging

    logging.getLogger(__name__).warning(
        "unknown denoise method %r; returning the image unchanged", method
    )
    return jnp.asarray(image, jnp.float32)
