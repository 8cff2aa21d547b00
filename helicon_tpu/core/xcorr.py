"""Batched FFT cross-correlation (class-average vs filament segments).

SURVEY.md section 7 item 5 / BASELINE.md benchmark config: the
whereIsMyClass workload correlates every 2D class average against every
filament segment. Implemented as one vmapped FFT cross-correlation on
the MXU-backed fft facade: (n_classes, n_segments) peak CCC matrix in a
single jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import fft as hfft

__all__ = ["batched_cross_correlation", "cross_correlation_map"]


def cross_correlation_map(image_a, image_b):
    """Normalized circular cross-correlation map of two same-size images."""
    a = jnp.asarray(image_a, jnp.float32)
    b = jnp.asarray(image_b, jnp.float32)
    a = a - jnp.mean(a)
    b = b - jnp.mean(b)
    Fa = hfft.fft2(a)
    Fb = hfft.fft2(b)
    cc = jnp.real(hfft.ifftn(Fa * jnp.conj(Fb), axes=(-2, -1)))
    norm = jnp.maximum(
        jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-12
    )
    return cc / norm


def _dft_pair(xr, xi, axis: int, inverse: bool):
    """Complex DFT of a (real, imag) pair along the last or second-last
    axis — einsum contractions on real tensors only (the axon TPU
    backend handles complex HLOs poorly, and explicit moveaxis copies of
    large 4D tensors are HBM-bound)."""
    from .fft import _dft_mats

    n = xr.shape[axis]
    c, s = _dft_mats(n, inverse)
    if axis in (-1, xr.ndim - 1):
        eq = "...k,km->...m"
    elif axis in (-2, xr.ndim - 2):
        eq = "...kl,km->...ml"
    else:  # pragma: no cover - xcorr only uses the image axes
        raise ValueError("axis must be -1 or -2")
    mv = lambda m, v: jnp.einsum(eq, v, m, preferred_element_type=jnp.float32)
    yr = mv(c, xr) - mv(s, xi)
    yi = mv(s, xr) + mv(c, xi)
    if inverse:
        yr = yr / n
        yi = yi / n
    return yr, yi


def _fft2_pair(x):
    zr, zi = _dft_pair(x, jnp.zeros_like(x), -2, False)
    return _dft_pair(zr, zi, -1, False)


@functools.partial(jax.jit, static_argnames=())
def batched_cross_correlation(classes, segments):
    """Peak normalized xcorr of every (class, segment) pair.

    classes (C, ny, nx), segments (S, ny, nx) -> (C, S) peak CCC and
    (C, S, 2) integer peak shifts (the shift to apply to the segment to
    align it with the class).

    All spectral math is on REAL (re, im) tensor pairs via DFT matmuls
    (complex HLOs are slow/partial on the axon TPU backend), and the
    segment axis is chunked with lax.map to bound the (C, chunk, ny, nx)
    intermediate.
    """
    cl = jnp.asarray(classes, jnp.float32)
    sg = jnp.asarray(segments, jnp.float32)
    C, ny, nx = cl.shape
    S = sg.shape[0]
    cl = cl - jnp.mean(cl, axis=(-2, -1), keepdims=True)
    sg = sg - jnp.mean(sg, axis=(-2, -1), keepdims=True)
    cr, ci = _fft2_pair(cl)  # (C, ny, nx)
    sr, si = _fft2_pair(sg)  # (S, ny, nx)
    norm_c = jnp.linalg.norm(cl.reshape(C, -1), axis=1)
    norm_s = jnp.linalg.norm(sg.reshape(S, -1), axis=1)

    # conj(segment) spectral product: (C, S, ny, nx) real pairs
    pr = cr[:, None] * sr[None] + ci[:, None] * si[None]
    pi = ci[:, None] * sr[None] - cr[:, None] * si[None]
    qr, qi = _dft_pair(pr, pi, -2, True)
    ccr, _ = _dft_pair(qr, qi, -1, True)  # real part of IDFT2
    flat = ccr.reshape(C, S, -1)
    peak = jnp.max(flat, axis=-1)
    idx = jnp.argmax(flat, axis=-1)
    peak = peak / jnp.maximum(norm_c[:, None] * norm_s[None, :], 1e-12)
    sy = idx // nx
    sx = idx % nx
    sy = jnp.where(sy > ny // 2, sy - ny, sy)
    sx = jnp.where(sx > nx // 2, sx - nx, sx)
    return peak, jnp.stack([sy, sx], axis=-1)
