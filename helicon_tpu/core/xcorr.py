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


def batched_cross_correlation(classes, segments, chunk: int | None = None):
    """Peak normalized xcorr of every (class, segment) pair.

    classes (C, ny, nx), segments (S, ny, nx) -> (C, S) peak CCC and
    (C, S, 2) integer peak shifts (the shift to apply to the segment to
    align it with the class).

    All spectral math is on REAL (re, im) tensor pairs via DFT matmuls
    (complex HLOs are slow/partial on the axon TPU backend). The segment
    axis is chunked with lax.map ONLY when the full (C, S, ny, nx)
    product would exceed ~0.5 GB per tensor: small workloads keep the
    single fully-parallel product (chunking the 50 x 1000 x 64^2 bench
    serialized it 60x), huge ones (50 classes x 5000 segments at 128^2
    would be 16 GB) stay memory-bounded.
    """
    classes = jnp.asarray(classes, jnp.float32)
    segments = jnp.asarray(segments, jnp.float32)
    C, ny, nx = classes.shape
    S = segments.shape[0]
    if chunk is None:
        budget_elems = 2**27  # 0.5 GB of float32 per live tensor
        chunk = max(1, min(S, budget_elems // max(1, C * ny * nx)))
    return _batched_xcorr_impl(classes, segments, int(chunk))


@functools.partial(jax.jit, static_argnames=("chunk",))
def _batched_xcorr_impl(classes, segments, chunk: int):
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

    chunk = min(chunk, S) or 1
    pad = (-S) % chunk
    if pad:
        sr = jnp.concatenate([sr, jnp.zeros((pad, ny, nx), sr.dtype)])
        si = jnp.concatenate([si, jnp.zeros((pad, ny, nx), si.dtype)])
    n_chunks = (S + pad) // chunk
    sr = sr.reshape(n_chunks, chunk, ny, nx)
    si = si.reshape(n_chunks, chunk, ny, nx)

    def one_chunk(args):
        sr_c, si_c = args  # (chunk, ny, nx)
        # conj(segment) spectral product: (C, chunk, ny, nx) real pairs
        pr = cr[:, None] * sr_c[None] + ci[:, None] * si_c[None]
        pi = ci[:, None] * sr_c[None] - cr[:, None] * si_c[None]
        qr, qi = _dft_pair(pr, pi, -2, True)
        ccr, _ = _dft_pair(qr, qi, -1, True)  # real part of IDFT2
        flat = ccr.reshape(C, chunk, -1)
        return jnp.max(flat, axis=-1), jnp.argmax(flat, axis=-1)

    peaks, idxs = jax.lax.map(one_chunk, (sr, si))  # (n_chunks, C, chunk)
    peak = jnp.moveaxis(peaks, 0, 1).reshape(C, -1)[:, :S]
    idx = jnp.moveaxis(idxs, 0, 1).reshape(C, -1)[:, :S]
    peak = peak / jnp.maximum(norm_c[:, None] * norm_s[None, :], 1e-12)
    sy = idx // nx
    sx = idx % nx
    sy = jnp.where(sy > ny // 2, sy - ny, sy)
    sx = jnp.where(sx > nx // 2, sx - nx, sx)
    return peak, jnp.stack([sy, sx], axis=-1)
