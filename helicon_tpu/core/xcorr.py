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


@functools.partial(jax.jit, static_argnames=())
def batched_cross_correlation(classes, segments):
    """Peak normalized xcorr of every (class, segment) pair.

    classes (C, ny, nx), segments (S, ny, nx) -> (C, S) peak CCC and
    (C, S, 2) integer peak shifts (the shift to apply to the segment to
    align it with the class). One batched FFT per stack; the
    correlation is a broadcasted spectral product (C, S, ny, nx) — for
    very large C*S, chunk the segment axis outside.
    """
    cl = jnp.asarray(classes, jnp.float32)
    sg = jnp.asarray(segments, jnp.float32)
    cl = cl - jnp.mean(cl, axis=(-2, -1), keepdims=True)
    sg = sg - jnp.mean(sg, axis=(-2, -1), keepdims=True)
    Fc = hfft.fftn(cl, axes=(-2, -1))
    Fs = hfft.fftn(sg, axes=(-2, -1))
    prod = Fc[:, None] * jnp.conj(Fs)[None, :]
    cc = jnp.real(hfft.ifftn(prod, axes=(-2, -1)))
    norms = (
        jnp.linalg.norm(cl.reshape(cl.shape[0], -1), axis=1)[:, None]
        * jnp.linalg.norm(sg.reshape(sg.shape[0], -1), axis=1)[None, :]
    )
    cc = cc / jnp.maximum(norms, 1e-12)[..., None, None]
    flat = cc.reshape(cc.shape[0], cc.shape[1], -1)
    peak = jnp.max(flat, axis=-1)
    idx = jnp.argmax(flat, axis=-1)
    ny, nx = cl.shape[-2:]
    sy = idx // nx
    sx = idx % nx
    sy = jnp.where(sy > ny // 2, sy - ny, sy)
    sx = jnp.where(sx > nx // 2, sx - nx, sx)
    return peak, jnp.stack([sy, sx], axis=-1)
