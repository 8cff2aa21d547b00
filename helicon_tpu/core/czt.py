"""Chirp-Z transform (Bluestein) in JAX.

The reference uses finufft's type-2 NUFFT to evaluate an image's Fourier
transform on a rescaled *uniform* frequency grid
(/root/reference/src/helicon/lib/transforms.py:663-743). A uniform output
grid makes the NUFFT an exact chirp-Z transform, which is three FFTs —
a far better fit for TPU than scattered-point interpolation kernels.

``czt(x, m, f0, df, axis)`` computes, along ``axis``::

    X[k] = sum_n x[n] * exp(-2*pi*i * (f0 + k*df) * n),   k = 0..m-1

with ``f0``/``df`` in cycles/sample. Bluestein's identity
``nk = (n^2 + k^2 - (k-n)^2) / 2`` turns this into a linear convolution
evaluated with zero-padded FFTs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["czt", "zoom_fft_2d", "zoom_fft_3d"]


def _next_fast_len(n: int) -> int:
    """Smallest 5-smooth number >= n (good FFT length)."""
    if n <= 2:
        return max(n, 1)
    best = 1 << (n - 1).bit_length()
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            # round p35 * 2^k up to >= n
            need = -(-n // p35)
            p2 = 1 << max(0, (need - 1).bit_length())
            best = min(best, p35 * p2)
            p35 *= 3
        p5 *= 5
    return best


def czt(x: jnp.ndarray, m: int, f0: float, df: float, axis: int = -1) -> jnp.ndarray:
    """Chirp-Z transform along one axis at frequencies ``f0 + k*df``.

    Parameters are static (Python floats/ints); the transform jit-compiles
    to three FFTs of length ``next_fast_len(n + m - 1)``.
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    n = x.shape[axis]

    from . import fft as _fft

    if _fft.use_matmul_dft():
        # TPU backend without the FFT HLO: evaluate the m target
        # frequencies directly as an (m, n) DFT matmul on the MXU —
        # cheaper than chirp-Z via emulated FFTs and exact.
        j = np.arange(n, dtype=np.float64)
        k = np.arange(m, dtype=np.float64)
        ang = -2.0 * np.pi * np.mod(np.outer(f0 + k * df, j), 1.0)
        c = jnp.asarray(np.cos(ang), jnp.float32)
        s = jnp.asarray(np.sin(ang), jnp.float32)
        xr = jnp.real(x).astype(jnp.float32)
        xi = jnp.imag(x).astype(jnp.float32)
        mv = lambda mat, v: jnp.moveaxis(
            jnp.tensordot(mat, jnp.moveaxis(v, axis, 0), axes=([1], [0])), 0, axis
        )
        return jax.lax.complex(mv(c, xr) - mv(s, xi), mv(s, xr) + mv(c, xi))

    L = _next_fast_len(n + m - 1)

    # Chirp phases are precomputed in float64 numpy (host, trace time) to
    # keep fp error small, then cast to complex64 for the device.
    k_all = np.arange(max(n, m), dtype=np.float64)
    # W^(k^2/2) with W = exp(-2*pi*i*df); keep the exponent reduced mod 1
    # to avoid precision loss for large k.
    w_exp = 0.5 * df * k_all * k_all
    a_exp = f0 * k_all[:n]
    chirp = np.exp(-2j * np.pi * np.mod(w_exp, 1.0))
    a_fac = np.exp(-2j * np.pi * np.mod(a_exp, 1.0))

    pre = (a_fac * chirp[:n]).astype(np.complex64)
    post = chirp[:m].astype(np.complex64)

    # Convolution kernel: conj chirp at offsets (k - n) for k in [0, L)
    idx = np.arange(L, dtype=np.float64)
    offs = np.where(idx < m, idx, idx - L)  # wrap: positions -(n-1)..(m-1)
    v = np.exp(2j * np.pi * np.mod(0.5 * df * offs * offs, 1.0)).astype(np.complex64)
    # zero the unused middle region (positions outside [-(n-1), m-1])
    valid = (idx < m) | (idx >= L - (n - 1)) if n > 1 else (idx < m)
    v = np.where(valid, v, 0).astype(np.complex64)

    shape = [1] * x.ndim
    shape[axis] = n
    xw = x.astype(jnp.complex64) * jnp.asarray(pre).reshape(shape)

    Xf = jnp.fft.fft(xw, n=L, axis=axis)
    Vf = jnp.asarray(np.fft.fft(v))
    vshape = [1] * x.ndim
    vshape[axis] = L
    y = jnp.fft.ifft(Xf * Vf.reshape(vshape), axis=axis)

    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, m)
    y = y[tuple(sl)]
    pshape = [1] * x.ndim
    pshape[axis] = m
    return y * jnp.asarray(post).reshape(pshape)


def zoom_fft_2d(
    data: jnp.ndarray, out_shape: tuple[int, int], zoom: tuple[float, float]
) -> jnp.ndarray:
    """Evaluate the 2D DFT on zoomed fftfreq-ordered frequency grids.

    Output frequencies along each axis are ``fftfreq(m) * zoom`` (cycles per
    input sample), matching the reference's ``fft_rescale`` grid
    (transforms.py:696-698). Batch dims (leading) pass through.
    """
    my, mx = out_shape
    zy, zx = zoom
    dfy, dfx = zy / my, zx / mx
    # contiguous grid from -(m//2)*df then ifftshift -> fftfreq order
    y = czt(data, my, -(my // 2) * dfy, dfy, axis=-2)
    y = czt(y, mx, -(mx // 2) * dfx, dfx, axis=-1)
    y = jnp.fft.ifftshift(y, axes=(-2, -1))
    return y


def zoom_fft_3d(
    data: jnp.ndarray,
    out_shape: tuple[int, int, int],
    zoom: tuple[float, float, float],
) -> jnp.ndarray:
    """3D analog of :func:`zoom_fft_2d`."""
    mz, my, mx = out_shape
    zz, zy, zx = zoom
    y = czt(data, mz, -(mz // 2) * (zz / mz), zz / mz, axis=-3)
    y = czt(y, my, -(my // 2) * (zy / my), zy / my, axis=-2)
    y = czt(y, mx, -(mx // 2) * (zx / mx), zx / mx, axis=-1)
    return jnp.fft.ifftshift(y, axes=(-3, -2, -1))
