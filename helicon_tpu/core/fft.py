"""FFT facade with a matmul-DFT fallback for TPU backends without the FFT HLO.

The experimental axon TPU backend returns UNIMPLEMENTED for the Fft HLO, so
every FFT in helicon_tpu routes through this module: on TPU the transforms
are computed as dense DFT matmuls on the MXU (exact, O(n^2) per axis — fine
for the <=1k-pixel images/volumes this framework works on and often *faster*
than FFT on MXU for n <= 512); elsewhere they lower to jnp.fft.

API mirrors the jnp.fft subset used by the framework: fft/ifft (axis),
fftn/ifftn, fft2, rfft2/irfft2, rfftn/irfftn, fftshift/ifftshift,
fftfreq/rfftfreq.

CAVEAT (axon TPU backend): complex64 device->host transfer is ALSO
unimplemented there — np.asarray() of a complex result raises
JaxRuntimeError. Keep complex intermediates on device and materialize
only real-valued reductions (jnp.abs / jnp.real / power spectra), as
every in-tree caller does.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fft",
    "ifft",
    "fft2",
    "fftn",
    "ifftn",
    "rfft2",
    "irfft2",
    "rfftn",
    "irfftn",
    "fftshift",
    "ifftshift",
    "fftfreq",
    "rfftfreq",
    "use_matmul_dft",
]

fftshift = jnp.fft.fftshift  # pure roll, supported on all backends
ifftshift = jnp.fft.ifftshift
fftfreq = jnp.fft.fftfreq
rfftfreq = jnp.fft.rfftfreq


def use_matmul_dft() -> bool:
    """True when FFTs must be emulated as DFT matmuls (TPU backend)."""
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=64)
def _dft_mats_np(n: int, inverse: bool):
    """(cos, sin) of the n x n DFT matrix, sign folded into sin.

    Cache NUMPY arrays only: caching jnp arrays created inside a jit
    trace leaks tracers into later traces (UnexpectedTracerError)."""
    k = np.arange(n)
    ang = 2.0 * math.pi * np.outer(k, k) / n
    sign = 1.0 if inverse else -1.0
    c = np.cos(ang).astype(np.float32)
    s = (sign * np.sin(ang)).astype(np.float32)
    return c, s


def _dft_mats(n: int, inverse: bool):
    c, s = _dft_mats_np(n, inverse)
    return jnp.asarray(c), jnp.asarray(s)


def _dft_axis(x, axis: int, inverse: bool):
    """Complex DFT along one axis via two real matmuls (MXU)."""
    n = x.shape[axis]
    c, s = _dft_mats(n, inverse)
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    mv = lambda m, v: jnp.moveaxis(
        jnp.tensordot(m, jnp.moveaxis(v, axis, 0), axes=([1], [0])), 0, axis
    )
    # (c + i s) @ (xr + i xi)
    yr = mv(c, xr) - mv(s, xi)
    yi = mv(s, xr) + mv(c, xi)
    y = jax.lax.complex(yr, yi)
    if inverse:
        y = y / n
    return y


def fft(x, axis: int = -1):
    if not use_matmul_dft():
        return jnp.fft.fft(x, axis=axis)
    return _dft_axis(jnp.asarray(x, jnp.complex64), axis, inverse=False)


def ifft(x, axis: int = -1):
    if not use_matmul_dft():
        return jnp.fft.ifft(x, axis=axis)
    return _dft_axis(jnp.asarray(x, jnp.complex64), axis, inverse=True)


def _fftn_impl(x, axes, inverse: bool):
    y = jnp.asarray(x, jnp.complex64)
    for ax in axes:
        y = _dft_axis(y, ax, inverse)
    return y


def fftn(x, axes=None):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    if not use_matmul_dft():
        return jnp.fft.fftn(x, axes=axes)
    return _fftn_impl(x, axes, inverse=False)


def ifftn(x, axes=None):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    if not use_matmul_dft():
        return jnp.fft.ifftn(x, axes=axes)
    return _fftn_impl(x, axes, inverse=True)


def fft2(x):
    return fftn(x, axes=(-2, -1))


def rfftn(x, axes=None):
    """Real-input FFT: full complex DFT sliced to the half spectrum."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    if not use_matmul_dft():
        return jnp.fft.rfftn(x, axes=axes)
    full = _fftn_impl(x, axes, inverse=False)
    last = axes[-1]
    n = x.shape[last]
    sl = [slice(None)] * x.ndim
    sl[last] = slice(0, n // 2 + 1)
    return full[tuple(sl)]


def rfft2(x):
    return rfftn(x, axes=(-2, -1))


def _expand_half(y, n: int, axes):
    """Rebuild the full spectrum along the last transformed axis from the
    rfft half spectrum, using Hermitian symmetry over the transformed axes
    only (conjugate + index negation); batch axes are untouched."""
    ndim = y.ndim
    axis = axes[-1] % ndim
    sl = [slice(None)] * ndim
    sl[axis] = slice(1, n - (n // 2 + 1) + 1)
    tail = jnp.conj(y[tuple(sl)])
    tail = jnp.flip(tail, axis=axis)
    for ax in axes[:-1]:
        ax = ax % ndim
        tail = jnp.roll(jnp.flip(tail, axis=ax), 1, axis=ax)
    return jnp.concatenate([y, tail], axis=axis)


def irfftn(y, s, axes=None):
    y = jnp.asarray(y)
    if axes is None:
        axes = tuple(range(y.ndim))
    if not use_matmul_dft():
        return jnp.fft.irfftn(y, s=s, axes=axes)
    full = _expand_half(jnp.asarray(y, jnp.complex64), s[-1], axes)
    out = _fftn_impl(full, axes, inverse=True)
    return jnp.real(out)


def irfft2(y, s):
    return irfftn(y, s=s, axes=(-2, -1))
