"""Compat shim: reference helicon.lib.curvelet -> helicon_tpu.core.curvelet.

The reference module exposes a few private helpers that its tests (and
possibly downstream code) import directly; they are provided here as
thin derivations of the native implementation:

- ``_udct_compatible_shape`` (reference curvelet.py:381): round each
  dimension up to a multiple of ``2**num_scales`` so the UDCT's dyadic
  decimation divides evenly.
- ``_riesz_transform_x`` / ``_riesz_transform_y`` (reference
  curvelet.py:789-808): the two components of the 2D Riesz transform,
  which the native core computes jointly (``riesz_transform_2d``).
"""

from __future__ import annotations

import numpy as np

from helicon._shim import reexport


def _udct_compatible_shape(shape, num_scales: int):
    m = 2**int(num_scales)
    return tuple(int(-(-int(d) // m) * m) for d in shape)


def _mad_std(values) -> float:
    """Median-absolute-deviation noise sigma (reference curvelet.py:99):
    median(|x|) / 0.6745 — the Gaussian-consistency constant."""
    return float(np.median(np.abs(np.asarray(values).ravel())) / 0.6745)


def _tile_indices_2d(shape, tile_size: int, overlap: int):
    """Overlapping 2D tile slices (reference curvelet.py:1008-1027):
    stride = tile_size - overlap, plus a flush-to-edge last tile when
    the stride walk does not reach the boundary."""
    ny, nx = shape
    stride = max(1, int(tile_size) - int(overlap))

    def starts(n):
        if tile_size >= n:
            return [0]
        s = list(range(0, n - tile_size + 1, stride))
        if s[-1] + tile_size < n:
            s.append(n - tile_size)
        return s

    return [
        (slice(y, min(y + tile_size, ny)), slice(x, min(x + tile_size, nx)))
        for y in starts(ny)
        for x in starts(nx)
    ]


def _cosine_taper_2d(shape, overlap: int):
    """Separable sin^2 edge ramp for feathering tile seams (reference
    curvelet.py:1029-1044)."""
    ny, nx = shape
    wy = np.ones(ny)
    wx = np.ones(nx)
    if overlap > 0 and ny > 1 and nx > 1:
        oy, ox = min(overlap, ny), min(overlap, nx)
        ry = np.sin(np.linspace(0, np.pi / 2, oy)) ** 2
        wy[:oy] = ry
        wy[-oy:] = ry[::-1]
        rx = np.sin(np.linspace(0, np.pi / 2, ox)) ** 2
        wx[:ox] = rx
        wx[-ox:] = rx[::-1]
    return wy[:, None] * wx[None, :]


def _riesz_transform_x(image):
    from helicon_tpu.core.curvelet import riesz_transform_2d

    rx, _ = riesz_transform_2d(np.asarray(image))
    return np.asarray(rx, dtype=np.float64)


def _riesz_transform_y(image):
    from helicon_tpu.core.curvelet import riesz_transform_2d

    _, ry = riesz_transform_2d(np.asarray(image))
    return np.asarray(ry, dtype=np.float64)


__getattr__, __dir__ = reexport(
    __name__,
    "helicon_tpu.core.curvelet",
    "helicon_tpu",
)
