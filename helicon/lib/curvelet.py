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
