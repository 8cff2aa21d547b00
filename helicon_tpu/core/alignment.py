"""2D image alignment: exhaustive flip/polarity x Nelder-Mead over
(log-scale, angle) with phase cross-correlation shifts.

Reference: lib/alignment.py (8-239). skimage's phase_cross_correlation
is replaced by a native JAX phase-correlation (normalization="phase"),
so the hot correlation runs through core.fft (TPU-safe).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import fft as hfft
from .analysis import cross_correlation_coefficient
from .filters import generate_tapering_filter, threshold_data
from .transforms import pad_to_size, transform_image

__all__ = ["align_images", "phase_cross_correlation"]


def phase_cross_correlation(reference_image, moving_image):
    """Integer-pixel shift maximizing the phase correlation.

    Equivalent to skimage.registration.phase_cross_correlation with
    normalization="phase" and no upsampling: shift to APPLY to
    moving_image to align it with reference_image, in (row, col).
    """
    ref = jnp.asarray(reference_image, jnp.float32)
    mov = jnp.asarray(moving_image, jnp.float32)
    F1 = hfft.fft2(ref)
    F2 = hfft.fft2(mov)
    cross = F1 * jnp.conj(F2)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    cc = jnp.real(hfft.ifftn(cross, axes=(-2, -1)))
    idx = jnp.unravel_index(jnp.argmax(cc), cc.shape)
    shifts = np.asarray(idx, np.float64)
    for d, n in enumerate(ref.shape):
        if shifts[d] > n // 2:
            shifts[d] -= n
    return shifts, None, None


def align_images(
    image_moving,
    image_ref,
    scale_range,
    angle_range,
    check_polarity: bool = True,
    check_flip: bool = True,
    return_aligned_moving_image: bool = False,
):
    """Align image_moving to image_ref over flip x polarity x (scale,
    angle) with phase-correlation shifts and masked-CCC scoring
    (alignment.py:8-239).

    Returns (scale, angle_deg, shift_cartesian, score[, aligned]); with
    check_flip=True a leading bool (flipped) is prepended as in the
    reference.
    """
    image_moving = np.asarray(image_moving, np.float32)
    image_ref = np.asarray(image_ref, np.float32)
    assert 0 <= scale_range < 1, f"scale_range={scale_range} out of [0, 1)"

    if check_flip:
        result = align_images(
            image_moving, image_ref, scale_range, angle_range,
            check_polarity=check_polarity, check_flip=False,
            return_aligned_moving_image=return_aligned_moving_image,
        )
        result_flip = align_images(
            image_moving[::-1, :], image_ref, scale_range, angle_range,
            check_polarity=check_polarity, check_flip=False,
            return_aligned_moving_image=return_aligned_moving_image,
        )
        if result_flip[3] > result[3]:
            return (True, *result_flip)
        return (False, *result)

    taper_mov = np.asarray(
        generate_tapering_filter(image_moving.shape, fraction_start=(0.8, 0.8))
    )
    padded_taper = np.asarray(pad_to_size(taper_mov, image_ref.shape))
    padded_mov = np.asarray(pad_to_size(image_moving, image_ref.shape))
    mov_work = np.asarray(
        threshold_data(padded_taper * padded_mov, thresh_fraction=-1.0)
    )
    taper_ref = np.asarray(
        generate_tapering_filter(image_ref.shape, fraction_start=(0.8, 0.8))
    )
    ref_work = np.asarray(threshold_data(taper_ref * image_ref, thresh_fraction=0.0))

    best = [1e10, 1.0, 0.0, np.zeros(2), None]

    def scale_rotation_score(x, angle0):
        if isinstance(x, np.ndarray):
            scale = float(np.exp(x[0]))
            angle = float(x[1])
        else:
            scale, angle = 1.0, float(x)
        angle += angle0
        rotated = np.asarray(
            transform_image(mov_work, scale=scale, rotation=angle, mode="constant")
        )
        shift, _, _ = phase_cross_correlation(ref_work, rotated)
        shifted = np.asarray(
            transform_image(
                mov_work, scale=scale, rotation=angle,
                post_translation=shift, mode="wrap",
            )
        )
        shifted_taper = np.asarray(
            transform_image(
                padded_taper, scale=scale, rotation=angle,
                post_translation=shift, mode="wrap",
            )
        )
        mask = shifted_taper > 0
        score = -float(
            cross_correlation_coefficient(ref_work[mask], shifted[mask])
        )
        if score < best[0]:
            best[0], best[1], best[2] = score, scale, angle
            best[3], best[4] = shift, shifted
        return score

    from scipy.optimize import minimize, minimize_scalar

    angle0s = [0] + ([180] if check_polarity else [])
    for angle0 in angle0s:
        if scale_range > 0:
            minimize(
                scale_rotation_score,
                x0=np.array([0.0, 0.0]),
                args=(angle0,),
                bounds=[
                    (-np.log(1 + scale_range), np.log(1 + scale_range)),
                    (-angle_range, angle_range),
                ],
                method="Nelder-Mead",
                options=dict(xatol=0.01),
            )
        elif angle_range > 0:
            minimize_scalar(
                scale_rotation_score,
                bounds=(angle0 - angle_range, angle0 + angle_range),
                args=(0.0,),
                method="bounded",
                options=dict(xatol=0.01),
            )
        # both ranges 0: NO optimization — the reference returns the
        # identity pose (scale=1, angle=0, shift=0) without probing the
        # polarity flip or a phase-correlation shift (alignment.py:156-197)

    _, scale, angle, shift, aligned_work = best
    if aligned_work is None:  # no optimizer ran (both ranges 0)
        aligned_work = mov_work

    # final similarity at the winning pose (reference alignment.py:210-221)
    taper_best = np.asarray(
        transform_image(
            padded_taper, scale=scale, rotation=angle,
            post_translation=shift, mode="wrap",
        )
    )
    mask = taper_best > 0
    similarity = float(
        cross_correlation_coefficient(ref_work[mask], aligned_work[mask])
    )

    ret = (scale, angle, shift, similarity)
    if return_aligned_moving_image:
        # the RAW moving image at the winning pose — not the
        # tapered+thresholded work image (reference alignment.py:223-230)
        aligned_raw = np.asarray(
            transform_image(
                padded_mov, scale=scale, rotation=angle,
                post_translation=shift, mode="wrap",
            )
        )
        ret = (*ret, aligned_raw)
    return ret
