"""Jittable 3D adaptive masking (the trueFSC mask chain, on-device).

The reference builds its gold-standard-FSC mask on host scipy
(``/root/reference/src/helicon/commands/trueFSC.py:608-783``):
gaussian lowpass -> threshold (fraction/absolute/mass/Otsu) ->
brightest-voxel seeding -> connected growth -> cosine soft edge via a
*downsampled* Euclidean distance transform. Every step here is a JAX op
that runs on the accelerator:

- lowpass: separable spatial Gaussian as three axis matmuls (reflect
  boundary, matching scipy.ndimage.gaussian_filter) — MXU-friendly and
  independent of the FFT HLO (unsupported on this TPU backend).
- Otsu: EMAN2-matched inter-class-variance maximization, vectorized.
- seeded growth: morphological reconstruction by dilation (3^3 box, the
  reference's 26-connectivity ``label`` structure) under a while_loop —
  exactly the union of connected components containing a seed.
- distance: EXACT Euclidean distance transform, separable min-plus
  passes (one fori_loop of elementwise mins per axis) — tighter than the
  reference's step-subsampled EDT + linear zoom.

Behavioral quirks preserved for parity (each cited in its function):
histogram bin offset and bin-0 skip in Otsu, the 3.81 lowpass
calibration, the threshold precedence order, the 1000-seed cap.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "euclidean_distance_outside",
    "gaussian_lowpass_3d",
    "grow_from_seeds",
    "otsu_threshold_3d",
    "soft_cosine_mask",
    "adaptive_mask_3d",
]


@functools.lru_cache(maxsize=32)
def _reflect_gaussian_matrix(n: int, sigma: float) -> np.ndarray:
    """(n, n) matrix applying a 1D Gaussian with reflect boundaries.

    Row i holds the weights of output sample i; taps falling outside
    [0, n) are folded back by scipy's 'reflect' rule (d c b a | a b c d),
    so K @ line == scipy.ndimage.gaussian_filter1d(line, sigma).
    """
    radius = max(1, int(4.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kern = np.exp(-0.5 * (x / sigma) ** 2)
    kern /= kern.sum()
    K = np.zeros((n, n), np.float64)
    idx = np.arange(n)
    for t, w in zip(range(-radius, radius + 1), kern):
        j = idx + t
        # reflect: ... 2 1 0 | 0 1 2 ... n-1 | n-1 n-2 ...
        j = np.where(j < 0, -j - 1, j)
        j = np.where(j >= n, 2 * n - j - 1, j)
        K[idx, j] += w
    return K.astype(np.float32)


def gaussian_lowpass_3d(volume, sigma: float):
    """Separable 3D Gaussian blur, reflect boundary (sigma in voxels)."""
    if sigma <= 0:
        return jnp.asarray(volume, jnp.float32)
    v = jnp.asarray(volume, jnp.float32)
    for axis in range(3):
        K = jnp.asarray(_reflect_gaussian_matrix(v.shape[axis], float(sigma)))
        v = jnp.moveaxis(
            jnp.tensordot(K, jnp.moveaxis(v, axis, 0), axes=([1], [0])), 0, axis
        )
    return v


def otsu_threshold_3d(volume, n_bins: int = 256, ignore_zero: bool = True):
    """EMAN2-style Otsu threshold (inter-class variance maximization).

    Matches the reference's quirks (trueFSC.py:608-656): the histogram
    spans [min, max] in n_bins equal bins, exact zeros are dropped when
    ignore_zero, bin 0 never wins, and the returned level is
    min + (winning_bin + 1) * bin_width. Expressed via the normalized
    single-cumulative form sigma_b^2(t) = (mu_T w(t) - mu(t))^2 /
    (w(t) (1 - w(t))) — algebraically the same maximizer.
    """
    v = jnp.asarray(volume, jnp.float32).ravel()
    lo = jnp.min(v)
    hi = jnp.max(v)
    width = (hi - lo) / n_bins
    span = jnp.where(hi > lo, hi - lo, 1.0)
    bins = jnp.clip(
        ((v - lo) / span * n_bins).astype(jnp.int32), 0, n_bins - 1
    )
    w = jnp.where(v != 0, 1.0, 0.0) if ignore_zero else jnp.ones_like(v)
    hist = jnp.zeros(n_bins, jnp.float32).at[bins].add(w)
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    centers = jnp.arange(n_bins, dtype=jnp.float32)
    omega = jnp.cumsum(p)  # class-0 weight up to bin t
    mu = jnp.cumsum(p * centers)  # class-0 first moment
    mu_total = mu[-1]
    denom = omega * (1.0 - omega)
    var_b = jnp.where(
        denom > 0, (mu_total * omega - mu) ** 2 / jnp.maximum(denom, 1e-30), 0.0
    )
    best = jnp.argmax(var_b.at[0].set(-1.0))  # bin 0 never wins
    return lo + (best.astype(jnp.float32) + 1.0) * width


def _dilate_box3(mask_f):
    """One 3^3 box dilation (26-connectivity) of a float 0/1 volume."""
    return jax.lax.reduce_window(
        mask_f,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3, 3),
        window_strides=(1, 1, 1),
        padding="SAME",
    )


def grow_from_seeds(above, seeds, max_iters: int | None = None):
    """Morphological reconstruction: grow `seeds` inside `above`.

    Returns the union of `above`'s connected components (26-connected)
    that contain at least one seed — the reference's label() + isin()
    seed-and-grow, as an iterate-to-fixpoint dilation.
    """
    above_f = jnp.asarray(above, jnp.float32)
    cur = jnp.asarray(seeds, jnp.float32) * above_f
    if max_iters is None:
        max_iters = int(sum(above.shape))  # worst-case path length

    def cond(state):
        cur, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(cur != prev))

    def body(state):
        cur, _, it = state
        return (_dilate_box3(cur) * above_f, cur, it + 1)

    out, _, _ = jax.lax.while_loop(
        cond, body, (cur, cur - 1.0, jnp.int32(0))
    )
    return out > 0.5


def euclidean_distance_outside(mask, cap: float | None = None):
    """EXACT Euclidean distance from each voxel to the mask (0 inside).

    Separable min-plus transform: per axis, d2[x] = min_i (d2_in[i] +
    (x - i)^2) computed with a fori_loop of elementwise mins — no
    downsampling (the reference subsamples by soft_width/4 and linearly
    re-zooms, trueFSC.py:738-770). cap (optional) only bounds the
    returned values, not the computation.
    """
    m = jnp.asarray(mask, bool)
    big = jnp.float32(np.prod(m.shape) ** 2)
    d2 = jnp.where(m, 0.0, big)
    for axis in range(3):
        d2m = jnp.moveaxis(d2, axis, 0)
        n = d2m.shape[0]
        offs = (jnp.arange(n, dtype=jnp.float32)[:, None]
                - jnp.arange(n, dtype=jnp.float32)[None, :]) ** 2

        def body(i, acc):
            return jnp.minimum(
                acc, d2m[i][None] + offs[:, i][:, None, None]
            )

        d2 = jnp.moveaxis(
            jax.lax.fori_loop(0, n, body, jnp.full_like(d2m, big)), 0, axis
        )
    d = jnp.sqrt(d2)
    if cap is not None:
        d = jnp.minimum(d, cap)
    return d


def soft_cosine_mask(mask, soft_width: float):
    """Cosine falloff over `soft_width` voxels outside the binary mask.

    Full cosine reaching 0 at d = soft_width. Documented deviation: the
    reference's half-cosine (pi/2, trueFSC.py:779) leaves a
    0.5-amplitude cliff at the soft zone's outer edge — exactly the
    mask-autocorrelation artifact FSCtrue exists to remove.
    """
    m = jnp.asarray(mask, bool)
    if soft_width <= 0:
        return m.astype(jnp.float32)
    d = euclidean_distance_outside(m, cap=2.0 * soft_width)
    edge = (jnp.cos(d / soft_width * jnp.pi) + 1.0) / 2.0
    return jnp.where(m, 1.0, jnp.where(d <= soft_width, edge, 0.0))


def adaptive_mask_3d(
    volume,
    apix: float,
    cutoff_res: float,
    thresh_fraction: float = 0.0,
    thresh_absolute: float = 0.0,
    mass_kda: float = 0.0,
    n_seeds: int = 1000,
):
    """EMAN2 mask.auto3d-equivalent adaptive mask, fully on-device.

    Chain (reference trueFSC.py:658-737): calibrated Gaussian lowpass
    (sigma = cutoff_res / (3.81 apix) when cutoff_res > 2 apix) ->
    threshold with precedence fraction > absolute > mass > Otsu ->
    top-n_seeds brightest voxels as seeds -> connected growth. Returns
    (binary_mask_bool, threshold, lowpassed_volume).
    """
    v = jnp.asarray(volume, jnp.float32)
    if cutoff_res > 2 * apix:
        v_lp = gaussian_lowpass_3d(v, cutoff_res / (3.81 * apix))
    else:
        v_lp = v
    if thresh_fraction > 0:
        level = thresh_fraction * jnp.max(v_lp)
    elif thresh_absolute > 0:
        level = jnp.float32(thresh_absolute)
    elif mass_kda > 0:
        # protein density 0.81 Da/A^3: mass -> voxel count -> the value
        # rank that encloses it
        n_vox = int(mass_kda * 1e3 / (0.81 * apix**3))
        flat = jnp.sort(v_lp.ravel())[::-1]
        level = flat[min(n_vox, flat.shape[0] - 1)]
    else:
        level = otsu_threshold_3d(v_lp)
    above = v_lp > level
    _, seed_flat = jax.lax.top_k(v_lp.ravel(), min(n_seeds, v_lp.size))
    seeds = (
        jnp.zeros(v_lp.size, jnp.float32).at[seed_flat].set(1.0)
    ).reshape(v_lp.shape)
    grown = grow_from_seeds(above, seeds)
    # a threshold above every seed leaves nothing: fall back to the bare
    # threshold mask (reference keeps `above` in that case)
    mask = jnp.where(jnp.any(grown), grown, above)
    return mask, level, v_lp
