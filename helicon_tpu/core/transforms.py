"""Real- and Fourier-space image/volume transforms (JAX, TPU-first).

Parity map (reference: /root/reference/src/helicon/lib/transforms.py):
  apply_helical_symmetry  .. numba-parallel loop (58-165) -> batched
                             trilinear gathers scanned over symmetry copies
  transform_map           .. scipy map_coordinates order-3 (168-235)
  transform_image         .. skimage AffineTransform+warp (238-312)
  rotate_shift_image      .. scipy affine_transform (315-369)
  crop/pad/clip helpers   .. (372-607), host-side numpy (shape-dynamic)
  fft_crop                .. rfft truncation (610-660)
  fft_rescale             .. finufft type-2 NUFFT (663-743) -> chirp-Z
  flip_hand               .. axis flip (746-768)
  compute_power_spectra   .. (771-820)
  compute_phase_difference_across_meridian .. (823-842)

Design: every dense transform is jittable and vmappable; geometry scalars
(twist, rise, angles, shifts) may be traced values so candidate grids
compile once. Shape-changing helpers (crop/pad/clip) stay in numpy — they
are metadata-scale and dynamic shapes don't belong under jit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as hfft

from .czt import zoom_fft_2d, zoom_fft_3d
from .interp import map_coordinates
from .rotation import euler_matrix

__all__ = [
    "apply_helical_symmetry",
    "compute_phase_difference_across_meridian",
    "compute_power_spectra",
    "crop_center",
    "crop_center_z",
    "fft_crop",
    "fft_rescale",
    "flip_hand",
    "get_clip",
    "get_clip3d",
    "get_rotated_clip",
    "pad_to_size",
    "rotate_shift_image",
    "transform_image",
    "transform_map",
]


# ---------------------------------------------------------------------------
# helical symmetrization
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("csym", "n_hsym", "work_shape", "src_shape"),
)
def _helical_sym_accumulate(
    data, twist_degree, rise_pixel_src, scale, z0, z1, csym, n_hsym, work_shape, src_shape
):
    """Accumulate symmetry copies onto the work grid.

    For each output voxel and each (hsym, csym) copy, gather the source
    value by trilinear interpolation and count the copy when in bounds.
    rise_pixel_src = rise_angstrom / apix (source pixels);
    scale = new_apix / apix.
    """
    nz, ny, nx = work_shape
    nz0, ny0, nx0 = src_shape

    kk = jnp.arange(nz, dtype=jnp.float32)
    jj = jnp.arange(ny, dtype=jnp.float32)
    ii = jnp.arange(nx, dtype=jnp.float32)
    K = kk[:, None, None]
    J = jj[None, :, None]
    I = ii[None, None, :]

    hs = jnp.arange(-n_hsym, n_hsym + 1, dtype=jnp.float32)
    cs = jnp.arange(csym, dtype=jnp.float32)
    hi_grid, ci_grid = jnp.meshgrid(hs, cs, indexing="ij")
    copies = jnp.stack([hi_grid.ravel(), ci_grid.ravel()], axis=-1)

    def body(carry, hc):
        acc, wsum = carry
        hi, ci = hc[0], hc[1]
        k2 = ((K - nz // 2) * scale + hi * rise_pixel_src) + nz0 // 2
        rot = jnp.deg2rad(twist_degree * hi + 360.0 * ci / csym)
        c, s = jnp.cos(rot), jnp.sin(rot)
        # reference rotation matrix: [[c, s], [-s, c]] applied to (j, i)
        j2 = (c * (J - ny // 2) + s * (I - nx / 2)) * scale + ny0 // 2
        i2 = (-s * (J - ny // 2) + c * (I - nx / 2)) * scale + nx0 // 2

        kf = jnp.floor(k2)
        jf = jnp.floor(j2)
        if_ = jnp.floor(i2)
        wk = k2 - kf
        wj = j2 - jf
        wi = i2 - if_

        valid = (k2 >= z0) & (k2 < z1)
        valid &= (jf >= 0) & (jf < ny0 - 1)
        valid &= (if_ >= 0) & (if_ < nx0 - 1)

        kf_i = jnp.clip(kf.astype(jnp.int32), 0, nz0 - 1)
        kc_i = jnp.clip(kf_i + 1, 0, nz0 - 1)
        jf_i = jnp.clip(jf.astype(jnp.int32), 0, ny0 - 1)
        jc_i = jnp.clip(jf_i + 1, 0, ny0 - 1)
        if_i = jnp.clip(if_.astype(jnp.int32), 0, nx0 - 1)
        ic_i = jnp.clip(if_i + 1, 0, nx0 - 1)

        kf_b = jnp.broadcast_to(kf_i, (nz, ny, nx))
        kc_b = jnp.broadcast_to(kc_i, (nz, ny, nx))

        val = (
            (1 - wk) * (1 - wj) * (1 - wi) * data[kf_b, jf_i, if_i]
            + (1 - wk) * (1 - wj) * wi * data[kf_b, jf_i, ic_i]
            + (1 - wk) * wj * (1 - wi) * data[kf_b, jc_i, if_i]
            + (1 - wk) * wj * wi * data[kf_b, jc_i, ic_i]
            + wk * (1 - wj) * (1 - wi) * data[kc_b, jf_i, if_i]
            + wk * (1 - wj) * wi * data[kc_b, jf_i, ic_i]
            + wk * wj * (1 - wi) * data[kc_b, jc_i, if_i]
            + wk * wj * wi * data[kc_b, jc_i, ic_i]
        )
        acc = acc + jnp.where(valid, val, 0.0)
        wsum = wsum + valid.astype(jnp.float32)
        return (acc, wsum), None

    init = (
        jnp.zeros(work_shape, jnp.float32),
        jnp.zeros(work_shape, jnp.float32),
    )
    (acc, wsum), _ = jax.lax.scan(body, init, copies)
    return jnp.where(wsum > 0, acc / jnp.maximum(wsum, 1.0), acc)


def apply_helical_symmetry(
    data,
    apix: float,
    twist_degree: float,
    rise_angstrom: float,
    csym: int = 1,
    fraction: float = 1.0,
    new_size=None,
    new_apix: float | None = None,
    cpu: int = 1,
):
    """Symmetrize a 3D map by averaging helical/cyclic symmetry copies,
    optionally resampling to a new pixel size and box size.

    TPU-native reimplementation of the reference numba kernel
    (transforms.py:58-165): the per-voxel loop over symmetry copies
    becomes a lax.scan of full-volume trilinear gathers. ``cpu`` is
    accepted for API compatibility and ignored (XLA owns threading).
    """
    data = jnp.asarray(data, jnp.float32)
    nz0, ny0, nx0 = data.shape
    if new_apix is None:
        new_apix = apix
    if new_size is None:
        new_size = data.shape
    new_size = tuple(int(v) for v in new_size)

    if new_size != tuple(data.shape):
        nz1, ny1, nx1 = new_size
        work_shape = (max(nz0, nz1), max(ny0, ny1), max(nx0, nx1))
    else:
        work_shape = (nz0, ny0, nx0)
    nz, ny, nx = work_shape

    n_hsym = max(1, int(nz * new_apix / rise_angstrom))

    # non-zero z range of the source, shrunk to the requested fraction
    profile_z = jnp.sum(data, axis=(1, 2))
    threshold = 0.01 * jnp.max(profile_z)
    nz_idx = jnp.arange(nz0)
    nonzero = profile_z > threshold
    z0 = jnp.min(jnp.where(nonzero, nz_idx, nz0))
    z1 = jnp.max(jnp.where(nonzero, nz_idx, -1))
    zmid = (z0 + z1) // 2 + (z0 + z1) % 2
    half = int(nz0 * fraction + 0.5) // 2
    z0 = jnp.maximum(z0, zmid - half)
    z1 = jnp.minimum(z1, zmid + half)

    out = _helical_sym_accumulate(
        data,
        jnp.float32(twist_degree),
        jnp.float32(rise_angstrom / apix),
        jnp.float32(new_apix / apix),
        z0.astype(jnp.float32),
        z1.astype(jnp.float32),
        int(csym),
        n_hsym,
        work_shape,
        (nz0, ny0, nx0),
    )

    if work_shape != new_size:
        nz1, ny1, nx1 = new_size
        out = out[
            nz // 2 - nz1 // 2 : nz // 2 + nz1 // 2,
            ny // 2 - ny1 // 2 : ny // 2 + ny1 // 2,
            nx // 2 - nx1 // 2 : nx // 2 + nx1 // 2,
        ]
    return out


# ---------------------------------------------------------------------------
# geometric transforms
# ---------------------------------------------------------------------------


def transform_map(
    data,
    scale: float = 1.0,
    rot: float = 0,
    tilt: float = 0,
    psi: float = 0,
    dx: float = 0,
    dy: float = 0,
    dz: float = 0,
):
    """Scale/rotate (intrinsic ZYZ)/translate a 3D volume (cubic interp).

    Mirrors reference transform_map (transforms.py:168-235): output voxel
    coordinates are rotated forward and sampled from the input.
    """
    if (
        scale == 1
        and rot == 0
        and tilt == 0
        and psi == 0
        and dx == 0
        and dy == 0
        and dz == 0
    ):
        return jnp.asarray(data)
    data = jnp.asarray(data, jnp.float32)
    nz, ny, nx = data.shape
    k = jnp.arange(nz, dtype=jnp.float32) - nz // 2
    j = jnp.arange(ny, dtype=jnp.float32) - ny // 2
    i = jnp.arange(nx, dtype=jnp.float32) - nx // 2
    Z, Y, X = jnp.meshgrid(k, j, i, indexing="ij")
    if scale != 1.0:
        Z, Y, X = Z * scale, Y * scale, X * scale
    R = euler_matrix("ZYZ", jnp.asarray([rot, tilt, psi], jnp.float32))
    xyz = jnp.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1) @ R.T
    x = xyz[:, 0] + nx // 2 - dx
    y = xyz[:, 1] + ny // 2 - dy
    z = xyz[:, 2] + nz // 2 - dz
    out = map_coordinates(data, (z, y, x), order=3, mode="constant")
    return out.reshape((nz, ny, nx))


def transform_image(
    image,
    scale=1.0,
    rotation: float = 0.0,
    rotation_center=None,
    pre_translation=(0.0, 0.0),
    post_translation=(0.0, 0.0),
    mode: str = "constant",
    order: int = 1,
):
    """Center-referenced affine warp with pre/post translations.

    Mirrors reference transform_image (transforms.py:238-312), which chains
    skimage AffineTransforms: pre_translation -> to_center -> rotate/scale
    -> from_center -> post_translation, then warps by the inverse map.
    Translations and centers are (y, x).
    """
    image = jnp.asarray(image, jnp.float32)
    ny, nx = image.shape
    if rotation_center is None:
        center = np.array([ny, nx], dtype=np.float64) / 2.0
    else:
        center = np.asarray(rotation_center, dtype=np.float64)
    if np.isscalar(scale) or isinstance(scale, (int, float)):
        scale = (float(scale), float(scale))
    sy, sx = float(scale[0]), float(scale[1])

    def T(tx, ty):
        m = np.eye(3)
        m[0, 2], m[1, 2] = tx, ty
        return m

    theta = math.radians(rotation)
    RS = np.array(
        [
            [sx * math.cos(theta), -sy * math.sin(theta), 0.0],
            [sx * math.sin(theta), sy * math.cos(theta), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    # skimage transforms act on (x, y); translations given (y, x) are
    # reversed by the reference before use.
    pre = T(pre_translation[1], pre_translation[0])
    to_c = T(-center[1], -center[0])
    from_c = T(center[1], center[0])
    post = T(post_translation[1], post_translation[0])
    M = post @ from_c @ RS @ to_c @ pre
    Minv = np.linalg.inv(M)

    rr, cc = jnp.meshgrid(
        jnp.arange(ny, dtype=jnp.float32), jnp.arange(nx, dtype=jnp.float32), indexing="ij"
    )
    x_src = Minv[0, 0] * cc + Minv[0, 1] * rr + Minv[0, 2]
    y_src = Minv[1, 0] * cc + Minv[1, 1] * rr + Minv[1, 2]

    jmode = {
        "constant": "constant",
        "edge": "nearest",
        "symmetric": "reflect",
        "reflect": "mirror",
        "wrap": "wrap",
    }.get(mode, "constant")
    return map_coordinates(image, (y_src, x_src), order=order, mode=jmode)


def rotate_shift_image(
    data,
    angle: float = 0,
    pre_shift=(0, 0),
    post_shift=(0, 0),
    rotation_center=None,
    order: int = 1,
):
    """Rotate about a center with pre/post (y, x) shifts.

    Mirrors reference rotate_shift_image (transforms.py:315-369): builds
    the same affine matrix/offset pair and samples input at
    ``m @ out + offset``.
    """
    data = jnp.asarray(data, jnp.float32)
    if angle == 0 and tuple(pre_shift) == (0, 0) and tuple(post_shift) == (0, 0):
        return data * 1.0
    ny, nx = data.shape
    if rotation_center is None:
        rotation_center = np.array([ny // 2, nx // 2], dtype=np.float64)
    else:
        rotation_center = np.asarray(rotation_center, dtype=np.float64)
    ang = math.radians(angle)
    m = np.array(
        [[math.cos(ang), math.sin(ang)], [-math.sin(ang), math.cos(ang)]],
        dtype=np.float64,
    )
    offset = -m @ np.asarray(post_shift, dtype=np.float64)
    offset += rotation_center - m @ rotation_center
    offset += -np.asarray(pre_shift, dtype=np.float64)

    rr, cc = jnp.meshgrid(
        jnp.arange(ny, dtype=jnp.float32), jnp.arange(nx, dtype=jnp.float32), indexing="ij"
    )
    y_src = m[0, 0] * rr + m[0, 1] * cc + offset[0]
    x_src = m[1, 0] * rr + m[1, 1] * cc + offset[1]
    return map_coordinates(data, (y_src, x_src), order=order, mode="constant")


# ---------------------------------------------------------------------------
# crop / pad / clip (host-side numpy: shapes are dynamic)
# ---------------------------------------------------------------------------


def crop_center_z(data, n: int):
    """Keep *n* central Z slices (reference quirk: slice end is
    ``nz//2 + n//2 + n``, transforms.py:372-389)."""
    assert data.ndim == 3
    nz = data.shape[0]
    return data[nz // 2 - n // 2 : nz // 2 + n // 2 + n, :, :]


def crop_center(data, shape, center_offset=None):
    """Crop the central region (optionally offset) of a 2D/3D array."""
    assert data.ndim in (2, 3) and data.ndim == len(shape)
    if tuple(data.shape) == tuple(shape):
        return data
    if data.ndim == 2:
        ny, nx = data.shape
        my, mx = shape
        dy, dx = center_offset if center_offset is not None else (0, 0)
        y0 = max(0, ny // 2 + dy - my // 2)
        x0 = max(0, nx // 2 + dx - mx // 2)
        return data[y0 : min(ny, y0 + my), x0 : min(nx, x0 + mx)]
    nz, ny, nx = data.shape
    mz, my, mx = shape
    dz, dy, dx = center_offset if center_offset is not None else (0, 0, 0)
    z0 = max(0, nz // 2 + dz - mz // 2)
    y0 = max(0, ny // 2 + dy - my // 2)
    x0 = max(0, nx // 2 + dx - mx // 2)
    return data[
        z0 : min(nz, z0 + mz), y0 : min(ny, y0 + my), x0 : min(nx, x0 + mx)
    ]


def pad_to_size(data, shape):
    """Zero-pad a 2D/3D array to the target shape, centered."""
    assert data.ndim in (2, 3)
    if tuple(data.shape) == tuple(shape):
        return data
    xp = jnp if isinstance(data, jnp.ndarray) else np
    ny, nx = data.shape[-2:]
    my, mx = shape[-2:]
    yb = max(0, (my - ny) // 2)
    ya = max(0, my - yb - ny)
    xb = max(0, (mx - nx) // 2)
    xa = max(0, mx - xb - nx)
    if data.ndim == 2:
        return xp.pad(data, ((yb, ya), (xb, xa)))
    nz, mz = data.shape[0], shape[0]
    zb = max(0, (mz - nz) // 2)
    za = max(0, mz - zb - nz)
    return xp.pad(data, ((zb, za), (yb, ya), (xb, xa)))


def get_clip(image, y0: int, x0: int, height: int, width: int):
    """Rectangular clip with zero padding outside the image."""
    image = np.asarray(image)
    clip = np.zeros((height, width), dtype=image.dtype)
    yc, xc = max(0, y0), max(0, x0)
    y1 = min(y0 + height, image.shape[0])
    x1 = min(x0 + width, image.shape[1])
    if y1 > yc and x1 > xc:
        clip[yc - y0 : y1 - y0, xc - x0 : x1 - x0] = image[yc:y1, xc:x1]
    return clip


def get_clip3d(data, z0: int, y0: int, x0: int, nz: int, ny: int, nx: int):
    """3D clip with zero padding outside the volume."""
    data = np.asarray(data)
    clip = np.zeros((nz, ny, nx), dtype=data.dtype)
    zc, yc, xc = max(0, z0), max(0, y0), max(0, x0)
    z1 = min(z0 + nz, data.shape[0])
    y1 = min(y0 + ny, data.shape[1])
    x1 = min(x0 + nx, data.shape[2])
    if z1 > zc and y1 > yc and x1 > xc:
        clip[zc - z0 : z1 - z0, yc - y0 : y1 - y0, xc - x0 : x1 - x0] = data[
            zc:z1, yc:y1, xc:x1
        ]
    return clip


def get_rotated_clip(image, y0, x0, y1, x1, width: int, order: int = 1):
    """Extract a straightened strip along the segment (y0,x0)->(y1,x1)."""
    image = jnp.asarray(image, jnp.float32)
    dy, dx = y1 - y0, x1 - x0
    angle = math.atan2(dy, dx)
    length = math.hypot(dy, dx)
    xs = jnp.linspace(0.0, length, int(length))
    ys = jnp.linspace(-width / 2.0, width / 2.0, width)
    X, Y = jnp.meshgrid(xs, ys)
    xr = X * math.cos(angle) - Y * math.sin(angle) + x0
    yr = X * math.sin(angle) + Y * math.cos(angle) + y0
    return map_coordinates(image, (yr, xr), order=order, mode="constant")


# ---------------------------------------------------------------------------
# Fourier-space transforms
# ---------------------------------------------------------------------------


def fft_crop(data, output_size=None):
    """Downscale by truncating the Fourier transform (even sizes).

    Mirrors reference fft_crop (transforms.py:610-660) for 2D. For 3D the
    reference inverts only the last two axes (a latent bug); we invert all
    axes, which is the evident intent.
    """
    if output_size is None or tuple(data.shape) == tuple(output_size):
        return jnp.asarray(data)
    data = jnp.asarray(data, jnp.float32)
    assert data.ndim in (2, 3) and data.ndim == len(output_size)
    # fail fast on odd sizes: the half-open shift slices keep size//2*2
    # rows, so an odd request would silently return the wrong shape (or
    # diverge between the jnp.fft and matmul-DFT backends)
    assert all(s % 2 == 0 for s in output_size) and all(
        s % 2 == 0 for s in data.shape
    ), f"fft_crop requires even sizes, got {tuple(data.shape)} -> {tuple(output_size)}"
    if data.ndim == 2:
        ny, nx = data.shape
        ony, onx = output_size
        assert ony <= ny and onx <= nx
        fft = hfft.rfft2(data)
        fft = jnp.fft.fftshift(fft, axes=0)[
            ny // 2 - ony // 2 : ny // 2 + ony // 2, : onx // 2 + 1
        ]
        fft = jnp.fft.fftshift(fft, axes=0)
        return hfft.irfft2(fft, s=(ony, onx))
    nz, ny, nx = data.shape
    onz, ony, onx = output_size
    assert onz <= nz and ony <= ny and onx <= nx
    fft = hfft.rfftn(data)
    fft = jnp.fft.fftshift(fft, axes=(0, 1))[
        nz // 2 - onz // 2 : nz // 2 + onz // 2,
        ny // 2 - ony // 2 : ny // 2 + ony // 2,
        : onx // 2 + 1,
    ]
    fft = jnp.fft.fftshift(fft, axes=(0, 1))
    return hfft.irfftn(fft, s=(onz, ony, onx))


def fft_rescale(data, apix: float = 1.0, cutoff_res=None, output_size=None):
    """Evaluate the Fourier transform on a rescaled uniform grid.

    Exact chirp-Z replacement for the reference's finufft type-2 call
    (transforms.py:663-743): frequencies ``fftfreq(m) * 2*apix/cutoff``
    per axis, multiplied by the (-1)^(sum of indices) phase so the
    implied real-space origin matches. Returns complex coefficients in
    fftfreq layout; ``ifftn`` would recover the (rescaled) image.
    """
    data = jnp.asarray(data)

    def _center_phase(out_sizes, zooms, in_sizes):
        # The reference's finufft type-2 treats the data origin at the
        # ARRAY CENTER (indices -n/2 .. n/2-1); the czt here is
        # corner-origin. exp(2*pi*i*f*(n_in/2)) per axis re-centers so
        # the zoom acts about the image center and, combined with the
        # (-1)^(sum of output indices) phase, ifftn recovers the image
        # at its original position (reference transforms.py:702-743).
        ph = None
        for om, zoom, n_in in zip(out_sizes, zooms, in_sizes):
            f = np.fft.fftfreq(om) * zoom
            p = np.exp(2j * np.pi * f * (n_in / 2.0))
            ph = p if ph is None else np.multiply.outer(ph, p)
        return ph

    def _apply_phase(fft, ph):
        # decomposed complex multiply: the axon TPU backend lacks the
        # complex-arithmetic HLOs (same reason core/fft.py emulates the
        # DFT with real matmuls)
        pr = jnp.asarray(np.real(ph).astype(np.float32))
        pi = jnp.asarray(np.imag(ph).astype(np.float32))
        fr = jnp.real(fft)
        fi = jnp.imag(fft)
        return jax.lax.complex(fr * pr - fi * pi, fr * pi + fi * pr)

    if data.ndim == 2:
        cy, cx = cutoff_res if cutoff_res else (2 * apix, 2 * apix)
        ony, onx = output_size if output_size else data.shape
        zooms = (2 * apix / cy, 2 * apix / cx)
        fft = zoom_fft_2d(data, (ony, onx), zooms)
        iy = np.indices((ony, onx)).sum(axis=0) % 2
        ph = _center_phase((ony, onx), zooms, data.shape) * np.where(iy, -1.0, 1.0)
        return _apply_phase(fft, ph)
    if data.ndim == 3:
        cz, cy, cx = cutoff_res if cutoff_res else (2 * apix,) * 3
        onz, ony, onx = output_size if output_size else data.shape
        zooms = (2 * apix / cz, 2 * apix / cy, 2 * apix / cx)
        fft = zoom_fft_3d(data, (onz, ony, onx), zooms)
        idx = np.indices((onz, ony, onx)).sum(axis=0) % 2
        ph = _center_phase((onz, ony, onx), zooms, data.shape) * np.where(idx, -1.0, 1.0)
        return _apply_phase(fft, ph)
    raise ValueError("only 2D images and 3D maps are supported")


def flip_hand(data, axis: str = "x"):
    """Mirror a 3D volume along one axis (handedness flip)."""
    if axis == "x":
        return data[:, :, ::-1]
    if axis == "y":
        return data[:, ::-1, :]
    if axis == "z":
        return data[::-1, :, :]
    raise ValueError("axis must be 'x', 'y', or 'z'")


def compute_power_spectra(
    data,
    apix: float,
    cutoff_res=None,
    output_size=None,
    log: bool = True,
    low_pass_fraction: float = 0,
    high_pass_fraction: float = 0,
):
    """Power spectrum + phase on a rescaled Fourier grid (hill primitive).

    Mirrors reference compute_power_spectra (transforms.py:771-820).
    """
    from .filters import low_high_pass_filter, normalize_percentile

    fft = fft_rescale(data, apix=apix, cutoff_res=cutoff_res, output_size=output_size)
    fft = jnp.fft.fftshift(fft)
    pwr = jnp.log1p(jnp.abs(fft)) if log else jnp.abs(fft)
    if 0 < low_pass_fraction < 1 or 0 < high_pass_fraction < 1:
        pwr = low_high_pass_filter(
            pwr,
            low_pass_fraction=low_pass_fraction,
            high_pass_fraction=high_pass_fraction,
        )
    pwr = normalize_percentile(pwr, percentile=(0, 100))
    phase = jnp.angle(fft)
    return pwr, phase


def compute_phase_difference_across_meridian(phase):
    """Friedel phase difference across the meridian, mapped to [0, 180] deg.

    Mirrors reference (transforms.py:823-842): 0 -> even Bessel order,
    180 -> odd order.
    """
    phase = jnp.asarray(phase)
    diff = jnp.zeros_like(phase)
    diff = diff.at[..., 1:].set(phase[..., 1:] - phase[..., 1:][..., ::-1])
    return jnp.rad2deg(jnp.arccos(jnp.cos(diff)))
