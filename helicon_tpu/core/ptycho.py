"""4D-STEM ptychography: h5 ingest + native reconstruction engine.

Reference: lib/ptycho.py — load_h5_file (12-52) reads a py4DSTEM-style h5
dataset (EMPIAR-12236 layout); reconstruct_ptychography (54-239) drives
py4DSTEM's Parallax (tcBF aberration estimation) and
SingleslicePtychography (gradient-based phase retrieval) on CPU/GPU.

Here both stages are native JAX, no py4DSTEM:

- Parallax defocus estimation: virtual bright-field images from detector
  pixels inside the BF disk are cross-correlated against the central BF
  image; the paraxial shift model  shift(θ) = -C1·θ  is fit by least
  squares over the sampled detector angles (the same physics py4DSTEM's
  Parallax.aberration_fit extracts from its alignment field).
- Single-slice reconstruction: batched ePIE (extended ptychographic
  iterative engine) — vmapped probe·object patches, batched FFTs, modulus
  replacement, scatter-add object updates; the probe update keeps the
  Fourier amplitude pinned to the vacuum probe (the reference runs with
  fix_probe_aperture=True). Everything is jittable and batch-first, so
  the per-batch step maps onto the MXU/VPU and scales with jax.sharding
  over the scan-position axis if needed.

Conventions: object_type="potential" like the reference — the returned
array is the object phase (radians), cropped by `crop_margin`.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "load_h5_file",
    "reconstruct_ptychography",
    "electron_wavelength_angstrom",
    "get_probe_size",
    "estimate_defocus_parallax",
]


def load_h5_file(filepath: str):
    """Load a 4D-STEM dataset (reference ptycho.py:12-52 contract).

    Returns (data, vacuumProbe, AccVoltage_V, SemiConvAngle_mrad,
    R_pixel_A). Prefers the EMPIAR-12236 layout ("data" + "vacuumProbe"
    datasets with the reference attribute names); falls back to the first
    4D dataset found plus generic attribute names (energy [keV],
    convergence semi-angle, pixel_size/apix) with vacuumProbe=None.
    """
    from pathlib import Path

    import h5py

    extension = Path(filepath).suffix.lower()
    if extension != ".h5":
        raise ValueError("only hdf5 (.h5) files are supported")

    with h5py.File(filepath, "r") as f:
        if "data" in f:
            node = f["data"]
            data = np.asarray(node)
            vacuum = np.asarray(f["vacuumProbe"]) if "vacuumProbe" in f else None
            attrs = dict(node.attrs)
            acc_v = float(attrs.get("Acceleration voltage [kV]", 300.0)) * 1e3
            semi = float(attrs.get("Convergence semi-angle [mrad]", 0.0))
            r_pix = float(attrs.get("STEM step-size [A]", 1.0))
            return data, vacuum, acc_v, semi, r_pix

        def find_dataset(node, path=""):
            out = []
            for key, item in node.items():
                p = f"{path}/{key}"
                if isinstance(item, h5py.Dataset) and item.ndim == 4:
                    out.append(p)
                elif isinstance(item, h5py.Group):
                    out.extend(find_dataset(item, p))
            return out

        candidates = find_dataset(f)
        if not candidates:
            raise ValueError(f"{filepath}: no 4D dataset found")
        node = f[candidates[0]]
        data = np.asarray(node)
        # nearest attribute wins: apply root first, dataset last
        chain = []
        n = node
        while n is not None:
            chain.append(n)
            n = n.parent if n.name != "/" else None
        attrs: dict = {}
        for g in reversed(chain):
            attrs.update(dict(g.attrs))
        acc_v = float(attrs.get("energy", attrs.get("E_keV", 300.0))) * 1e3
        semi = float(attrs.get("Convergence semi-angle [mrad]",
                               attrs.get("semiconv_mrad", 0.0)))
        r_pix = float(attrs.get("STEM step-size [A]",
                                attrs.get("pixel_size", attrs.get("apix", 1.0))))
        return data, None, acc_v, semi, r_pix


def electron_wavelength_angstrom(voltage_v: float) -> float:
    """Relativistic electron wavelength (A) at the given voltage (V).

    Delegates to ctf.electron_wavelength (exact CODATA constants) — one
    source of truth for lambda across CTF simulation and ptychography."""
    from .ctf import electron_wavelength

    return float(electron_wavelength(voltage_v / 1000.0))


def get_probe_size(dp_mean, thresh: float = 0.5):
    """(radius_px, qx0, qy0) of the bright-field disk in a mean
    diffraction pattern (py4DSTEM get_probe_size semantics: the radius
    where the azimuthal average falls to `thresh` of its peak)."""
    dp = np.asarray(dp_mean, np.float64)
    total = dp.sum()
    if total <= 0:
        raise ValueError("empty diffraction pattern")
    ys, xs = np.indices(dp.shape)
    qx0 = float((ys * dp).sum() / total)
    qy0 = float((xs * dp).sum() / total)
    r = np.hypot(ys - qx0, xs - qy0)
    rbin = r.astype(np.int64)
    prof = np.bincount(rbin.ravel(), weights=dp.ravel()) / np.maximum(
        np.bincount(rbin.ravel()), 1
    )
    level = thresh * prof.max()
    below = np.nonzero(prof < level)[0]
    radius = float(below[0]) if len(below) else float(len(prof) - 1)
    return radius, qx0, qy0


def _phase_cross_correlation_shift(a, b):
    """Integer+parabolic-subpixel shift of a relative to b (2D, FFT):
    for b = shift(a, s) this returns -s (the convention the parallax
    C1 fit in estimate_defocus_parallax is built on)."""
    up = 8  # subpixel resolution 1/up px via Fourier zero-padding
    A = np.fft.fft2(np.asarray(a, np.float64))
    B = np.fft.fft2(np.asarray(b, np.float64))
    C = np.fft.fftshift(A * np.conj(B))
    ny, nx = C.shape
    pad = np.zeros((ny * up, nx * up), np.complex128)
    y0, x0 = (ny * up - ny) // 2, (nx * up - nx) // 2
    pad[y0 : y0 + ny, x0 : x0 + nx] = C
    cc = np.fft.ifft2(np.fft.ifftshift(pad)).real
    idx = np.unravel_index(np.argmax(cc), cc.shape)
    shift = []
    for ax, i in enumerate(idx):
        n = cc.shape[ax]
        s = i if i <= n / 2 else i - n
        shift.append(s / up)
    return np.asarray(shift)


def estimate_defocus_parallax(
    data,
    wavelength_a: float,
    q_pixel_mrad: float,
    r_pixel_a: float,
    bf_radius_px: float,
    center,
    max_samples: int = 48,
):
    """Parallax (tcBF) defocus estimate in Angstroms.

    Virtual BF image from detector pixel at angle θ is shifted by
    -C1·θ (A) relative to the axial image; least-squares over sampled
    BF-disk pixels (reference drives py4DSTEM Parallax for the same
    quantity; aberration_C1, ptycho.py:208-215).
    """
    data = np.asarray(data)
    sr, sc, ny, nx = data.shape
    cy, cx = center
    ys, xs = np.indices((ny, nx))
    rr = np.hypot(ys - cy, xs - cx)
    inside = (rr < 0.8 * bf_radius_px) & (rr > 0)
    cand = np.argwhere(inside)
    if len(cand) == 0:
        return 0.0
    # deterministic subsample spread over the disk
    step = max(1, len(cand) // max_samples)
    cand = cand[::step][:max_samples]
    ref_img = data[:, :, int(round(cy)), int(round(cx))]
    thetas, shifts = [], []
    for (iy, ix) in cand:
        img = data[:, :, iy, ix]
        if img.std() == 0 or ref_img.std() == 0:
            continue
        sh = _phase_cross_correlation_shift(ref_img, img)  # scan pixels
        theta = (
            np.asarray([iy - cy, ix - cx], np.float64) * q_pixel_mrad * 1e-3
        )  # radians
        thetas.append(theta)
        shifts.append(sh * r_pixel_a)  # Angstroms
    if not thetas:
        return 0.0
    T = np.stack(thetas)  # (n, 2) radians
    S = np.stack(shifts)  # (n, 2) Angstroms

    # shift = -C1 * theta + b_axis. The per-axis intercepts absorb the
    # reference pixel's own nonzero angle and any bright-field-center
    # estimation error; the TRIMMED refit drops decorrelated samples —
    # virtual BF images near the disk edge lose correlation with the
    # axial image and return wrap-around garbage shifts that otherwise
    # dominate the fit (observed: a 0.1 px center shift changing the
    # sample set flipped the fitted C1 sign entirely).
    def fit(T, S):
        n = len(T)
        A = np.zeros((2 * n, 3))
        A[:n, 0] = -T[:, 0]
        A[n:, 0] = -T[:, 1]
        A[:n, 1] = 1.0
        A[n:, 2] = 1.0
        b = np.concatenate([S[:, 0], S[:, 1]])
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        resid = A @ sol - b
        per_sample = np.hypot(resid[:n], resid[n:])
        return sol, per_sample

    sol, resid = fit(T, S)
    for _ in range(3):
        if len(T) <= 6:
            break
        keep = resid <= max(2.0 * np.median(resid), 1e-12)
        # always keep at least half (trim at most the worst half)
        if keep.sum() < max(6, len(T) // 2):
            keep = np.argsort(resid)[: max(6, len(T) // 2)]
        T2, S2 = T[keep], S[keep]
        if len(T2) == len(T):
            break
        T, S = T2, S2
        sol, resid = fit(T, S)
    return float(sol[0])


def _build_probe(vacuum_intensity, det_shape, bf_radius_px, center,
                 wavelength_a, q_pixel_mrad, defocus_a):
    """Complex probe array (corner/FFT order) from the vacuum-probe
    intensity (or a hard aperture) plus a defocus aberration phase."""
    ny, nx = det_shape
    if vacuum_intensity is not None:
        amp_c = np.sqrt(np.clip(np.asarray(vacuum_intensity, np.float64), 0, None))
    else:
        ys, xs = np.indices((ny, nx))
        rr = np.hypot(ys - center[0], xs - center[1])
        amp_c = (rr <= bf_radius_px).astype(np.float64)
    # centered -> FFT order, with the pattern center moved to (0, 0)
    amp = np.roll(
        amp_c,
        (-int(round(center[0])), -int(round(center[1]))),
        axis=(0, 1),
    )
    ky = np.fft.fftfreq(ny)[:, None] * ny
    kx = np.fft.fftfreq(nx)[None, :] * nx
    k_a = np.hypot(ky, kx) * (q_pixel_mrad * 1e-3) / wavelength_a  # A^-1
    chi = np.pi * wavelength_a * (k_a**2) * defocus_a
    probe_f = amp * np.exp(1j * chi)
    probe = np.fft.ifft2(probe_f)
    # normalize total intensity to the measured mean pattern scale
    norm = np.sqrt((np.abs(probe) ** 2).sum())
    if norm > 0:
        probe = probe / norm
    return probe.astype(np.complex64)


def _epie_reconstruct(
    amplitudes,
    probe0,
    positions,
    obj_shape,
    num_iter: int,
    step_size: float,
    batch_size: int,
    fix_probe_aperture: bool = True,
):
    """Batched ePIE. amplitudes (N, py, px) in FFT (corner) order;
    positions (N, 2) integer patch corners; returns (object, probe)."""
    import jax
    import jax.numpy as jnp

    # FFTs route through the core.fft facade (matmul-DFT fallback where
    # the backend lacks the FFT HLO, e.g. the axon TPU tunnel)
    from .fft import fft2 as _fft2, ifftn as _ifftn

    def _ifft2(z):
        return _ifftn(z, axes=(-2, -1))

    n, py, px = amplitudes.shape
    oy, ox = obj_shape
    alpha = jnp.float32(step_size)
    probe_f_amp = jnp.abs(_fft2(jnp.asarray(probe0)))

    iy = jnp.arange(py)
    ix = jnp.arange(px)

    @jax.jit
    def batch_step(obj, probe, amps, pos):
        rows = pos[:, 0:1, None] + iy[None, :, None]  # (B, py, 1)
        cols = pos[:, 1:2, None] + ix[None, None, :]  # (B, 1, px)
        patches = obj[rows, cols]  # (B, py, px)
        psi = probe[None] * patches
        big_psi = _fft2(psi)
        big_psi_new = amps * jnp.exp(1j * jnp.angle(big_psi))
        dpsi = _ifft2(big_psi_new) - psi
        p_max = jnp.maximum(jnp.max(jnp.abs(probe)) ** 2, 1e-12)
        upd = alpha * jnp.conj(probe)[None] / p_max * dpsi
        # overlap-average the batch update (parallel ePIE)
        num = jnp.zeros(obj_shape, jnp.complex64).at[rows, cols].add(upd)
        cnt = jnp.zeros(obj_shape, jnp.float32).at[rows, cols].add(
            jnp.ones_like(dpsi, jnp.float32)
        )
        obj = obj + num / jnp.maximum(cnt, 1.0)
        o_max = jnp.maximum(jnp.max(jnp.abs(patches)) ** 2, 1e-12)
        dprobe = jnp.mean(alpha * jnp.conj(patches) / o_max * dpsi, axis=0)
        probe = probe + dprobe
        if fix_probe_aperture:
            pf = _fft2(probe)
            probe = _ifft2(probe_f_amp * jnp.exp(1j * jnp.angle(pf)))
        return obj, probe

    obj = jnp.ones(obj_shape, jnp.complex64)
    probe = jnp.asarray(probe0, jnp.complex64)
    amps = jnp.asarray(amplitudes, jnp.float32)
    pos = jnp.asarray(positions, jnp.int32)
    n_batches = max(1, (n + batch_size - 1) // batch_size)
    order = np.arange(n)
    rng = np.random.default_rng(0)
    for _ in range(num_iter):
        rng.shuffle(order)
        for b in range(n_batches):
            sl = order[b * batch_size : (b + 1) * batch_size]
            if len(sl) == 0:
                continue
            obj, probe = batch_step(obj, probe, amps[sl], pos[sl])

    def to_host(z):
        # complex64 device->host transfer is unimplemented on the axon
        # TPU backend (see core/fft.py caveat): move real/imag separately
        return np.asarray(jnp.real(z)) + 1j * np.asarray(jnp.imag(z))

    return to_host(obj), to_host(probe)


def reconstruct_ptychography(
    filepath: str,
    defocus_initial_guess: float = -15000,
    iteration_times: int = 30,
    com_rotation_force: float = 89.8,
    com_transpose_force: bool = False,
    dataset_scan_size: tuple = (128, 128),
    batch_size: int = 256,
    step_size: float = 0.5,
    crop_margin: int = 16,
    num_iter: int = 5,
) -> np.ndarray:
    """Reconstruct the object phase from a 4D-STEM h5 file.

    Native JAX counterpart of the reference driver (ptycho.py:54-239):
    parallax defocus estimation on a row-cropped subset, then batched
    ePIE single-slice ptychography with the probe built from the vacuum
    probe intensity + estimated defocus. Returns the reconstructed
    potential (object phase, radians) cropped by `crop_margin`, like the
    reference's ptycho.object_cropped[crop_margin:-crop_margin, ...].
    `iteration_times` is accepted for interface parity (the reference
    accepts it and never forwards it, ptycho.py:60/225-237); ePIE runs
    num_iter epochs like the reference's reconstruct(num_iter=...).
    """
    from pathlib import Path

    if not (isinstance(filepath, str) and len(filepath) > 0):
        raise ValueError("filepath must be a non-empty string")
    if not Path(filepath).exists():
        raise ValueError(f"File {filepath} does not exist")
    if num_iter <= 0 or step_size <= 0 or batch_size <= 0:
        raise ValueError("num_iter, step_size, batch_size must be positive")

    data, vacuum, acc_voltage, semiconv_mrad, r_pixel_a = load_h5_file(filepath)
    data = np.asarray(data, np.float32)
    sr, sc, ny, nx = data.shape
    wavelength = electron_wavelength_angstrom(acc_voltage)

    dp_mean = data.mean(axis=(0, 1))
    bf_radius, qx0, qy0 = get_probe_size(dp_mean)
    if semiconv_mrad <= 0:
        semiconv_mrad = 1.0  # undetermined calibration: nominal value
    q_pixel_mrad = semiconv_mrad / max(bf_radius, 1e-6)

    # parallax defocus estimate on a row-cropped subset (reference uses
    # data[0:64, :], ptycho.py:176)
    subset = data[: min(64, sr)]
    defocus = estimate_defocus_parallax(
        subset, wavelength, q_pixel_mrad, r_pixel_a, bf_radius, (qx0, qy0)
    )
    if not np.isfinite(defocus) or defocus == 0.0:
        defocus = float(defocus_initial_guess)

    # real-space sampling of the probe/object grid
    dx = wavelength / (ny * q_pixel_mrad * 1e-3)  # A per object pixel
    step_px = r_pixel_a / dx

    # scan lattice -> object pixels, with the forced R/Q rotation applied
    # to the lattice (the reference rotates Q-space by the same angle)
    theta = np.deg2rad(com_rotation_force)
    ii, jj = np.meshgrid(np.arange(sr), np.arange(sc), indexing="ij")
    if com_transpose_force:
        ii, jj = jj, ii
    ry = step_px * (np.cos(theta) * ii - np.sin(theta) * jj)
    rx = step_px * (np.sin(theta) * ii + np.cos(theta) * jj)
    ry -= ry.min()
    rx -= rx.min()
    pad = 16  # reference object_padding_px=(16, 16)
    positions = np.stack(
        [np.round(ry.ravel()) + pad, np.round(rx.ravel()) + pad], axis=1
    ).astype(np.int32)
    obj_shape = (
        int(positions[:, 0].max()) + ny + pad,
        int(positions[:, 1].max()) + nx + pad,
    )

    probe0 = _build_probe(
        vacuum, (ny, nx), bf_radius, (qx0, qy0), wavelength, q_pixel_mrad, defocus
    )
    # measured amplitudes, centered pattern -> FFT corner order
    amps = np.sqrt(np.clip(data.reshape(-1, ny, nx), 0, None))
    amps = np.roll(
        amps, (-int(round(qx0)), -int(round(qy0))), axis=(1, 2)
    ).astype(np.float32)
    # scale to the unnormalized-FFT convention: with the probe at unit
    # energy and |O| ~ 1, sum |F[probe*patch]|^2 = ny*nx, so the measured
    # amplitudes must carry the same total
    scale = np.sqrt((amps**2).sum(axis=(1, 2)))
    amps = amps * (np.sqrt(ny * nx) / np.maximum(scale.mean(), 1e-12))

    obj, _ = _epie_reconstruct(
        amps,
        probe0,
        positions,
        obj_shape,
        num_iter=num_iter,
        step_size=step_size,
        batch_size=min(batch_size, len(positions)),
    )
    potential = np.angle(obj).astype(np.float32)
    if crop_margin > 0:
        potential = potential[crop_margin:-crop_margin, crop_margin:-crop_margin]
    return potential
