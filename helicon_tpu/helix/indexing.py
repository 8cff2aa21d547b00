"""Native helical indexing from power spectra (the HILL capability).

The reference ships `helicon hill` only as a launcher that downloads the
jianglab/HILL app at runtime (reference commands/hill.py:14-24, 38-69);
the underlying layer-line math lives in `compute_power_spectra` +
`compute_phase_difference_across_meridian` (reference
lib/transforms.py:771-842). This module implements the indexing core
natively so the framework is self-contained:

- detect_layer_lines: peak rows of a (pwr) spectrum above a smoothed
  radial background.
- estimate_bessel_order: invert the first-maximum position of |J_n|
  (x_peak ~= n + 0.8086 n^(1/3)) given the filament radius.
- estimate_helical_parameters: image -> candidate (twist, rise, csym)
  table from the detected lines via the helical selection rule
  Z = n/P + m/rise.

The spectra come from the jittable compute_power_spectra; the per-row
reductions detection needs (layer_line_profiles) are jittable too, so a
batched pipeline (detect_layer_lines_batch) keeps the full spectra on
the device and ships only three length-ny vectors per image to the
host, where the serial peak/selection-rule logic runs on numpy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "LayerLine",
    "detect_layer_lines",
    "detect_layer_lines_batch",
    "layer_line_profiles",
    "estimate_bessel_order",
    "estimate_helical_parameters",
    "bessel_first_peak_x",
]


def bessel_first_peak_x(n: int) -> float:
    """Position of the first maximum of |J_n(x)| (n >= 0).

    J_0 peaks at x=0; for n >= 1 the standard asymptotic
    x ~= n + 0.8086434 n^(1/3) is accurate to ~2% at n = 1
    (1.8086 vs the true 1.8412) and <1% for n >= 3.
    """
    n = abs(int(n))
    if n == 0:
        return 0.0
    return n + 0.8086434 * n ** (1.0 / 3.0)


@dataclass
class LayerLine:
    """One detected layer line."""

    Z: float  # height, 1/A (absolute value; lines come in +/- pairs)
    intensity: float  # peak power along the line
    r_peak: float  # in-plane frequency (1/A) of the strongest peak
    bessel_order: int | None = None  # estimated |n|, None if no radius given
    meridional: bool = False  # peak on (or adjacent to) the meridian
    candidates: list = field(default_factory=list)


def _masked_row(pwr: np.ndarray, p: int, cx: int) -> np.ndarray:
    row = pwr[p].copy()
    row[max(0, cx - 1) : cx + 2] = 0.0
    return row


def _row_profile(pwr: np.ndarray) -> np.ndarray:
    """Per-row line strength: max over the in-plane axis, excluding the
    3-pixel meridian core (dominated by the equator/DC ridge)."""
    ny, nx = pwr.shape
    cx = nx // 2
    masked = pwr.copy()
    masked[:, max(0, cx - 1) : cx + 2] = 0.0
    return masked.max(axis=1)


def layer_line_profiles(pwr):
    """Per-row reductions of (a batch of) power spectra — all the data
    detection needs, jittable so it runs on the accelerator.

    The full spectrum never has to leave the device: detection reads
    only three length-ny vectors per image (row-strength profile,
    in-row argmax, meridian profile) — ~nx fewer bytes over the wire
    than shipping the spectrum itself, which is what makes the batched
    hill pipeline tunnel-transfer-proof.

    pwr: (..., ny, nx) fftshifted spectra.
    Returns (off_prof, off_argmax, merid_prof), each (..., ny).
    """
    import jax.numpy as jnp

    pwr = jnp.asarray(pwr)
    nx = pwr.shape[-1]
    cx = nx // 2
    col = jnp.arange(nx)
    merid = (col >= max(0, cx - 1)) & (col < cx + 2)
    masked = jnp.where(merid, 0.0, pwr)
    off_prof = masked.max(axis=-1)
    off_argmax = masked.argmax(axis=-1)
    merid_prof = jnp.where(merid, pwr, 0.0).max(axis=-1)
    return off_prof, off_argmax, merid_prof


def detect_layer_lines(
    pwr,
    apix: float,
    min_prominence: float = 3.0,
    max_lines: int = 10,
    radius: float | None = None,
):
    """Detect layer lines in a fftshifted power spectrum.

    pwr: (ny, nx) power spectrum (e.g. from compute_power_spectra),
    meridian along the central column, equator along the central row.
    min_prominence: required peak height in MAD units above the local
    background of the row-strength profile.
    radius: filament radius in Angstrom; when given, each line gets a
    Bessel-order estimate from its first-peak position.

    Returns a list of LayerLine sorted by Z (equator excluded).
    """
    pwr = np.asarray(pwr, np.float64)
    ny, nx = pwr.shape
    cx = nx // 2
    masked = pwr.copy()
    masked[:, max(0, cx - 1) : cx + 2] = 0.0
    off_prof = masked.max(axis=1)
    off_argmax = masked.argmax(axis=1)
    merid_prof = pwr[:, max(0, cx - 1) : cx + 2].max(axis=1)
    return _detect_from_profiles(
        off_prof, off_argmax, merid_prof, nx, apix,
        min_prominence=min_prominence, max_lines=max_lines, radius=radius,
    )


def detect_layer_lines_batch(
    pwrs,
    apix: float,
    min_prominence: float = 3.0,
    max_lines: int = 10,
    radius: float | None = None,
):
    """Detect layer lines for a stack of spectra, device-efficiently.

    The per-row reductions (:func:`layer_line_profiles`) run on the
    accelerator in one batched call; only (3, batch, ny) floats cross to
    the host, where the serial peak logic runs per image. Returns a list
    of per-image line lists (same results as mapping
    :func:`detect_layer_lines`).
    """
    import jax
    import jax.numpy as jnp

    # one fused (3, batch, ny) float32 pull: each host<->device round
    # trip over the tunneled backend costs ~25 ms, so three separate
    # array pulls would triple the wire latency (argmax is exact in
    # f32 for any ny below 2^24)
    @jax.jit
    def _stacked(p):
        a, b, c = layer_line_profiles(p)
        return jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32),
                          c.astype(jnp.float32)])

    packed = np.asarray(_stacked(pwrs))
    off_prof, off_argmax, merid_prof = packed[0], packed[1], packed[2]
    off_argmax = off_argmax.astype(np.int64)
    nx = np.shape(pwrs)[-1]
    return [
        _detect_from_profiles(
            off_prof[i], off_argmax[i], merid_prof[i], nx, apix,
            min_prominence=min_prominence, max_lines=max_lines, radius=radius,
        )
        for i in range(off_prof.shape[0])
    ]


def _detect_from_profiles(
    off_prof,
    off_argmax,
    merid_prof,
    nx: int,
    apix: float,
    min_prominence: float = 3.0,
    max_lines: int = 10,
    radius: float | None = None,
):
    """Shared peak logic on the per-row profiles (see
    :func:`layer_line_profiles` for what each vector carries)."""
    from scipy.ndimage import median_filter
    from scipy.signal import find_peaks

    off_prof = np.asarray(off_prof, np.float64)
    merid_prof = np.asarray(merid_prof, np.float64)
    ny = off_prof.shape[0]
    sy = np.fft.fftshift(np.fft.fftfreq(ny, d=apix))
    sx = np.fft.fftshift(np.fft.fftfreq(nx, d=apix))

    def _peak_rows(prof):
        bg = median_filter(prof, size=max(5, ny // 16))
        resid = prof - bg
        mad = np.median(np.abs(resid - np.median(resid))) * 1.4826 + 1e-12
        peaks, _ = find_peaks(resid, height=min_prominence * mad)
        # merge +/-Z pairs: keep the stronger of each pair
        by_absz: dict[float, tuple[int, float]] = {}
        for p in peaks:
            Z = abs(float(sy[p]))
            if Z <= 1e-9:
                continue
            key = round(Z, 6)
            if key not in by_absz or prof[p] > by_absz[key][1]:
                by_absz[key] = (p, float(prof[p]))
        return by_absz

    # two independent detections: the meridian column (n = 0 lines: the
    # rise family) carries the shape-transform streak of the finite
    # filament, which would contaminate a single joint peak search.
    off = _peak_rows(off_prof)
    on = _peak_rows(merid_prof)

    lines = []
    off_px = {}  # row -> off-meridian argmax, reused by the ghost filter
    for key, (p, inten) in sorted(off.items()):
        px = int(off_argmax[p])
        off_px[p] = px
        r_peak = abs(float(sx[px]))
        n_est = None
        if radius is not None and radius > 0:
            n_est = estimate_bessel_order(r_peak, radius)
        lines.append(
            LayerLine(
                Z=key, intensity=inten, r_peak=r_peak,
                bessel_order=n_est, meridional=False,
            )
        )
    dZ = abs(float(sy[1] - sy[0])) if ny > 1 else 1.0
    df = abs(float(sx[1] - sx[0])) if nx > 1 else 1.0
    # a low-|n| line peaking closer to the meridian than this is likely a
    # streak ghost; a true n = 0 line's first J0 sidelobe sits at
    # x = 3.83, well beyond the n = 1 peak at x = 1.84
    if radius is not None and radius > 0:
        r_ghost = 0.5 * (1.84 + 3.83) / (2.0 * math.pi * radius)
    else:
        r_ghost = 4.0 * df
    ghost_Z = {
        k for k, (p, _) in off.items()
        if 0 < abs(float(sx[off_px[p]])) < r_ghost
    }
    for key, (p, inten) in sorted(on.items()):
        # a meridional line must beat the off-meridian peak on its row
        if merid_prof[p] <= off_prof[p]:
            continue
        # drop streak ghosts: an "on-meridian" peak coincident with a
        # NEAR-meridian off line is that line's tail riding the
        # finite-length shape-transform streak, not an n = 0 line
        if any(abs(key - k) <= 1.5 * dZ for k in ghost_Z):
            continue
        lines.append(
            LayerLine(
                Z=key, intensity=inten, r_peak=0.0,
                bessel_order=0 if radius else None, meridional=True,
            )
        )
    lines.sort(key=lambda l: -l.intensity)
    lines = lines[:max_lines]
    lines.sort(key=lambda l: l.Z)
    return lines


def estimate_bessel_order(r_peak: float, radius: float) -> int:
    """|n| whose first |J_n| maximum sits nearest to x = 2 pi R r_peak."""
    x = 2.0 * math.pi * radius * r_peak
    best, best_err = 0, abs(x - bessel_first_peak_x(0))
    n = 1
    while True:
        err = abs(x - bessel_first_peak_x(n))
        if err < best_err:
            best, best_err = n, err
        # first-peak positions are increasing in n; stop once past x
        if bessel_first_peak_x(n) > x and n > best + 2:
            break
        n += 1
        if n > 200:
            break
    return best


def _harmonic_support(pitch, lines, exclude=None):
    """Summed intensity of detected lines sitting near an integer
    harmonic k = Z * pitch of the candidate pitch. round(k) >= 1: the
    0th harmonic is the equator, so a low-frequency line near k ~ 0 is
    NOT harmonic support."""
    support = 0.0
    for q in lines:
        k = q.Z * pitch
        if q is not exclude and round(k) >= 1 and abs(k - round(k)) < 0.15:
            support += q.intensity
    return support


def estimate_helical_parameters(
    image=None,
    apix: float = 1.0,
    diameter: float | None = None,
    pwr=None,
    csym: int = 1,
    min_prominence: float = 3.0,
    max_lines: int = 10,
    rise_range: tuple[float, float] = (1.5, 200.0),
    radius_factor: float = 0.75,
):
    """Candidate (twist, rise) table from layer lines of one 2D image.

    Either `image` (real-space class average / segment with the filament
    axis VERTICAL, the HILL display convention — transpose a
    denovo3D-convention horizontal-axis image first) or a precomputed
    fftshifted `pwr` spectrum must be given. diameter (Angstrom) enables
    Bessel-order estimation (radius = diameter / 2 * 0.75, the
    peak-density radius heuristic).

    Uses the helical selection rule Z = n/P + m/rise:
    - a meridional line (n = 0, m = 1) fixes rise = 1 / Z,
    - the lowest non-meridional line with |n| = 1 (or the lowest line
      when orders are unknown) fixes pitch P = 1 / Z, twist =
      360 * rise / P.

    Returns dict(layer_lines=[LayerLine...], candidates=[{twist, rise,
    pitch, csym, Z_pitch, Z_rise}...]) sorted by decreasing line
    intensity support. Candidates are empty if fewer than one usable
    line is found.
    """
    if pwr is None:
        if image is None:
            raise ValueError("either image or pwr is required")
        from ..core.transforms import compute_power_spectra

        img = np.asarray(image, np.float32)
        pwr_j, _ = compute_power_spectra(img, apix=apix)
        pwr = np.asarray(pwr_j)
    # the scattering-mass radius is typically inside the envelope
    # diameter; radius_factor=1.0 when the density sits at diameter/2
    radius = None if diameter is None else radius_factor * diameter / 2.0
    lines = detect_layer_lines(
        pwr, apix, min_prominence=min_prominence, max_lines=max_lines,
        radius=radius,
    )
    candidates = []
    merid = [l for l in lines if l.meridional or l.bessel_order == 0]
    non_merid = [l for l in lines if not (l.meridional or l.bessel_order == 0)]

    # pitch from the lowest non-meridional line; its Bessel order n means
    # the line sits at n / P (near-equatorial lines of an n-start family)
    pitch_lines = sorted(non_merid, key=lambda l: l.Z)
    pitches = []
    for p in pitch_lines[:3]:
        n = p.bessel_order if p.bessel_order else 1
        pitch = n / p.Z
        support = p.intensity + _harmonic_support(pitch, non_merid, exclude=p)
        pitches.append((pitch, p, support))

    # rise from the lowest meridional (n = 0, m = 1) line
    rises = []
    for m in sorted(merid, key=lambda l: l.Z):
        rise = 1.0 / m.Z
        if rise_range[0] <= rise <= rise_range[1]:
            rises.append((rise, m))

    for pitch, pline, psupport in pitches:
        if rises:
            for rise, mline in rises:
                twist = 360.0 * rise / pitch
                # rise ~ pitch means the "rise" line was the pitch
                # family's own streak: degenerate, not a real candidate
                if twist >= 355.0:
                    continue
                # the power spectrum cannot resolve the twist sign /
                # rotation direction: fold into (0, 180] (RELION
                # convention; the grid search decides handedness)
                if twist > 180.0:
                    twist = 360.0 - twist
                candidates.append(
                    dict(
                        twist=twist,
                        rise=rise,
                        pitch=pitch,
                        csym=csym,
                        Z_rise=mline.Z,
                        Z_pitch=pline.Z,
                        support=psupport + mline.intensity,
                    )
                )
        else:
            # rise line not resolved (damped beyond the signal envelope):
            # report the pitch; twist/rise need an external rise estimate
            candidates.append(
                dict(
                    twist=math.nan,
                    rise=math.nan,
                    pitch=pitch,
                    csym=csym,
                    Z_rise=math.nan,
                    Z_pitch=pline.Z,
                    support=psupport,
                )
            )
    if not pitches:
        for rise, mline in rises:
            # only the rise family was detected: the twist is UNRESOLVED
            # (NaN, like the mirrored pitch-only branch) — reporting 0.0
            # here would present an unmeasured twist as a definite value
            candidates.append(
                dict(
                    twist=math.nan, rise=rise, pitch=math.nan, csym=csym,
                    Z_rise=mline.Z, Z_pitch=math.nan,
                    support=mline.intensity,
                )
            )
    candidates.sort(key=lambda c: -c["support"])
    return dict(layer_lines=lines, candidates=candidates)
