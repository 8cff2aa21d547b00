"""Analytic contrast transfer function (CTF) and helical layer-line math.

The reference's ctfSimulation and hill commands download external
streamlit/shiny apps at runtime (commands/ctfSimulation.py:14-18,
commands/hill.py:14-69) — the math is NOT in the reference repo
(SURVEY.md section 2g), so this module implements it natively:

* ctf_1d / ctf_2d: the standard analytic CTF
  CTF(s) = -w sin(pi lam s^2 (df - 0.5 lam^2 s^2 cs) + phase) * env(s)
  with astigmatism, amplitude contrast, B-factor envelope — jittable and
  batched (vmap over defocus for a stack).
* helical layer lines: line heights Z(l) = l / pitch and allowed Bessel
  orders from the helical selection rule l = n*m + c*k for (twist, rise,
  csym) — the machinery hill builds its indexing UI on.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ctf_1d",
    "ctf_2d",
    "electron_wavelength",
    "layer_line_positions",
    "layer_line_bessel_orders",
    "simulate_helix_power_spectrum",
]


def electron_wavelength(voltage_kv) -> float:
    """Relativistic electron wavelength in Angstroms (matches
    io.metadata._electron_wavelength)."""
    h = 6.62607015e-34
    m_e = 9.1093837e-31
    e = 1.602176634e-19
    c = 299792458
    V = np.asarray(voltage_kv, dtype=float) * 1000.0
    lam = h / np.sqrt(2 * m_e * e * V * (1 + e * V / (2 * m_e * c**2)))
    return lam * 1e10


def ctf_1d(
    s,
    defocus_um: float = 1.0,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amp_contrast: float = 0.07,
    phase_shift_deg: float = 0.0,
    bfactor: float = 0.0,
):
    """CTF at spatial frequencies s (1/A). Positive defocus = underfocus."""
    s = jnp.asarray(s, jnp.float32)
    lam = float(electron_wavelength(voltage_kv))
    df = defocus_um * 1e4  # A
    cs = cs_mm * 1e7  # A
    s2 = s * s
    gamma = (
        jnp.pi * lam * s2 * (df - 0.5 * lam * lam * s2 * cs)
        + jnp.deg2rad(phase_shift_deg)
    )
    w = amp_contrast
    ctf = -(
        jnp.sqrt(1 - w * w) * jnp.sin(gamma) + w * jnp.cos(gamma)
    )
    if bfactor:
        ctf = ctf * jnp.exp(-bfactor * s2 / 4)
    return ctf


@functools.partial(
    jax.jit,
    static_argnames=("shape",),
)
def _ctf_2d_impl(
    shape, apix, defocus_u_A, defocus_v_A, astig_angle_rad, lam, cs_A,
    amp_contrast, phase_shift_rad, bfactor,
):
    ny, nx = shape
    fy = jnp.fft.fftfreq(ny, d=apix)[:, None]
    fx = jnp.fft.fftfreq(nx, d=apix)[None, :]
    s2 = fx * fx + fy * fy
    ang = jnp.arctan2(fy, fx)
    df = 0.5 * (
        defocus_u_A
        + defocus_v_A
        + (defocus_u_A - defocus_v_A) * jnp.cos(2 * (ang - astig_angle_rad))
    )
    gamma = jnp.pi * lam * s2 * (df - 0.5 * lam * lam * s2 * cs_A) + phase_shift_rad
    w = amp_contrast
    ctf = -(jnp.sqrt(1 - w * w) * jnp.sin(gamma) + w * jnp.cos(gamma))
    return ctf * jnp.exp(-bfactor * s2 / 4)


def ctf_2d(
    shape,
    apix: float,
    defocus_u_A: float = 10000.0,
    defocus_v_A: float = 10000.0,
    astig_angle_deg: float = 0.0,
    voltage_kv: float = 300.0,
    cs_mm: float = 2.7,
    amp_contrast: float = 0.07,
    phase_shift_deg: float = 0.0,
    bfactor: float = 0.0,
):
    """2D CTF in fftfreq layout (vmap over defocus args for stacks)."""
    return _ctf_2d_impl(
        tuple(shape),
        jnp.float32(apix),
        jnp.float32(defocus_u_A),
        jnp.float32(defocus_v_A),
        jnp.deg2rad(jnp.float32(astig_angle_deg)),
        jnp.float32(electron_wavelength(voltage_kv)),
        jnp.float32(cs_mm * 1e7),
        jnp.float32(amp_contrast),
        jnp.deg2rad(jnp.float32(phase_shift_deg)),
        jnp.float32(bfactor),
    )


def layer_line_positions(twist: float, rise: float, csym: int = 1, n_lines: int = 10):
    """Layer-line heights Z (1/A) and their (l, n) selection-rule indices.

    Helical diffraction: with pitch P = 360/|twist| * rise, the layer
    line of Bessel order n from the m-start family sits at
    Z = n / P + m / rise (selection rule for a 1-start helix); csym
    restricts allowed n to multiples of csym.
    Returns list of (Z, n, m) sorted by Z, the n_lines smallest Z > 0
    plus the equator (0, 0, 0).
    """
    twist_eff = abs(twist)
    if twist_eff < 1e-6:
        P = math.inf
    else:
        P = 360.0 / twist_eff * rise
    # collect EVERY allowed (n, m) per height, then keep the DOMINANT
    # (lowest |n|) representative per line: the first-visible peak of a
    # layer line is |J_n| of its smallest allowed order, not whichever
    # (n, m) combination a scan order happens to find first
    by_z: dict = {0.0: [(0, 0)]}
    max_n = n_lines * max(1, csym) + csym
    max_m = n_lines + 1
    for m in range(-max_m, max_m + 1):
        for n in range(-max_n, max_n + 1):
            if csym > 1 and n % csym != 0:
                continue
            Z = (n / P if math.isfinite(P) else 0.0) + m / rise
            if Z <= 1e-9:
                continue
            by_z.setdefault(round(Z, 8), []).append((n, m))
    lines = []
    for Zr, nms in by_z.items():
        nms.sort(key=lambda t: (abs(t[0]), abs(t[1])))
        n, m = nms[0]
        lines.append((float(Zr), n, m))
    lines.sort(key=lambda t: t[0])
    return lines[: n_lines + 1]


def layer_line_bessel_orders(twist: float, rise: float, csym: int = 1, n_lines: int = 10):
    """{Z: [n, ...]} ALL allowed Bessel orders per layer-line height,
    sorted by |n| (the line's dominant order first)."""
    kept = {
        round(Z, 8) for Z, _, _ in layer_line_positions(twist, rise, csym, n_lines)
    }
    twist_eff = abs(twist)
    P = math.inf if twist_eff < 1e-6 else 360.0 / twist_eff * rise
    out: dict = {z: [] for z in kept}
    max_n = n_lines * max(1, csym) + csym
    max_m = n_lines + 1
    for m in range(-max_m, max_m + 1):
        for n in range(-max_n, max_n + 1):
            if csym > 1 and n % csym != 0:
                continue
            Z = round((n / P if math.isfinite(P) else 0.0) + m / rise, 8)
            if Z in out and n not in out[Z]:
                out[Z].append(n)
    for z in out:
        out[z].sort(key=abs)
    return out


def simulate_helix_power_spectrum(
    shape,
    apix: float,
    twist: float,
    rise: float,
    csym: int = 1,
    radius: float = 50.0,
    n_lines: int = 10,
):
    """Schematic layer-line power spectrum (hill-style display): each
    allowed line drawn as |J_n(2 pi R r)|^2 along X at height Z."""
    from scipy.special import jv

    ny, nx = shape
    img = np.zeros((ny, nx), np.float32)
    sx = np.fft.fftshift(np.fft.fftfreq(nx, d=apix))
    sy = np.fft.fftshift(np.fft.fftfreq(ny, d=apix))
    for Z, n, m in layer_line_positions(twist, rise, csym, n_lines):
        for zsign in (1, -1) if Z > 0 else (1,):
            iy = np.argmin(np.abs(sy - zsign * Z))
            amp = jv(abs(n), 2 * np.pi * np.abs(sx) * radius) ** 2
            img[iy] = np.maximum(img[iy], amp.astype(np.float32))
    return img
