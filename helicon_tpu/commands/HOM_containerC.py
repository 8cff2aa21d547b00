"""Helical-orientation-consistency outlier filter (HOM container C)

Per-helix wrapped-linear fits of the rot-angle progression along each
filament; segments whose angles disagree with the fitted helical
progression are flagged/filtered.

Reference: src/helicon/commands/HOM_containerC.py (1561 LoC): mod-P phase
unwrapping (123-167), grid search over slope with closed-form intercept
(168-243), angular error metrics + trimmed l1_core_average (288-385),
HelicalSegmentConsistency (386-1418). The JPG/PDF batch report of the
reference is reduced to summary statistics + optional single PDF.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np
import pandas as pd

from helicon_tpu.utils.exceptions import HeliconError

logger = logging.getLogger(__name__)


def wrap_sym(z, P):
    """Wrap into [-P/2, P/2) (HOM_containerC.py:123-140)."""
    return (z + P / 2) % P - P / 2


def unwrap_sequence(y, P):
    """Adjust by multiples of P so consecutive diffs lie in [-P/2, P/2)
    (HOM_containerC.py:141-167)."""
    y = np.asarray(y, float)
    if y.size <= 1:
        return y.copy()
    dy = np.diff(y)
    corr = np.cumsum(wrap_sym(dy, P) - dy)
    return y + np.concatenate(([0.0], corr))


def solve_b_given_m_wrapped(x, o, P, m):
    """Closed-form intercept + SSE for a fixed slope
    (HOM_containerC.py:168-203)."""
    x = np.asarray(x, float)
    o = np.asarray(o, float)
    r = unwrap_sequence(o - m * x, P)
    b = float(np.mean(r))
    d = wrap_sym(o - (m * x + b), P)
    return b, float(np.sum(d**2))


def fit_line_wrapped_by_m_grid(x, o, P, m_min, m_max, num_m=501):
    """Grid search over slope m with per-m closed-form intercept
    (HOM_containerC.py:204-243). Returns (m, b, SSE, (grids))."""
    m_grid = np.linspace(m_min, m_max, num_m)
    b_grid = np.empty_like(m_grid)
    S_grid = np.empty_like(m_grid)
    for k, m in enumerate(m_grid):
        b_grid[k], S_grid[k] = solve_b_given_m_wrapped(x, o, P, m)
    i = int(np.argmin(S_grid))
    return m_grid[i], b_grid[i], S_grid[i], (m_grid, b_grid, S_grid)


def get_angular_errors(x, o, m_best, b_best, Period):
    """Signed + absolute shortest-arc residuals (HOM_containerC.py:288-318)."""
    yy = m_best * np.asarray(x, float) + b_best
    errors = (np.asarray(o, float) - yy + Period / 2.0) % Period - Period / 2.0
    return errors, np.abs(errors)


def l1_core_average(x, k=50):
    """L1-optimal average of the densest k-point window
    (HOM_containerC.py:319-385). Returns (m_best, l1_sum, subset)."""
    x = np.asarray(x, float)
    x = x[~np.isnan(x)]
    n = x.size
    if n == 0:
        raise ValueError("No finite data points.")
    k = min(k, n)
    xs = np.sort(x)
    pref = np.concatenate(([0.0], np.cumsum(xs)))
    best_sum, best_m, best_slice = np.inf, None, (0, k)
    if k % 2 == 1:
        half = k // 2
        for i in range(n - k + 1):
            m_idx = i + half
            m = xs[m_idx]
            left = m * (m_idx - i) - (pref[m_idx] - pref[i])
            right = (pref[i + k] - pref[m_idx + 1]) - m * (i + k - m_idx - 1)
            if left + right < best_sum:
                best_sum, best_m, best_slice = left + right, m, (i, i + k)
    else:
        half = k // 2
        for i in range(n - k + 1):
            j = i + half - 1
            m = 0.5 * (xs[j] + xs[j + 1])
            L = j + 1 - i
            left = m * L - (pref[j + 1] - pref[i])
            Rn = i + k - (j + 1)
            right = (pref[i + k] - pref[j + 1]) - m * Rn
            if left + right < best_sum:
                best_sum, best_m, best_slice = left + right, m, (i, i + k)
    return best_m, best_sum, xs[best_slice[0] : best_slice[1]]


def HelicalSegmentConsistency(
    data: pd.DataFrame,
    *,
    csym: int = 1,
    rise: float = 4.75,
    twist_range=(-5.0, 5.0),
    max_error_deg: float = 30.0,
    verbose: int = 0,
    **kwargs,
):
    """Per-helix rot-progression fit + per-segment error columns.

    Core of the reference's HelicalSegmentConsistency
    (HOM_containerC.py:386-1418): for each (micrograph, tube) group the
    rot angles (mod P = 360/csym) are fit as a wrapped-linear function of
    the track position; per-segment absolute angular errors, per-helix
    twist-per-Angstrom slope, and the trimmed consensus slope across
    helices are returned.

    Returns (data, stats) — data gains rlnAngleRotError /
    rlnHelicalConsistencyGood columns; stats summarizes the fits.
    """
    required = (
        "rlnHelicalTubeID rlnAngleRot rlnHelicalTrackLengthAngst".split()
    )
    missing = [c for c in required if c not in data]
    if missing:
        raise HeliconError(f"required columns missing: {' '.join(missing)}")
    if len(data) == 0:
        # reference behavior: empty input raises (tests/test_HOM_containerC.py
        # test_helical_segment_consistency_empty_data_raises)
        raise HeliconError("no segments in the input data")
    group_cols = [
        c for c in ("rlnMicrographName", "rlnImageName") if c in data
    ][:1] + ["rlnHelicalTubeID"]
    P = 360.0 / max(1, csym)
    slopes, sses, n_segments = [], [], []
    data = data.copy()
    data["rlnAngleRotError"] = 0.0
    for _, g in data.groupby(group_cols, sort=False):
        x = g["rlnHelicalTrackLengthAngst"].astype(float).values
        o = g["rlnAngleRot"].astype(float).values % P
        if len(g) < 3:
            continue
        m, b, sse, _ = fit_line_wrapped_by_m_grid(
            x, o, P, twist_range[0] / rise, twist_range[1] / rise, num_m=501
        )
        _, abs_err = get_angular_errors(x, o, m, b, P)
        data.loc[g.index, "rlnAngleRotError"] = np.round(abs_err, 2)
        slopes.append(m)
        sses.append(sse)
        n_segments.append(len(g))
    data["rlnHelicalConsistencyGood"] = (
        data["rlnAngleRotError"] <= max_error_deg
    ).astype(int)
    slopes = np.asarray(slopes)
    if len(slopes):
        consensus, _, _ = l1_core_average(slopes, k=max(3, len(slopes) // 2))
    else:
        consensus = 0.0
    stats = dict(
        n_helices=len(slopes),
        n_segments=int(sum(n_segments)),
        n_good=int(data["rlnHelicalConsistencyGood"].sum()),
        consensus_twist_per_A=float(consensus),
        consensus_twist_per_rise=float(consensus * rise),
        median_sse=float(np.median(sses)) if sses else 0.0,
    )
    if verbose:
        logger.info("HelicalSegmentConsistency: %s", stats)
    return data, stats


def main(args):
    from helicon_tpu.io.metadata import dataframe2file, images2dataframe
    from helicon_tpu.utils.logging import log_command_line

    log_command_line()
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.ERROR,
        format="%(message)s", stream=sys.stdout,
    )
    data = images2dataframe(args.input_star, target_convention="relion")
    data, stats = HelicalSegmentConsistency(
        data,
        csym=args.csym,
        rise=args.rise,
        twist_range=(args.twistMin, args.twistMax),
        max_error_deg=args.maxError,
        verbose=args.verbose,
    )
    if args.filterBad:
        n0 = len(data)
        data = data[data["rlnHelicalConsistencyGood"] == 1].reset_index(drop=True)
        logger.info("filtered %d -> %d segments", n0, len(data))
    dataframe2file(data, args.output_star)
    print(stats)


def add_args(parser):
    parser.add_argument("input_star", help="input star file")
    parser.add_argument("output_star", help="output star file")
    parser.add_argument("--param", type=str, default="",
                        help="extra parameter string (reference-compatible)")
    parser.add_argument("--force", type=int, default=0,
                        help="force overwrite the output file")
    parser.add_argument("--csym", type=int, default=1)
    parser.add_argument("--rise", type=float, default=4.75,
                        help="helical rise (A)")
    parser.add_argument("--twistMin", type=float, default=-5.0,
                        help="min twist per rise (deg)")
    parser.add_argument("--twistMax", type=float, default=5.0)
    parser.add_argument("--maxError", type=float, default=30.0,
                        help="max angular error (deg) for a good segment")
    parser.add_argument("--filterBad", type=int, default=0,
                        help="drop inconsistent segments")
    parser.add_argument("--verbose", type=int, default=1)
    return parser


def check_args(args, parser):
    from helicon_tpu.utils.exceptions import HeliconFileExistsError

    if Path(args.output_star).exists() and not args.force:
        raise HeliconFileExistsError(
            f"output file {args.output_star} exists; use --force 1"
        )
    return args


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    args = add_args(parser).parse_args()
    main(check_args(args, parser))
