#!/usr/bin/env python
"""Benchmark: denovo3D (twist, rise) candidate grid throughput.

North star (BASELINE.md): 10^4 candidates on one 2D class average in
< 60 s on TPU v5e-8, i.e. >= 166.7 candidates/s. vs_baseline is the
achieved rate over that target (scaled by available chips: the driver
runs this on ONE chip, so the single-chip target is 166.7/8 = 20.8/s).

Prints ONE compact JSON line (VERDICT r3 #7: the driver records only a
short output tail, so the headline line must stay small and parseable):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The full detail document (configs, repeats, MFU bookkeeping, large /
accurate / Pallas / secondary stages) is written to BENCH_DETAIL.json
next to this script, or to the path given by `--json FILE`.

Env knobs: HELICON_BENCH_N (candidates, default 10240),
HELICON_BENCH_BATCH (batch size, default 1024).
"""

import json
import os
import sys
import time

import numpy as np

# honor HELICON_PLATFORM=cpu (the axon TPU plugin ignores the plain
# JAX_PLATFORMS env var) so tests/metadata runs can stay off the chip
if os.environ.get("HELICON_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["HELICON_PLATFORM"])


def bench_etl():
    """images2star+proc3d-style ETL throughput over 100k particles
    (BASELINE.json configs[4]; the one driver-defined config with a
    CPU-reference measurement — see BASELINE.md: the ACTUAL reference
    plugin chain ran the identical 100k-row pipeline at a median
    28,099 rows/s on this machine's CPU, which is the vs_baseline
    denominator here). Runs in the default bench secondary stage
    (VERDICT r4 #4) and standalone via HELICON_BENCH_METRIC=etl."""
    import collections
    import tempfile
    from argparse import Namespace
    from pathlib import Path

    import pandas as pd

    from helicon_tpu.ops.images2star import dispatch

    n = int(os.environ.get("HELICON_BENCH_ETL_ROWS", 100_000))
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        dict(
            rlnImageName=[f"{i % 500 + 1:06d}@stack_{i // 500:04d}.mrcs" for i in range(n)],
            rlnMicrographName=[f"mic_{i // 500:04d}.mrc" for i in range(n)],
            rlnHelicalTubeID=rng.integers(1, 20, n),
            rlnCoordinateX=rng.uniform(0, 4000, n),
            rlnCoordinateY=rng.uniform(0, 4000, n),
            rlnHelicalTrackLengthAngst=rng.uniform(0, 5000, n),
            rlnDefocusU=rng.uniform(8000, 30000, n),
            rlnDefocusV=rng.uniform(8000, 30000, n),
            rlnDefocusAngle=rng.uniform(0, 180, n),
            rlnAnglePsi=rng.uniform(-180, 180, n),
            rlnClassNumber=rng.integers(1, 51, n),
        )
    )
    df.attrs["convention"] = "relion"
    args = Namespace(verbose=0, folder=[], ignoreBadParticlePath=0,
                     ignoreBadMicrographPath=1, output_starFile="bench.star",
                     subset=0, input_imageFiles=["bench.star"])
    chain = [
        ("select", ["rlnClassNumber", "1,2,3,4,5,6,7,8,9,10"]),
        ("addParm", ["rlnDefocusU", "100"]),
        ("multParm", ["rlnDefocusV", "1.01"]),
        ("sortby", ["rlnMicrographName", "rlnHelicalTubeID"]),
        ("breakFilaments", "maxSegments=20"),
        ("removeDuplicates", ["rlnImageName"]),
    ]
    from helicon_tpu.io.metadata import dataframe2file, star2dataframe

    def run():
        t0 = time.perf_counter()
        data = df
        index_d = collections.defaultdict(int)
        for opt, param in chain:
            data, index_d = dispatch(opt, data, args, index_d, param)
        with tempfile.TemporaryDirectory() as td:
            out = str(Path(td) / "out.star")
            dataframe2file(data, out)
            star2dataframe(out, ignore_bad_particle_path=2)
        return n / (time.perf_counter() - t0)

    rates = [run() for _ in range(_secondary_repeats(3))]
    # baseline: the measured reference-chain CPU rate (BASELINE.md)
    return _secondary_stats(
        "images2star_etl_rows_per_s", "rows/s", rates, 28_099
    )


def _secondary_stats(metric, unit, rates, baseline):
    """median-of-N + IQR record for one secondary bench (VERDICT r2 #8:
    medians/IQR in the JSON, not hand-noted best-of runs in a doc)."""
    rates = sorted(rates)
    n = len(rates)
    med = rates[n // 2] if n % 2 else 0.5 * (rates[n // 2 - 1] + rates[n // 2])
    q1 = rates[max(0, (n - 1) // 4)]
    q3 = rates[min(n - 1, (3 * (n - 1)) // 4)]
    return {
        "metric": metric,
        "value": round(med, 1),
        "unit": unit,
        "vs_baseline": round(med / baseline, 4),
        "repeats": [round(r, 1) for r in rates],
        "iqr": [round(q1, 1), round(q3, 1)],
    }


def _secondary_repeats(default=5):
    return int(os.environ.get("HELICON_BENCH_SECONDARY_REPEATS", default))


def bench_ctf():
    """ctfSimulation 512^2 throughput (BASELINE.md benchmark config)."""
    import jax

    from helicon_tpu.core.ctf import ctf_2d

    n_rep = int(os.environ.get("HELICON_BENCH_CTF_REPS", 200))
    fn = jax.jit(
        lambda d: ctf_2d((512, 512), apix=1.0, defocus_u_A=d, defocus_v_A=d * 0.9,
                         astig_angle_deg=30.0)
    )
    fn(10000.0).block_until_ready()

    def run():
        t0 = time.perf_counter()
        for i in range(n_rep):
            out = fn(10000.0 + 10.0 * i)
        out.block_until_ready()
        return n_rep / (time.perf_counter() - t0)

    rates = [run() for _ in range(_secondary_repeats())]
    return _secondary_stats("ctf2d_512_images_per_s", "images/s", rates, 100)


def bench_hill():
    """hill power-spectrum pipeline on 256^2 class averages
    (BASELINE.md benchmark config): vmapped compute_power_spectra +
    layer-line detection via the batched profile path. The spectra
    never leave the device — detect_layer_lines_batch reduces each to
    three length-ny row vectors on-chip (the full 50-spectra stack is
    13 MB, and the axon tunnel moves ~10-35 MB/s, so shipping spectra
    to the host was the entire old bottleneck: 45-77/s; the profile
    path ships ~150 KB)."""
    import jax

    import helicon_tpu as ht
    from helicon_tpu.helix import detect_layer_lines_batch

    img = np.squeeze(np.asarray(ht.simulate_helical_projection(
        n=1, twist=29.4, rise=4.75, csym=1, helical_diameter=100.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=256, nx=256,
        apix=1.5, rng=0))).T
    n_rep = int(os.environ.get("HELICON_BENCH_HILL_REPS", 50))
    # classes load to the device ONCE (a session recomputes spectra many
    # times per loaded stack); over the axon tunnel the one-time 13 MB
    # upload costs ~280 ms and would otherwise dominate the pipeline
    stack = jax.device_put(np.stack([img] * n_rep))
    fn = jax.jit(jax.vmap(lambda im: ht.compute_power_spectra(im, apix=1.5)[0]))

    def run():
        t0 = time.perf_counter()
        pwrs = fn(stack)  # stays on device
        lines = detect_layer_lines_batch(pwrs, apix=1.5, radius=50.0)
        assert len(lines) == n_rep
        return n_rep / (time.perf_counter() - t0)

    run()  # warmup / compile
    rates = [run() for _ in range(_secondary_repeats())]
    return _secondary_stats("hill_256_spectra_per_s", "spectra/s", rates, 10)


def bench_xcorr():
    """whereIsMyClass 50 classes x 1k segments batched FFT xcorr
    (BASELINE.md benchmark config)."""
    from helicon_tpu.core.xcorr import batched_cross_correlation

    rng = np.random.default_rng(0)
    classes = rng.standard_normal((50, 64, 64)).astype(np.float32)
    segments = rng.standard_normal((1000, 64, 64)).astype(np.float32)
    n_pairs = len(classes) * len(segments)
    batched_cross_correlation(segments, classes)  # warm up / compile

    def run():
        t0 = time.perf_counter()
        ccc, shifts = batched_cross_correlation(segments, classes)
        np.asarray(ccc)
        return n_pairs / (time.perf_counter() - t0)

    # baseline: measured numpy-FFT CPU rate on this host for the same
    # (64^2) workload: ~1930 pairs/s
    rates = [run() for _ in range(_secondary_repeats())]
    return _secondary_stats("xcorr_pairs_per_s", "pairs/s", rates, 1930)


def _guard_backend(timeout_s=240):
    """Never hang the driver on a wedged accelerator transport.

    The axon-tunneled TPU backend can block indefinitely inside
    jax.devices() when the tunnel is down (observed 2026-08-17: >300 s
    at make_c_api_client). Probe backend init in a short-lived
    subprocess; if it does not come up within timeout_s, force the CPU
    platform so the bench still emits its JSON line (flagged via
    "platform" so the number is not mistaken for a TPU figure).
    Honors an explicit HELICON_PLATFORM choice as-is.
    """
    if os.environ.get("HELICON_PLATFORM"):
        return os.environ["HELICON_PLATFORM"]
    timeout_s = int(os.environ.get("HELICON_BENCH_BACKEND_TIMEOUT", timeout_s))
    retries = int(os.environ.get("HELICON_BENCH_BACKEND_RETRIES", 3))
    import subprocess

    for attempt in range(max(1, retries)):
        if attempt:
            # a wedged tunnel usually clears after a few minutes
            # (observed after a TPU worker crash, 2026-08-21); retry
            # instead of immediately surrendering the chip
            sys.stderr.write(
                f"bench: backend probe attempt {attempt} failed; "
                "retrying in 60s\n"
            )
            time.sleep(60)
        try:
            # the probe must EXECUTE an op: after a worker crash,
            # jax.devices() can come up while the first computation hangs
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print('up', float(jnp.ones((8, 8)).sum()))"],
                capture_output=True,
                text=True,
                timeout=timeout_s,
            )
            if proc.returncode == 0 and "up" in proc.stdout:
                return None  # default backend healthy
        except subprocess.TimeoutExpired:
            pass
    sys.stderr.write(
        f"bench: default backend failed to initialize within {timeout_s}s "
        f"x {retries} attempts; falling back to CPU\n"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"


def _toy_workload():
    """The north-star workload: 10^4 (twist, rise) candidates on an
    EMPIAR-10940-like class average (amyloid-ish scale, 2 A/pixel)."""
    from helicon_tpu.helix import simulate_helical_projection
    from helicon_tpu.denovo3d import build_candidate_grid

    img = simulate_helical_projection(
        n=1, twist=29.4, rise=4.75, csym=1, helical_diameter=100.0,
        ball_radius=6.0, polymer=0, planarity=1.0, ny=128, nx=256,
        apix=2.0, rng=0,
    )
    n_cand = int(os.environ.get("HELICON_BENCH_N", 10240))
    # grid DENSER than n_cand so the slice below really has n_cand
    # candidates. (A 2026-08-17 audit found the old 0.25-step grid held
    # only 895 candidates while the rate still divided by n_cand=10240,
    # inflating every recorded figure 11.4x — BENCH_r01.json's 1827.6
    # cand/s was really ~160. Honest numbers from this date on.)
    twists, rises = build_candidate_grid(0.5, 45.0, 0.05, 4.0, 5.0, 0.08)
    order = np.random.default_rng(0).permutation(len(twists))[:n_cand]
    twists, rises = twists[order], rises[order]
    # random SUBSET, ordered twist-major: the twist-grouped scorer
    # (projector_grouped.py) is order-insensitive, but the warmup slice
    # must contain repeated twists so it compiles/warms the same grouped
    # path the timed run uses
    order2 = np.lexsort((rises, twists))
    return img, twists[order2], rises[order2]


def _toy_kwargs(batch):
    return dict(
        apix=2.0,
        target_apix2d=4.0,
        target_apix3d=-1,
        tube_diameter=110.0,
        reconstruct_length_rise=3.0,
        # iteration split: CG overshoots toward the UNconstrained LS
        # solution; the box-constrained optimum is reached by FISTA, so
        # a short CG warm start + more FISTA is both faster and MORE
        # accurate (cg=10/fista=16 beats cg=30/fista=12 on max|score
        # delta| vs converged AND preserves the exact top-10 ranking;
        # 147-candidate CPU study, Spearman > 0.999).
        cg_iters=int(os.environ.get("HELICON_BENCH_CG", 10)),
        fista_iters=int(os.environ.get("HELICON_BENCH_FISTA", 16)),
        # power=1..8 gives identical rankings (the adaptive Lipschitz
        # margin absorbs the Rayleigh underestimate); 2 balances safety
        power_iters=int(os.environ.get("HELICON_BENCH_POWER", 2)),
        compute_dtype=os.environ.get("HELICON_BENCH_DTYPE", "bfloat16"),
        batch_size=batch,
        return_best_volume=False,
    )


def _large_workload():
    """Production-scale geometry (VERDICT r2 #2): 1 A/pixel class
    average, d2 = d3 = 64, l3 = 18, linear interpolation, ~2^20
    constrained voxels — the scale the reference budgets for
    (solver_linear_regression.py:131 caps 2^26 equations,
    pipeline.py:334-349 targets ~2^20 voxels). Cartesian grid with 32
    rises per twist (rise resolution 0.032 A over 4-5 A)."""
    from helicon_tpu.helix import simulate_helical_projection
    from helicon_tpu.denovo3d import build_candidate_grid

    img = simulate_helical_projection(
        n=1, twist=29.4, rise=4.75, csym=1, helical_diameter=100.0,
        ball_radius=4.0, polymer=0, planarity=1.0, ny=256, nx=512,
        apix=1.0, rng=0,
    )
    n_cand = int(os.environ.get("HELICON_BENCH_LARGE_N", 1024))
    twists, rises = build_candidate_grid(0.5, 45.0, 0.05, 4.0, 5.0, 0.0323)
    order2 = np.lexsort((rises, twists))
    twists, rises = twists[order2][:n_cand], rises[order2][:n_cand]
    kwargs = dict(
        apix=1.0, target_apix2d=1.75, target_apix3d=1.75,
        tube_diameter=110.0, reconstruct_length_rise=6.0,
        interpolation="linear",
        cg_iters=int(os.environ.get("HELICON_BENCH_CG", 10)),
        fista_iters=int(os.environ.get("HELICON_BENCH_FISTA", 16)),
        power_iters=int(os.environ.get("HELICON_BENCH_POWER", 2)),
        compute_dtype=os.environ.get("HELICON_BENCH_DTYPE", "bfloat16"),
        batch_size=int(os.environ.get("HELICON_BENCH_LARGE_BATCH", 256)),
        return_best_volume=False,
    )
    return img, twists, rises, kwargs


def _timed_runs(fn, n_repeats):
    vals = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return vals


def _rate_stats(n_cand, times):
    rates = sorted(n_cand / t for t in times)
    med = rates[len(rates) // 2] if len(rates) % 2 else 0.5 * (
        rates[len(rates) // 2 - 1] + rates[len(rates) // 2]
    )
    return med, [round(r, 1) for r in rates]


def _mfu_fields(res, rate, n_dev, peak):
    """MFU + flop bookkeeping from a cost_analysis-bearing GridResult.

    Two flop counts are reported: XLA's static count (which counts each
    lax.scan body ONCE — a hard lower bound that understates the
    iterative solve by roughly the iteration count) and the analytic
    per-candidate count of the GEMMs actually issued
    (grid._grouped_analytic_flops). `mfu` uses the analytic count; the
    XLA-based figure is kept as `mfu_xla_scanbody_lower`."""
    out = {}
    if not (res.cost and res.cost.get("flops", 0) > 0):
        return out
    flops_xla = res.cost["flops"] / res.cost["batch_size"]
    out["flops_per_candidate_xla_scanbody"] = round(flops_xla)
    analytic = res.cost.get("analytic_flops_per_candidate", 0)
    if analytic:
        out["flops_per_candidate"] = round(analytic)
        if peak:
            out["mfu"] = round(analytic * rate / (peak * n_dev), 4)
            out["mfu_xla_scanbody_lower"] = round(
                flops_xla * rate / (peak * n_dev), 4
            )
    elif peak:
        out["mfu"] = round(flops_xla * rate / (peak * n_dev), 4)
    bytes_per_cand = res.cost.get("bytes_accessed", 0) / res.cost["batch_size"]
    if bytes_per_cand:
        out["xla_bytes_per_candidate"] = round(bytes_per_cand)
        out["effective_bytes_per_s"] = round(bytes_per_cand * rate / n_dev)
    return out


def _bench_fast(n_repeats):
    """Headline: toy-geometry north-star workload, median of n_repeats."""
    from helicon_tpu.denovo3d import reconstruct_grid

    img, twists, rises = _toy_workload()
    batch = int(os.environ.get("HELICON_BENCH_BATCH", 1024))
    kwargs = _toy_kwargs(batch)
    warm = reconstruct_grid(
        img, twists=twists[:batch], rises=rises[:batch],
        cost_analysis=True, **kwargs,
    )
    trace_dir = os.environ.get("HELICON_BENCH_TRACE", "")
    if trace_dir:
        import jax.profiler

        with jax.profiler.trace(trace_dir):
            reconstruct_grid(
                img, twists=twists[:batch], rises=rises[:batch], **kwargs
            )
    times = _timed_runs(
        lambda: reconstruct_grid(img, twists=twists, rises=rises, **kwargs),
        n_repeats,
    )
    return warm, len(twists), times, kwargs


def _bench_large(n_repeats):
    from helicon_tpu.denovo3d import reconstruct_grid

    img, twists, rises, kwargs = _large_workload()
    batch = kwargs["batch_size"]
    warm = reconstruct_grid(
        img, twists=twists[:batch], rises=rises[:batch],
        cost_analysis=True, **kwargs,
    )
    times = _timed_runs(
        lambda: reconstruct_grid(img, twists=twists, rises=rises, **kwargs),
        n_repeats,
    )
    return warm, len(twists), times, kwargs


def _bench_accurate():
    """Accuracy-mode row (VERDICT r2 #3): float32 at matmul precision
    "highest" (TPU f32 matmuls otherwise run bf16-pass arithmetic —
    measured 5e-5 score error vs 1.9e-6 at highest), converged iteration
    budget, throughput on a candidate slice, and an in-process
    max|dscore| check against the CPU float32 converged oracle on a
    non-degenerate candidate subsample (north star: scores within 1e-5,
    BASELINE.json:5). The subsample keeps >= 3 same-twist rises per
    twist so both runs stay on the grouped path (a 1-rise-per-twist
    pick would fall to the much slower per-candidate path)."""
    import jax

    from helicon_tpu.denovo3d import reconstruct_grid

    img, twists, rises = _toy_workload()
    n_acc = int(os.environ.get("HELICON_BENCH_ACC_N", 512))
    kwargs = _toy_kwargs(int(os.environ.get("HELICON_BENCH_ACC_BATCH", 256)))
    kwargs.update(
        compute_dtype="float32",
        cg_iters=int(os.environ.get("HELICON_BENCH_ACC_CG", 400)),
        fista_iters=int(os.environ.get("HELICON_BENCH_ACC_FISTA", 2000)),
        power_iters=8,
    )
    batch = kwargs["batch_size"]

    # oracle subsample: 2 non-degenerate twists (360/twist far from an
    # integer: the reference's own solver cannot converge on degenerate
    # candidates — PARITY.md §1) x 3 rises each
    uniq = np.unique(twists)
    degeneracy = np.abs((360.0 / np.maximum(uniq, 1e-6)) % 1.0 - 0.5)
    pick_t = [
        t for t in uniq[np.argsort(-degeneracy)] if (twists == t).sum() >= 3
    ][:2]
    pick = np.sort(
        np.concatenate([np.where(twists == t)[0][:3] for t in pick_t])
    )
    check_kwargs = dict(kwargs, batch_size=None)

    with jax.default_matmul_precision("highest"):
        reconstruct_grid(
            img, twists=twists[:batch], rises=rises[:batch], **kwargs
        )
        t0 = time.perf_counter()
        res = reconstruct_grid(
            img, twists=twists[:n_acc], rises=rises[:n_acc], **kwargs
        )
        rate = n_acc / (time.perf_counter() - t0)
        sub = reconstruct_grid(
            img, twists=twists[pick], rises=rises[pick], **check_kwargs
        )
        with jax.default_device(jax.devices("cpu")[0]):
            oracle = reconstruct_grid(
                img, twists=twists[pick], rises=rises[pick], **check_kwargs
            )
    dmax = float(np.max(np.abs(sub.scores - oracle.scores)))
    return {
        "value": round(rate, 1),
        "unit": "candidates/s",
        "config": {
            "dtype": "float32",
            "matmul_precision": "highest",
            "cg_iters": kwargs["cg_iters"],
            "fista_iters": kwargs["fista_iters"],
            "n_candidates": n_acc,
        },
        "max_abs_dscore_vs_cpu_f32_converged": round(dmax, 9),
        "n_checked": int(len(pick)),
        "meets_1e5": bool(dmax <= 1e-5),
    }


def _config_fields(res, kwargs, n_cand):
    cfgd = {
        "dtype": kwargs.get("compute_dtype"),
        "cg_iters": kwargs.get("cg_iters"),
        "fista_iters": kwargs.get("fista_iters"),
        "power_iters": kwargs.get("power_iters"),
        "batch_size": kwargs.get("batch_size"),
        "n_candidates": int(n_cand),
        "interpolation": kwargs.get("interpolation", "nn"),
    }
    if res.effective:
        cfgd.update(res.effective)
    return cfgd


def main():
    metric = os.environ.get("HELICON_BENCH_METRIC", "denovo3d")
    if metric == "etl":
        # pandas-only: never probe/init an accelerator
        return print(json.dumps(bench_etl()))
    platform_note = _guard_backend()
    if metric == "ctf":
        return print(json.dumps(bench_ctf()))
    if metric == "hill":
        return print(json.dumps(bench_hill()))
    if metric == "xcorr":
        return print(json.dumps(bench_xcorr()))

    import jax

    n_repeats = int(os.environ.get("HELICON_BENCH_REPEATS", 3))
    n_dev = len(jax.devices())
    peak = _peak_flops_per_s()
    target_rate = (10_000 / 60.0) * (n_dev / 8.0)  # scale target to chips

    t0 = time.perf_counter()
    warm, n_cand, times, kwargs = _bench_fast(n_repeats)
    sys.stderr.write(f"bench: fast stage {time.perf_counter()-t0:.0f}s\n")
    rate, rates = _rate_stats(n_cand, times)
    out = {
        "metric": "denovo3d_candidates_per_s",
        "value": round(rate, 3),
        "unit": "candidates/s",
        "vs_baseline": round(rate / target_rate, 4),
        "repeats_candidates_per_s": rates,
        "config": _config_fields(warm, kwargs, n_cand),
    }
    if platform_note == "cpu-fallback":
        out["platform"] = platform_note
    out.update(_mfu_fields(warm, rate, n_dev, peak))

    # densified run (VERDICT r4 #3): same grid with padding slots filled
    # by real interpolated rises — the kernel shapes (and so the wall
    # time) are unchanged, the extra candidates are free useful output.
    # useful-work MFU counts requested + extra candidates over the SAME
    # measured wall.
    try:
        from helicon_tpu.denovo3d import reconstruct_grid as _rg

        img_d, tw_d, ri_d = _toy_workload()
        kw_d = _toy_kwargs(int(os.environ.get("HELICON_BENCH_BATCH", 1024)))
        t0d = time.perf_counter()
        res_d = _rg(img_d, twists=tw_d, rises=ri_d,
                    densify_padding=True, **kw_d)
        t_d = time.perf_counter() - t0d
        n_extra = int((res_d.effective or {}).get("densified", 0))
        dens = {
            "extra_candidates": n_extra,
            "total_candidates_per_s": round((n_cand + n_extra) / t_d, 1),
            "wall_s": round(t_d, 3),
        }
        analytic = (warm.cost or {}).get("analytic_flops_per_candidate", 0)
        if analytic and peak:
            dens["useful_mfu"] = round(
                analytic * (n_cand + n_extra) / t_d / (peak * n_dev), 4
            )
        out["densify"] = dens
    except Exception as e:
        out["densify"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # large/accurate stages are accelerator benchmarks: on a CPU backend
    # (smoke tests, cpu-fallback) they would take tens of minutes for a
    # number nobody reads — default them off there
    on_cpu = (
        platform_note == "cpu-fallback"
        or jax.devices()[0].platform == "cpu"
    )
    full = os.environ.get("HELICON_BENCH_FULL", "0" if on_cpu else "1") != "0"
    if full:
        t0 = time.perf_counter()
        try:
            lwarm, ln, ltimes, lkw = _bench_large(max(2, n_repeats - 1))
            lrate, lrates = _rate_stats(ln, ltimes)
            large = {
                "value": round(lrate, 2),
                "unit": "candidates/s",
                "repeats_candidates_per_s": lrates,
                "config": _config_fields(lwarm, lkw, ln),
            }
            large.update(_mfu_fields(lwarm, lrate, n_dev, peak))
            out["large"] = large
        except Exception as e:  # still emit the headline line
            out["large"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        sys.stderr.write(f"bench: large stage {time.perf_counter()-t0:.0f}s\n")
        t0 = time.perf_counter()
        try:
            out["accurate"] = _bench_accurate()
        except Exception as e:
            out["accurate"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        sys.stderr.write(
            f"bench: accurate stage {time.perf_counter()-t0:.0f}s\n"
        )
        # standing on-real-chip Pallas validation (VERDICT r2 #2): both
        # compiled kernels vs the XLA closures, errors recorded here
        try:
            from helicon_tpu.denovo3d.pallas_solver import validate_on_device

            out["pallas_on_chip"] = validate_on_device()
        except Exception as e:
            out["pallas_on_chip"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        # v3 grouped kernel (the production grid path on TPU since
        # round 4): same standing on-chip validation
        try:
            from helicon_tpu.denovo3d.pallas_solver import (
                validate_grouped_on_device,
            )

            out["pallas_grouped_on_chip"] = validate_grouped_on_device()
        except Exception as e:
            out["pallas_grouped_on_chip"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
        # secondary metrics (VERDICT r2 #8): median-of-5 + IQR, in the
        # same JSON artifact the driver records
        t0 = time.perf_counter()
        out["secondary"] = {}
        for name, fn in (("ctf", bench_ctf), ("hill", bench_hill),
                         ("xcorr", bench_xcorr), ("etl", bench_etl)):
            try:
                out["secondary"][name] = fn()
            except Exception as e:
                out["secondary"][name] = {
                    "error": f"{type(e).__name__}: {e}"[:200]
                }
        sys.stderr.write(
            f"bench: secondary stage {time.perf_counter()-t0:.0f}s\n"
        )
    _emit(out)


def _emit(out):
    """Write the full detail document to disk and print a compact
    headline line on stdout.

    The driver keeps only a tail of the combined output, so the stdout
    line must stay well under ~2 KB or it gets truncated mid-document
    (this is exactly what happened to BENCH_r03.json's `parsed: null`).
    """
    detail_path = None
    argv = sys.argv[1:]
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 < len(argv):
            detail_path = argv[i + 1]
    if detail_path is None:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
    try:
        with open(detail_path, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError as e:
        sys.stderr.write(f"bench: could not write {detail_path}: {e}\n")
        detail_path = None

    line = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "vs_baseline": out["vs_baseline"],
    }
    if "platform" in out:
        line["platform"] = out["platform"]
    if "mfu" in out:
        line["mfu"] = out["mfu"]
    large = out.get("large", {})
    if isinstance(large, dict) and "value" in large:
        line["large_candidates_per_s"] = large["value"]
        if "mfu" in large:
            line["large_mfu"] = large["mfu"]
    acc = out.get("accurate", {})
    if isinstance(acc, dict) and "max_abs_dscore_vs_cpu_f32_converged" in acc:
        line["accurate_max_abs_dscore"] = acc[
            "max_abs_dscore_vs_cpu_f32_converged"
        ]
        line["meets_1e5"] = acc.get("meets_1e5")
    dn = out.get("densify", {})
    if isinstance(dn, dict) and "useful_mfu" in dn:
        line["useful_mfu_densified"] = dn["useful_mfu"]
    pal = out.get("pallas_on_chip", {})
    if isinstance(pal, dict) and "ok" in pal:
        line["pallas_on_chip_ok"] = pal["ok"]
    pg = out.get("pallas_grouped_on_chip", {})
    if isinstance(pg, dict) and "ok" in pg:
        line["pallas_grouped_ok"] = pg["ok"]
    if detail_path:
        line["detail"] = os.path.basename(detail_path)
    print(json.dumps(line))


def _peak_flops_per_s():
    """Per-chip peak dense-matmul FLOP/s for the current backend (bf16
    for TPUs — the bench's compute dtype). None when unknown (e.g. CPU)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v4": 275e12,
        "v5 lite": 197e12,  # v5e
        "v5litepod": 197e12,
        "v5e": 197e12,
        "v5p": 459e12,
        "v6 lite": 918e12,  # trillium / v6e
        "v6e": 918e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return None


if __name__ == "__main__":
    main()
