#!/usr/bin/env python
"""Round-4 head-to-head: fused grouped Pallas solve vs the XLA grouped
path (VERDICT r3 #1 "make the Pallas fused solve win or retire it").

Runs the bench's two standard workloads (toy north-star grid and the
production-scale d3=64/l3=18/linear geometry) under
HELICON_PALLAS_GROUPED=0 (XLA) and =1 (forced Pallas), same warmup
protocol as bench.py, and prints a measurement table. The winning mode
becomes grid._grouped_scoring's `auto` policy; the numbers land in
docs/PROFILE.md and PARITY.md.

Usage: python docs/pallas_study.py [--fast-only] [--repeats N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _run(img, twists, rises, kwargs, mode, n_repeats, n_warm):
    from helicon_tpu.denovo3d import reconstruct_grid

    os.environ["HELICON_PALLAS_GROUPED"] = mode
    batch = kwargs["batch_size"]
    warm = reconstruct_grid(
        img, twists=twists[:n_warm or batch], rises=rises[:n_warm or batch],
        **kwargs,
    )
    times = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        res = reconstruct_grid(img, twists=twists, rises=rises, **kwargs)
        times.append(time.perf_counter() - t0)
    rates = sorted(len(twists) / t for t in times)
    med = rates[len(rates) // 2] if len(rates) % 2 else 0.5 * (
        rates[len(rates) // 2 - 1] + rates[len(rates) // 2]
    )
    return dict(
        mode=mode,
        median_cand_per_s=round(med, 1),
        rates=[round(r, 1) for r in rates],
        effective=res.effective,
        scores=np.asarray(res.scores),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast-only", action="store_true")
    ap.add_argument("--large-only", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n", type=int, default=0, help="override n candidates")
    args = ap.parse_args()

    import bench

    out = {}
    if not args.large_only:
        if args.n:
            os.environ["HELICON_BENCH_N"] = str(args.n)
        img, twists, rises = bench._toy_workload()
        kwargs = bench._toy_kwargs(int(os.environ.get("HELICON_BENCH_BATCH", 1024)))
        rows = {}
        for mode in ("0", "1"):
            r = _run(img, twists, rises, kwargs, mode, args.repeats, 0)
            scores = r.pop("scores")
            r["effective"] = {k: r["effective"][k] for k in
                              ("path", "R_pad", "group_chunk", "use_pallas")
                              if r["effective"] and k in r["effective"]}
            rows[mode] = r
            print(f"toy   mode={mode}: {r['median_cand_per_s']} cand/s "
                  f"{r['rates']} eff={r['effective']}", flush=True)
            if mode == "0":
                s0 = scores
            else:
                d = float(np.nanmax(np.abs(scores - s0)))
                r["max_abs_dscore_vs_xla"] = round(d, 6)
                print(f"toy   max|dscore| pallas vs xla = {d:.2e}", flush=True)
        out["toy"] = rows
    if not args.fast_only:
        if args.n:
            os.environ["HELICON_BENCH_LARGE_N"] = str(args.n)
        img, twists, rises, kwargs = bench._large_workload()
        rows = {}
        for mode in ("0", "1"):
            r = _run(img, twists, rises, kwargs, mode,
                     max(2, args.repeats - 1), kwargs["batch_size"])
            scores = r.pop("scores")
            r["effective"] = {k: r["effective"][k] for k in
                              ("path", "R_pad", "group_chunk", "use_pallas")
                              if r["effective"] and k in r["effective"]}
            rows[mode] = r
            print(f"large mode={mode}: {r['median_cand_per_s']} cand/s "
                  f"{r['rates']} eff={r['effective']}", flush=True)
            if mode == "0":
                s0 = scores
            else:
                d = float(np.nanmax(np.abs(scores - s0)))
                r["max_abs_dscore_vs_xla"] = round(d, 6)
                print(f"large max|dscore| pallas vs xla = {d:.2e}", flush=True)
        out["large"] = rows
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
