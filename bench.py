#!/usr/bin/env python
"""Benchmark: denovo3D (twist, rise) candidate grid throughput.

North star (BASELINE.md): 10^4 candidates on one 2D class average in
< 60 s on TPU v5e-8, i.e. >= 166.7 candidates/s. vs_baseline is the
achieved rate over that target (scaled by available chips: the driver
runs this on ONE chip, so the single-chip target is 166.7/8 = 20.8/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Env knobs: HELICON_BENCH_N (candidates, default 256),
HELICON_BENCH_BATCH (batch size, default 32).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    n_cand = int(os.environ.get("HELICON_BENCH_N", 256))
    batch = int(os.environ.get("HELICON_BENCH_BATCH", 32))

    import jax

    from helicon_tpu.helix import simulate_helical_projection
    from helicon_tpu.denovo3d import build_candidate_grid, reconstruct_grid

    # EMPIAR-10940-like class average: amyloid-ish scale, 2 A/pixel
    img = simulate_helical_projection(
        n=1,
        twist=29.4,
        rise=4.75,
        csym=1,
        helical_diameter=100.0,
        ball_radius=6.0,
        polymer=0,
        planarity=1.0,
        ny=128,
        nx=256,
        apix=2.0,
        rng=0,
    )

    twists, rises = build_candidate_grid(0.5, 45.0, 0.25, 4.0, 5.0, 0.25)
    order = np.random.default_rng(0).permutation(len(twists))[:n_cand]
    twists, rises = twists[order], rises[order]

    kwargs = dict(
        apix=2.0,
        target_apix2d=4.0,
        target_apix3d=-1,
        tube_diameter=110.0,
        reconstruct_length_rise=3.0,
        cg_iters=int(os.environ.get("HELICON_BENCH_CG", 50)),
        fista_iters=int(os.environ.get("HELICON_BENCH_FISTA", 20)),
        compute_dtype=os.environ.get("HELICON_BENCH_DTYPE", "float32"),
        batch_size=batch,
        return_best_volume=False,
    )

    # warmup / compile on a small same-batch-size slice
    reconstruct_grid(img, twists=twists[:batch], rises=rises[:batch], **kwargs)

    t0 = time.perf_counter()
    res = reconstruct_grid(img, twists=twists, rises=rises, **kwargs)
    dt = time.perf_counter() - t0

    rate = n_cand / dt
    n_dev = len(jax.devices())
    target_rate = (10_000 / 60.0) * (n_dev / 8.0)  # scale target to chips
    out = {
        "metric": "denovo3d_candidates_per_s",
        "value": round(rate, 3),
        "unit": "candidates/s",
        "vs_baseline": round(rate / target_rate, 4),
    }
    print(json.dumps(out))
    return res


if __name__ == "__main__":
    main()
