"""Ranking study: refine_mode="topk" (post-hoc) vs "all" (reference
per-task refinement) — does top-k-post-hoc miss candidates whose rank
improves under refinement? (VERDICT r3 #5; results table in PARITY.md.)

Run: python docs/refine_mode_study.py   (CPU, ~20 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


OUT = "/tmp/refine_mode_study.json"
_results = []


def _flush(rec):
    import sys

    _results.append(rec)
    with open(OUT, "w") as f:
        json.dump(_results, f, indent=1)
    print(json.dumps(rec), flush=True)
    sys.stdout.flush()
    return rec


def run_case(name, img, apix, tw, ri, tilt0, r_range, diameter):
    from helicon_tpu.denovo3d import reconstruct_grid

    kw = dict(
        apix=apix, twists=tw, rises=ri, tilt=tilt0,
        tube_diameter=diameter, cg_iters=8, fista_iters=10,
        power_iters=2, compute_dtype="float32", batch_size=16,
        return_best_volume=False,
    )
    t0 = time.time()
    fixed = reconstruct_grid(img, **kw)
    t_fixed = time.time() - t0
    t0 = time.time()
    r_all = reconstruct_grid(
        img, refine_mode="all", refine_tilt_psi_dy_range=r_range, **kw
    )
    t_all = time.time() - t0
    # "topk" mode re-scores only the single best candidate; its ranking
    # below rank 1 is the fixed-pose ranking by construction
    top_fixed = np.argsort(-fixed.scores)[:10]
    top_all = np.argsort(-r_all.scores)[:10]
    overlap = len(set(top_fixed.tolist()) & set(top_all.tolist()))
    return _flush(dict(
        case=name,
        n_candidates=int(len(tw)),
        top1_fixed=[float(fixed.twists[top_fixed[0]]),
                    float(fixed.rises[top_fixed[0]])],
        top1_all=[float(r_all.twists[top_all[0]]),
                  float(r_all.rises[top_all[0]])],
        top1_same=bool(top_fixed[0] == top_all[0]),
        top10_overlap=overlap,
        spearman=float(
            np.corrcoef(
                np.argsort(np.argsort(-fixed.scores)),
                np.argsort(np.argsort(-r_all.scores)),
            )[0, 1]
        ),
        max_score_gain=float(np.max(r_all.scores - fixed.scores)),
        t_fixed_s=round(t_fixed, 1),
        t_all_s=round(t_all, 1),
    ))


def main():
    from helicon_tpu.denovo3d import build_candidate_grid
    from helicon_tpu.helix import simulate_helical_projection

    def sim(**kws):
        return np.squeeze(np.asarray(simulate_helical_projection(**kws)))

    rng = np.random.default_rng(0)
    results = _results

    # S1: tilted clean helix, grid started at tilt 0
    img = sim(n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
              ball_radius=5.0, polymer=0, planarity=1.0, ny=48, nx=96,
              apix=2.0, tilt=4.0, rng=0)
    tw, ri = build_candidate_grid(26.0, 34.0, 2.0, 5.4, 6.6, 0.3,
                                  handedness="right")
    run_case(
        "S1 tilt=4 clean", img, 2.0, tw, ri, 0.0,
        dict(tilt=8.0, psi=3.0, dy=1.0, max_iter=3), 44.0,
    )

    # S2: tilted + psi + noise
    img = sim(n=1, twist=22.0, rise=5.0, csym=1, helical_diameter=60.0,
              ball_radius=5.0, polymer=0, planarity=1.0, ny=64, nx=128,
              apix=2.0, tilt=6.0, psi=2.0, rng=1)
    img = img + rng.normal(scale=0.2 * img.std(), size=img.shape)
    tw, ri = build_candidate_grid(18.0, 26.0, 2.0, 4.4, 5.6, 0.3,
                                  handedness="right")
    run_case(
        "S2 tilt=6 psi=2 noisy", img.astype(np.float32), 2.0, tw, ri, 0.0,
        dict(tilt=10.0, psi=4.0, dy=1.0, max_iter=3), 66.0,
    )

    # S3: wrong fixed tilt (grid run at tilt=3, truth 0)
    img = sim(n=1, twist=50.0, rise=3.2, csym=1, helical_diameter=36.0,
              ball_radius=4.0, polymer=0, planarity=1.0, ny=48, nx=96,
              apix=2.0, rng=2)
    img = img + rng.normal(scale=0.1 * img.std(), size=img.shape)
    tw, ri = build_candidate_grid(44.0, 56.0, 3.0, 2.8, 3.7, 0.2,
                                  handedness="right")
    run_case(
        "S3 wrong tilt0=3", img.astype(np.float32), 2.0, tw, ri, 3.0,
        dict(tilt=6.0, psi=2.0, dy=1.0, max_iter=3), 40.0,
    )

    # E1: committed EMPIAR-10940-style amyloid fixture
    import pathlib

    img = np.load(
        pathlib.Path(__file__).parent.parent
        / "tests" / "data" / "class_avg_amyloid.npy"
    )
    tw, ri = build_candidate_grid(1.0, 3.0, 0.5, 4.45, 5.06, 0.15,
                                  handedness="left")
    run_case(
        "E1 amyloid fixture", img, 2.0, tw, ri, 0.0,
        dict(tilt=5.0, psi=2.0, dy=1.0, max_iter=3), 110.0,
    )

    print("study complete:", len(results), "cases ->", OUT)


if __name__ == "__main__":
    main()
