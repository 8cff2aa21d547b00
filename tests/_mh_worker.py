"""Worker for the 2-process multi-host test (tests/test_parallel.py).

Usage: python _mh_worker.py <process_id> <num_processes> <port> <out.json>

Forces the CPU platform *before* the backend initializes (the axon TPU
plugin ignores JAX_PLATFORMS; same override as tests/conftest.py), joins
the distributed runtime, runs multihost_reconstruct_grid on the shared
tiny workload, and writes the full gathered score vector as JSON.
"""

import json
import os
import sys

# spawned as `python tests/_mh_worker.py`: sys.path[0] is tests/, so put
# the repo root on the path regardless of the caller's environment
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def tiny_workload(bucketed: bool = False):
    """Shared (image, twists, rises, kwargs) for single- and multi-process
    runs — must be identical across processes (candidate slicing assumes
    every process enumerates the same grid).

    bucketed=True widens the rise range past rise_bucket_ratio so the
    grid splits into TWO rise buckets: exercises the multi-host bucketed
    path (global bucket partition, per-bucket geometry pinning, the
    cross-bucket top-10% re-scoring pass)."""
    from helicon_tpu.helix import simulate_helical_projection

    image = simulate_helical_projection(
        n=1, twist=29.4, rise=4.75, csym=1, helical_diameter=100.0,
        ball_radius=6.0, polymer=0, planarity=1.0,
        ny=64, nx=128, apix=2.0, rng=0,
    )
    if bucketed:
        tw = np.asarray([25.0] * 2 + [29.4] * 3 + [33.0], np.float32)
        ri = np.asarray([3.0, 4.75, 3.2, 4.75, 5.6, 4.75], np.float32)
    else:
        tw = np.asarray([25.0] * 3 + [29.4] * 3 + [33.0], np.float32)
        ri = np.asarray([4.3, 4.6, 4.9, 4.4, 4.75, 5.0, 4.75], np.float32)
    kw = dict(
        apix=2.0, target_apix2d=4.0, tube_diameter=110.0,
        reconstruct_length_rise=3.0, cg_iters=8, fista_iters=8,
        power_iters=2, compute_dtype="float32", batch_size=4,
        return_best_volume=False,
    )
    return image, tw, ri, kw


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    # extra args: "bucketed", "ckpt=<base path>", "chunk=<n>",
    # "die=<k0,k1,...>" (per-rank die_after_chunks test hook)
    extra = sys.argv[5:]
    bucketed = "bucketed" in extra
    mh_kw = {}
    for a in extra:
        if a.startswith("ckpt="):
            mh_kw["checkpoint_path"] = a[5:]
        elif a.startswith("chunk="):
            mh_kw["checkpoint_chunk"] = int(a[6:])
        elif a.startswith("die="):
            ks = [int(x) for x in a[4:].split(",")]
            if ks[pid % len(ks)] > 0:
                mh_kw["die_after_chunks"] = ks[pid % len(ks)]
    from helicon_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    image, tw, ri, kw = tiny_workload(bucketed)
    res = multihost.multihost_reconstruct_grid(
        image, twists=tw, rises=ri, **mh_kw, **kw
    )
    with open(out_path, "w") as f:
        json.dump(
            dict(
                process_id=pid,
                scores=np.asarray(res.scores, np.float64).tolist(),
                best_index=res.best_index,
                has_volume=res.best_volume is not None,
                effective={
                    k: res.effective.get(k)
                    for k in ("n_processes", "n_buckets",
                              "checkpointed", "chunks_run")
                },
            ),
            f,
        )
    print(f"p{pid}: ok", flush=True)


if __name__ == "__main__":
    main()
