"""Multi-host (DCN) execution: process-sharded candidate grids.

The reference has no distributed execution at all — its widest
parallelism is a single host's ThreadPool/joblib fan-out (SURVEY.md
section 2h; reference `helicon/lib/util.py` parallel helpers). The
TPU-native scale-out axis is the same one the single-host design
shards over ICI: the *candidate* axis. Per-candidate solves never
communicate, so the multi-host decomposition is embarrassingly clean:

  1. `jax.distributed.initialize()` (or :func:`initialize` below) wires
     the processes into one JAX runtime.
  2. Every process enumerates the full (twist, rise) grid host-side
     (cheap numpy table building), partitions it into the SAME rise
     buckets a single-host run would use (geometry consistency is
     decided by the GLOBAL candidate set, never by a process's slice —
     each per-bucket call pins the bucket's global rise range via
     ``reconstruct_grid(geometry_rise_range=...)``), takes its
     contiguous slice of each bucket, and runs the ordinary single-host
     `reconstruct_grid` on its *local* devices — ICI parallelism inside
     a host is unchanged.
  3. The per-candidate score vector (a few KB) is exchanged with ONE
     collective per pass (:func:`_psum_exchange`). No operator tensors,
     images, or volumes ever cross hosts; DCN carries only scores and
     (when refining) the few refined pose triples, exactly the "DCN
     only for multi-host batch farming" plan of SURVEY.md section 2h.

Top-k pose refinement keeps single-host semantics: the fixed-pose pass
runs WITHOUT refinement, scores are gathered, and the GLOBAL per-bucket
top-k (identical on every process) is then refined by its round-robin
owner and re-exchanged — a slice-local top-k would refine different
candidates than a single-host run. refine_mode="all" refines every
candidate inside the sharded pass directly (slice-independent by
construction).

This mirrors how the scaling-book treats pure data parallelism: the
mesh axis that owns independent work items needs collectives only at
the reduction point, so the slow inter-host links see one small
message per pass instead of per-step traffic.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "initialize",
    "is_distributed",
    "is_writer",
    "process_candidate_slice",
    "multihost_reconstruct_grid",
]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """`jax.distributed.initialize` with env-var fallbacks.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    when arguments are omitted (the names jax itself documents), so a
    launcher can configure workers purely through the environment. On a
    single process (no coordinator configured anywhere) this is a no-op:
    the single-host path needs no distributed runtime.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return  # single-process: nothing to initialize
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def is_distributed() -> bool:
    return jax.process_count() > 1


def is_writer() -> bool:
    """Should this process write shared output files? Process 0 owns
    them under multi-host execution (every process holds the same full
    ranking, so any single writer produces the complete outputs)."""
    return not is_distributed() or jax.process_index() == 0


def process_candidate_slice(
    n: int, num_processes: int | None = None, process_id: int | None = None
) -> slice:
    """Contiguous balanced slice of an n-long candidate axis for this
    process. Contiguous (not strided) so each process's slice shares
    rise buckets / twist groups — the compiled-shape caches inside
    reconstruct_grid stay as effective as in the single-host run."""
    if num_processes is None:
        num_processes = jax.process_count()
    if process_id is None:
        process_id = jax.process_index()
    base, rem = divmod(n, num_processes)
    start = process_id * base + min(process_id, rem)
    stop = start + base + (1 if process_id < rem else 0)
    return slice(start, stop)


def _psum_exchange(contrib: np.ndarray) -> np.ndarray:
    """One-collective exchange of disjoint per-process contributions.

    Every process passes a full-shape float32 array that is ZERO
    everywhere it does not own; the psum over the global mesh
    reconstructs the combined array (disjoint ownership, so
    sum == scatter). Built on shard_map over the global 1D device mesh,
    which is the supported way to run a cross-process collective.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())  # global, all processes
    mesh = Mesh(devices, ("d",))
    full = np.asarray(contrib, np.float32)
    # each local device contributes full / n_local_devices so the psum
    # over ALL devices still sums each process's contribution exactly once
    full = full / max(1, jax.local_device_count())

    def body(x):
        return jax.lax.psum(x, "d")

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=P(), out_specs=P(),
            check_vma=False,
        ),
        in_shardings=NamedSharding(mesh, P()),
        out_shardings=NamedSharding(mesh, P()),
    )
    arr = jax.make_array_from_callback(
        full.shape, NamedSharding(mesh, P()), lambda idx: full[idx]
    )
    # writable copy: device_get hands back a read-only buffer view, and
    # callers scatter refined / re-scored entries into the result
    return np.array(jax.device_get(fn(arr)), np.float32)


def _shard_checkpoint_path(path: str, pid: int) -> str:
    """Per-process checkpoint shard name: `run.ckpt.npz` ->
    `run.ckpt.p0.npz` (VERDICT r4 #5 — each process persists only its
    own slice, so no two processes ever write the same file)."""
    if path.endswith(".npz"):
        return f"{path[:-4]}.p{pid}.npz"
    return f"{path}.p{pid}"


def multihost_reconstruct_grid(
    image, apix, twists, rises,
    checkpoint_path: str | None = None, checkpoint_chunk: int = 1024,
    die_after_chunks: int | None = None,
    **kwargs,
):
    """Process-sharded candidate grid: each process scores its slice of
    every (globally determined) rise bucket on its local devices; scores
    are exchanged with one DCN collective per pass.

    checkpoint_path (optional) composes resumability with multi-host
    execution (VERDICT r4 #5): each process persists ITS OWN coarse-pass
    slice to a per-process shard (`<path>.p<rank>.npz`, same atomic
    write + grid-hash validation as the single-host checkpoint layer)
    after every `checkpoint_chunk` candidates. A killed run restarts
    with the SAME command on every host; each process recomputes only
    its shard's missing candidates, then the ordinary score exchange +
    merge stages run. Only the coarse pass is checkpointed — the merge
    stages are the same bounded tail work as everywhere else, and they
    re-derive from the coarse vector (single-host checkpoint semantics).
    die_after_chunks is a TEST hook: exit the process cleanly after N
    chunks, BEFORE any collective (simulates a mid-grid kill without
    deadlocking the surviving processes in the psum barrier).

    Semantics match a single-host `reconstruct_grid` call on the full
    grid: identical rise bucketing, identical per-bucket geometry (the
    bucket's GLOBAL rise range is pinned via geometry_rise_range, so a
    process's slice extremes never shift the compiled geometry),
    global — not slice-local — top-k selection for pose refinement, and
    the same cross-bucket top-10% re-scoring pass at per-candidate
    geometry. Batch-mode only: progress_callback / should_abort are not
    forwarded (partial -inf fills cannot ride a psum exchange).

    Returns the same GridResult with the FULL score vector (and, when
    refining, the full refined_params dict) on every process, so
    ranking stays reproducible everywhere. best_volume is populated
    only on the process that re-solves the winner (volumes are
    host-memory heavy; shipping them over DCN is the caller's choice).
    """
    from ..denovo3d import reconstruct_grid
    from ..denovo3d.grid import (
        GridResult,
        crossbucket_selection,
        global_rise_buckets,
    )

    twists = np.asarray(twists, np.float32)
    rises = np.asarray(rises, np.float32)
    n = len(twists)
    if not is_distributed():
        if checkpoint_path is not None:
            from ..denovo3d import reconstruct_grid_checkpointed

            return reconstruct_grid_checkpointed(
                image, apix, twists, rises,
                checkpoint_path=checkpoint_path,
                chunk=checkpoint_chunk, **kwargs,
            )
        return reconstruct_grid(image, apix, twists, rises, **kwargs)

    n_proc = jax.process_count()
    pid = jax.process_index()
    ratio = float(kwargs.get("rise_bucket_ratio", 1.6))
    refine_range = kwargs.get("refine_tilt_psi_dy_range")
    refine_mode = kwargs.get("refine_mode", "topk")
    refine_top_k = max(1, int(kwargs.get("refine_top_k", 1)))
    return_best_volume = kwargs.get("return_best_volume", True)

    # GLOBAL bucket partition — pure numpy over the full grid, so every
    # process computes the identical partition a single-host run would
    buckets = global_rise_buckets(rises, ratio)

    defer_refine = refine_range is not None and refine_mode != "all"
    local_kw = dict(kwargs)
    for k in ("return_best_volume", "progress_callback", "should_abort",
              "devices"):
        local_kw.pop(k, None)
    local_kw["return_best_volume"] = False
    if local_kw.pop("densify_padding", False):
        # extras would be rank-local (each process densifies only its
        # own slice's padding and nothing exchanges them) — dropping the
        # flag with a note beats returning different extras per rank
        import logging as _logging

        _logging.getLogger("helicon").warning(
            "denovo3d: densify_padding is not supported under "
            "multi-host execution — ignored (no extras will be produced)"
        )
    if defer_refine:
        local_kw["refine_tilt_psi_dy_range"] = None

    def run(cand_idx, rise_range, **overrides):
        return reconstruct_grid(
            image, apix, twists[cand_idx], rises[cand_idx],
            devices=jax.local_devices(),
            geometry_rise_range=rise_range,
            **dict(local_kw, **overrides),
        )

    # pass 1: fixed-pose scoring, sharded within each bucket. With a
    # checkpoint path, this process's completed entries live in its
    # shard (NaN = not mine / not yet scored) and only the missing ones
    # of its slice are recomputed — chunked with a save after each
    # chunk, exactly the single-host checkpoint contract.
    contrib = np.zeros(n, np.float32)
    pose_c = np.zeros((n, 3), np.float32)
    pose_m = np.zeros(n, np.float32)
    local_sub = None
    cost = None
    chunks_run = 0
    ck_scores = ck_pose = ck_mask = None
    shard = None
    if checkpoint_path is not None:
        from ..denovo3d.checkpoint import _atomic_save, _load_state

        shard = _shard_checkpoint_path(checkpoint_path, pid)
        # (the trailing densify-extras tuple is unused here: multi-host
        # drops densify_padding above)
        ck_scores, ck_pose, ck_mask, _ = _load_state(shard, twists, rises)

        def save_shard():
            _atomic_save(
                shard, version=1, twists=twists, rises=rises,
                scores=ck_scores, pose=ck_pose, pose_mask=ck_mask,
            )

    for idx in buckets:
        rr = (float(np.min(rises[idx])), float(np.max(rises[idx])))
        mine = idx[process_candidate_slice(len(idx), n_proc, pid)]
        if not len(mine):
            continue
        if shard is None:
            parts = [mine]
        else:
            done = mine[~np.isnan(ck_scores[mine])]
            contrib[done] = ck_scores[done]
            pose_c[done] = ck_pose[done]
            pose_m[done] = ck_mask[done].astype(np.float32)
            todo = mine[np.isnan(ck_scores[mine])]
            step = max(1, int(checkpoint_chunk))
            parts = [
                todo[s : s + step] for s in range(0, len(todo), step)
            ]
        for part in parts:
            if not len(part):
                continue
            sub = run(part, rr)
            contrib[part] = np.asarray(sub.scores, np.float32)
            if sub.refined_params:  # refine_mode="all": every candidate
                for k, v in sub.refined_params.items():
                    pose_c[part[k]] = np.asarray(v, np.float32)
                    pose_m[part[k]] = 1.0
            local_sub = sub
            if cost is None:
                cost = sub.cost
            chunks_run += 1
            if shard is not None:
                ck_scores[part] = contrib[part]
                ck_pose[part] = pose_c[part]
                ck_mask[part] = pose_m[part] > 0
                save_shard()
                if (
                    die_after_chunks is not None
                    and chunks_run >= die_after_chunks
                ):
                    # test hook: simulate a mid-grid kill without ever
                    # reaching a collective (no deadlock for peers)
                    os._exit(17)
    scores = _psum_exchange(contrib)

    refined: dict = {}
    if refine_mode == "all" and refine_range is not None:
        pose_all = _psum_exchange(pose_c)
        mask_all = _psum_exchange(pose_m) > 0
        refined = {
            int(i): tuple(map(float, pose_all[i]))
            for i in np.where(mask_all)[0]
        }

    # deferred top-k refinement: GLOBAL per-bucket top-k (identical on
    # every process), each candidate refined by its round-robin owner at
    # its bucket's geometry, refined scores + poses re-exchanged
    if defer_refine:
        tasks = []  # (bucket index, candidate index)
        for b, idx in enumerate(buckets):
            k = min(refine_top_k, len(idx))
            top = idx[np.argsort(-scores[idx])[:k]]
            tasks.extend((b, int(c)) for c in top)
        r_s = np.zeros(n, np.float32)
        r_m = np.zeros(n, np.float32)
        r_p = np.zeros((n, 3), np.float32)
        for j, (b, c) in enumerate(tasks):
            if j % n_proc != pid:
                continue
            idx = buckets[b]
            rr = (float(np.min(rises[idx])), float(np.max(rises[idx])))
            sub = run(
                np.asarray([c]), rr,
                refine_tilt_psi_dy_range=refine_range,
                refine_top_k=1, batch_size=None,
            )
            r_s[c] = float(sub.scores[0])
            r_m[c] = 1.0
            if sub.refined_params:
                r_p[c] = np.asarray(sub.refined_params[0], np.float32)
        got_s = _psum_exchange(r_s)
        got_m = _psum_exchange(r_m) > 0
        got_p = _psum_exchange(r_p)
        scores[got_m] = got_s[got_m]
        refined = {
            int(i): tuple(map(float, got_p[i])) for i in np.where(got_m)[0]
        }

    # cross-bucket pass: bucket scores are comparable only WITHIN a
    # bucket (longer volume = more unknowns = better fit); re-score each
    # bucket's top 10% at per-candidate geometry, exactly like the
    # single-host bucketed merge, sharded over distinct rise values.
    # refine_tilt_psi_dy_range is forced off here for every refine_mode
    # (the single-host second pass at grid.py's _reconstruct_grid_bucketed
    # does the same: refinement already ran in the buckets).
    sel = None
    if len(buckets) > 1:
        sel = crossbucket_selection(buckets, scores)
        r_s = np.zeros(n, np.float32)
        r_m = np.zeros(n, np.float32)
        for j, r in enumerate(np.unique(rises[sel])):
            if j % n_proc != pid:
                continue
            m = sel[rises[sel] == r]
            r_s[m] = np.asarray(
                run(m, None, refine_tilt_psi_dy_range=None).scores,
                np.float32,
            )
            r_m[m] = 1.0
        got_s = _psum_exchange(r_s)
        got_m = _psum_exchange(r_m) > 0
        scores[got_m] = got_s[got_m]

    # winner selection mirrors _reconstruct_grid_bucketed: with >1
    # bucket, only cross-bucket RE-SCORED candidates are eligible —
    # un-selected candidates keep bias-inflated bucket-geometry scores
    # and must never outrank a re-scored one
    if not n:
        best = -1
    elif sel is not None and len(sel):
        best = int(sel[int(np.argmax(scores[sel]))])
    else:
        best = int(np.argmax(scores))
    owner = best % n_proc if best >= 0 else -1
    best_volume = None
    win = None
    if return_best_volume and best >= 0 and pid == owner:
        # winner re-solve: single bucket -> the grid's global geometry
        # (what a one-shot call solves the volume at); bucketed -> the
        # winner's own per-candidate geometry (the single-host bucketed
        # merge's winner call). Refinement, if configured, re-runs
        # deterministically on this one candidate.
        win_rr = (
            (float(np.min(rises)), float(np.max(rises)))
            if len(buckets) == 1
            else None
        )
        win = run(
            np.asarray([best]), win_rr,
            return_best_volume=True, batch_size=None,
            refine_tilt_psi_dy_range=refine_range,
        )
        best_volume = win.best_volume

    ref_sub = win if win is not None else local_sub
    if ref_sub is None and n:
        # this rank scored nothing (empty slice, or a fully-resumed
        # checkpoint shard) and did not re-solve the winner — one
        # single-candidate solve supplies the geom/target_apix metadata
        # callers read off the result (scores untouched)
        idx0 = buckets[0]
        rr0 = (float(np.min(rises[idx0])), float(np.max(rises[idx0])))
        local_sub = ref_sub = run(
            idx0[:1], rr0, batch_size=None,
            refine_tilt_psi_dy_range=None,
        )
    return GridResult(
        twists=twists,
        rises=rises,
        scores=scores,
        geom=ref_sub.geom if ref_sub is not None else None,
        target_apix2d=ref_sub.target_apix2d if ref_sub is not None else -1.0,
        target_apix3d=ref_sub.target_apix3d if ref_sub is not None else -1.0,
        best_index=best,
        best_volume=best_volume,
        refined_params=refined or None,
        cost=cost,
        effective=dict(
            (local_sub.effective or {}) if local_sub is not None else {},
            n_processes=n_proc,
            n_buckets=len(buckets),
            **(
                dict(checkpointed=True, chunks_run=chunks_run)
                if shard is not None
                else {}
            ),
        ),
    )
