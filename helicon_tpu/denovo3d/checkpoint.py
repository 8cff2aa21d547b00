"""Checkpoint/resume for long grid searches.

The reference has no resumability: an interrupted denovo3D run loses
every completed task (its joblib cache, reference util.py:469-515,
memoizes only whole-call results, so a killed 10^5-candidate search
restarts from zero). Production-scale searches need batch-level
persistence: :func:`reconstruct_grid_checkpointed` scores the grid in
chunks, persists the coarse score vector after every chunk (atomic
write-then-rename .npz), and on re-run recomputes only the missing
candidates.

Chunked scoring reproduces the one-shot run exactly through the same
two mechanisms the multi-host driver uses (parallel/multihost.py): the
GLOBAL rise-bucket partition (`grid.global_rise_buckets`) and
`reconstruct_grid(geometry_rise_range=...)` pinning every call to its
bucket's global rise range — a chunk's own rise extremes never shift
the compiled geometry. After the coarse pass completes, the standard
merge stages run exactly like the single-host bucketed driver: the
cross-bucket top-10% re-scoring pass at per-candidate geometry, global
top-k pose refinement (when configured), and the winner re-solve.
These tail stages are a small, bounded fraction of the total work (10%
of candidates, k refinements, 1 volume), so only the coarse pass is
checkpointed.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

__all__ = ["reconstruct_grid_checkpointed"]

_STATE_VERSION = 1


def _atomic_save(path: str, **arrays) -> None:
    """np.savez to a temp file in the same directory, then rename —
    a crash mid-write never corrupts the previous checkpoint."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _load_state(path, twists, rises):
    """Validate + return (scores, pose, pose_mask) from an existing
    checkpoint, or fresh arrays. A checkpoint written for a DIFFERENT
    grid raises instead of silently mixing scores."""
    from ..utils.exceptions import HeliconError

    n = len(twists)
    scores = np.full(n, np.nan, np.float32)
    pose = np.zeros((n, 3), np.float32)
    pose_mask = np.zeros(n, bool)
    empty = np.zeros(0, np.float32)
    if not os.path.exists(path):
        return scores, pose, pose_mask, (empty, empty, empty)
    z = np.load(path)
    if int(z.get("version", -1)) != _STATE_VERSION:
        raise HeliconError(
            f"checkpoint {path}: unknown version {z.get('version')}"
        )
    if len(z["twists"]) != n or not (
        np.array_equal(z["twists"], twists) and np.array_equal(z["rises"], rises)
    ):
        raise HeliconError(
            f"checkpoint {path} was written for a different candidate "
            "grid — delete it (or change --checkpoint) to start fresh"
        )
    # densify extras (optional keys: absent in shards written before
    # round 5's densify persistence)
    extras = tuple(
        np.array(z[k], np.float32) if k in z.files else empty
        for k in ("extra_twists", "extra_rises", "extra_scores")
    )
    return (
        np.array(z["scores"], np.float32),
        np.array(z["pose"], np.float32),
        np.array(z["pose_mask"], bool),
        extras,
    )


def reconstruct_grid_checkpointed(
    image,
    apix,
    twists,
    rises,
    checkpoint_path: str,
    chunk: int = 1024,
    should_abort=None,
    progress_callback=None,
    **kwargs,
):
    """Resumable `reconstruct_grid`: identical results, interruptible.

    Scores land in `checkpoint_path` (.npz) after every `chunk`
    candidates; a killed run resumes from the last completed chunk on
    the next call with the same arguments. `should_abort` (a callable,
    polled between chunks) stops cleanly after the current chunk — the
    returned GridResult then carries -inf for unscored candidates
    (reconstruct_grid's incremental-mode convention; the on-disk state
    keeps NaN so resume knows what is missing) and no best volume. `progress_callback(done, total, scores)` mirrors
    reconstruct_grid's incremental protocol at chunk granularity.

    All reconstruct_grid kwargs are accepted. Refinement semantics match
    the one-shot call: refine_mode="topk" refines the global per-bucket
    top-k after the coarse pass; refine_mode="all" refines inside every
    chunk (slice-independent) with the poses persisted alongside the
    scores.
    """
    from . import reconstruct_grid
    from .grid import GridResult, crossbucket_selection, global_rise_buckets

    twists = np.asarray(twists, np.float32)
    rises = np.asarray(rises, np.float32)
    n = len(twists)
    ratio = float(kwargs.get("rise_bucket_ratio", 1.6))
    refine_range = kwargs.get("refine_tilt_psi_dy_range")
    refine_mode = kwargs.get("refine_mode", "topk")
    refine_top_k = max(1, int(kwargs.get("refine_top_k", 1)))
    return_best_volume = kwargs.get("return_best_volume", True)
    defer_refine = refine_range is not None and refine_mode != "all"

    buckets = global_rise_buckets(rises, ratio)
    scores, pose, pose_mask, loaded_extras = _load_state(
        checkpoint_path, twists, rises
    )

    sub_kw = dict(kwargs)
    for k in ("return_best_volume", "progress_callback", "should_abort"):
        sub_kw.pop(k, None)
    sub_kw["return_best_volume"] = False
    if defer_refine:
        sub_kw["refine_tilt_psi_dy_range"] = None

    def run(cand_idx, rise_range, **overrides):
        return reconstruct_grid(
            image, apix, twists[cand_idx], rises[cand_idx],
            geometry_rise_range=rise_range,
            **dict(sub_kw, **overrides),
        )

    def _extras_arrays():
        if not extra_parts:
            e = np.zeros(0, np.float32)
            return e, e, e
        return (
            np.concatenate([p["twists"] for p in extra_parts]),
            np.concatenate([p["rises_A"] for p in extra_parts]),
            np.concatenate([p["scores"] for p in extra_parts]),
        )

    def save():
        et, er, es = _extras_arrays()
        _atomic_save(
            checkpoint_path,
            version=_STATE_VERSION,
            twists=twists,
            rises=rises,
            scores=scores,
            pose=pose,
            pose_mask=pose_mask,
            extra_twists=et,
            extra_rises=er,
            extra_scores=es,
        )

    # coarse pass: chunked over each bucket's still-unscored candidates
    aborted = False
    chunks_run = 0
    local_sub = None
    cost = None
    # densify extras: seeded from the persisted shard (so a resumed run
    # keeps the completed chunks' extras) and extended per new chunk;
    # stored uniformly as {'twists','rises_A','scores'} with rises in
    # ANGSTROM (GridResult.extras already converts from pixels)
    extra_parts: list = []
    if len(loaded_extras[0]):
        extra_parts.append(dict(
            twists=loaded_extras[0],
            rises_A=loaded_extras[1],
            scores=loaded_extras[2],
        ))
    for idx in buckets:
        rr = (float(np.min(rises[idx])), float(np.max(rises[idx])))
        todo = idx[np.isnan(scores[idx])]
        for s in range(0, len(todo), max(1, int(chunk))):
            if should_abort is not None and should_abort():
                aborted = True
                break
            m = todo[s : s + max(1, int(chunk))]
            sub = run(m, rr)
            scores[m] = np.asarray(sub.scores, np.float32)
            if sub.extras:  # densify_padding extras (persisted in the
                extra_parts.append(dict(  # shard by save() below)
                    twists=sub.extras["twists"],
                    rises_A=sub.extras["rises"],
                    scores=sub.extras["scores"],
                ))
            if sub.refined_params:  # refine_mode="all"
                for k, v in sub.refined_params.items():
                    pose[m[k]] = np.asarray(v, np.float32)
                    pose_mask[m[k]] = True
            chunks_run += 1
            local_sub = sub
            if cost is None:
                cost = sub.cost
            save()
            if progress_callback is not None:
                done = int(np.count_nonzero(~np.isnan(scores)))
                progress_callback(done, n, scores)
        if aborted:
            break

    refined = {
        int(i): tuple(map(float, pose[i])) for i in np.where(pose_mask)[0]
    }
    if aborted or np.isnan(scores).any():
        # partial coarse scores: no merge stages, no winner re-solve.
        # NaN marks "unscored" only in the on-disk state; the returned
        # GridResult follows reconstruct_grid's incremental/abort
        # convention and fills unscored entries with -inf so consumers
        # that sort or argmax (e.g. the CLI's CSV writer) behave
        et, er, es = _extras_arrays()
        return GridResult(
            twists=twists,
            rises=rises,
            scores=np.where(np.isnan(scores), -np.inf, scores).astype(
                np.float32
            ),
            extras=(
                dict(twists=et, rises=er, scores=es) if len(et) else None
            ),
            geom=local_sub.geom if local_sub is not None else None,
            target_apix2d=(
                local_sub.target_apix2d if local_sub is not None else -1.0
            ),
            target_apix3d=(
                local_sub.target_apix3d if local_sub is not None else -1.0
            ),
            best_index=-1,
            refined_params=refined or None,
            cost=cost,
            effective=dict(
                (local_sub.effective or {}) if local_sub is not None else {},
                checkpointed=True,
                chunks_run=chunks_run,
                aborted=True,
            ),
        )

    # Merge stages below mutate only the IN-MEMORY score/pose arrays —
    # the checkpoint file keeps the pure coarse-pass state, so a re-run
    # of a finished (or merge-interrupted) checkpoint re-derives the
    # top-k and cross-bucket selections from the same coarse score
    # vector the one-shot call would use, instead of from
    # already-refined values.

    # deferred top-k refinement at bucket geometry (single-host semantics)
    if defer_refine:
        for idx in buckets:
            rr = (float(np.min(rises[idx])), float(np.max(rises[idx])))
            k = min(refine_top_k, len(idx))
            for c in idx[np.argsort(-scores[idx])[:k]]:
                c = int(c)
                sub = run(
                    np.asarray([c]), rr,
                    refine_tilt_psi_dy_range=refine_range,
                    refine_top_k=1, batch_size=None,
                    densify_padding=False,
                )
                scores[c] = float(sub.scores[0])
                if sub.refined_params:
                    pose[c] = np.asarray(sub.refined_params[0], np.float32)
                    pose_mask[c] = True

    # cross-bucket pass at per-candidate geometry (see
    # grid._reconstruct_grid_bucketed's second pass)
    sel = None
    if len(buckets) > 1:
        sel = crossbucket_selection(buckets, scores)
        for r in np.unique(rises[sel]):
            m = sel[rises[sel] == r]
            scores[m] = np.asarray(
                run(
                    m, None, refine_tilt_psi_dy_range=None,
                    densify_padding=False,
                ).scores,
                np.float32,
            )

    refined = {
        int(i): tuple(map(float, pose[i])) for i in np.where(pose_mask)[0]
    }
    # winner restricted to the re-scored set when bucketed, mirroring
    # _reconstruct_grid_bucketed: un-selected candidates carry
    # bias-inflated bucket-geometry scores
    if not n:
        best = -1
    elif sel is not None and len(sel):
        best = int(sel[int(np.argmax(scores[sel]))])
    else:
        best = int(np.argmax(scores))
    best_volume = None
    win = None
    if return_best_volume and best >= 0:
        # single bucket: the one-shot call solves the winner at the
        # grid's global geometry; bucketed: at per-candidate geometry
        # (grid._reconstruct_grid_bucketed's winner call)
        win_rr = (
            (float(np.min(rises)), float(np.max(rises)))
            if len(buckets) == 1
            else None
        )
        win = run(
            np.asarray([best]), win_rr,
            return_best_volume=True, batch_size=None,
            refine_tilt_psi_dy_range=refine_range,
            densify_padding=False,
        )
        best_volume = win.best_volume

    extras = None
    if extra_parts:
        et, er, es = _extras_arrays()
        extras = dict(twists=et, rises=er, scores=es)
    ref_sub = win if win is not None else local_sub
    if ref_sub is None and n:
        # fully-resumed run without a winner re-solve (e.g.
        # return_best_volume=False): nothing was recomputed, but callers
        # still read geom/target_apix metadata off the result — one
        # single-candidate solve supplies it (scores untouched). Skipped
        # whenever the winner re-solve already provided ref_sub.
        idx0 = buckets[0]
        rr0 = (float(np.min(rises[idx0])), float(np.max(rises[idx0])))
        local_sub = ref_sub = run(
            idx0[:1], rr0, batch_size=None,
            refine_tilt_psi_dy_range=None, densify_padding=False,
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
            checkpointed=True,
            chunks_run=chunks_run,
            n_buckets=len(buckets),
        ),
        extras=extras,
    )
