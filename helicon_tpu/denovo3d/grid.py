"""Candidate-grid driver: vmapped, device-sharded (twist, rise) search.

Reference: webApps/denovo3D/app.py run_denovo3D_reconstruction
(2286-2452) fans the grid out over a host ThreadPool, one scipy/sklearn
solve per thread. Here the whole grid is a single jitted computation:
candidates are batched, vmapped, and sharded over a 1D device mesh
("candidates" axis) with jax.sharding — the TPU-idiomatic replacement for
the reference's task parallelism (SURVEY.md section 2h).

Deviation (documented): the reference grows the reconstruction length
with each candidate's rise (reconstruct_length_rise * rise); a vmapped
grid needs one static geometry per compilation. Candidates are therefore
partitioned into RISE BUCKETS (max/min rise <= rise_bucket_ratio, default
1.6) and each bucket gets its own geometry sized from its largest rise —
a handful of compiles instead of one per candidate, with every
candidate's volume length within the ratio of the reference's. A search
whose rises already fit one bucket compiles exactly once, as before.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..angular import set_to_periodic_range
from ..core.filters import down_scale
from .geometry import (
    ReconstructionGeometry,
    estimate_copy_pair_counts,
    estimate_n_pair_ops,
    select_copies,
    select_pair_ops,
    select_pairs,
)
from .pipeline import _pixel_geometry, auto_sym_oversample, derive_task_geometry, prepare_data
from .solver import (
    SolveConfig,
    _solve_candidate_impl,
    _use_fused_ntn,
    regularization_from_algorithm,
    solve_candidate,
)

__all__ = ["build_candidate_grid", "reconstruct_grid", "GridResult"]


def build_candidate_grid(
    twist_min: float,
    twist_max: float,
    twist_step: float,
    rise_min: float,
    rise_max: float,
    rise_step: float,
    handedness: str = "both",
    tube_length: float = math.inf,
):
    """(twist, rise) candidate list with the reference's filters
    (app.py:2308-2334, 2389-2404): degenerate twist/rise and
    rise >= tube_length/2 dropped; handedness forcing for single-twist
    searches. Returns (twists, rises) float32 arrays of equal length.
    """
    if handedness.startswith("left") and twist_max == twist_min:
        twists = [-abs(twist_max)]
    elif handedness.startswith("right") and twist_max == twist_min:
        twists = [abs(twist_max)]
    elif twist_min < twist_max:
        twists = np.arange(twist_min, twist_max + twist_step / 2, twist_step)
    else:
        twists = [twist_min]
    if rise_min < rise_max:
        rises = np.arange(rise_min, rise_max + rise_step / 2, rise_step)
    else:
        rises = [rise_min]

    out_t, out_r = [], []
    for t in twists:
        t = round(set_to_periodic_range(float(t), min=-180, max=180), 6)
        for r in rises:
            if abs(t) < 0.01 or abs(r) < 0.01 or abs(r) >= tube_length / 2:
                continue
            out_t.append(t)
            out_r.append(float(r))
    return np.asarray(out_t, np.float32), np.asarray(out_r, np.float32)


@dataclasses.dataclass
class GridResult:
    twists: np.ndarray
    rises: np.ndarray
    scores: np.ndarray
    geom: ReconstructionGeometry
    target_apix2d: float
    target_apix3d: float
    best_index: int = -1
    best_volume: np.ndarray | None = None
    # {candidate index: (tilt_deg, psi_deg, dy_pixel)} for candidates that
    # went through Gauss-Newton pose refinement (refine_tilt_psi_dy_range)
    refined_params: dict | None = None
    # XLA cost analysis of one scoring batch (cost_analysis=True):
    # dict(flops, bytes_accessed, batch_size) — flops is XLA's own count
    # for the compiled vmapped solve, the basis for the bench's MFU figure
    cost: dict | None = None
    # resolved dispatch knobs actually in effect for this run (path,
    # R_pad, group_chunk, g_call, n_groups, fused_ntn, ...) so bench
    # JSONs record the configuration that produced the number
    effective: dict | None = None
    # densify_padding=True: {twists, rises (Angstrom), scores} of the
    # EXTRA candidates scored in otherwise-padded kernel slots —
    # informational (never part of winner selection; VERDICT r4 #3)
    extras: dict | None = None

    def top(self, n: int = 10):
        """(twist, rise, score) rows of the n best candidates."""
        order = np.argsort(-self.scores)[:n]
        return np.stack(
            [self.twists[order], self.rises[order], self.scores[order]], axis=1
        )


def _candidate_tables(
    geom, twists, rises, n_copies, n_pairs, n_ops, copy_cache=None
):
    """Host-side per-candidate symmetry copy/pair/op tables (padded)."""
    n = len(twists)
    ch = np.zeros((n, n_copies), np.int32)
    cc = np.zeros((n, n_copies), np.int32)
    cv = np.zeros((n, n_copies), bool)
    phc = np.zeros((n, n_pairs, 4), np.int32)
    pv = np.zeros((n, n_pairs), bool)
    ops_hc = np.zeros((n, n_ops, 2), np.int32)
    ops_v = np.zeros((n, n_ops), bool)
    pair_idx = np.zeros((n, n_pairs, 2), np.int32)
    if copy_cache is None:
        copy_cache = {}
    for i in range(n):
        r = float(rises[i])
        if r not in copy_cache:
            copy_cache[r] = select_copies(geom, r, n_copies)
        ch[i], cc[i], cv[i] = copy_cache[r]
        ops_hc[i], ops_v[i], pair_idx[i], pv[i] = select_pair_ops(
            geom, float(twists[i]), r, n_pairs, n_ops
        )
        # the pair list itself (for the non-separable path / debugging)
        o = ops_hc[i]
        phc[i, :, 0:2] = o[pair_idx[i, :, 0]]
        phc[i, :, 2:4] = o[pair_idx[i, :, 1]]
    return ch, cc, cv, phc, pv, ops_hc, ops_v, pair_idx


def _group_tables(
    geom, twist, rises_pixel, n_copies, n_pairs, n_ops, C_u, R_pad, copy_cache
):
    """Canonical-copy multiplicity + canonical pair tables for one
    twist-group (host side; see projector_grouped.py for the semantics).

    Returns (rises[R_pad], m[R_pad, C_u], ch_u[C_u], cc_u[C_u],
    pair_idx[R_pad, n_pairs, 2], pairs_valid[R_pad, n_pairs],
    rank[R_pad, C_u]); groups smaller than R_pad repeat their last
    candidate (scores discarded by the caller's index scatter).

    rank[ri, k] is canonical copy k's LAST position in candidate ri's
    Halton-ordered copy list (-1 = unselected): the 2D score metrics
    scatter reprojection rows last-copy-wins in that order (reference
    solver:507-516), which the sorted canonical table alone cannot
    reproduce.
    """
    from .geometry import _pair_table

    R = len(rises_pixel)
    csym = geom.csym
    hmax_p = (n_ops // csym - 1) // 2
    rises_pad, m, ch_u, cc_u, rank = _copy_block(
        geom, tuple(float(r) for r in rises_pixel),
        n_copies, C_u, R_pad, copy_cache,
    )
    pidx = np.zeros((R_pad, n_pairs, 2), np.int32)
    pval = np.zeros((R_pad, n_pairs), bool)
    prev_hm = None
    for ri, r in enumerate(rises_pixel):
        # the pair table depends on rise only through hmax; consecutive
        # rises in a group almost always share it — copy the row instead
        # of recomputing (the host producer thread is the grid search's
        # bottleneck; see _copy_block)
        hm = geom.hsym_max_pairs(float(r))
        if hm == prev_hm:
            pidx[ri] = pidx[ri - 1]
            pval[ri] = pval[ri - 1]
            continue
        prev_hm = hm
        t = _pair_table(float(twist), float(r), csym, geom.l3)[:n_pairs]
        if len(t):
            k1 = (t[:, 0] + hmax_p) * csym + t[:, 1]
            k2 = (t[:, 2] + hmax_p) * csym + t[:, 3]
            assert k1.min() >= 0 and k1.max() < n_ops, "op table too small"
            assert k2.min() >= 0 and k2.max() < n_ops, "op table too small"
            pidx[ri, : len(t), 0] = k1
            pidx[ri, : len(t), 1] = k2
            pval[ri, : len(t)] = True
    for ri in range(R, R_pad):
        pidx[ri] = pidx[R - 1]
        pval[ri] = pval[R - 1]
    return rises_pad, m, ch_u, cc_u, pidx, pval, rank


_COPY_BLOCK_CACHE: collections.OrderedDict = collections.OrderedDict()


def _copy_block(geom, rises_key, n_copies, C_u, R_pad, copy_cache):
    """Rise-only half of the group tables, cached on the rise tuple.

    Copy selection is twist-INdependent (select_copies), so every
    twist-group over the same rises — all of them, on a Cartesian
    (twist, rise) grid — shares one (m, rank, ch_u, cc_u, rises_pad)
    block. Without this cache the per-(copy, rise) Python loop below ran
    once per GROUP and dominated the grid search's host producer thread
    (~110 us/candidate — the device starved on it; see PROFILE.md).
    Returned arrays are read-only and must not be mutated."""
    key = (geom, rises_key, n_copies, C_u, R_pad)
    hit = _COPY_BLOCK_CACHE.get(key)
    if hit is not None:
        _COPY_BLOCK_CACHE.move_to_end(key)  # LRU refresh
        return hit
    R = len(rises_key)
    sels = []
    for r in rises_key:
        if r not in copy_cache:
            copy_cache[r] = select_copies(geom, r, n_copies)
        sels.append(copy_cache[r])
    # canonical union copy table, ordered by (|h|, h, c)
    union = set()
    for ch, cc, cv in sels:
        union.update(zip(ch[cv].tolist(), cc[cv].tolist()))
    keys = sorted(union, key=lambda x: (abs(x[0]), x[0], x[1]))
    assert len(keys) <= C_u, (len(keys), C_u)
    col = {k: i for i, k in enumerate(keys)}
    ch_u = np.zeros(C_u, np.int32)
    cc_u = np.zeros(C_u, np.int32)
    for (h, c), i in col.items():
        ch_u[i], cc_u[i] = h, c
    m = np.zeros((R_pad, C_u), np.float32)
    rank = np.full((R_pad, C_u), -1, np.int32)
    for ri, (ch, cc, cv) in enumerate(sels):
        for pos, (h, c) in enumerate(zip(ch[cv].tolist(), cc[cv].tolist())):
            m[ri, col[(h, c)]] += 1.0  # Halton repeats -> multiplicity
            rank[ri, col[(h, c)]] = pos  # overwritten -> LAST position
    for ri in range(R, R_pad):
        m[ri] = m[R - 1]
        rank[ri] = rank[R - 1]
    rises_pad = np.concatenate(
        [np.asarray(rises_key, np.float32),
         np.full(R_pad - R, rises_key[-1], np.float32)]
    )
    out = (rises_pad, m, ch_u, cc_u, rank)
    for a in out:
        a.flags.writeable = False
    while len(_COPY_BLOCK_CACHE) >= 256:
        # LRU eviction: a full clear() mid-search would drop the hot
        # rise-tuple and reintroduce the host-producer bottleneck
        _COPY_BLOCK_CACHE.popitem(last=False)
    _COPY_BLOCK_CACHE[key] = out
    return out


@functools.lru_cache(maxsize=16)
def _vgsolve_cached(
    geom, cfg: SolveConfig, n_ops_u: int, group_chunk: int, devices=None,
    fused_ntn: bool = True, use_pallas: bool = False,
):
    """Compiled twist-grouped scorer, shared across reconstruct_grid
    calls (same caching rationale as _vsolve_cached). Runs a sequential
    lax.map over chunks of `group_chunk` twist-groups with each group's
    shared operators built once and its candidates vmapped inside
    (projector_grouped.py) — the loop-interchange VMEM-residency story
    of the chunked path, but with R-candidate-wide GEMMs.

    devices (tuple, len > 1): shard the GROUPS axis over a 1D mesh with
    jax.shard_map, each device running the chunked schedule on its local
    group shard (mirrors _vsolve_cached's multi-device form)."""
    from .solver import _solve_group_impl

    def one_group(region, dyv, tw, rises, m, ch, cc, pidx, pval, rank):
        return _solve_group_impl(
            geom, cfg, region, tw, rises, m, ch, cc, pidx, pval, rank,
            n_ops_u=n_ops_u, dy_pixel=dyv, fused_ntn=fused_ntn,
            use_pallas=use_pallas,
        )

    vgroups = jax.vmap(one_group, in_axes=(None, None) + (0,) * 8)

    def run(region, dyv, tws, rises, m, ch, cc, pidx, pval, rank):
        G = tws.shape[0]
        g = min(group_chunk, G)
        outer = G // g
        assert outer * g == G, (G, g)
        cargs = tuple(
            a.reshape((outer, g) + a.shape[1:])
            for a in (tws, rises, m, ch, cc, pidx, pval, rank)
        )
        scores = jax.lax.map(lambda ca: vgroups(region, dyv, *ca), cargs)
        return scores.reshape((G,) + scores.shape[2:])  # (G, R_pad)

    if devices is not None and len(devices) > 1:
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.asarray(devices), ("groups",))
        sharded = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(P(), P()) + (P("groups"),) * 8,
            out_specs=P("groups"),
            # no collectives inside (scores concatenate along the
            # sharded axis); skip pcast plumbing through the scan carries
            check_vma=False,
        )
        return jax.jit(sharded)

    return jax.jit(run)


@functools.lru_cache(maxsize=16)
def _vsolve_cached(geom, cfg: SolveConfig, inner_chunk: int = 0, devices=None):
    """Compiled vmapped scorer, shared ACROSS reconstruct_grid calls.

    The image region and the tilt/psi/dy pose are traced arguments
    (broadcast with in_axes=None) instead of closure constants, so one
    trace+compile serves every grid invocation with the same static
    (geom, cfg, batch_size). Rebuilding the closure per call put ~2 s of
    host retracing inside every invocation's timed dispatch loop
    (docs/PROFILE.md) — the web app / CLI re-search the same geometry
    repeatedly and hit this cache instead.

    inner_chunk > 0 interchanges the loops: a sequential lax.map over
    chunks of `inner_chunk` candidates, with the CG/FISTA iteration scan
    INSIDE each chunk. A fully vmapped batch makes candidates the inner
    axis of every scan step, so the per-candidate operator tensors
    (Wsum ~5.7 MB + dense symmetry matrices ~6 MB in bf16) re-stream
    from HBM on every one of the ~29 matvecs — ~350 GB per 1024-batch,
    saturating the HBM roofline. With the interchange each chunk's
    operators are built once and live in VMEM across all its iterations.

    devices (tuple, len > 1) combines both: the chunked schedule runs
    per device under jax.shard_map over a 1D "candidates" mesh, so a
    multi-chip grid keeps the VMEM-resident interchange instead of
    falling back to the HBM-bound vmapped form (a plain lax.map cannot
    scan a sharded axis — shard_map makes the scan device-local). Each
    device's shard must divide by inner_chunk; reconstruct_grid sizes
    batches to n_dev * inner_chunk multiples.
    """

    def one(region, tiltv, psiv, dyv, tw, ri, a, b, c, d, e, oh, ov, pi):
        out = _solve_candidate_impl(
            geom,
            cfg,
            region,
            tw,
            ri,
            a,
            b,
            c,
            d,
            e,
            tiltv,
            psiv,
            dyv,
            pair_ops=(oh, ov, pi) if cfg.separable else None,
        )
        return out["score"]

    vone = jax.vmap(one, in_axes=(None,) * 4 + (0,) * 10)
    if inner_chunk <= 0:
        return jax.jit(vone)

    def chunked(region, tiltv, psiv, dyv, *args):
        n = args[0].shape[0]
        g = min(inner_chunk, n)
        outer = n // g
        assert outer * g == n, (
            f"batch {n} not divisible by inner_chunk {g}"
        )
        cargs = tuple(a.reshape((outer, g) + a.shape[1:]) for a in args)
        scores = jax.lax.map(
            lambda ca: vone(region, tiltv, psiv, dyv, *ca), cargs
        )
        return scores.reshape(n)

    if devices is not None and len(devices) > 1:
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.asarray(devices), ("candidates",))
        # each device runs the chunked schedule on its LOCAL candidate
        # shard; region/pose broadcast replicated. No collectives are
        # needed — scores concatenate along the sharded axis.
        sharded = jax.shard_map(
            chunked,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()) + (P("candidates"),) * 10,
            out_specs=P("candidates"),
            # no collectives inside; the varying-axes checker would
            # otherwise demand pcast plumbing through every scan carry
            check_vma=False,
        )
        return jax.jit(sharded)

    return jax.jit(chunked)


def _percand_scoring(
    geom, cfg, scores, twists, rise_pixels, n_copies, n_pairs, n_ops,
    pose_args, copy_cache, batch_size, put, vsolve,
    incremental_mode, progress_callback, should_abort, cost_analysis,
):
    """Per-candidate batch dispatch (the pre-grouping scoring loop).

    Fills `scores` in place; returns (aborted, cost_stats). Tables are
    built on a single-worker PRODUCER THREAD (all batch futures queued
    up front, executed serially, so the producer runs ahead of the
    dispatch loop as far as it can): building them on the main thread
    between dispatches blocks the thread the axon tunnel needs for
    pumping async transfers (measured: a 30% throughput loss when
    interleaved inline). numpy releases the GIL in its C kernels, so
    the worker overlaps both dispatch and device compute. On abort,
    queued futures are cancelled (see executor.shutdown below).
    """
    from concurrent.futures import ThreadPoolExecutor

    n_cand = len(twists)
    slices = []
    for start in range(0, n_cand, batch_size):
        end = min(start + batch_size, n_cand)
        slices.append(slice(start, end))

    executor = ThreadPoolExecutor(max_workers=1)
    cost_stats = None
    aborted = False
    try:
        futures = [
            executor.submit(
                _candidate_tables, geom, twists[sl], rise_pixels[sl],
                n_copies, n_pairs, n_ops, copy_cache,
            )
            for sl in slices
        ]
        # incremental mode (progress_callback / should_abort, used by the
        # web app): block per batch so completed scores stream out and an
        # abort between batches keeps them. Otherwise keep dispatch ASYNC:
        # enqueue all batches, then block.
        incremental = incremental_mode
        pending = []
        done = 0
        for sl, fut in zip(slices, futures):
            if should_abort is not None and should_abort():
                aborted = True
                break
            b_ch, b_cc, b_cv, b_phc, b_pv, b_oh, b_ov, b_pi = fut.result()
            pad = batch_size - (sl.stop - sl.start)

            def pad_to(x):
                if pad:
                    x = np.concatenate(
                        [x, np.repeat(x[-1:], pad, axis=0)], axis=0
                    )
                return put(x)

            batch_args = (
                pad_to(twists[sl]),
                pad_to(rise_pixels[sl]),
                pad_to(b_ch),
                pad_to(b_cc),
                pad_to(b_cv),
                pad_to(b_phc),
                pad_to(b_pv),
                pad_to(b_oh),
                pad_to(b_ov),
                pad_to(b_pi),
            )
            if cost_analysis and cost_stats is None:
                try:
                    # count on the UNchunked variant: XLA's static cost
                    # analysis counts a lax.map body once, not x trips
                    ca = (
                        # same 4-arg call shape as the main path so the
                        # lru_cache entry is SHARED when inner_chunk == 0
                        # (3-arg vs 4-arg would key — and compile — twice)
                        _vsolve_cached(geom, cfg, 0, None)
                        .lower(*pose_args, *batch_args)
                        .compile()
                        .cost_analysis()
                    )
                    if isinstance(ca, (list, tuple)):
                        ca = ca[0]
                    cost_stats = dict(
                        flops=float(ca.get("flops", 0.0)),
                        bytes_accessed=float(ca.get("bytes accessed", 0.0)),
                        batch_size=batch_size,
                    )
                except Exception:  # cost analysis is best-effort
                    cost_stats = None
            s = vsolve(*pose_args, *batch_args)
            if incremental:
                scores[sl] = np.asarray(s)[: sl.stop - sl.start]
                done = sl.stop
                if progress_callback is not None:
                    progress_callback(done, n_cand, scores)
            else:
                pending.append((sl, sl.stop - sl.start, s))
        for sl, n_valid, s in pending:
            scores[sl] = np.asarray(s)[:n_valid]
    finally:
        # cancel queued table builds (an abort would otherwise leave the
        # producer thread grinding through every remaining batch AND
        # mutating copy_cache concurrently with the refine/best-volume
        # table calls in reconstruct_grid); wait= joins the in-flight one
        executor.shutdown(wait=True, cancel_futures=True)
    return aborted, cost_stats, dict(
        path="percand", batch_size=int(batch_size),
    )


def _host_default_device():
    """Context manager routing JAX ops to the host CPU backend.

    Falls back to a no-op when no CPU backend exists (then the default
    device handles everything, as before)."""
    import contextlib

    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except Exception:
        return contextlib.nullcontext()
    return jax.default_device(cpu0)


def _group_operator_bytes(geom, n_copies: int, n_ops: int, cfg) -> int:
    """Estimated resident bytes of ONE group's shared operator tensors
    (projector_grouped.build_group_shared): A_top = [Wsum; Mxy] stacked
    plus the separate Wsum/Mxy copies it is concatenated from, in the
    compute dtype. n_copies is the per-candidate estimate — the group's
    canonical union C_u is a modest constant factor above it."""
    dt = 2 if str(cfg.compute_dtype) in ("bfloat16", "float16") else 4
    d2, d3 = geom.d2, geom.d3
    rows = n_copies * d2 + n_ops * d3 * d3
    # peak residency: the f32 build of Wsum/Mxy (4 bytes) stays live
    # until A_top is concatenated, alongside the cast copies and A_top
    # itself (2 * dt) — see projector_grouped.build_group_shared
    return rows * d3 * d3 * (4 + 2 * dt)


def _grouped_analytic_flops(geom, cfg, C_u: int, n_ops: int) -> float:
    """Per-candidate FLOPs of the grouped fused-NTN solve, counted
    analytically. XLA's static cost_analysis counts each lax.scan body
    ONCE, so it underestimates the iterative solve by roughly the
    iteration count (~28x at default budgets); this counts the dense
    GEMM work actually issued per candidate:

      per NTN matvec: two A_top GEMMs (4 * rows * d3^2 * l3), the Gz
      data-Gram apply (2 * C_u * d2 * l3^2), two Mz_ops z-contractions
      (4 * n_ops * d3^2 * l3^2);
      matvec count: power_iters + 1 (Rayleigh) + cg_iters + fista_iters;
      plus one P (rhs) and one P (prediction) data pass.

    Small-tensor glue (Cn Laplacian, vector ops) is omitted — the
    estimate is a few percent low, never high."""
    d2, d3, l3 = geom.d2, geom.d3, geom.l3
    rows = C_u * d2 + n_ops * d3 * d3
    per_matvec = (
        4.0 * rows * d3 * d3 * l3
        + 2.0 * C_u * d2 * l3 * l3
        + 4.0 * n_ops * d3 * d3 * l3 * l3
    )
    n_matvec = cfg.power_iters + 1 + cfg.cg_iters + cfg.fista_iters
    data_pass = 2.0 * C_u * d2 * d3 * d3 * l3
    return n_matvec * per_matvec + 2.0 * data_pass


def _group_budget_bytes() -> int:
    """Per-group operator budget (HELICON_GROUP_BUDGET_MB, default
    1536 MB): one group's operators must fit several times over in HBM
    (group_chunk live groups + build transients + the solve state)."""
    import os as _os

    return int(_os.environ.get("HELICON_GROUP_BUDGET_MB", "1536")) * 1024 * 1024


def _pallas_group_compat(cfg) -> bool:
    """Configurations the fused grouped Pallas solve implements exactly
    (solver._solve_group_pallas). Since round 5 that is the full
    grouped envelope — every score metric, l1/l2 regularization with
    the alpha-decay retry, thresh_fraction, the lreg seed, and fsc
    half-set splits (three kernel solves with j-dependent z-Grams, the
    default lsq+cosine config) — except ard (unweighted equation
    counting keeps it per-candidate)."""
    if not cfg.separable or cfg.model == "ard":
        return False
    if cfg.fsc_test != 0:
        return (
            cfg.model == "lsq"
            and cfg.score_metric == "cosine"
            and cfg.l1_reg == 0.0
            and cfg.l2_reg == 0.0
            and cfg.thresh_fraction < 0
        )
    return True


_pallas_fallback_logged: set = set()


def _log_pallas_fallback(reason: str) -> None:
    """VERDICT r4 #2: a config that falls off the fused Pallas kernel
    must never do so silently — log each distinct reason once per
    process (the grouped XLA path is correct, just slower)."""
    if reason in _pallas_fallback_logged:
        return
    _pallas_fallback_logged.add(reason)
    import logging as _logging

    # plain stdlib lookup: utils.logging.getLogger would RECONFIGURE
    # the handler set, which is the CLI's decision, not this module's
    _logging.getLogger("helicon").info(
        "denovo3d: grouped Pallas kernel not engaged (%s); "
        "scoring on the XLA grouped path", reason,
    )


def _pallas_auto_regime(cfg) -> bool:
    """Is this config in the fused grouped Pallas kernel's MEASURED-win
    regime (docs/PROFILE.md round-4 study)? auto mode engages the
    kernel only here: bf16 compute at production-scale iteration
    budgets. The accuracy mode (float32, cg=400/fista=2000, matmul
    precision "highest") must stay on the XLA path — its huge in-kernel
    fori_loops fail the Mosaic compile helper, and its
    1e-5-vs-CPU-oracle contract depends on XLA's "highest" matmul
    precision, which the kernel does not consume. Forced mode
    (HELICON_PALLAS_GROUPED=1) bypasses this check."""
    return (
        jnp.dtype(cfg.compute_dtype) == jnp.bfloat16
        and cfg.cg_iters + cfg.fista_iters + cfg.power_iters <= 128
    )


def _grouped_scoring(
    geom, cfg, scores, twists, rise_pixels, n_copies, n_pairs, n_ops,
    pose_args, copy_cache, batch_size,
    progress_callback, should_abort, cost_analysis, devices=None,
    densify_padding: bool = False,
):
    """Twist-grouped scoring dispatch (see projector_grouped.py).

    Partitions candidates into same-twist groups, builds per-group
    canonical copy/pair tables on a producer thread, and dispatches
    jitted group-batches (lax.map over chunks of `group_chunk` groups,
    R-candidate vmap inside each group). Fills `scores` in place via
    index scatter; returns (aborted, cost_stats).
    """
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    region, _tilt, _psi, dyv = pose_args
    n_cand = len(twists)
    incremental = progress_callback is not None or should_abort is not None

    uniq = np.unique(twists)
    raw_groups = [(float(t), np.where(twists == t)[0]) for t in uniq]
    # one static R serves every sub-group: groups larger than R_pad are
    # split, smaller ones padded (repeating their last candidate). The
    # cap keeps a lone oversized group from inflating the padding of
    # every other group; full Cartesian grids (all groups equal) fit
    # exactly. batch_size also caps it: an explicit small batch_size is
    # the caller's dispatch/abort granularity (run_grid_incremental), and
    # one call dispatches at least R_pad candidates. HELICON_GRID_GROUP_R
    # overrides.
    max_size = max(len(g) for _, g in raw_groups)

    # static canonical table width: copy-set union over ALL distinct
    # rises (selection is twist-independent -> cache per rise). A global
    # union (vs per-group max) keeps C_u — and hence the compiled shape —
    # identical across calls that share a rise set, e.g. a warmup slice
    # and the full grid.
    u_all = set()
    for r in np.unique(rise_pixels):
        r = float(r)
        if r not in copy_cache:
            copy_cache[r] = select_copies(geom, r, n_copies)
        ch, cc, cv = copy_cache[r]
        u_all.update(zip(ch[cv].tolist(), cc[cv].tolist()))
    C_u = len(u_all)

    # HELICON_PALLAS_GROUPED: 1 = force the fused grouped Pallas solve
    # (if the config is compatible and a tile-aligned R fits VMEM),
    # 0 = never, auto (default) = on-TPU whenever it fits. Measured
    # policy (docs/PROFILE.md round-4 study, 2026-08-20, v5e): toy
    # 13.0k vs 7.45k cand/s (1.75x, max|dscore| 3.6e-4 bf16); large
    # geometry fails the VMEM fit and stays on the XLA grouped path.
    dev0 = devices[0] if devices else jax.devices()[0]
    pallas_mode = _os.environ.get("HELICON_PALLAS_GROUPED", "auto")
    use_pallas = False
    R_pallas = 0
    if pallas_mode != "0" and _pallas_group_compat(cfg):
        from .pallas_solver import fits_vmem_grouped

        # the kernel's whole-group state lives in VMEM, so R is bounded
        # by the fit check; its wide layout slices R-row slabs on the
        # sublane axis, so R must be a multiple of 8 — batch_size is
        # floored to a multiple of 8 here (it is only rounded to the
        # device count upstream), and a batch_size < 8 disables the
        # kernel rather than dispatch more candidates than the caller's
        # abort granularity allows
        r_try = min(64, -(-max_size // 8) * 8, (batch_size // 8) * 8)
        while r_try >= 8 and not fits_vmem_grouped(
            C_u, geom.d2, geom.d3 * geom.d3, int(n_ops), geom.l3,
            r_try, cfg.compute_dtype,
        ):
            r_try -= 8
        if r_try >= 8:
            R_pallas = r_try
            use_pallas = (
                pallas_mode == "1"
                or (dev0.platform == "tpu" and _pallas_auto_regime(cfg))
            )
            if not use_pallas and dev0.platform == "tpu":
                _log_pallas_fallback(
                    "accuracy-mode config: float32 compute or iteration "
                    "budget > 128 stays on XLA by measured policy "
                    "(docs/PROFILE.md)"
                )
        elif dev0.platform == "tpu" or pallas_mode == "1":
            _log_pallas_fallback(
                f"group operators exceed the kernel's VMEM budget at "
                f"this geometry (C_u={C_u}, d3={geom.d3}, l3={geom.l3}, "
                f"n_ops={int(n_ops)})"
            )

    r_env = _os.environ.get("HELICON_GRID_GROUP_R", "")
    if r_env:
        R_pad = max(1, int(r_env))
        use_pallas = use_pallas and R_pad % 8 == 0 and R_pad <= R_pallas
    elif use_pallas:
        R_pad = R_pallas
    else:
        # geometry-aware cap: the group GEMMs' output axis is N = R * l3,
        # so small-l3 (toy) geometries want a larger R than tall ones.
        # Target N ~ 1024 lanes, capped at 64 (R = 64 measured slower
        # than 32 at d3 = 64/l3 = 18: bigger live solve state, no added
        # lane occupancy), then split max_size EVENLY so a 32-rise row
        # is not carved into 28 + a padded 4
        cap = max(16, min(64, 1024 // max(1, geom.l3)))
        cap = min(cap, max_size, batch_size)
        R_pad = -(-max_size // -(-max_size // max(1, cap)))
    groups = []  # (twist, candidate indices, extra rises) per sub-group
    for t, g in raw_groups:
        for s in range(0, len(g), R_pad):
            groups.append((t, g[s : s + R_pad], None))

    # ---- padding densification (VERDICT r4 #3) ----------------------
    # A group smaller than R_pad would pad by repeating its last
    # candidate — computed and thrown away. densify_padding=True fills
    # those slots with REAL rises instead (iterative midpoints of the
    # group's largest rise gaps: same geometry envelope, so bucketing /
    # compiled shapes are untouched), and their scores come back in
    # GridResult.extras — a finer rise grid at zero extra device work.
    # Padded slots within a twist whose rises are all identical keep
    # the repeat padding (no gap to subdivide).
    n_extras = 0
    if densify_padding:
        dens = []
        for t, g, _ in groups:
            k = R_pad - len(g)
            ext = None
            if k > 0:
                uniq = np.unique(rise_pixels[g].astype(np.float64))
                if len(uniq) >= 2:
                    vals = list(uniq)
                    new = []
                    for _i in range(k):
                        gaps = np.diff(vals)
                        j = int(np.argmax(gaps))
                        mid = 0.5 * (vals[j] + vals[j + 1])
                        new.append(mid)
                        vals.insert(j + 1, mid)
                    ext = np.asarray(new, np.float32)
                    n_extras += len(new)
            dens.append((t, g, ext))
        if n_extras:
            groups = dens
            # the extras' copy selections may widen the canonical union
            u_ext = set(u_all)
            for _t, _g, ext in groups:
                if ext is None:
                    continue
                for r in ext:
                    r = float(r)
                    if r not in copy_cache:
                        copy_cache[r] = select_copies(geom, r, n_copies)
                    ch, cc, cv = copy_cache[r]
                    u_ext.update(zip(ch[cv].tolist(), cc[cv].tolist()))
            if len(u_ext) != C_u:
                if use_pallas:
                    from .pallas_solver import fits_vmem_grouped

                    if not fits_vmem_grouped(
                        len(u_ext), geom.d2, geom.d3 * geom.d3,
                        int(n_ops), geom.l3, R_pad, cfg.compute_dtype,
                    ):
                        # widened table breaks the kernel fit: keep the
                        # kernel, drop densification
                        groups = [(t, g, None) for t, g, _ in groups]
                        n_extras = 0
                if n_extras:
                    C_u = len(u_ext)
    group_idx = [g for _, g, _ in groups]

    chunk_env = _os.environ.get("HELICON_GRID_GROUP_CHUNK", "")
    if chunk_env:
        group_chunk = max(1, int(chunk_env))
    else:
        # ~32 candidates of live operator state per chunk step — the
        # same VMEM-residency budget the per-candidate chunked schedule
        # settled on (chunk=8 at ~4x the per-candidate footprint); an
        # explicit smaller batch_size bounds the per-call candidate count
        group_chunk = max(1, min(32, batch_size) // max(1, R_pad))
        # memory cap: group_chunk groups' operators are live inside one
        # lax.map step (vmapped); bound them to ~2x the per-group budget
        # so production-scale geometries (d3 ~ 64: ~0.8 GB/group bf16)
        # run with chunk 1-2 instead of falling back or OOMing
        # C_u is the canonical union table width, the true Wsum row count
        per_group = _group_operator_bytes(geom, max(1, C_u), n_ops, cfg)
        mem_cap = max(1, int(2 * _group_budget_bytes() // max(1, per_group)))
        # chunk 2 beats 1 whenever memory allows: two groups in flight
        # pipeline one group's host/dispatch bubble behind the other's
        # compute (measured: toy 5225 -> 7413, large d3=64/R=32
        # 181.9 -> 197.9 cand/s; chunk 4 regresses both). Accelerators
        # only: CPU execution is synchronous (no dispatch bubble to
        # hide), so the floor would just widen the compiled body.
        if group_chunk == 1 and mem_cap >= 2 and dev0.platform != "cpu":
            group_chunk = 2
        group_chunk = min(group_chunk, mem_cap)
    n_dev = 1 if devices is None else len(devices)
    n_groups = len(groups)
    # never let the chunk (and hence the padded call) exceed the real
    # work: a small grid on a wide mesh would otherwise pad a handful
    # of groups to group_chunk * n_dev many
    group_chunk = min(group_chunk, max(1, -(-n_groups // n_dev)))
    # groups per jitted call: amortize dispatch to ~batch_size
    # candidates; every device's shard must divide by group_chunk
    unit = group_chunk * n_dev
    g_call = max(1, batch_size // max(1, R_pad * unit)) * unit
    g_call = min(g_call, -(-n_groups // unit) * unit)  # round-up clamp
    # NOTE: do NOT balance g_call against n_groups beyond this clamp —
    # the jitted scorer's shape is (g_call, ...), and a warmup slice
    # with fewer groups must produce the SAME g_call as the full grid
    # or the timed run recompiles (measured: a "balanced" tail saved
    # ~2 % of device work but put a ~1.9 s compile inside every first
    # full-grid call; the tail padding is the cheaper evil)

    fused = _use_fused_ntn()
    extra_rows: list = []
    effective = dict(
        path="grouped", R_pad=int(R_pad), group_chunk=int(group_chunk),
        g_call=int(g_call), n_groups=int(n_groups), C_u=int(C_u),
        n_devices=int(n_dev), fused_ntn=bool(fused),
        use_pallas=bool(use_pallas),
        pad_fraction=round(1.0 - n_cand / (len(groups) * R_pad), 4),
        densified=int(n_extras),
    )
    run = _vgsolve_cached(
        geom, cfg, int(n_ops), group_chunk,
        tuple(devices) if n_dev > 1 else None,
        fused_ntn=fused, use_pallas=use_pallas,
    )
    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(devices), ("groups",))
        putg = lambda x: jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P("groups"))
        )
    else:
        putg = jnp.asarray

    call_slices = [
        slice(s, min(s + g_call, n_groups))
        for s in range(0, n_groups, g_call)
    ]

    def _build_call(sl):
        gs = groups[sl]
        pad = g_call - len(gs)
        rows = [
            _group_tables(
                geom, t,
                rise_pixels[g] if ext is None
                else np.concatenate([rise_pixels[g], ext]),
                n_copies, n_pairs, n_ops, C_u, R_pad, copy_cache,
            )
            for t, g, ext in gs
        ]
        if pad:
            rows.extend([rows[-1]] * pad)
        tws = np.asarray(
            [t for t, _, _ in gs] + [gs[-1][0]] * pad, np.float32
        )
        stack = [np.stack([r[k] for r in rows]) for k in range(7)]
        # device_put HERE, on the producer thread: the host->device
        # transfer of call N+1's tables then overlaps call N's device
        # compute. Issuing it on the consumer loop serialized a
        # per-call transfer+dispatch stall behind every executable run
        # (~38 % of wall on the tunneled chip: pure-exec 4.8k cand/s
        # vs 3.5k end to end before this move).
        return tuple(putg(a) for a in ((tws,) + tuple(stack)))

    executor = ThreadPoolExecutor(max_workers=1)
    cost_stats = None
    aborted = False
    try:
        region_dev = jnp.asarray(region)
        dyv_dev = jnp.float32(dyv)
        # bounded prefetch: _build_call device_puts its tables, so an
        # unbounded submit-all would make EVERY call's tables
        # HBM-resident at once on a large grid. A window of 3 keeps
        # transfer/compute overlap with ~constant table residency.
        from collections import deque as _deque

        slices_iter = iter(call_slices)
        fut_q: _deque = _deque()

        def _refill():
            while len(fut_q) < 3:
                sl_n = next(slices_iter, None)
                if sl_n is None:
                    return
                fut_q.append((sl_n, executor.submit(_build_call, sl_n)))

        _refill()
        pending = []
        done = 0
        while fut_q:
            sl, fut = fut_q.popleft()
            if should_abort is not None and should_abort():
                aborted = True
                break
            args = (region_dev, dyv_dev) + fut.result()
            _refill()
            if cost_analysis and cost_stats is None:
                try:
                    # one-group variant: lax.map body counted once ->
                    # flops for R_pad candidates (incl. padding, so the
                    # per-candidate figure is conservative)
                    one = tuple(
                        a if i < 2 else a[:1] for i, a in enumerate(args)
                    )
                    ca = (
                        # 5-arg call shape: shares the lru entry with the
                        # main scorer when group_chunk == 1, single device
                        _vgsolve_cached(geom, cfg, int(n_ops), 1, None,
                                        fused_ntn=_use_fused_ntn(),
                                        use_pallas=use_pallas)
                        .lower(*one)
                        .compile()
                        .cost_analysis()
                    )
                    if isinstance(ca, (list, tuple)):
                        ca = ca[0]
                    cost_stats = dict(
                        flops=float(ca.get("flops", 0.0)),
                        bytes_accessed=float(ca.get("bytes accessed", 0.0)),
                        batch_size=R_pad,
                        analytic_flops_per_candidate=_grouped_analytic_flops(
                            geom, cfg, int(C_u), int(n_ops)
                        ),
                    )
                except Exception:  # cost analysis is best-effort
                    cost_stats = None
            s = run(*args)
            if incremental:
                s_np = np.asarray(s)
                for i, (t, g, ext) in enumerate(groups[sl]):
                    scores[g] = s_np[i, : len(g)]
                    done += len(g)
                    if ext is not None:
                        for j, r in enumerate(ext):
                            extra_rows.append(
                                (t, float(r), float(s_np[i, len(g) + j]))
                            )
                if progress_callback is not None:
                    progress_callback(done, n_cand, scores)
            else:
                pending.append((sl, s))
        for sl, s in pending:
            s_np = np.asarray(s)
            for i, (t, g, ext) in enumerate(groups[sl]):
                scores[g] = s_np[i, : len(g)]
                if ext is not None:
                    for j, r in enumerate(ext):
                        extra_rows.append(
                            (t, float(r), float(s_np[i, len(g) + j]))
                        )
    finally:
        executor.shutdown(wait=True, cancel_futures=True)
    if extra_rows:
        effective["extras"] = dict(
            twists=np.asarray([e[0] for e in extra_rows], np.float32),
            rise_pixels=np.asarray([e[1] for e in extra_rows], np.float32),
            scores=np.asarray([e[2] for e in extra_rows], np.float32),
        )
    return aborted, cost_stats, effective


def reconstruct_grid(
    image,
    apix: float,
    twists,
    rises,
    csym: int = 1,
    tilt: float = 0.0,
    psi: float = 0.0,
    dy: float = 0.0,
    low_pass: float = -1,
    transpose: int = 0,
    horizontalize: int = 0,
    denoise: str = "",
    target_apix2d: float = -1,
    target_apix3d: float = -1,
    tube_diameter: float = -1,
    tube_diameter_inner: float = 0.0,
    tube_length: float = -1,
    reconstruct_length_rise: float = 3.0,
    thresh_fraction: float = -1,
    positive_constraint: int = -1,
    sym_oversample: int = -1,
    interpolation: str = "nn",
    algorithm: dict | None = None,
    score_metric: str = "cosine",
    fsc_test: int = 0,
    refine_tilt_psi_dy_range: dict | None = None,
    refine_top_k: int = 1,
    refine_mode: str = "topk",
    cg_iters: int = 120,
    fista_iters: int = 60,
    power_iters: int = 8,
    compute_dtype: str = "auto",
    batch_size: int | None = None,
    devices=None,
    return_best_volume: bool = True,
    progress_callback=None,
    should_abort=None,
    cost_analysis: bool = False,
    rise_bucket_ratio: float = 1.6,
    geometry_rise_range: tuple | None = None,
    densify_padding: bool = False,
) -> GridResult:
    """Score every (twist, rise) candidate for one class-average image.

    The flagship TPU workload: one jit compilation, vmapped over
    candidates, sharded over `devices` (default: all local devices).
    compute_dtype defaults to "auto": bfloat16 on accelerator backends
    for the vmapped scoring pass — validated to preserve the candidate
    ranking (identical top-10, Spearman > 0.9999 vs float32; max score
    delta ~3e-4) while running ~6% faster on TPU — and float32 on CPU
    backends (bf16 buys nothing there and some XLA:CPU builds lack
    bf16 dot thunks). The final best-volume re-solve always runs in
    float32.

    refine_tilt_psi_dy_range (reference pipeline.py:357-368: dict with
    tilt/psi/dy bounds) enables Gauss-Newton pose refinement.
    refine_mode selects the semantics:
      "topk" (default): the vmapped grid scores all candidates at the
        fixed pose, then the refine_top_k best are GN-refined (autodiff
        Jacobians) and re-scored at their refined pose — the grid
        locates the basin, GN polishes it.
      "all": reference parity (solver_linear_regression.py:550-841
        refines inside EVERY task) — every candidate is GN-refined
        inside the scored grid (vmapped batches) and ranked by its
        refined score. ~max_iter x the cost of "topk".
    docs/PARITY.md records a ranking study comparing the two modes.

    densify_padding=True (VERDICT r4 #3) turns the grouped scorer's
    repeat-padding slots (a twist group's candidate count rounded up to
    the kernel's R_pad) into REAL interpolated rises; their scores come
    back in GridResult.extras (twists/rises/scores arrays) — a finer
    rise grid at zero extra device work. The requested candidates'
    scores and winner selection are unchanged.
    """
    algorithm = algorithm or dict(model="lsq")
    twists = np.asarray(twists, np.float32)
    rises = np.asarray(rises, np.float32)
    assert twists.shape == rises.shape and twists.ndim == 1
    n_cand = len(twists)
    if n_cand == 0:
        from ..utils.exceptions import HeliconError

        raise HeliconError(
            "no (twist, rise) candidates to score — check the grid "
            "ranges/filters (build_candidate_grid drops |twist| < 0.01, "
            "|rise| < 0.01 and rise >= tube_length/2)"
        )

    # Wide rise ranges: one static geometry sized from max(rises) lets
    # large-rise candidates out-score small-rise ones (longer volume =
    # more unknowns; measured Spearman ~0.06 vs per-candidate lengths on
    # a 4-48 A search). Bucket the candidates so each bucket's rises stay
    # within rise_bucket_ratio, derive geometry per bucket (recursing into
    # this function), and merge — the reference's per-candidate
    # reconstruct_length_rise * rise, quantized to a handful of compiles.
    if geometry_rise_range is None and rise_bucket_ratio > 1 and float(
        np.max(rises)
    ) > rise_bucket_ratio * max(float(np.min(rises)), 1e-6):
        # explicit forwarding dict: every reconstruct_grid parameter
        # except the ones the bucket driver owns (image/apix/candidates,
        # progress/abort plumbing, return_best_volume, the ratio itself)
        fwd = dict(
            csym=csym, tilt=tilt, psi=psi, dy=dy, low_pass=low_pass,
            transpose=transpose, horizontalize=horizontalize,
            denoise=denoise, target_apix2d=target_apix2d,
            target_apix3d=target_apix3d, tube_diameter=tube_diameter,
            tube_diameter_inner=tube_diameter_inner,
            tube_length=tube_length,
            reconstruct_length_rise=reconstruct_length_rise,
            thresh_fraction=thresh_fraction,
            positive_constraint=positive_constraint,
            sym_oversample=sym_oversample, interpolation=interpolation,
            algorithm=algorithm, score_metric=score_metric,
            fsc_test=fsc_test,
            refine_tilt_psi_dy_range=refine_tilt_psi_dy_range,
            refine_top_k=refine_top_k, refine_mode=refine_mode,
            cg_iters=cg_iters,
            fista_iters=fista_iters, power_iters=power_iters,
            compute_dtype=compute_dtype, batch_size=batch_size,
            devices=devices, cost_analysis=cost_analysis,
            densify_padding=densify_padding,
        )
        return _reconstruct_grid_bucketed(
            image, apix, twists, rises, rise_bucket_ratio, fwd,
            return_best_volume, progress_callback, should_abort,
        )

    # Image prep is a chain of ~20 SMALL ops (filter, blur, cubic
    # resample) with host syncs between them; on the tunneled TPU each
    # sync is a full round trip and the chain cost ~0.4 s of an ~2.9 s
    # 10k-candidate search. Run it on the host CPU backend — the
    # scoring path (and its parity guarantees) is untouched.
    with _host_default_device():
        data = prepare_data(
            image, apix, denoise, low_pass, transpose, horizontalize
        )
        ny0, nx0 = data.shape

        estimated_diameter = None
        if tube_diameter < 0:
            from ..core.analysis import estimate_helix_rotation_center_diameter

            _, _, estimated_diameter = estimate_helix_rotation_center_diameter(
                data
            )

    # geometry_rise_range: derive the reconstruction geometry from an
    # EXPLICIT rise range instead of this call's candidates — the
    # multi-host path shards one geometry-consistent candidate set
    # across processes, and every process must compile the IDENTICAL
    # geometry regardless of which slice of rises it drew
    # (parallel/multihost.py); also bypasses rise bucketing above
    # (the caller took responsibility for geometry consistency).
    if geometry_rise_range is not None:
        g_rise_lo = float(geometry_rise_range[0])
        g_rise_hi = float(geometry_rise_range[1])
    else:
        g_rise_lo = float(np.min(rises))
        g_rise_hi = float(np.max(rises))
    rise_ref = g_rise_hi
    g = derive_task_geometry(
        (ny0, nx0),
        apix,
        rise_ref,
        (g_rise_lo, g_rise_hi),
        (-abs(tilt), abs(tilt)),
        tube_length,
        tube_diameter,
        tube_diameter_inner,
        reconstruct_length_rise * rise_ref,
        target_apix2d,
        target_apix3d,
        estimated_diameter,
    )
    target_apix2d = g["target_apix2d"]
    with _host_default_device():
        data = np.asarray(down_scale(data, target_apix2d, apix))
    ny, nx = data.shape
    pg = _pixel_geometry(g, (ny, nx), rise_ref)
    target_apix3d = pg["target_apix3d"]

    geom = ReconstructionGeometry(
        d2=pg["d2"],
        l2=pg["l2"],
        d3=pg["d3"],
        l3=pg["l3"],
        rmin=pg["d3_inner"] / 2,
        rmax=pg["d3"] // 2 - 1,
        scale2d_to_3d=target_apix2d / target_apix3d,
        csym=int(csym),
    )

    if sym_oversample <= 0:
        sym_oversample = auto_sym_oversample(pg["l3"], pg["d3"], pg["d3_inner"])

    rise_pixels = rises / target_apix3d
    n_copies, n_pairs = estimate_copy_pair_counts(
        geom, float(np.min(rise_pixels)), sym_oversample,
        rise_pixel_max=float(np.max(rise_pixels)),
    )
    n_ops = estimate_n_pair_ops(geom, float(np.min(rise_pixels)))
    # (both scoring paths build their tables on a single-worker producer
    # thread — see _percand_scoring's docstring for the rationale)

    region = data[
        ny // 2 - geom.d2 // 2 : ny // 2 + geom.d2 // 2,
        nx // 2 - geom.l2 // 2 : nx // 2 + geom.l2 // 2,
    ]

    model = algorithm.get("model", "lsq")
    # per-ROW coefficients (n_rows=1): the jitted solve multiplies by
    # each candidate's own valid-copy row count (SolveConfig.reg_per_row)
    # instead of the padded worst-case n_copies, matching lsq_reconstruct
    l1, l2r = regularization_from_algorithm(algorithm, 1)
    devices = devices if devices is not None else jax.devices()
    if compute_dtype in ("auto", ""):
        # bfloat16 is a TPU win (MXU-native, ranking-validated); on CPU
        # backends it is never faster and some XLA:CPU builds lack
        # bf16 dot thunks for the grouped shapes — resolve per backend.
        compute_dtype = (
            "bfloat16" if devices[0].platform != "cpu" else "float32"
        )
    cfg = SolveConfig(
        interpolation=interpolation,
        model=model,
        cg_iters=cg_iters,
        fista_iters=fista_iters,
        power_iters=power_iters,
        fsc_test=int(fsc_test),
        score_metric=score_metric,
        thresh_fraction=float(thresh_fraction),
        positive_constraint=int(positive_constraint),
        l1_reg=float(l1),
        l2_reg=float(l2r),
        reg_per_row=model in ("lasso", "elasticnet"),
        separable=(tilt == 0.0 and psi == 0.0),
        compute_dtype=compute_dtype,
        ard_prior=float(algorithm.get("alpha", 1e-6)),
    )

    n_dev = len(devices)
    if batch_size is None:
        # Large batches amortize dispatch overhead (measured: ~12x
        # throughput going 128 -> 1024 per chip with the matmul
        # operators + async dispatch). The HBM ceiling is the larger of
        # the per-candidate Wsum tensor (~5x C*d2*d3^2 bytes live in
        # bf16 incl. XLA copies) and the dense symmetry matrices
        # (n_ops x d3^2 x d3^2 — dominant for d3 >~ 40); autosize
        # against ~9 GB/chip and clamp to [8, 1024] per chip.
        d3sq = geom.d3 * geom.d3
        per_cand = 5.0 * n_copies * geom.d2 * d3sq + 3.0 * n_ops * d3sq * d3sq
        auto = int(9e9 / max(per_cand, 1.0))
        per_chip = max(8, min(1024, auto))
        batch_size = max(n_dev, min(n_cand, per_chip * n_dev))
    # round UP to a multiple of the device count (a user batch smaller
    # than n_dev would otherwise produce an unshardable batch of 1;
    # padding fills the remainder)
    batch_size = max(n_dev, ((batch_size + n_dev - 1) // n_dev) * n_dev)

    import os as _os

    # loop-interchange default: ON for accelerator backends (measured
    # 263.7 -> 585+ candidates/s on v5e, 2026-08-17 — each chunk's
    # operator tensors stay VMEM-resident across its CG/FISTA scan
    # instead of re-streaming from HBM every iteration), OFF on CPU
    # (a sequential lax.map only slows the reference oracle runs).
    # Chunk-size sweep after the gather-free build (2026-08-17): 8 wins
    # (1041 cand/s device-level vs 766 at 32; 8x~12MB of operators is
    # real VMEM residency, 32x streams).
    default_chunk = 8 if devices[0].platform != "cpu" else 0
    inner_chunk = int(
        _os.environ.get("HELICON_GRID_INNER", str(default_chunk))
    )
    # Twist-grouped scoring (projector_grouped.py): same-twist candidates
    # share the big Wsum/Mxy operator tensors and their GEMMs fuse across
    # the group's rise axis (N = R*l3 instead of l3). All score metrics
    # run grouped (the 2D metrics unweight rows and scatter by Halton
    # rank — see _candidate_score), and since round 5 so do fsc half-set
    # splits (pixel-id mask as a j-dependent z-Gram; unregularized
    # models). ard counts unweighted equations and regularized fsc
    # bypasses the grouped reg bookkeeping — those keep the
    # per-candidate path. HELICON_GRID_GROUPED: -1 auto (on when twists
    # repeat), 0 off, 1 force.
    grouped_env = int(_os.environ.get("HELICON_GRID_GROUPED", "-1"))
    use_grouped = (
        grouped_env != 0
        and cfg.separable
        and cfg.model != "ard"
        # grouped fsc (round 5): unregularized models only — the half
        # solves bypass the sqrt-multiplicity reg_scale bookkeeping
        and not (cfg.fsc_test != 0 and (cfg.l1_reg or cfg.l2_reg))
    )
    if not use_grouped and grouped_env != 0 and devices[0].platform == "tpu":
        # VERDICT r4 #2: never a silent fall-off from the fused kernel —
        # these configs take the per-candidate path (grouped AND Pallas
        # are both out of envelope for the same row-semantics reasons).
        # Reason order: ard first — an ard+fsc config is out because of
        # ard, not the fsc/regularization combination.
        why = (
            "model='ard' counts unweighted equations"
            if cfg.model == "ard"
            else "fsc_test with l1/l2 regularization"
            if cfg.fsc_test != 0 and (cfg.l1_reg or cfg.l2_reg)
            else "non-separable pose (tilt/psi != 0)"
        )
        _log_pallas_fallback(why + " — per-candidate XLA path")
    if use_grouped and grouped_env == -1:
        use_grouped = n_cand >= 2 * len(np.unique(twists))
        # n_cand > 1: the drivers' own internal single-candidate calls
        # (winner re-solve, cross-bucket re-score, topk refinement)
        # must not emit a user-facing diagnostic about "the grid"
        if not use_grouped and n_cand > 1 and devices[0].platform == "tpu":
            _log_pallas_fallback(
                "grid has < 2 candidates per twist: operator sharing "
                "buys nothing — per-candidate XLA path (set "
                "HELICON_GRID_GROUPED=1 to force grouping)"
            )
    # Operator-residency budget. The grouped path materializes, per live
    # group, A_top = [Wsum; Mxy] stacked (plus the unstacked Mxy/Wsum
    # copies) in the compute dtype; production-scale geometries (d3 ~ 64,
    # l3 >= 16) fit comfortably in HBM with a small group_chunk — the
    # per-group GEMMs are then genuinely MXU-shaped (M ~ 45k, K = d3^2,
    # N = R*l3), so LARGE geometry is exactly where grouping pays.
    # _grouped_scoring caps group_chunk against the same estimate; only
    # geometries whose SINGLE-group operators exceed the budget fall back.
    if use_grouped:
        per_group = _group_operator_bytes(geom, n_copies, n_ops, cfg)
        if per_group > _group_budget_bytes():
            use_grouped = False

    if inner_chunk > 0 and not use_grouped:
        # chunked mode needs every device's shard divisible by the
        # chunk: batch % (inner_chunk * n_dev) == 0. The grouped path
        # has its own R_pad/group-chunk scheduling and honors an
        # explicit batch_size as the caller's dispatch/abort
        # granularity, so it must NOT be inflated here.
        unit = inner_chunk * n_dev
        batch_size = max(unit, (batch_size // unit) * unit)

    vsolve = _vsolve_cached(
        geom, cfg, inner_chunk,
        tuple(devices) if (n_dev > 1 and inner_chunk > 0) else None,
    )
    pose_args = (
        jnp.asarray(region),
        jnp.float32(tilt),
        jnp.float32(psi),
        jnp.float32(dy / target_apix2d),
    )

    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(devices), ("candidates",))
        shard = NamedSharding(mesh, P("candidates"))
        put = lambda x: jax.device_put(x, shard)
    else:
        put = jnp.asarray

    # incremental mode marks unscored candidates with -inf so consumers
    # (the web app's ranked snapshots) can distinguish "not yet scored"
    # from a legitimate 0.0 score; a full run overwrites every entry
    incremental_mode = progress_callback is not None or should_abort is not None
    scores = np.full(
        n_cand, -np.inf if incremental_mode else 0.0, np.float32
    )
    copy_cache: dict = {}

    refine_all_mode = bool(refine_tilt_psi_dy_range) and refine_mode == "all"
    if refine_all_mode and not incremental_mode and not cost_analysis:
        # refine_mode="all" replaces EVERY candidate's score with its
        # refined-pose value and never consumes the fixed-pose ranking,
        # so the full fixed-pose scoring pass would be pure waste here.
        # It still runs in incremental mode (progress snapshots need a
        # coarse ranking to display) and under cost_analysis (which
        # instruments that pass).
        aborted, cost_stats, effective = False, None, None
    elif use_grouped:
        aborted, cost_stats, effective = _grouped_scoring(
            geom, cfg, scores, twists, rise_pixels, n_copies, n_pairs,
            n_ops, pose_args, copy_cache, batch_size,
            progress_callback, should_abort, cost_analysis,
            devices=tuple(devices) if n_dev > 1 else None,
            densify_padding=densify_padding,
        )
    else:
        aborted, cost_stats, effective = _percand_scoring(
            geom, cfg, scores, twists, rise_pixels, n_copies, n_pairs,
            n_ops, pose_args, copy_cache, batch_size, put, vsolve,
            incremental_mode, progress_callback, should_abort,
            cost_analysis,
        )

    refined_params: dict | None = None
    if aborted:
        # partial scores only: refining / re-solving the argmax of a
        # mostly-zero score array would burn seconds on an arbitrary
        # candidate (workflow.py documents best_volume as finish-only)
        refine_tilt_psi_dy_range = None
        return_best_volume = False
    if refine_tilt_psi_dy_range and refine_mode == "all":
        # reference-parity: every candidate carries its own refined pose
        from .refine import refine_all_candidates

        refine_cfg = cfg._replace(separable=False, compute_dtype="float32")
        tabs = _candidate_tables(
            geom, twists, rise_pixels, n_copies, n_pairs, n_ops, copy_cache
        )
        # footprint-aware batch cap: the non-separable refine path
        # materializes per-copy sample-index/deposit tensors of
        # ~n_copies x l2 x d2^2 per candidate under vmap (measured: a
        # 110 A fixture at d2=56/l2=256/177 copies asked 20.8 GB at
        # batch 16 on a 16 GB v5e — 1.3 GB/candidate).
        # HELICON_REFINE_BUDGET_MB overrides the 3 GB default.
        import os as _os

        est = max(1, n_copies * geom.l2 * geom.d2 * geom.d2 * 8)
        budget = int(
            _os.environ.get("HELICON_REFINE_BUDGET_MB", "3072")
        ) * 1024 * 1024
        # accelerator HBM only — CPU backends page into system RAM
        mem_cap = (
            max(1, budget // est)
            if devices[0].platform != "cpu"
            else n_cand
        )
        r_scores, r_params = refine_all_candidates(
            geom, refine_cfg, region, twists, rise_pixels, tabs[:5],
            float(tilt), float(psi), float(dy / target_apix2d),
            refine_tilt_psi_dy_range,
            batch_size=min(32, int(batch_size or 32), n_cand, mem_cap),
        )
        scores = r_scores
        refined_params = {i: tuple(map(float, r_params[i])) for i in range(n_cand)}
    elif refine_tilt_psi_dy_range:
        from .refine import refine_tilt_psi_dy

        refine_cfg = cfg._replace(separable=False, compute_dtype="float32")
        refined_params = {}
        for idx in np.argsort(-scores)[: max(1, int(refine_top_k))]:
            idx = int(idx)
            ch, cc, cv, phc, pv, *_ = _candidate_tables(
                geom, twists[idx : idx + 1], rise_pixels[idx : idx + 1],
                n_copies, n_pairs, n_ops, copy_cache,
            )
            t_r, p_r, d_r = refine_tilt_psi_dy(
                geom,
                refine_cfg,
                region,
                float(twists[idx]),
                float(rise_pixels[idx]),
                (ch[0], cc[0], cv[0]),
                (phc[0], pv[0]),
                float(tilt),
                float(psi),
                float(dy / target_apix2d),
                refine_tilt_psi_dy_range,
            )
            out = solve_candidate(
                geom,
                refine_cfg,
                jnp.asarray(region),
                jnp.float32(twists[idx]),
                jnp.float32(rise_pixels[idx]),
                jnp.asarray(ch[0]),
                jnp.asarray(cc[0]),
                jnp.asarray(cv[0]),
                jnp.asarray(phc[0]),
                jnp.asarray(pv[0]),
                jnp.float32(t_r),
                jnp.float32(p_r),
                jnp.float32(d_r),
            )
            scores[idx] = float(out["score"])
            refined_params[idx] = (t_r, p_r, d_r)

    extras = None
    if effective and effective.get("extras"):
        ee = effective.pop("extras")
        extras = dict(
            twists=ee["twists"],
            # user-facing rises in Angstrom (the scorer works in pixels)
            rises=ee["rise_pixels"] * np.float32(target_apix3d),
            scores=ee["scores"],
        )
    result = GridResult(
        twists=twists,
        rises=rises,
        scores=scores,
        geom=geom,
        target_apix2d=float(target_apix2d),
        target_apix3d=float(target_apix3d),
        refined_params=refined_params,
        cost=cost_stats,
        effective=effective,
        extras=extras,
    )
    result.best_index = int(np.argmax(scores))
    if return_best_volume and n_cand:
        bi = result.best_index
        tilt_b, psi_b, dy_b = tilt, psi, dy / target_apix2d
        if refined_params and bi in refined_params:
            tilt_b, psi_b, dy_b = refined_params[bi]
        cfg_best = cfg._replace(
            compute_dtype="float32",
            separable=(tilt_b == 0.0 and psi_b == 0.0),
        )
        b = _candidate_tables(
            geom, twists[bi : bi + 1], rise_pixels[bi : bi + 1],
            n_copies, n_pairs, n_ops, copy_cache,
        )
        ch, cc, cv, phc, pv, ops_hc, ops_v, pair_idx = b
        bi_loc = 0
        # duplicate sym rows don't change the candidate RANKING (verified
        # vs the reference: identical ordering), so the vmapped grid skips
        # the dedup masks; the final volume re-solve applies them for
        # exact reference-semantics output.
        sym_keep = None
        if cfg_best.interpolation == "nn":
            from .geometry import compute_sym_dedup_mask

            sym_keep = jnp.asarray(
                compute_sym_dedup_mask(
                    geom,
                    float(twists[bi]),
                    float(rise_pixels[bi]),
                    phc[bi_loc],
                    pv[bi_loc],
                )
            )
        out = solve_candidate(
            geom,
            cfg_best,
            jnp.asarray(region),
            jnp.float32(twists[bi]),
            jnp.float32(rise_pixels[bi]),
            jnp.asarray(ch[bi_loc]),
            jnp.asarray(cc[bi_loc]),
            jnp.asarray(cv[bi_loc]),
            jnp.asarray(phc[bi_loc]),
            jnp.asarray(pv[bi_loc]),
            jnp.float32(tilt_b),
            jnp.float32(psi_b),
            jnp.float32(dy_b),
            pair_ops=(
                (jnp.asarray(ops_hc[bi_loc]), jnp.asarray(ops_v[bi_loc]), jnp.asarray(pair_idx[bi_loc]))
                if cfg_best.separable
                else None
            ),
            sym_keep=sym_keep,
        )
        result.best_volume = np.asarray(out["rec3d"])
    return result


def _rise_buckets(rises: np.ndarray, ratio: float):
    """Partition candidate indices into rise buckets with bounded spread.

    Greedy over ascending rises: a bucket absorbs rises up to
    ratio * (its smallest rise), so every bucket's geometry length (sized
    from its max rise) is within `ratio` of what the reference would use
    per candidate. Returns a list of index arrays covering range(len(rises)).
    """
    order = np.argsort(rises, kind="stable")
    buckets, cur = [], [int(order[0])]
    r0 = float(rises[order[0]])
    for i in order[1:]:
        if float(rises[i]) <= ratio * r0:
            cur.append(int(i))
        else:
            buckets.append(np.asarray(cur))
            cur, r0 = [int(i)], float(rises[i])
    buckets.append(np.asarray(cur))
    return buckets


def global_rise_buckets(rises, ratio) -> list:
    """The bucket partition reconstruct_grid applies to this FULL
    candidate set ([arange(n)] when no bucketing triggers).

    Shared by the multi-host (parallel/multihost.py) and checkpointed
    (checkpoint.py) drivers: both score SUBSETS of the grid, and their
    per-subset calls reproduce the one-shot run's geometry only if the
    partition is computed from the global candidate set and each call
    pins its bucket's global rise range via geometry_rise_range."""
    rises = np.asarray(rises)
    n = len(rises)
    if (
        n
        and ratio
        and ratio > 1
        and float(np.max(rises)) > ratio * max(float(np.min(rises)), 1e-6)
    ):
        return _rise_buckets(rises, ratio)
    return [np.arange(n)]


def crossbucket_selection(buckets, scores) -> np.ndarray:
    """Top-10% (at least 10) per bucket — the candidate set the bucketed
    merge re-scores at per-candidate geometry (second pass below)."""
    parts = []
    for idx in buckets:
        k = max(10, -(-len(idx) // 10))
        parts.append(idx[np.argsort(-scores[idx])[: min(k, len(idx))]])
    return np.unique(np.concatenate(parts))


def _reconstruct_grid_bucketed(
    image, apix, twists, rises, ratio, kw,
    return_best_volume, progress_callback, should_abort,
):
    """Run reconstruct_grid once per rise bucket and merge the results.

    Each bucket recurses into reconstruct_grid (its rises now within
    `ratio`, so it takes the single-geometry path) with bucket-local
    progress/abort plumbing; scores land in one global array. Buckets
    run WITHOUT best-volume reconstruction; the winner candidate is
    re-solved once at the end, so only one volume is ever computed.
    `cost` is the first bucket's (per-candidate flops differ between
    geometries; the bench is single-bucket).
    """
    n_cand = len(twists)
    incremental_mode = progress_callback is not None or should_abort is not None
    scores = np.full(
        n_cand, -np.inf if incremental_mode else 0.0, np.float32
    )
    merged_refined: dict = {}
    merged_extras: list = []  # densify_padding extras across buckets
    best_sub = None
    best_score = -np.inf
    best_global_idx = -1
    cost = None
    done_off = 0
    aborted = False
    for idx in _rise_buckets(rises, ratio):
        if should_abort is not None and should_abort():
            aborted = True
            break

        def cb(done_b, _n_b, scores_b, idx=idx, off=done_off):
            scores[idx[: len(scores_b)]] = scores_b[: len(idx)]
            if progress_callback is not None:
                progress_callback(off + done_b, n_cand, scores)

        sub = reconstruct_grid(
            image,
            apix,
            twists[idx],
            rises[idx],
            return_best_volume=False,
            progress_callback=cb if (progress_callback or should_abort) else None,
            should_abort=should_abort,
            rise_bucket_ratio=ratio,
            **kw,
        )
        scores[idx] = sub.scores
        done_off += len(idx)
        if cost is None:
            cost = sub.cost
        if sub.extras:
            merged_extras.append(sub.extras)
        if sub.refined_params:
            for k, v in sub.refined_params.items():
                merged_refined[int(idx[k])] = v
        if len(sub.scores) and float(np.max(sub.scores)) > best_score:
            best_score = float(np.max(sub.scores))
            best_sub = sub
            best_global_idx = int(idx[int(np.argmax(sub.scores))])

    # Second pass (VERDICT r2 #5): bucket scores are comparable only
    # WITHIN a bucket — a longer bucket volume has more unknowns and
    # fits better, biasing cross-bucket comparisons (Spearman 0.52 vs
    # the reference's per-candidate geometry on a 4-48 A study). Take
    # each bucket's top-K by its own coarse ranking and RE-SCORE them
    # with per-candidate geometry — one call per distinct selected rise,
    # each deriving reconstruct_length from that rise exactly as the
    # reference does per candidate (pipeline.py:288-302). The final
    # ranking (and the winner) comes from the re-scored set; unselected
    # candidates keep their bucket-geometry scores (within-bucket
    # comparable, never ranked above a re-scored candidate here).
    if not aborted and n_cand:
        sel = crossbucket_selection(_rise_buckets(rises, ratio), scores)
        rkw = dict(
            kw,
            refine_tilt_psi_dy_range=None,  # refine ran in the buckets
            cost_analysis=False,
            # re-scoring known candidates must not mint duplicate extras
            densify_padding=False,
        )
        best_score = -np.inf
        for r in np.unique(rises[sel]):
            if should_abort is not None and should_abort():
                aborted = True
                break
            m = sel[rises[sel] == r]
            # abort is checked BETWEEN rise calls only: passing
            # should_abort down would overwrite good coarse scores with
            # a partial batch's -inf fill
            sub = reconstruct_grid(
                image,
                apix,
                twists[m],
                rises[m],
                return_best_volume=False,
                rise_bucket_ratio=ratio,
                **rkw,
            )
            scores[m] = sub.scores
            if len(sub.scores) and float(np.max(sub.scores)) > best_score:
                best_score = float(np.max(sub.scores))
                best_sub = sub
                best_global_idx = int(m[int(np.argmax(sub.scores))])
        if progress_callback is not None:
            progress_callback(n_cand, n_cand, scores)

    extras = None
    if merged_extras:
        extras = {
            k: np.concatenate([e[k] for e in merged_extras])
            for k in ("twists", "rises", "scores")
        }
    result = GridResult(
        twists=twists,
        rises=rises,
        scores=scores,
        geom=best_sub.geom if best_sub is not None else None,
        target_apix2d=best_sub.target_apix2d if best_sub is not None else -1.0,
        target_apix3d=best_sub.target_apix3d if best_sub is not None else -1.0,
        refined_params=merged_refined or None,
        cost=cost,
        effective=best_sub.effective if best_sub is not None else None,
        extras=extras,
    )
    result.best_index = best_global_idx if best_global_idx >= 0 else int(np.argmax(scores))
    if aborted:
        return_best_volume = False  # partial scores: no winner re-solve
    if return_best_volume and best_sub is not None:
        # one single-candidate pass on the winner (its own bucket's
        # geometry) for the volume; refinement (if configured) re-runs
        # deterministically on this one candidate
        win_kw = dict(kw, batch_size=None, densify_padding=False)  # 1 candidate: autosize, don't
        # pad the winner to the caller's full scoring batch
        win = reconstruct_grid(
            image,
            apix,
            twists[best_global_idx: best_global_idx + 1],
            rises[best_global_idx: best_global_idx + 1],
            return_best_volume=True,
            rise_bucket_ratio=ratio,
            **win_kw,
        )
        result.best_volume = win.best_volume
        result.geom = win.geom
        result.target_apix2d = win.target_apix2d
        result.target_apix3d = win.target_apix3d
        if win.refined_params:
            merged_refined[best_global_idx] = win.refined_params[0]
            result.refined_params = merged_refined
    return result
