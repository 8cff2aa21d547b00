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
     (cheap numpy table building), takes its contiguous slice of the
     candidate axis (:func:`process_candidate_slice`), and runs the
     ordinary single-host `reconstruct_grid` on its *local* devices —
     ICI parallelism inside a host is unchanged.
  3. The per-candidate score vector (a few KB) is exchanged with ONE
     all-gather over DCN (:func:`_allgather_f32`). No operator tensors,
     images, or volumes ever cross hosts; DCN carries only the final
     scores, exactly the "DCN only for multi-host batch farming" plan
     of SURVEY.md section 2h.

This mirrors how the scaling-book treats pure data parallelism: the
mesh axis that owns independent work items needs collectives only at
the reduction point, so the slow inter-host links see one small
message per grid instead of per-step traffic.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "initialize",
    "is_distributed",
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


def _allgather_f32(local: np.ndarray, n_total: int, sl: slice) -> np.ndarray:
    """One-collective exchange of per-process score slices.

    Every process scatters its slice into an n_total-long zero vector
    and the psum over the global mesh reconstructs the full vector —
    one DCN all-reduce of a float32 vector (the slices are disjoint, so
    sum == concatenate). Built on shard_map over the global 1D device
    mesh, which is the supported way to run a cross-process collective.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())  # global, all processes
    mesh = Mesh(devices, ("d",))
    full = np.zeros(n_total, np.float32)
    full[sl] = local
    # each local device contributes full/ n_local_devices so the psum
    # over ALL devices still sums each process's slice exactly once
    full /= max(1, jax.local_device_count())

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
        (n_total,), NamedSharding(mesh, P()), lambda idx: full[idx]
    )
    return np.asarray(jax.device_get(fn(arr)))


def multihost_reconstruct_grid(image, apix, twists, rises, **kwargs):
    """Process-sharded candidate grid: each process scores its slice on
    its local devices; scores are exchanged with one DCN all-gather.

    Returns the same GridResult as `reconstruct_grid` with the FULL
    score vector on every process (so ranking/refinement stay
    reproducible everywhere). best_volume is populated only on the
    process that owns the argmax candidate (volumes are host-memory
    heavy; shipping them over DCN is the caller's choice).
    """
    from ..denovo3d import reconstruct_grid
    from ..denovo3d.grid import GridResult

    twists = np.asarray(twists, np.float32)
    rises = np.asarray(rises, np.float32)
    n = len(twists)
    if not is_distributed():
        return reconstruct_grid(image, apix, twists, rises, **kwargs)

    sl = process_candidate_slice(n)
    local = reconstruct_grid(
        image, apix, twists[sl], rises[sl],
        devices=jax.local_devices(), **kwargs
    )
    scores = _allgather_f32(
        np.asarray(local.scores, np.float32), n, sl
    )
    best = int(np.argmax(scores))
    owns_best = sl.start <= best < sl.stop
    return GridResult(
        twists=twists,
        rises=rises,
        scores=scores,
        geom=local.geom,
        target_apix2d=local.target_apix2d,
        target_apix3d=local.target_apix3d,
        best_index=best,
        best_volume=local.best_volume if owns_best else None,
        refined_params=(
            {k + sl.start: v for k, v in local.refined_params.items()}
            if local.refined_params
            else None
        ),
        cost=local.cost,
        effective=dict(
            local.effective or {},
            n_processes=jax.process_count(),
            process_slice=(sl.start, sl.stop),
        ),
    )
