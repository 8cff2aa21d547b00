"""Device-mesh utilities: candidate-grid sharding over TPU chips.

The reference's only parallelism is single-host task fan-out
(ThreadPool/ProcessPool/joblib, SURVEY.md section 2h) — there is no model
to shard, so the TPU design shards the *candidate* (and image-batch) axis
over a 1D ICI mesh with jax.sharding; per-candidate solves stay on-chip
and scores come back with one gather. DP is the only meaningful axis;
TP/PP/SP/EP have no counterpart in this workload.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "candidate_mesh",
    "candidate_sharding",
    "distributed_reconstruct_grid",
    "image_candidate_mesh",
    "initialize_multihost",
    "multihost_reconstruct_grid",
    "pad_to_multiple",
    "process_candidate_slice",
    "shard_batch",
]


def __getattr__(name):
    # lazy: multihost pulls in jax.distributed machinery only when used
    if name in (
        "initialize_multihost",
        "multihost_reconstruct_grid",
        "process_candidate_slice",
    ):
        from . import multihost

        return getattr(
            multihost, name.replace("initialize_multihost", "initialize")
        )
    raise AttributeError(name)


def candidate_mesh(devices=None, axis_name: str = "candidates") -> Mesh:
    """1D mesh over all (or the given) local devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def image_candidate_mesh(devices=None, n_image_shards: int | None = None) -> Mesh:
    """2D ("images", "candidates") mesh for the multi-image batch
    workload (denovo3DBatch: many class averages x one candidate grid).

    Image batches shard on one axis (the DP analog) and each image's
    candidate grid on the other; n_image_shards defaults to the largest
    power-of-2 divisor <= sqrt(n_devices).
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n_image_shards is None:
        n_image_shards = 1
        while (
            n_image_shards * 2 <= int(np.sqrt(n))
            and n % (n_image_shards * 2) == 0
        ):
            n_image_shards *= 2
        # (no n=2 special case: the documented rule gives a 1x2 mesh —
        # both chips on the candidate axis — which is what a
        # single-image batch on a 2-chip host actually wants)
    assert n % n_image_shards == 0, (n, n_image_shards)
    grid = np.asarray(devices).reshape(n_image_shards, n // n_image_shards)
    return Mesh(grid, ("images", "candidates"))


def candidate_sharding(mesh: Mesh, axis_name: str = "candidates") -> NamedSharding:
    """Shard leading (candidate/batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Pad by repeating the last slice so axis length % multiple == 0."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if not pad:
        return x
    last = np.take(x, [-1], axis=axis)
    reps = [1] * x.ndim
    reps[axis] = pad
    return np.concatenate([x, np.tile(last, reps)], axis=axis)


def shard_batch(arrays, mesh: Mesh, axis_name: str = "candidates"):
    """device_put a pytree of per-candidate arrays with leading-axis
    sharding (pad first with pad_to_multiple)."""
    sh = candidate_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), arrays)


def distributed_reconstruct_grid(image, apix, twists, rises, devices=None, **kwargs):
    """Run the denovo3D candidate grid sharded over a device mesh.

    Thin entry: the sharding lives inside reconstruct_grid (grid.py), this
    just selects devices and sizes batches to the mesh.
    """
    from ..denovo3d import reconstruct_grid

    devices = list(devices) if devices is not None else jax.devices()
    return reconstruct_grid(
        image, apix, twists, rises, devices=devices, **kwargs
    )
