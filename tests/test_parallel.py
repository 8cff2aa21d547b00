"""Mesh/sharding utilities + driver hooks on the virtual 8-CPU-device mesh."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # heavy solver/parity coverage: run explicitly or without -m "not slow"

from helicon_tpu.parallel import (
    candidate_mesh,
    candidate_sharding,
    pad_to_multiple,
    shard_batch,
)


def test_virtual_device_count():
    assert len(jax.devices()) == 8


def test_pad_to_multiple():
    x = np.arange(10).reshape(10, 1)
    y = pad_to_multiple(x, 8)
    assert y.shape == (16, 1)
    np.testing.assert_array_equal(y[10:], np.full((6, 1), 9))
    assert pad_to_multiple(x, 5) is x


def test_mesh_and_sharding():
    mesh = candidate_mesh()
    assert mesh.devices.shape == (8,)
    sh = candidate_sharding(mesh)
    x = np.arange(16, dtype=np.float32)
    y = shard_batch(x, mesh)
    assert np.asarray(y).shape == (16,)
    assert len(y.sharding.device_set) == 8


def test_graft_entry_compiles():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    score, vol = jax.jit(fn)(*args)
    assert np.isfinite(float(score))
    assert vol.shape == (12, 12, 12)


def test_dryrun_multichip_small():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(4)


def test_dryrun_multichip_cold_shell():
    """The driver invokes dryrun_multichip with no env prepared and JAX
    possibly initialized on a single chip; it must self-configure (re-exec)."""
    import os, pathlib, subprocess, sys

    root = pathlib.Path(__file__).resolve().parents[1]
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=root,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok: 8 devices" in proc.stdout


def test_multidevice_chunked_shard_map_matches_vmapped():
    """The loop-interchanged (VMEM-resident) chunked schedule runs
    per-device under jax.shard_map on a multi-device mesh; before this
    path existed, n_dev > 1 silently fell back to the HBM-bound vmapped
    form. Scores must match the vmapped reference bit-for-bit (each
    candidate's solve is independent)."""
    import os

    from helicon_tpu.denovo3d import reconstruct_grid
    from helicon_tpu.helix.simulate import simulate_helical_projection

    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=48, nx=96, apix=2.0,
        rng=0,
    )))
    twists = np.array([20.0, 25.0, 30.0, 35.0, 40.0, 45.0, 50.0, 55.0],
                      np.float32)
    rises = np.full(8, 6.0, np.float32)
    kw = dict(
        apix=2.0, twists=twists, rises=rises, cg_iters=8, fista_iters=6,
        batch_size=8, return_best_volume=False, devices=jax.devices(),
        compute_dtype="float32",  # bf16 reduction order differs between
        # the chunked and vmapped compilations (~1e-4); f32 pins tightly
    )
    old = os.environ.get("HELICON_GRID_INNER")
    try:
        os.environ["HELICON_GRID_INNER"] = "0"
        ref = reconstruct_grid(img, **kw)
        os.environ["HELICON_GRID_INNER"] = "2"  # unit = 2 * 8 devices = 16
        got = reconstruct_grid(img, **kw)
    finally:
        if old is None:
            os.environ.pop("HELICON_GRID_INNER", None)
        else:
            os.environ["HELICON_GRID_INNER"] = old
    np.testing.assert_allclose(got.scores, ref.scores, rtol=0, atol=1e-6)
    assert int(np.argmax(got.scores)) == 2  # truth twist=30


def test_image_candidate_mesh_factorization():
    """2D (images x candidates) mesh covers all devices; image shards
    default to the largest power-of-2 divisor <= sqrt(n)."""
    import jax

    from helicon_tpu.parallel import image_candidate_mesh

    devices = jax.devices()
    mesh = image_candidate_mesh(devices)
    assert mesh.axis_names == ("images", "candidates")
    ni, nc = mesh.devices.shape
    assert ni * nc == len(devices)
    assert ni >= 1 and nc >= 1
    # explicit factorization
    mesh2 = image_candidate_mesh(devices, n_image_shards=len(devices))
    assert mesh2.devices.shape == (len(devices), 1)


def test_image_candidate_mesh_two_devices_candidate_parallel():
    """n=2 follows the documented rule: 1 image shard x 2 candidate
    shards (a forced 2x1 mesh left the candidate grid unsharded)."""
    import jax

    from helicon_tpu.parallel import image_candidate_mesh

    devices = jax.devices()[:2]
    if len(devices) < 2:
        import pytest

        pytest.skip("needs 2 devices")
    mesh = image_candidate_mesh(devices)
    assert mesh.devices.shape == (1, 2)


def test_multi_device_grouped_matches_single_device():
    """Twist-grouped scoring sharded over the 8-device mesh (groups
    axis via shard_map) must match the single-device per-candidate
    path: same scores, same winner."""
    import os

    from helicon_tpu.denovo3d import reconstruct_grid
    from helicon_tpu.helix.simulate import simulate_helical_projection

    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=48, nx=96, apix=2.0,
        rng=0,
    )))
    # 8 twist-groups x 2 rises: one group per device after sharding
    twists = np.repeat(
        np.linspace(20.0, 55.0, 8).astype(np.float32), 2
    )
    rises = np.tile(np.asarray([5.6, 6.0], np.float32), 8)
    kw = dict(
        apix=2.0, twists=twists, rises=rises, cg_iters=8, fista_iters=6,
        batch_size=16, return_best_volume=False,
        compute_dtype="float32",
    )
    old = os.environ.get("HELICON_GRID_GROUPED")
    try:
        os.environ["HELICON_GRID_GROUPED"] = "0"
        ref = reconstruct_grid(img, devices=jax.devices()[:1], **kw)
        os.environ["HELICON_GRID_GROUPED"] = "1"
        got = reconstruct_grid(img, devices=jax.devices(), **kw)
    finally:
        if old is None:
            os.environ.pop("HELICON_GRID_GROUPED", None)
        else:
            os.environ["HELICON_GRID_GROUPED"] = old
    np.testing.assert_allclose(got.scores, ref.scores, rtol=0, atol=2e-5)
    assert int(np.argmax(got.scores)) == int(np.argmax(ref.scores))


def _spawn_mh_workers(n_proc: int, extra_args=(), expect_rc=0):
    """Launch tests/_mh_worker.py n_proc times (Gloo over localhost, 2
    virtual CPU devices each) and return their parsed result dicts.
    expect_rc: required exit code, or a SET of acceptable codes (17 =
    the die_after_chunks test hook's clean mid-grid exit; a process
    whose COORDINATOR died first exits 1 with a grpc error instead —
    both are legitimate kill modes). Killed runs write no result
    JSON -> returns []."""
    import json
    import os
    import pathlib
    import socket
    import subprocess
    import sys
    import tempfile

    worker = pathlib.Path(__file__).parent / "_mh_worker.py"
    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        ).strip()
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    env.pop("JAX_NUM_PROCESSES", None)
    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"p{i}.json") for i in range(n_proc)]
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), str(n_proc),
                 str(port), outs[i], *extra_args],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(n_proc)
        ]
        logs = [p.communicate(timeout=420)[0] for p in procs]
        ok_rcs = expect_rc if isinstance(expect_rc, set) else {expect_rc}
        for p, log in zip(procs, logs):
            assert p.returncode in ok_rcs, (p.returncode, log[-2000:])
            if p.returncode == 1:
                # rc 1 is acceptable ONLY as the grpc fallout of a
                # killed coordinator — a Python traceback is a real
                # bug the tolerant rc set must not swallow (it did
                # once: an API change crashed both workers with rc 1
                # and the test still passed its rc check)
                assert "Traceback (most recent call last)" not in log, (
                    log[-2000:]
                )
        return [json.load(open(o)) for o in outs if os.path.exists(o)]


@pytest.mark.slow
def test_multihost_two_process_cpu():
    """Multi-host (DCN) path: 2 processes x 2 virtual CPU devices each,
    jax.distributed + Gloo collectives. Every process must end up with
    the FULL score vector, identical across processes and matching a
    single-process run of the same workload (tests/_mh_worker.py)."""
    res = _spawn_mh_workers(2)

    # identical full score vectors on both processes
    s0 = np.asarray(res[0]["scores"])
    s1 = np.asarray(res[1]["scores"])
    np.testing.assert_allclose(s0, s1, rtol=0, atol=1e-6)
    assert res[0]["best_index"] == res[1]["best_index"]
    assert res[0]["effective"]["n_processes"] == 2
    # the tiny workload's rises span < rise_bucket_ratio: one bucket,
    # sharded contiguously across the two processes
    assert res[0]["effective"]["n_buckets"] == 1
    # (return_best_volume=False in the worker: neither holds a volume)
    assert not res[0]["has_volume"] and not res[1]["has_volume"]

    # single-process reference on the same workload
    from tests._mh_worker import tiny_workload

    from helicon_tpu.denovo3d import reconstruct_grid

    image, tw, ri, kw = tiny_workload()
    ref = reconstruct_grid(image, twists=tw, rises=ri, **kw)
    np.testing.assert_allclose(s0, np.asarray(ref.scores), rtol=0, atol=2e-5)


@pytest.mark.slow
def test_multihost_two_process_bucketed_cpu():
    """Multi-host with a rise range spanning rise_bucket_ratio: the
    bucket partition must come from the GLOBAL grid (each per-bucket
    slice pinned to the bucket's global geometry), and the cross-bucket
    top-10% re-scoring pass must reproduce the single-host bucketed
    merge — scores identical across processes AND matching the
    single-host run of the same wide-rise workload."""
    res = _spawn_mh_workers(2, ("bucketed",))

    s0 = np.asarray(res[0]["scores"])
    s1 = np.asarray(res[1]["scores"])
    np.testing.assert_allclose(s0, s1, rtol=0, atol=1e-6)
    assert res[0]["best_index"] == res[1]["best_index"]
    assert res[0]["effective"]["n_buckets"] == 2

    from tests._mh_worker import tiny_workload

    from helicon_tpu.denovo3d import reconstruct_grid

    image, tw, ri, kw = tiny_workload(bucketed=True)
    ref = reconstruct_grid(image, twists=tw, rises=ri, **kw)
    np.testing.assert_allclose(s0, np.asarray(ref.scores), rtol=0, atol=2e-5)
    assert res[0]["best_index"] == int(np.argmax(ref.scores))


@pytest.mark.slow
def test_dryrun_multichip_multiprocess():
    """Driver hook: dryrun_multichip(n, n_processes=2) runs the DCN
    path (2 workers x 2 virtual devices) and verifies score agreement."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import __graft_entry__ as g

    g.dryrun_multichip(4, n_processes=2)  # raises on failure


@pytest.mark.slow
def test_multihost_cli_two_process(tmp_path):
    """`helicon denovo3d_cli` becomes multi-host aware purely through
    the JAX_* env vars: two processes run the SAME command line, the
    grid shards across them, process 0 writes the table/summary, and
    the summary reports the same winner a single-process run finds."""
    import json
    import os
    import socket
    import subprocess
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    from helicon_tpu.helix import simulate_helical_projection
    from helicon_tpu.io.mrc import write_mrc

    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=29.4, rise=4.75, csym=1, helical_diameter=100.0,
        ball_radius=6.0, polymer=0, planarity=1.0,
        ny=64, nx=128, apix=2.0, rng=0,
    )))
    in_mrc = tmp_path / "in.mrc"
    write_mrc(in_mrc, img[None], apix=2.0)
    prefix = tmp_path / "mh"

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    def env_for(pid):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "").replace(
                "--xla_force_host_platform_device_count=8", ""
            ).strip()
            + " --xla_force_host_platform_device_count=2"
        ).strip()
        env.update(
            HELICON_PLATFORM="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        return env

    cmd = [
        sys.executable, "-m", "helicon_tpu.commands.helicon", "denovo3d_cli",
        str(in_mrc), str(prefix),
        "--twist", "25", "33", "2", "--rise", "4.3", "5.2", "0.3",
        "--handedness", "right", "--tubeDiameter", "110",
        "--cgIters", "8", "--fistaIters", "8",
        "--computeDtype", "float32", "--verbose", "0",
    ]
    procs = [
        subprocess.Popen(
            cmd, env=env_for(i), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=420)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    summary = json.loads((tmp_path / "mh.json").read_text())
    assert (tmp_path / "mh.csv").exists()
    # exactly one process re-solved and wrote the winner volume
    assert (tmp_path / "mh.best.mrc").exists()
    assert summary["n_candidates"] == 20
    # single-process reference: same winner
    from helicon_tpu.denovo3d import build_candidate_grid, reconstruct_grid

    tw, ri = build_candidate_grid(25, 33, 2, 4.3, 5.2, 0.3, handedness="right")
    ref = reconstruct_grid(
        img, 2.0, tw, ri, tube_diameter=110.0, cg_iters=8, fista_iters=8,
        compute_dtype="float32", return_best_volume=False,
    )
    assert summary["best_twist"] == pytest.approx(
        float(ref.twists[np.argmax(ref.scores)])
    )
    assert summary["best_rise"] == pytest.approx(
        float(ref.rises[np.argmax(ref.scores)]), abs=1e-5
    )


@pytest.mark.slow
def test_multihost_checkpoint_kill_and_resume(tmp_path):
    """Checkpointing composes with multi-host (VERDICT r4 #5): both
    workers are killed mid-grid (the die_after_chunks hook exits each
    process cleanly after a different number of chunks, before any
    collective), then the SAME command restarts, each process resumes
    from its own shard (<base>.p<rank>.npz), and the merged result
    reproduces the single-host bucketed run exactly."""
    import os

    base = str(tmp_path / "run.ckpt.npz")

    # phase A: chunk=1 candidate; rank 0 dies after 2 chunks, rank 1
    # after 1 — partial shards on disk, no result JSONs. Exit modes
    # race benignly: a rank exits 17 via its own die hook, OR 1 when
    # its peer (the rank-0 coordinator) died first — both are the
    # "killed mid-grid" condition the resume contract covers.
    res = _spawn_mh_workers(
        2, ("bucketed", f"ckpt={base}", "chunk=1", "die=2,1"),
        expect_rc={17, 1},
    )
    assert res == []
    shard0 = base[:-4] + ".p0.npz"
    shard1 = base[:-4] + ".p1.npz"
    done0 = done1 = 0
    if os.path.exists(shard0):
        done0 = int(np.count_nonzero(~np.isnan(np.load(shard0)["scores"])))
    if os.path.exists(shard1):
        done1 = int(np.count_nonzero(~np.isnan(np.load(shard1)["scores"])))
    # at least one rank persisted progress, and the grid is NOT done
    assert done0 + done1 >= 1
    assert done0 <= 4 and done1 <= 2
    assert done0 + done1 < 6

    # phase B: restart with the same command (no die hook)
    res = _spawn_mh_workers(2, ("bucketed", f"ckpt={base}", "chunk=1"))
    s0 = np.asarray(res[0]["scores"])
    s1 = np.asarray(res[1]["scores"])
    np.testing.assert_allclose(s0, s1, rtol=0, atol=1e-6)
    assert res[0]["best_index"] == res[1]["best_index"]
    assert res[0]["effective"]["checkpointed"]
    assert res[1]["effective"]["checkpointed"]
    # resume recomputed ONLY the missing chunks of each slice: the
    # total chunk count across both ranks is 6 (bucket slices 4 + 2),
    # and phase A persisted done0+done1 of them
    resumed = (
        res[0]["effective"]["chunks_run"]
        + res[1]["effective"]["chunks_run"]
    )
    assert resumed == 6 - (done0 + done1), (resumed, done0, done1)

    # single-host reference on the same wide-rise workload
    from tests._mh_worker import tiny_workload

    from helicon_tpu.denovo3d import reconstruct_grid

    image, tw, ri, kw = tiny_workload(bucketed=True)
    ref = reconstruct_grid(image, twists=tw, rises=ri, **kw)
    np.testing.assert_allclose(s0, np.asarray(ref.scores), rtol=0, atol=2e-5)
    assert res[0]["best_index"] == ref.best_index


@pytest.mark.slow
def test_multihost_three_process_bucketed_cpu():
    """Three processes (odd count: unbalanced slices, round-robin
    refinement/cross-bucket ownership with pid 2 owning fewer tasks)
    must still reproduce the single-host bucketed result exactly."""
    res = _spawn_mh_workers(3, ("bucketed",))
    assert len(res) == 3
    s = [np.asarray(r["scores"]) for r in res]
    np.testing.assert_allclose(s[0], s[1], rtol=0, atol=1e-6)
    np.testing.assert_allclose(s[0], s[2], rtol=0, atol=1e-6)
    assert res[0]["best_index"] == res[1]["best_index"] == res[2]["best_index"]
    assert res[0]["effective"]["n_processes"] == 3

    from tests._mh_worker import tiny_workload

    from helicon_tpu.denovo3d import reconstruct_grid

    image, tw, ri, kw = tiny_workload(bucketed=True)
    ref = reconstruct_grid(image, twists=tw, rises=ri, **kw)
    np.testing.assert_allclose(s[0], np.asarray(ref.scores), rtol=0, atol=2e-5)
    assert res[0]["best_index"] == ref.best_index
