"""End-to-end CLI tests (subprocess, CPU-forced via HELICON_PLATFORM)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from helicon_tpu.io.mrc import read_mrc, write_mrc
from helicon_tpu.io.metadata import dataframe2file


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    HELICON_PLATFORM="cpu",
    # the CLI subprocess runs with cwd=tmp_path; make helicon_tpu importable
    # without requiring an editable install of the package
    PYTHONPATH=os.pathsep.join(
        p for p in (_REPO_ROOT, os.environ.get("PYTHONPATH", "")) if p
    ),
)


def touch_stacks(tmp_path, df, col="rlnImageName"):
    """Create the (empty) stack files a synthetic table references, so the
    CLI's strict path normalization (reference semantics) resolves them."""
    names = df[col].astype(str).str.split("@").str[-1].unique()
    for f in names:
        (tmp_path / f).touch()


def run_cli(*argv, cwd=None):
    return subprocess.run(
        [sys.executable, "-m", "helicon_tpu.commands.helicon", *argv],
        capture_output=True, text=True, env=ENV, cwd=cwd, timeout=600,
    )


# module entry shim: python -m helicon_tpu.commands.helicon
def test_cli_help_lists_commands():
    r = run_cli("--help")
    assert r.returncode == 0
    for cmd in ("images2star", "proc3d", "cryosparc", "trueFSC",
                "symmetry_mismatch", "HOM_containerC", "denovo3d_cli"):
        assert cmd in r.stdout


def test_cli_proc3d_helical_sym(tmp_path):
    vol = np.zeros((24, 16, 16), np.float32)
    vol[8:16, 4:12, 4:12] = np.random.default_rng(0).random((8, 8, 8))
    write_mrc(tmp_path / "in.mrc", vol, apix=2.0)
    r = run_cli(
        "proc3d", "in.mrc", "out.mrc",
        "--helical_sym", "twist=30:rise=6:csym=1:center_fraction=0.8",
        "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    data, apix = read_mrc(tmp_path / "out.mrc")
    assert data.shape == (24, 16, 16) and apix == pytest.approx(2.0)
    assert float(np.max(data)) > 0


def test_cli_images2star_pipeline(tmp_path, relion_df):
    df = relion_df.copy()
    df.attrs["convention"] = "relion"
    touch_stacks(tmp_path, df)
    dataframe2file(df, str(tmp_path / "in.star"))
    r = run_cli(
        "images2star", "in.star", "out.star",
        "--select", "rlnHelicalTubeID", "1",
        "--addParm", "rlnDefocusU", "100",
        "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    from helicon_tpu.io.metadata import star2dataframe

    out = star2dataframe(tmp_path / "out.star")
    assert (out["rlnHelicalTubeID"] == 1).all()
    assert out["rlnDefocusU"].iloc[0] == pytest.approx(12100.0)


def test_cli_hom_containerc(tmp_path, relion_df):
    df = relion_df.copy()
    df.attrs["convention"] = "relion"
    df["rlnAngleRot"] = (np.arange(len(df)) * 10.0) % 360
    touch_stacks(tmp_path, df)
    dataframe2file(df, str(tmp_path / "in.star"))
    r = run_cli(
        "HOM_containerC", "in.star", "out.star", "--verbose", "0",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    from helicon_tpu.io.metadata import star2dataframe

    out = star2dataframe(tmp_path / "out.star")
    assert "rlnAngleRotError" in out


@pytest.mark.slow
def test_cli_truefsc(tmp_path):
    rng = np.random.default_rng(0)
    n = 32
    signal = np.zeros((n, n, n), np.float32)
    zz, yy, xx = np.meshgrid(*([np.arange(n) - n // 2] * 3), indexing="ij")
    signal[(zz**2 + yy**2 + xx**2) < 100] = 1.0
    from scipy.ndimage import gaussian_filter

    signal = gaussian_filter(signal, 1.5)
    m1 = signal + 0.1 * rng.standard_normal((n, n, n))
    m2 = signal + 0.1 * rng.standard_normal((n, n, n))
    write_mrc(tmp_path / "h1.mrc", m1.astype(np.float32), apix=2.0)
    write_mrc(tmp_path / "h2.mrc", m2.astype(np.float32), apix=2.0)
    r = run_cli(
        "trueFSC", "h1.mrc", "h2.mrc", "fsc.png", "--verbose", "0",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "fsc.png").exists()
    assert (tmp_path / "fsc.true.txt").exists()
    assert "trueFSC resolution" in r.stdout


@pytest.mark.slow
def test_cli_symmetry_mismatch(tmp_path):
    from helicon_tpu.io.metadata import dataframe2cs
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(0)
    n = 40
    rot1 = rng.uniform(0, 360, n)
    rel = 17.0
    rot2 = (rot1 + rel) % (360 / 3)  # job2 refined with C3
    e1 = np.stack([rot1, np.full(n, 5.0), np.zeros(n)], axis=1)
    e2 = np.stack([rot2, np.full(n, 5.0), np.zeros(n)], axis=1)
    p1 = R.from_euler("ZXZ", e1, degrees=True).as_rotvec()
    p2 = R.from_euler("ZXZ", e2, degrees=True).as_rotvec()
    df1 = pd.DataFrame({"uid": np.arange(n, dtype=np.uint64) + 1})
    df1["alignments3D/pose"] = list(p1.astype(np.float32))
    df2 = pd.DataFrame({"uid": np.arange(n, dtype=np.uint64) + 1})
    df2["alignments3D/pose"] = list(p2.astype(np.float32))
    dataframe2cs(df1, tmp_path / "j1.cs")
    dataframe2cs(df2, tmp_path / "j2.cs")
    r = run_cli(
        "symmetry_mismatch", "--input1", "j1.cs", "--input2", "j2.cs",
        "--sym1", "C1", "--sym2", "C3",
        "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "relative angle" in r.stdout


def test_hom_core_math():
    """HOM wrapped-fit primitives (reference math, exact behaviors)."""
    from helicon_tpu.commands.HOM_containerC import (
        fit_line_wrapped_by_m_grid,
        l1_core_average,
        unwrap_sequence,
        wrap_sym,
    )

    assert wrap_sym(190.0, 360.0) == pytest.approx(-170.0)
    assert wrap_sym(-190.0, 360.0) == pytest.approx(170.0)
    seq = np.array([350.0, 10.0, 30.0])  # wraps at 360
    unwrapped = unwrap_sequence(seq, 360.0)
    np.testing.assert_allclose(np.diff(unwrapped), [20.0, 20.0])
    # exact recovery of a wrapped line
    x = np.arange(40.0)
    m_true, b_true = 7.3, 12.0
    o = (m_true * x + b_true) % 360.0
    m, b, sse, _ = fit_line_wrapped_by_m_grid(x, o, 360.0, 5.0, 10.0, 501)
    assert m == pytest.approx(m_true, abs=0.02)
    assert sse < 1.0
    vals = np.concatenate([np.full(20, 3.0), [100.0, -50.0]])
    m_best, _, _ = l1_core_average(vals, k=10)
    assert m_best == pytest.approx(3.0)


@pytest.mark.slow
def test_cli_denovo3d(tmp_path):
    """Flagship grid-search CLI end-to-end on a tiny grid."""
    from helicon_tpu.helix import simulate_helical_projection

    img = np.squeeze(
        np.asarray(
            simulate_helical_projection(
                n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
                ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=48,
                apix=2.0, rng=0,
            )
        )
    ).astype(np.float32)
    write_mrc(tmp_path / "cls.mrc", img[None], apix=2.0)
    r = run_cli(
        "denovo3d_cli", "cls.mrc", "result",
        "--apix", "2.0",
        "--twist", "25", "35", "5",
        "--rise", "5.0", "7.0", "1.0",
        "--cgIters", "10", "--fistaIters", "8",
        "--horizontalize", "0", "--verbose", "0",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    outs = sorted(tmp_path.glob("result*"))
    assert outs, r.stdout


@pytest.mark.slow
def test_cli_denovo3d_refine_and_metric(tmp_path):
    """Gauss-Newton pose refinement + score-metric selection reachable
    from the CLI (VERDICT r1 items 2/3): one candidate, refine on, ssim
    scoring; the summary JSON must carry the refined pose."""
    import json

    from helicon_tpu.helix import simulate_helical_projection

    img = np.squeeze(
        np.asarray(
            simulate_helical_projection(
                n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
                ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=48,
                apix=2.0, rng=0,
            )
        )
    ).astype(np.float32)
    write_mrc(tmp_path / "cls.mrc", img[None], apix=2.0)
    r = run_cli(
        "denovo3d_cli", "cls.mrc", "refined",
        "--apix", "2.0",
        "--twist", "30", "30", "1",
        "--rise", "6.0", "6.0", "1.0",
        "--handedness", "right",
        "--cgIters", "10", "--fistaIters", "8",
        "--horizontalize", "0", "--verbose", "0",
        "--scoreMetric", "ssim",
        "--refineTiltPsiDy", "5", "5", "2",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    summary = json.loads((tmp_path / "refined.json").read_text())
    assert "refined_tilt" in summary and "refined_psi" in summary
    assert abs(summary["refined_tilt"]) <= 5.0
    assert abs(summary["refined_psi"]) <= 5.0
    assert 0.0 <= summary["best_score"] <= 1.0


@pytest.mark.slow
def test_cli_images2star_split(tmp_path, relion_df):
    """--splitNumSets by evenodd and by micrograph (reference
    images2star.py:246-297 splitting)."""
    df = relion_df.copy()
    df.attrs["convention"] = "relion"
    touch_stacks(tmp_path, df)
    dataframe2file(df, str(tmp_path / "in.star"))
    r = run_cli(
        "images2star", "in.star", "out.star",
        "--splitNumSets", "2", "--splitMode", "evenodd",
        "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "out.e.star").exists()
    assert (tmp_path / "out.o.star").exists()
    from helicon_tpu.io.metadata import star2dataframe

    e = star2dataframe(tmp_path / "out.e.star")
    o = star2dataframe(tmp_path / "out.o.star")
    assert len(e) + len(o) == len(df)
    assert abs(len(e) - len(o)) <= 1

    r = run_cli(
        "images2star", "in.star", "bymic.star",
        "--splitNumSets", "2", "--splitMode", "micrograph",
        "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    s0 = star2dataframe(tmp_path / "bymic.subset-0.star")
    s1 = star2dataframe(tmp_path / "bymic.subset-1.star")
    # micrograph granularity: each subset holds whole micrographs
    assert set(s0["rlnMicrographName"]).isdisjoint(set(s1["rlnMicrographName"]))
    assert len(s0) + len(s1) == len(df)


def test_launcher_modules_well_formed():
    """Every web-app launcher module imports and exposes add_args/main
    (the dispatcher requires both; they stay hidden without
    shiny/streamlit, matching the reference's gating)."""
    from importlib import import_module

    for name in (
        "denovo3D", "whereIsMyClass", "helicalPitch", "helicalProjection",
        "hill", "ctfSimulation", "hi3d", "helicalLattice", "procart",
        "map2seq",
    ):
        mod = import_module(f"helicon_tpu.commands.{name}")
        assert hasattr(mod, "add_args"), name
        assert hasattr(mod, "main"), name
        assert mod.__doc__, name


@pytest.mark.slow
def test_cli_images2star_cs_to_star(tmp_path):
    """CryoSPARC .cs in -> RELION .star out through the CLI (the
    cross-convention conversion path end-to-end)."""
    from helicon_tpu.io.cs import write_cs

    n = 8
    arr = np.zeros(
        n,
        dtype=[
            ("uid", "<u8"),
            ("blob/idx", "<u4"),
            ("blob/path", "S30"),
            ("blob/psize_A", "<f4"),
            ("ctf/df1_A", "<f4"),
            ("ctf/df2_A", "<f4"),
            ("ctf/df_angle_rad", "<f4"),
            ("ctf/accel_kv", "<f4"),
            ("ctf/cs_mm", "<f4"),
            ("ctf/amp_contrast", "<f4"),
            ("location/micrograph_path", "S20"),
            ("location/center_x_frac", "<f4"),
            ("location/center_y_frac", "<f4"),
            ("location/micrograph_shape", "<u4", (2,)),
        ],
    )
    arr["uid"] = np.arange(n) + 1
    arr["blob/idx"] = np.arange(n)
    arr["blob/path"] = b"extract/stack.mrcs"
    (tmp_path / "extract").mkdir(exist_ok=True)
    (tmp_path / "extract" / "stack.mrcs").touch()
    arr["blob/psize_A"] = 1.2
    arr["ctf/df1_A"] = 12000.0
    arr["ctf/df2_A"] = 11000.0
    arr["ctf/df_angle_rad"] = 0.5
    arr["ctf/accel_kv"] = 300.0
    arr["ctf/cs_mm"] = 2.7
    arr["ctf/amp_contrast"] = 0.1
    arr["location/micrograph_path"] = b"mics/m1.mrc"
    arr["location/center_x_frac"] = 0.5
    arr["location/center_y_frac"] = 0.5
    arr["location/micrograph_shape"] = (4096, 4096)
    write_cs(tmp_path / "particles.cs", arr)
    r = run_cli(
        "images2star", "particles.cs", "out.star", "--verbose", "0",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    from helicon_tpu.io.metadata import star2dataframe

    df = star2dataframe(tmp_path / "out.star")
    assert len(df) == n
    assert "rlnDefocusU" in df
    assert df["rlnDefocusU"].iloc[0] == pytest.approx(12000.0)
    assert df["rlnImageName"].iloc[0].startswith("000001@")


@pytest.mark.slow
def test_bench_script_runs_small(tmp_path):
    """bench.py (the driver's benchmark entry) runs end-to-end on a tiny
    grid; guards the metric JSON contract."""
    env = dict(ENV, HELICON_BENCH_N="8", HELICON_BENCH_BATCH="8",
               HELICON_BENCH_CG="3", HELICON_BENCH_FISTA="3",
               HELICON_BENCH_POWER="2", HELICON_BENCH_REPEATS="1",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        # --json: keep the smoke run's detail OUT of the repo's real
        # BENCH_DETAIL.json (a concurrent/subsequent driver bench run
        # must never be clobbered by a CPU smoke number)
        [sys.executable, "bench.py", "--json",
         str(tmp_path / "bench_smoke.json")],
        capture_output=True, text=True,
        env=env, cwd="/root/repo", timeout=900,
    )
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "denovo3d_candidates_per_s"
    assert out["value"] > 0 and "vs_baseline" in out and "unit" in out


def test_bench_etl_mode_runs_small():
    env = dict(ENV, HELICON_BENCH_METRIC="etl", HELICON_BENCH_ETL_ROWS="2000",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        env=env, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "images2star_etl_rows_per_s" and out["value"] > 0


def test_cli_cryosparc_local_pipeline(tmp_path):
    """helicon cryosparc on a local .cs: per-micrograph exposure groups +
    pixel-size change end-to-end."""
    from helicon_tpu.io.cs import read_cs, write_cs

    n = 12
    arr = np.zeros(
        n,
        dtype=[
            ("uid", "<u8"), ("blob/psize_A", "<f4"),
            ("ctf/df1_A", "<f4"), ("ctf/df2_A", "<f4"),
            ("ctf/exp_group_id", "<u4"),
            ("location/micrograph_path", "S20"),
        ],
    )
    arr["uid"] = np.arange(n) + 1
    arr["blob/psize_A"] = 1.2
    arr["ctf/df1_A"] = 12000.0
    arr["ctf/df2_A"] = 11000.0
    arr["ctf/exp_group_id"] = 1
    arr["location/micrograph_path"] = np.repeat(
        [b"m1.mrc", b"m2.mrc", b"m3.mrc"], 4
    )
    write_cs(tmp_path / "in.cs", arr)
    r = run_cli(
        "cryosparc", "--csFile", "in.cs", "--output_csFile", "out.cs",
        "--assignExposureGroupPerMicrograph", "1",
        "--changePixelSize", "2.4", "--verbose", "0",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    out = read_cs(tmp_path / "out.cs")
    assert len(out) == n
    assert len(np.unique(out["ctf/exp_group_id"])) == 3
    assert out["blob/psize_A"][0] == pytest.approx(2.4)
    assert out["ctf/df1_A"][0] == pytest.approx(48000.0)  # scaled by (2x)^2


@pytest.mark.slow
def test_cli_denovo3d_batch_all_images(tmp_path):
    """--imageIndex 0 = every image in the stack: per-image outputs plus
    a combined .batch.json summary."""
    import json

    from helicon_tpu.helix import simulate_helical_projection

    imgs = [
        np.squeeze(np.asarray(simulate_helical_projection(
            n=1, twist=tw, rise=6.0, csym=1, helical_diameter=40.0,
            ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=48,
            apix=2.0, rng=0,
        ))).astype(np.float32)
        for tw in (30.0, 40.0)
    ]
    write_mrc(tmp_path / "cls.mrcs", np.stack(imgs), apix=2.0)
    r = run_cli(
        "denovo3d_cli", "cls.mrcs", "batch",
        "--imageIndex", "0",
        "--apix", "2.0",
        "--twist", "30", "40", "10",
        "--rise", "6.0", "6.0", "1.0",
        "--cgIters", "8", "--fistaIters", "6",
        "--horizontalize", "0", "--verbose", "0",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    summaries = json.loads((tmp_path / "batch.batch.json").read_text())
    assert [s["image_index"] for s in summaries] == [1, 2]
    assert (tmp_path / "batch_001.csv").exists()
    assert (tmp_path / "batch_002.csv").exists()
    # each image's own twist wins its search
    assert summaries[0]["best_twist"] == 30.0
    assert summaries[1]["best_twist"] == 40.0


@pytest.mark.slow
def test_cli_denovo3d_rejects_mixed_zero_index(tmp_path):
    """0 mixed with other indices is ambiguous and must fail with a
    clear message, not an IndexError mid-batch."""
    from helicon_tpu.helix import simulate_helical_projection

    img = np.squeeze(np.asarray(simulate_helical_projection(
        n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
        ball_radius=5.0, polymer=0, planarity=1.0, ny=32, nx=48,
        apix=2.0, rng=0,
    ))).astype(np.float32)
    write_mrc(tmp_path / "cls.mrc", img[None], apix=2.0)
    r = run_cli(
        "denovo3d_cli", "cls.mrc", "out", "--imageIndex", "0", "2",
        "--apix", "2.0", "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode != 0
    assert "1-based" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_cli_repeated_append_options_each_apply(tmp_path, relion_df):
    """CLI-order-is-execution-order: every occurrence of an append
    option consumes ITS OWN value (a non-append --breakFilaments once
    replayed only the last value at every position)."""
    df = relion_df.copy()
    df.attrs["convention"] = "relion"
    touch_stacks(tmp_path, df)
    dataframe2file(df, str(tmp_path / "in.star"))
    r = run_cli(
        "images2star", "in.star", "out.star",
        "--breakFilaments", "maxSegments=4",
        "--breakFilaments", "maxSegments=2",
        "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    from helicon_tpu.io.metadata import star2dataframe

    out = star2dataframe(tmp_path / "out.star")
    # the SECOND occurrence (maxSegments=2) must have applied last
    assert out.groupby("rlnHelicalTubeID").size().max() <= 2
    # reference breakfilaments.py enumerates new tube IDs from 0
    assert int(out["rlnHelicalTubeID"].min()) == 0


@pytest.mark.slow
def test_cli_split_after_filtering_op(tmp_path, relion_df):
    """--select then --splitNumSets by micrograph: the split must handle
    the filtered (non-RangeIndex) frame and carry the LIVE optics."""
    df = relion_df.copy()
    df.attrs["convention"] = "relion"
    touch_stacks(tmp_path, df)
    dataframe2file(df, str(tmp_path / "in.star"))
    r = run_cli(
        "images2star", "in.star", "out.star",
        "--select", "rlnHelicalTubeID", "1,2",
        "--splitNumSets", "2", "--splitMode", "micrograph",
        "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    from helicon_tpu.io.metadata import star2dataframe

    s0 = star2dataframe(tmp_path / "out.subset-0.star")
    s1 = star2dataframe(tmp_path / "out.subset-1.star")
    assert len(s0) + len(s1) == len(df)
    # per-micrograph granularity preserved
    assert set(s0["rlnMicrographName"]).isdisjoint(set(s1["rlnMicrographName"]))


@pytest.mark.slow
def test_cli_proc3d_output_flag_form(tmp_path):
    """--outputMapFile (the flag form) must work: the dispatcher once
    treated the flag as an unknown plugin option and crashed."""
    vol = np.zeros((8, 8, 8), np.float32)
    vol[2:6, 2:6, 2:6] = 1.0
    write_mrc(tmp_path / "in.mrc", vol, apix=2.0)
    r = run_cli(
        "proc3d", "in.mrc", "--outputMapFile", "out.mrc",
        "--apix", "1.5", "--verbose", "0", cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "out.mrc").exists()


@pytest.mark.slow
def test_cli_abbreviated_option_resolves(tmp_path):
    """argparse accepts --sortb for --sortby; the execution plan must
    carry the FULL name instead of crashing mid-pipeline."""
    df = pd.DataFrame({
        "rlnImageName": [f"{i+1:06d}@s.mrcs" for i in range(3)],
        "rlnDefocusU": [3.0, 1.0, 2.0],
    })
    dataframe2file(df, str(tmp_path / "in.star"))
    touch_stacks(tmp_path, df)
    r = run_cli("images2star", "in.star", "out.star", "--sortb",
                "rlnDefocusU", cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    from helicon_tpu.io.metadata import star2dataframe

    out = star2dataframe(str(tmp_path / "out.star"),
                         ignore_bad_particle_path=2)
    assert out["rlnDefocusU"].tolist() == [1.0, 2.0, 3.0]


@pytest.mark.slow
def test_cli_split_respects_output_directory(tmp_path):
    """--splitNumSets subset files must land in the requested output
    directory (bare .stem dropped it), and a micrographs-only input
    (no rlnImageName) must not crash the per-subset sort."""
    df = pd.DataFrame({
        "rlnMicrographName": [f"m{i%4}.mrc" for i in range(8)],
        "rlnDefocusU": np.arange(8.0),
    })
    dataframe2file(df, str(tmp_path / "in.star"))
    (tmp_path / "results").mkdir()
    r = run_cli("images2star", "in.star", "results/out.star",
                "--splitNumSets", "2", "--splitMode", "micrograph",
                "--ignoreBadMicrographPath", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    subs = sorted((tmp_path / "results").glob("out.subset-*.star"))
    assert len(subs) == 2, list(tmp_path.iterdir())
    assert not list(tmp_path.glob("out.subset-*.star"))  # not in CWD


@pytest.mark.slow
def test_cli_cryosparc_passthrough_nan_first_row_still_decodes(tmp_path):
    """A left-merged passthrough can leave NaN at row 0 of a bytes column
    (uid missing from the passthrough); bytes detection must key on the
    first NON-NULL value or the column stays bytes and the .cs writer
    emits str(b'...') artifacts."""
    from helicon_tpu.io.cs import read_cs, write_cs

    n = 4
    arr = np.zeros(
        n,
        dtype=[
            ("uid", "<u8"), ("blob/path", "S20"), ("blob/psize_A", "<f4"),
        ],
    )
    arr["uid"] = [10, 11, 12, 13]
    arr["blob/path"] = b"J1/stack.mrcs"
    arr["blob/psize_A"] = 1.2
    write_cs(tmp_path / "J1_particles.cs", arr)

    # passthrough MISSING uid 10 (the first row) with a bytes column
    pt = np.zeros(
        n - 1,
        dtype=[("uid", "<u8"), ("location/micrograph_path", "S20")],
    )
    pt["uid"] = [11, 12, 13]
    pt["location/micrograph_path"] = [b"m1.mrc", b"m2.mrc", b"m3.mrc"]
    write_cs(tmp_path / "J1_passthrough_particles.cs", pt)

    r = run_cli(
        "cryosparc", "--csFile", "J1_particles.cs",
        "--output_csFile", "out.cs",
        "--changePixelSize", "2.4", "--verbose", "0",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr
    out = read_cs(tmp_path / "out.cs")
    paths = [v.decode() for v in out["location/micrograph_path"]]
    # matched rows decoded cleanly — no str(b'...') round-trip artifacts
    assert "m1.mrc" in paths and not any(p.startswith("b'") for p in paths)
