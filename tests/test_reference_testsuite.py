"""Run the REFERENCE project's own test files against the drop-in
``helicon`` compat package.

This is the strongest drop-in-parity evidence we can automate: the
reference's tests import ``helicon.*`` / ``helicon.plugins.*`` /
``helicon.commands.*`` directly, patch helpers by reference module
paths, and assert the reference's behavioral contracts. Everything that
can run in this environment must pass unchanged.

The subprocess runs with ``tests/_ref_shims`` on PYTHONPATH: functional
``starfile``/``mrcfile`` shims backed by the native codecs, so reference
tests that build fixtures through those packages (absent here) run for
real, and tests that patch ``starfile.read``/``mrcfile.open`` hit the
same seams the production compat code binds to.

Deselected tests (environment, not parity — each verified by hand on
2026-08-18):
- network access (EMDB/EMPIAR downloads): zero-egress environment
- the external ``plotly`` package: not installed here; the reference's
  figure-builder tests construct real plotly FigureWidgets
- CUDA GPU checks: TPU environment
- os.chmod-based read-only checks: the suite runs as root, where
  os.access(W_OK) is always true (the reference fails these as root too)
- TestSymmetrizeTransformMap.test_returns_3d_array: asserts that the
  reference's implementation RAISES on valid input (an incidental
  failure mode of its apply_helical_symmetry call); ours succeeds —
  a documented improvement, not a regression
"""

import subprocess
import sys
from pathlib import Path

import pytest

REF_TESTS = Path("/root/reference/tests")

pytestmark = pytest.mark.skipif(
    not REF_TESTS.is_dir(), reason="reference checkout not available"
)

FILES = [
    "test_analysis.py",
    "test_angular_property.py",
    "test_curvelet.py",
    "test_cryosparc.py",
    "test_dataset.py",
    "test_denovo3D_pipeline.py",
    "test_denovo3D_solver.py",
    "test_denovo3D_utils.py",
    "test_emdb_mirror.py",
    "test_filters.py",
    "test_groups.py",
    "test_HOM_containerC.py",
    "test_images2star.py",
    "test_integration_relion5.py",
    "test_io.py",
    "test_point_group.py",
    "test_proc3d.py",
    "test_shiny.py",
    "test_symmetry_mismatch.py",
    "test_transforms.py",
    "test_util.py",
    "test_whereIsMyClass_compute.py",
]

DESELECT = [
    # network
    "test_analysis.py::TestAnalysis::test_is_amyloid",
    "test_dataset.py::TestDataset::test_get_emdb_map_file",
    "test_dataset.py::TestDataset::test_amyloid_atlas_ids",
    # plotly package (the reference builds real FigureWidgets)
    "test_whereIsMyClass_compute.py::TestPlotMicrograph",
    "test_whereIsMyClass_compute.py::TestMarkClassesOnHelices",
    "test_whereIsMyClass_compute.py::TestDrawDistanceMeasurement",
    "test_whereIsMyClass_compute.py::TestPlotHistogram",
    # CUDA GPU
    "test_curvelet.py::TestUDCTGPU::test_gpu_available",
    # running as root defeats the chmod-based scenario
    "test_emdb_mirror.py::TestEMDBMirror::test_mirror_priority_logic",
    # asserts the reference's incidental raise; ours succeeds
    "test_denovo3D_utils.py::TestSymmetrizeTransformMap::test_returns_3d_array",
    # pins the reference's missing dataframe_relion_to_cryosparc (its
    # dataframe_convert raises NameError on target="cryosparc"); our
    # implementation performs the conversion (documented improvement,
    # io/metadata.py)
    "test_io.py::TestIo::test_dataframe_convert",
]


@pytest.mark.slow
def test_reference_suite_passes_against_compat_package(tmp_path):
    work = tmp_path / "reftests"
    work.mkdir()
    for f in FILES:
        src = REF_TESTS / f
        if not src.exists():  # reference snapshot drift: skip the file
            continue
        (work / f).write_text(src.read_text())
    # force the CPU backend before any jax use: the bare JAX_PLATFORMS
    # env var is ignored by the axon TPU plugin (tests/conftest.py has
    # the same guard)
    conftest = (REF_TESTS / "conftest.py").read_text()
    (work / "conftest.py").write_text(
        'import jax; jax.config.update("jax_platforms", "cpu")\n' + conftest
    )
    cmd = [
        sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
        *(f for f in FILES if (work / f).exists()),
    ]
    for d in DESELECT:
        cmd += ["--deselect", d]
    # the compat ``helicon`` package is imported from the repo root (it
    # is not pip-installed); the subprocess runs from tmp_path, so the
    # root must be on PYTHONPATH explicitly
    import os

    repo_root = str(Path(__file__).resolve().parents[1])
    shims = str(Path(__file__).resolve().parent / "_ref_shims")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, shims, env.get("PYTHONPATH", "")) if p
    )
    proc = subprocess.run(
        cmd, cwd=work, env=env, capture_output=True, text=True, timeout=1500
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, f"reference tests failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert " passed" in proc.stdout, tail
