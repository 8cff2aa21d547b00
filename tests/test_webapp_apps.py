"""Web-app shell tests.

Structure (AST) checks always run; boot tests are skip-gated on the
optional `shiny` extra exactly like the reference's Playwright suite
(reference tests/test_denovo3D_app.py); plotly figure-builder tests are
skip-gated on plotly.
"""

import ast
import pathlib

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1] / "helicon_tpu" / "webApps"

try:
    import shiny  # noqa: F401

    HAS_SHINY = True
except ImportError:
    HAS_SHINY = False

try:
    import plotly  # noqa: F401

    HAS_PLOTLY = True
except ImportError:
    HAS_PLOTLY = False


def _source(app):
    return (ROOT / app / "app.py").read_text()


def _parses(app):
    ast.parse(_source(app))


class TestDenovo3DAppStructure:
    def test_parses(self):
        _parses("denovo3D")

    def test_input_modes_present(self):
        src = _source("denovo3D")
        # reference app.py:136-214 workflow surface
        for token in [
            "input_mode_images", "upload_images", "url_images", "emdb_id",
            "randomize_emdb_id", "URLS[DEFAULT_URL_KEY]",
        ]:
            assert token in src, token

    def test_transform_chain_present(self):
        src = _source("denovo3D")
        for token in [
            "img_negate", "img_transpose", "img_flip", "threshold",
            "pre_rotation", "shift_y", "vertical_crop_size",
            "horizontal_crop_size", "auto_transform", "reset_transform",
            "apply_transform_chain", "stitch_x_offsets",
            "combine_images_for_display",
        ]:
            assert token in src, token

    def test_incremental_run_present(self):
        src = _source("denovo3D")
        for token in [
            "run_denovo3D", "abort", "run_grid_incremental",
            "reactive.extended_task", "ui.Progress", "grid_progress",
            "refine_tilt_psi_dy_range", "score_metric", "fsc_test",
            "clear_cache",
        ]:
            assert token in src, token


class TestWhereIsMyClassAppStructure:
    def test_parses(self):
        _parses("whereIsMyClass")

    def test_interactions_present(self):
        src = _source("whereIsMyClass")
        # reference app.py:513-655 interaction surface
        for token in [
            "get_micrograph", "mark_classes_on_helices",
            "draw_distance_measurement", "marked_helices_classes",
            "select_all_marked_helices_classes",
            "unselect_all_marked_helices_classes", "plot_histogram",
            "show_pitch_twist", "first_point", "second_point",
            "sort_abundance", "ignore_blank", "helices_table",
        ]:
            assert token in src, token


@pytest.mark.skipif(not HAS_SHINY, reason="shiny extra not installed")
class TestAppBoot:
    """create_app_fixture-style boot tests (reference test_denovo3D_app.py)."""

    def test_denovo3d_app_imports(self):
        import importlib

        importlib.import_module("helicon_tpu.webApps.denovo3D.app")

    def test_whereismyclass_app_imports(self):
        import importlib

        importlib.import_module("helicon_tpu.webApps.whereIsMyClass.app")


@pytest.mark.skipif(not HAS_PLOTLY, reason="plotly not installed")
class TestPlotlyBuilders:
    """Drive the figure mutators the app's reactive handlers call."""

    def test_mark_classes_roundtrip(self):
        from helicon_tpu.webApps.whereIsMyClass import compute

        fig = compute.plot_micrograph(np.zeros((8, 8), np.float32), "t", 1.0)
        xys = {(1, 2): dict(x=np.array([1.0, 2.0]), y=np.array([3.0, 4.0]))}
        compute.mark_classes_on_helices(fig, xys, marker_size=5)
        names = [d.name for d in fig.data]
        assert "class_2" in names
        compute.mark_classes_on_helices(fig, {}, marker_size=5)
        assert all(not d.name.startswith("class_") for d in fig.data)

    def test_distance_measurement_roundtrip(self):
        from helicon_tpu.webApps.whereIsMyClass import compute

        fig = compute.plot_micrograph(np.zeros((8, 8), np.float32), "t", 1.0)
        compute.draw_distance_measurement(fig, (0.0, 0.0), (3.0, 4.0))
        assert any(d.name == "distance_line" for d in fig.data)
        compute.draw_distance_measurement(fig, None, None)
        assert all(d.name != "distance_line" for d in fig.data)


def test_apps_use_shiny_express_ui():
    """Express-style pages MUST import ui from shiny.express — core
    shiny.ui has no page_opts and its containers are not context
    managers, so the apps crashed at launch with shiny installed."""
    import pathlib

    for app in (
        "helicon_tpu/webApps/denovo3D/app.py",
        "helicon_tpu/webApps/whereIsMyClass/app.py",
    ):
        src = pathlib.Path(app).read_text()
        assert "from shiny.express import" in src and " ui" in src.split(
            "from shiny.express import", 1
        )[1].split("\n")[0], app
        # no Express container may rely on core shiny.ui
        assert "from shiny import reactive, render, req, ui" not in src, app
