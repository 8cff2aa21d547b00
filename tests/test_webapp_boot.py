"""Functional web-app boot + end-to-end drive tests (VERDICT r2 #4).

The apps run on the test-only functional shiny shim
(tests/_ref_shims/shiny): import builds the page and registers the
reactive graph; tests then drive input -> effects -> grid search ->
sorted display -> abort, in-process. Reference bar: upstream boots the
apps under shiny.pytest + Playwright
(/root/reference/tests/test_denovo3D_app.py:10-18).
"""

import importlib
import sys
import time
from pathlib import Path

import numpy as np
import pytest

SHIMS = str(Path(__file__).resolve().parent / "_ref_shims")

APP_MODULES = (
    "helicon_tpu.webApps.denovo3D.app",
    "helicon_tpu.webApps.whereIsMyClass.app",
)


def _purge():
    for mod in list(sys.modules):
        if (
            mod in ("shiny", "shinywidgets", "plotly")
            or mod.startswith(("shiny.", "plotly."))
            or mod in APP_MODULES
        ):
            sys.modules.pop(mod)


@pytest.fixture()
def shiny_shim(monkeypatch):
    monkeypatch.syspath_prepend(SHIMS)
    _purge()
    import shiny

    shiny.get_session().reset()
    yield shiny
    _purge()


def _fake_class_average(ny=48, nx=96):
    from helicon_tpu.helix import simulate_helical_projection

    img = np.squeeze(
        np.asarray(
            simulate_helical_projection(
                n=1, twist=30.0, rise=6.0, csym=1, helical_diameter=40.0,
                ball_radius=5.0, polymer=0, planarity=1.0, ny=ny, nx=nx,
                apix=2.0, rng=0,
            )
        )
    ).astype(np.float32)
    return img


def _boot_denovo3d(shiny_shim, monkeypatch, **grid_overrides):
    """Import the denovo3D app on the shim with a synthetic default-URL
    ingest and a bounded iteration budget for the grid worker."""
    import helicon_tpu.webApps.denovo3D.pipeline as pipeline
    import helicon_tpu.webApps.denovo3D.workflow as workflow

    img = _fake_class_average()
    monkeypatch.setattr(
        pipeline, "get_images_from_url", lambda url: (img[None], 2.0)
    )
    real_run = workflow.run_grid_incremental

    def bounded_run(image, apix, twists, rises, **kwargs):
        kwargs.setdefault("cg_iters", 16)
        kwargs.setdefault("fista_iters", 32)
        kwargs.setdefault("power_iters", 2)
        kwargs.update(grid_overrides)
        return real_run(image, apix, twists, rises, **kwargs)

    monkeypatch.setattr(workflow, "run_grid_incremental", bounded_run)
    app = importlib.import_module("helicon_tpu.webApps.denovo3D.app")
    return app, shiny_shim.get_session()


class TestDenovo3DBoot:
    def test_page_builds_and_ingests_default_url(self, shiny_shim, monkeypatch):
        app, s = _boot_denovo3d(shiny_shim, monkeypatch)
        # sidebar inputs registered with their defaults
        for key in ("input_mode_images", "twist_range", "rise_range",
                    "score_metric", "run_denovo3D", "abort"):
            assert key in s.inputs, key
        assert s.inputs["input_mode_images"] == "url"
        # initial effect pass ingested the (faked) default URL
        assert app.all_images.get() is not None
        assert app.selected_indices.get() == [0]
        assert len(app.transformed_images.get()) == 1
        # renderers execute against live state
        gallery = s.render("image_gallery_ui")
        assert gallery is not None and "Click to select" in gallery.text()
        assert s.render("transformed_preview") is not None
        assert "Press Run" in s.render("progress_table").text()
        assert not s.errors, s.errors

    def test_transform_chain_reacts(self, shiny_shim, monkeypatch):
        app, s = _boot_denovo3d(shiny_shim, monkeypatch)
        base = app.transformed_images.get()[0].copy()
        s.set_input("img_negate", True)
        negated = app.transformed_images.get()[0]
        assert negated.shape[0] == base.shape[1] or negated.shape == base.shape
        # reset restores defaults through ui.update_* write-backs
        s.press("reset_transform")
        assert s.inputs["img_negate"] is False
        assert not s.errors, s.errors

    def test_grid_search_end_to_end(self, shiny_shim, monkeypatch):
        app, s = _boot_denovo3d(shiny_shim, monkeypatch)
        s.set_input("twist_range", (25.0, 35.0))
        s.set_input("twist_step", 5.0)
        s.set_input("rise_range", (5.0, 7.0))
        s.set_input("rise_step", 1.0)
        s.set_input("handedness", "right")
        s.press("run_denovo3D")  # sync_tasks: runs the grid to completion
        res = app.grid_result.get()
        assert res is not None and res.best_volume is not None
        # incremental progress reached the UI: ranked rows render
        table = s.render("progress_table")
        assert "candidates scored" in table.text()
        best = s.render("best_result")
        assert best is not None and "Best: twist=" in best.text()
        # the truth (twist 30, rise 6, pitch 72 A) wins on this synthetic
        # image up to the classic helical ambiguity: (25,5)/(30,6)/(35,7)
        # share the pitch and are indistinguishable from one projection,
        # so assert the recovered PITCH, not the exact pair
        best_t = float(res.twists[res.best_index])
        best_r = float(res.rises[res.best_index])
        assert 360.0 / best_t * best_r == pytest.approx(72.0)
        assert not s.errors, s.errors

    def test_invalid_steps_notify_instead_of_crashing(
        self, shiny_shim, monkeypatch
    ):
        app, s = _boot_denovo3d(shiny_shim, monkeypatch)
        s.set_input("twist_step", 0.0)
        s.press("run_denovo3D")
        assert any("must be positive" in msg for _, msg in s.notifications)
        assert app.grid_result.get() is None
        assert not s.errors, s.errors

    def test_abort_mid_search(self, shiny_shim, monkeypatch):
        app, s = _boot_denovo3d(
            shiny_shim, monkeypatch, batch_size=1, cg_iters=40, fista_iters=40
        )
        s.sync_tasks = False  # run the extended task on its thread
        s.set_input("twist_range", (5.0, 44.0))
        s.set_input("twist_step", 1.0)
        s.set_input("rise_range", (4.0, 6.0))
        s.set_input("rise_step", 0.5)
        s.set_input("handedness", "right")
        s.press("run_denovo3D")
        deadline = time.time() + 120
        while app.grid_progress.get() is None and time.time() < deadline:
            time.sleep(0.2)
        assert app.grid_progress.get() is not None, "no progress before deadline"
        s.press("abort")
        app.reconstruction_task.join(timeout=120)
        snap = app.grid_progress.get()
        assert snap is not None and snap.aborted
        assert snap.done < snap.total
        assert not s.errors, s.errors


def _write_class2d_project(tmp_path):
    """RELION-style Class2D job dir: run_it025_data.star + classes.mrcs."""
    import pandas as pd

    from helicon_tpu.io.metadata import dataframe2file
    from helicon_tpu.io.mrc import write_mrc

    job = tmp_path / "Class2D" / "job042"
    job.mkdir(parents=True)
    classes = np.stack(
        [_fake_class_average(32, 32), np.zeros((32, 32), np.float32)]
    )
    write_mrc(job / "run_it025_classes.mrcs", classes, apix=2.0)
    rows = []
    for tube in (1, 2):
        for seg in range(4):
            rows.append(
                dict(
                    rlnImageName=f"{len(rows) + 1:06d}@parts.mrcs",
                    rlnMicrographName="mic_0001.mrc",
                    rlnHelicalTubeID=tube,
                    rlnHelicalTrackLengthAngst=seg * 50.0,
                    rlnClassNumber=1,
                    rlnCoordinateX=100.0 + 10 * seg,
                    rlnCoordinateY=200.0 + 10 * tube,
                    rlnAnglePsi=15.0,
                    rlnDetectorPixelSize=5.0,
                    rlnMagnification=10000.0,
                )
            )
    df = pd.DataFrame(rows)
    df.attrs["convention"] = "relion"
    star = job / "run_it025_data.star"
    dataframe2file(df, str(star))
    return star


class TestWhereIsMyClassBoot:
    def test_page_builds(self, shiny_shim):
        app = importlib.import_module("helicon_tpu.webApps.whereIsMyClass.app")
        s = shiny_shim.get_session()
        for key in ("param_path", "load_param_path", "sort_abundance",
                    "target_apix", "rise", "bins"):
            assert key in s.inputs, key
        assert app.params.get() is None
        assert not s.errors, s.errors

    def test_load_and_display_classes(self, shiny_shim, tmp_path):
        star = _write_class2d_project(tmp_path)
        app = importlib.import_module("helicon_tpu.webApps.whereIsMyClass.app")
        s = shiny_shim.get_session()
        s.set_input("param_path", str(star))
        s.press("load_param_path")
        df = app.params.get()
        assert df is not None and "helixID" in df.columns
        assert app.data_all.get() is not None
        # blank class 2 filtered; class 1 displayed with abundance 8
        assert app.displayed_class_ids.get() == [0]
        assert int(app.abundance.get()[0]) == 8
        # clicking the first displayed class selects class id 0
        s.set_input("select_class", 0)
        assert app.selected_class_ids.get() == [0]
        assert not s.errors, s.errors

    def test_missing_path_shows_modal(self, shiny_shim, tmp_path):
        app = importlib.import_module("helicon_tpu.webApps.whereIsMyClass.app")
        s = shiny_shim.get_session()
        s.set_input("param_path", str(tmp_path / "nope.star"))
        s.press("load_param_path")
        assert s.modals, "expected a file-not-found modal"
        assert app.params.get() is None
        assert not s.errors, s.errors

    def test_micrograph_figure_path(self, shiny_shim, tmp_path):
        """The plotly branch (shinywidgets + plotly shims): helix row
        selection loads the micrograph, builds the heatmap figure, class
        markers overlay, and two clicks measure a distance."""
        from helicon_tpu.io.mrc import write_mrc

        star = _write_class2d_project(tmp_path)
        rng = np.random.default_rng(0)
        write_mrc(
            tmp_path / "mic_0001.mrc",
            rng.standard_normal((64, 64)).astype(np.float32),
            apix=5.0,
        )
        app = importlib.import_module("helicon_tpu.webApps.whereIsMyClass.app")
        assert app._HAS_WIDGETS, "shinywidgets shim not active"
        s = shiny_shim.get_session()
        s.set_input("param_path", str(star))
        s.press("load_param_path")
        s.set_input("select_class", 0)
        s.set_input("helices_table_selected_rows", (0,))
        assert app.displayed_micrograph_data.get() is not None
        fig = s.render("display_micrograph")
        assert fig is not None and fig.data[0]._kind == "heatmap"
        # class markers: the selection handler pre-checked the classes
        assert s.inputs["marked_helices_classes"]
        s.set_input(
            "marked_helices_classes", s.inputs["marked_helices_classes"]
        )
        marked = [d for d in fig.data if d.name.startswith("class_")]
        assert marked, [d.name for d in fig.data]
        # two clicks measure a distance; the readout reports it
        class _Pts:
            xs = [10.0]
            ys = [20.0]

        fig.data[0]._fire_click(_Pts)

        class _Pts2:
            xs = [40.0]
            ys = [60.0]

        fig.data[0]._fire_click(_Pts2)
        assert any(d.name == "distance_line" for d in fig.data)
        assert "measured distance: 50.0" in s.render("distance_readout")
        hist = s.render("pair_distance_histogram")
        assert hist is not None and hist.data[0]._kind == "bar"
        assert not s.errors, s.errors
