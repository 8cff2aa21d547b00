"""whereIsMyClass compute-layer tests, modeled on the reference's
tests/test_whereIsMyClass_compute.py (47 tests): project layout
inference, filament lengths, class selection, pair distances, abundance,
XYZ projections, star/cs ingest, plotly builders (skipped when plotly is
absent).
"""

import numpy as np
import pandas as pd
import pytest

from helicon_tpu.webApps.whereIsMyClass import compute


class TestGetProjectRootDir:
    def test_star_file(self):
        p = compute.get_project_root_dir(
            "/proj/Class2D/job042/run_it025_data.star"
        )
        assert str(p) == "/proj"

    def test_cs_file(self):
        p = compute.get_project_root_dir("/proj/J42/particles.cs")
        assert str(p) == "/proj"

    def test_unknown_extension_returns_none(self):
        # reference compute.py:16-24 returns None, not an exception
        assert compute.get_project_root_dir("/proj/whatever.xyz") is None


class TestGetClassFile:
    def test_star_file_class2d(self):
        f = compute.get_class_file("/proj/Class2D/job042/run_it025_data.star")
        assert str(f).endswith("run_it025_classes.mrcs")

    def test_cs_file(self):
        f = compute.get_class_file("/proj/J42/J42_020_particles.cs")
        assert str(f).endswith("class_averages.mrc")

    def test_unknown_extension_returns_none(self):
        assert compute.get_class_file("/proj/whatever.xyz") is None


def _helices(n_tubes=2, n_seg=4, cls=1):
    rows = []
    for tube in range(1, n_tubes + 1):
        for seg in range(n_seg):
            rows.append(
                dict(
                    rlnImageName=f"{len(rows) + 1:06d}@s.mrcs",
                    rlnMicrographName="m1.mrc",
                    rlnHelicalTubeID=tube,
                    rlnHelicalTrackLengthAngst=47.5 * seg,
                    rlnClassNumber=cls,
                    rlnCoordinateX=100.0 + 47.5 * seg,
                    rlnCoordinateY=100.0 * tube,
                    rlnAnglePsi=10.0,
                )
            )
    return pd.DataFrame(rows)


class TestFilamentLength:
    def test_basic_length(self):
        df = _helices(1, 4)
        helices = list(df.groupby(["rlnMicrographName", "rlnHelicalTubeID"]))
        lengths = compute.get_filament_length(helices)
        assert lengths[0] == pytest.approx(47.5 * 3)

    def test_multiple_helices(self):
        df = _helices(3, 4)
        helices = list(df.groupby(["rlnMicrographName", "rlnHelicalTubeID"]))
        lengths = compute.get_filament_length(helices)
        assert len(lengths) == 3

    def test_with_particle_box_length(self):
        df = _helices(1, 4)
        helices = list(df.groupby(["rlnMicrographName", "rlnHelicalTubeID"]))
        l0 = compute.get_filament_length(helices)[0]
        l1 = compute.get_filament_length(helices, particle_box_length=100.0)[0]
        assert l1 == pytest.approx(l0 + 100.0)


class TestSelectClasses:
    # class_indices are 0-BASED (reference compute.py:76-82); returns
    # the (micrograph, tube) groupby list of the selected particles
    def test_selects_single_class(self):
        df = pd.concat([_helices(cls=1), _helices(cls=2)], ignore_index=True)
        groups = compute.select_classes(df, [0])
        sel = pd.concat([g for _, g in groups])
        assert set(sel["rlnClassNumber"]) == {1}

    def test_selects_multiple_classes(self):
        df = pd.concat(
            [_helices(cls=1), _helices(cls=2), _helices(cls=3)], ignore_index=True
        )
        groups = compute.select_classes(df, [0, 2])
        sel = pd.concat([g for _, g in groups])
        assert set(sel["rlnClassNumber"]) == {1, 3}

    def test_empty_when_no_match(self):
        groups = compute.select_classes(_helices(cls=1), [8])
        assert len(groups) == 0


class TestSelectHelicesFromHelixID:
    def test_selects_ids(self):
        df = _helices(3, 4)
        df["helixID"] = df["rlnHelicalTubeID"]
        groups = compute.select_helices_from_helixID(df, [2])
        sel = pd.concat([g for _, g in groups])
        assert set(sel["rlnHelicalTubeID"]) == {2}
        groups = compute.select_helices_from_helixID(df, [1, 3])
        sel = pd.concat([g for _, g in groups])
        assert set(sel["rlnHelicalTubeID"]) == {1, 3}


class TestComputePairDistances:
    def test_returns_sorted_distances(self):
        df = _helices(1, 4)
        helices = list(df.groupby(["rlnMicrographName", "rlnHelicalTubeID"]))
        d, min_len = compute.compute_pair_distances(helices)
        assert len(d) > 0
        assert list(d) == sorted(d)

    def test_pair_count_one_helix(self):
        df = _helices(1, 4)
        helices = list(df.groupby(["rlnMicrographName", "rlnHelicalTubeID"]))
        d, _ = compute.compute_pair_distances(helices)
        assert len(d) == 6  # C(4,2) same-class same-polarity pairs

    def test_opposite_polarity_excluded(self):
        df = _helices(1, 4)
        df.loc[df.index[:2], "rlnAnglePsi"] = 190.0  # flipped segments
        helices = list(df.groupby(["rlnMicrographName", "rlnHelicalTubeID"]))
        d, _ = compute.compute_pair_distances(helices)
        assert len(d) == 2  # only the 2 same-polarity pairs remain

    def test_empty_input_returns_empty(self):
        d, min_len = compute.compute_pair_distances([])
        assert len(d) == 0 and min_len == 0


class TestEstimateInterSegmentDistance:
    def test_returns_median_distance(self):
        df = _helices(2, 4)
        d = compute.estimate_inter_segment_distance(df)
        assert d == pytest.approx(47.5, rel=0.05)

    def test_single_segment_raises(self):
        df = _helices(1, 1)
        with pytest.raises(Exception):
            compute.estimate_inter_segment_distance(df)


class TestGetClassAbundance:
    def test_counts_correctly(self):
        df = pd.concat([_helices(cls=1), _helices(1, 4, cls=3)], ignore_index=True)
        ab = compute.get_class_abundance(df, 3)
        assert ab[0] == 8 and ab[1] == 0 and ab[2] == 4

    def test_more_classes_than_data(self):
        ab = compute.get_class_abundance(_helices(cls=1), 10)
        assert len(ab) == 10 and ab[0] == 8

    def test_empty_input(self):
        ab = compute.get_class_abundance(_helices(cls=1).head(0), 3)
        assert (np.asarray(ab) == 0).all()


class TestXyzProjections:
    def test_returns_2d_image(self):
        vol = np.random.default_rng(0).random((16, 16, 16)).astype(np.float32)
        img = compute.get_one_map_xyz_projects(vol, 16)
        assert img.ndim == 2

    def test_sheet_shape_and_normalized_input(self):
        vol = np.random.default_rng(0).random((16, 16, 16)).astype(np.float32)
        img = np.asarray(compute.get_one_map_xyz_projects(vol, 16))
        assert img.shape == (16, 16 * 3 + 2)
        # panels built from min-max normalized data: bounded by nx
        assert img.min() >= 0 and img.max() <= 16 + 1e-3

    def test_constant_data_no_divide_by_zero(self):
        vol = np.full((16, 16, 16), 3.0, np.float32)
        img = np.asarray(compute.get_one_map_xyz_projects(vol, 16))
        assert np.isfinite(img).all()


class TestStarToDataframe:
    def test_returns_dataframe_with_optics(self, tmp_path):
        from helicon_tpu.io.metadata import dataframe2star

        df = _helices()
        df.attrs["optics"] = pd.DataFrame(
            [dict(rlnOpticsGroup=1, rlnOpticsGroupName="opticsGroup1",
                  rlnImagePixelSize=1.0, rlnVoltage=300.0,
                  rlnSphericalAberration=2.7, rlnAmplitudeContrast=0.1)]
        )
        df["rlnOpticsGroup"] = 1
        dataframe2star(df, tmp_path / "c2d.star")
        out = compute.star_to_dataframe(tmp_path / "c2d.star")
        assert len(out) == len(df)
        assert "optics" in out.attrs

    def test_raises_on_missing_optics(self, tmp_path):
        from helicon_tpu.io.star import write_star

        write_star(tmp_path / "bad.star", {"particles": _helices()})
        with pytest.raises(Exception):
            compute.star_to_dataframe(tmp_path / "bad.star")


def _cs_fixture(tmp_path, uid_base=0):
    from helicon_tpu.io.cs import write_cs

    n = 8
    arr = np.zeros(
        n,
        dtype=[
            ("uid", "<u8"),
            ("blob/idx", "<u4"),
            ("blob/path", "S30"),
            ("filament/filament_uid", "<u8"),
            ("filament/arc_length_A", "<f4"),
            ("alignments2D/class", "<u4"),
            ("alignments2D/pose", "<f4"),
            ("location/center_x_frac", "<f4"),
            ("location/center_y_frac", "<f4"),
            ("location/micrograph_shape", "<u4", (2,)),
        ],
    )
    arr["uid"] = np.arange(n) + 1
    arr["blob/idx"] = np.arange(n)
    arr["blob/path"] = b"extract/m1.mrcs"
    arr["filament/filament_uid"] = uid_base + np.repeat([1, 2], 4)
    arr["filament/arc_length_A"] = np.tile(np.arange(4) * 47.5, 2)
    arr["alignments2D/class"] = 0
    arr["location/center_x_frac"] = 0.25
    arr["location/center_y_frac"] = 0.5
    arr["location/micrograph_shape"] = (4096, 5760)
    write_cs(tmp_path / "p.cs", arr)
    return tmp_path / "p.cs"


class TestCsToDataframe:
    def test_converts_to_dataframe(self, tmp_path):
        out = compute.cs_to_dataframe(_cs_fixture(tmp_path))
        assert len(out) == 8
        assert out["rlnImageName"].iloc[0] == "000001@extract/m1.mrcs"
        assert out["rlnCoordinateX"].iloc[0] == pytest.approx(0.25 * 5760)
        assert out["rlnCoordinateY"].iloc[0] == pytest.approx(0.5 * 4096)

    def test_rln_class_number_is_1_indexed(self, tmp_path):
        out = compute.cs_to_dataframe(_cs_fixture(tmp_path))
        assert (out["rlnClassNumber"] == 1).all()

    def test_global_uids_remapped_per_micrograph(self, tmp_path):
        out = compute.cs_to_dataframe(_cs_fixture(tmp_path, uid_base=10**12))
        assert sorted(out["rlnHelicalTubeID"].unique()) == [1, 2]

    def test_missing_required_attrs_raises(self, tmp_path):
        from helicon_tpu.io.cs import write_cs

        arr = np.zeros(2, dtype=[("uid", "<u8"), ("blob/idx", "<u4")])
        write_cs(tmp_path / "bad.cs", arr)
        with pytest.raises(ValueError):
            compute.cs_to_dataframe(tmp_path / "bad.cs")


class TestGetClass2dParamsFromFile:
    def test_accepts_cs_file(self, tmp_path):
        out = compute.get_class2d_params_from_file(str(_cs_fixture(tmp_path)))
        assert "rlnClassNumber" in out

    def test_rejects_unknown_extension(self):
        with pytest.raises(ValueError):
            compute.get_class2d_params_from_file("whatever.xyz")


@pytest.fixture()
def plotly_shim(monkeypatch):
    """Run the figure builders on the functional test shim when the real
    plotly is absent (tests/_ref_shims/plotly)."""
    import importlib
    import sys
    from pathlib import Path

    try:
        import plotly  # noqa: F401  (real package wins when present)
    except ImportError:
        monkeypatch.syspath_prepend(
            str(Path(__file__).resolve().parent / "_ref_shims")
        )
        for mod in [m for m in sys.modules if m.split(".")[0] == "plotly"]:
            sys.modules.pop(mod)
        importlib.import_module("plotly")
    yield
    for mod in [m for m in sys.modules if m.split(".")[0] == "plotly"]:
        sys.modules.pop(mod)


class TestPlotBuilders:
    def test_plot_micrograph(self, plotly_shim):
        fig = compute.plot_micrograph(
            np.zeros((8, 8), np.float32), "t", apix=1.0, plot_width=100
        )
        assert fig is not None
        assert fig.data[0].name == "image"

    def test_plot_histogram(self, plotly_shim):
        fig = compute.plot_histogram(
            [100.0, 200.0, 200.0], "t", "pair dist (Å)", "count"
        )
        assert fig is not None
        assert fig.data[0].name == "histogram"

    def test_markers_and_distance_roundtrip(self, plotly_shim):
        fig = compute.plot_micrograph(np.zeros((8, 8), np.float32), "t", 1.0)
        xys = {(1, 2): dict(x=np.array([1.0, 2.0]), y=np.array([3.0, 4.0]))}
        compute.mark_classes_on_helices(fig, xys, marker_size=5)
        assert any(d.name == "class_2" for d in fig.data)
        compute.mark_classes_on_helices(fig, {}, marker_size=5)
        assert all(not d.name.startswith("class_") for d in fig.data)
        compute.draw_distance_measurement(fig, (0.0, 0.0), (3.0, 4.0))
        assert any(d.name == "distance_line" for d in fig.data)
        compute.draw_distance_measurement(fig, None, None)
        assert all(d.name != "distance_line" for d in fig.data)

    def test_builders_raise_clean_importerror_without_plotly(self):
        try:
            import plotly  # noqa: F401

            pytest.skip("plotly installed")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="plotly"):
            compute.plot_micrograph(np.zeros((4, 4)), "t", 1.0)


def test_resize_local_mean_non_integer_factor_covers_full_field():
    """Non-integer downscale must resize the WHOLE micrograph: the block
    path once cropped 20% of the field and mislabeled the pixel size."""
    from helicon_tpu.webApps.whereIsMyClass.compute import _resize_local_mean

    # a gradient: mean of the full field differs from mean of the first 80%
    data = np.tile(np.arange(1000, dtype=np.float32)[:, None], (1, 10))
    out = _resize_local_mean(data, (400, 10))
    assert out.shape == (400, 10)
    # full-field mean preserved (cropping the tail would bias it low)
    assert abs(out.mean() - data.mean()) < data.mean() * 0.01
    assert out[-1, 0] > 0.95 * data[-1, 0]  # the tail rows are represented
