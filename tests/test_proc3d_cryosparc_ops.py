"""Tests for proc3d and cryosparc plugin pipelines."""

import argparse
import collections

import numpy as np
import pandas as pd
import pytest

from helicon_tpu.ops import cryosparc as csplug
from helicon_tpu.ops import proc3d as p3plug


def p3_dispatch(option, data, param, apix=2.0):
    args = argparse.Namespace(verbose=0, cpu=1)
    index_d = collections.defaultdict(int)
    nz, ny, nx = data.shape
    return p3plug.dispatch(option, data, args, index_d, param, apix, nx, ny, nz)


@pytest.fixture
def vol():
    rng = np.random.default_rng(0)
    v = rng.random((16, 12, 12)).astype(np.float32)
    return v


def test_proc3d_registry():
    expected = {
        "apix", "clip", "fft_resample", "flip_hand", "helical_sym",
        "z_moving_average", "denoiseCurvelet",
    }
    assert expected <= set(p3plug._plugins)


def test_proc3d_apix_and_flip(vol):
    data, apix, nx, ny, nz = p3_dispatch("apix", vol, 3.5)
    assert apix == 3.5
    data, *_ = p3_dispatch("flip_hand", vol, "x")
    np.testing.assert_allclose(np.asarray(data), vol[:, :, ::-1])


def test_proc3d_clip(vol):
    data, apix, nx, ny, nz = p3_dispatch("clip", vol, "new_nx=8:new_ny=8:new_nz=8")
    assert data.shape == (8, 8, 8)
    assert (nx, ny, nz) == (8, 8, 8)


def test_proc3d_fft_resample(vol):
    data, apix, nx, ny, nz = p3_dispatch(
        "fft_resample", vol, "new_nx=6:new_ny=6:new_nz=8"
    )
    assert data.shape == (8, 6, 6)
    assert apix == pytest.approx(4.0)


def test_proc3d_helical_sym(vol):
    data, apix, nx, ny, nz = p3_dispatch(
        "helical_sym", vol,
        "twist=30:rise=6:csym=1:center_fraction=0.8:new_nz=16:new_nxy=12",
    )
    assert data.shape == (16, 12, 12)
    assert np.isfinite(data).all()


def test_proc3d_z_moving_average(vol):
    data, *_ = p3_dispatch("z_moving_average", vol, "n_pixel=4")
    # reference cumsum windowing (z_moving_average.py): out[k] averages
    # slices [k-n//2+1, k+n//2] (off-center by one, matched here)
    expected_center = vol[3:7].mean(axis=0)
    np.testing.assert_allclose(data[4], expected_center, rtol=1e-5)


def test_proc3d_denoise(vol):
    data, *_ = p3_dispatch("denoiseCurvelet", vol, "threshold_sigma=3")
    assert data.shape == vol.shape and np.isfinite(data).all()


# ---------------------------------------------------------------- cryosparc


def cs_dispatch(option, data, param):
    args = argparse.Namespace(verbose=0)
    index_d = collections.defaultdict(int)
    out = csplug.dispatch(
        option, data, args, index_d, param, "title", set(),
        "ctf/exp_group_id", "location/micrograph_path", [1],
    )
    return out[0]


@pytest.fixture
def cs_df():
    n = 12
    df = pd.DataFrame(
        {
            "uid": np.arange(n, dtype=np.uint64) + 100,
            "blob/psize_A": 1.2,
            "ctf/df1_A": 12000.0,
            "ctf/df2_A": 11000.0,
            "ctf/cs_mm": 2.7,
            "ctf/exp_group_id": 1,
            "location/micrograph_uid": np.repeat([1, 2, 3], 4).astype(np.uint64),
            "location/micrograph_path": np.repeat(
                ["m1.mrc", "m2.mrc", "m3.mrc"], 4
            ),
        }
    )
    return df


def test_cs_registry():
    expected = {
        "assignExposureGroupByBeamShiftLabel", "assignExposureGroupByBeamShiftXY",
        "assignExposureGroupByTime", "assignExposureGroupPerMicrograph",
        "changePixelSize", "copyExposureGroupAssignments",
        "copyExposureGroupParameters", "extractParticles",
        "resetExposureGroups", "splitByMicrograph",
    }
    assert expected <= set(csplug._plugins)


def test_change_pixel_size(cs_df):
    out = cs_dispatch("changePixelSize", cs_df.copy(), 2.4)
    assert out["blob/psize_A"].iloc[0] == 2.4
    assert out["ctf/df1_A"].iloc[0] == pytest.approx(48000.0)
    assert out["ctf/cs_mm"].iloc[0] == pytest.approx(2.7 * 16)


def test_exposure_groups(cs_df):
    out = cs_dispatch("assignExposureGroupPerMicrograph", cs_df.copy(), 1)
    assert out["ctf/exp_group_id"].nunique() == 3
    out = cs_dispatch("resetExposureGroups", out, 1)
    assert out["ctf/exp_group_id"].nunique() == 1


def test_split_by_micrograph(cs_df):
    out = cs_dispatch("splitByMicrograph", cs_df.copy(), 1)
    assert set(out["alignments3D/split"].unique()) <= {0, 1}
    # halves balanced at micrograph granularity
    per_mic = out.groupby("location/micrograph_uid")["alignments3D/split"].nunique()
    assert (per_mic == 1).all()


def test_extract_particles(tmp_path, cs_df, monkeypatch):
    from helicon_tpu.io.mrc import read_mrc, write_mrc

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    mic = rng.normal(0, 1, (64, 64)).astype(np.float32)
    for m in ("m1.mrc", "m2.mrc", "m3.mrc"):
        write_mrc(tmp_path / m, mic, apix=1.0)
    df = cs_df.copy()
    df["location/micrograph_psize_A"] = 1.0
    df["location/micrograph_shape"] = [(64, 64)] * len(df)
    df["location/center_x_frac"] = np.tile([0.25, 0.5, 0.75, 0.9], 3)
    df["location/center_y_frac"] = 0.5
    out = cs_dispatch(
        "extractParticles", df, "box_size=16:fft_crop_size=8:fp16=0"
    )
    assert "blob/path" in out
    stack, apix = read_mrc(tmp_path / "extract" / "m1.mrcs")
    assert stack.shape == (4, 8, 8)
    assert apix == pytest.approx(2.0)
    # normalized output
    assert abs(float(stack[0].mean())) < 1e-4


# ------------------------------------------------------- proc3d, extended
# (reference tests/test_proc3d.py: flip axes, clip invariants, resample
# identity, z_moving_average validation, helical_sym validation)


def test_proc3d_flip_hand_all_axes(vol):
    data, *_ = p3_dispatch("flip_hand", vol, "y")
    np.testing.assert_allclose(np.asarray(data), vol[:, ::-1, :])
    data, *_ = p3_dispatch("flip_hand", vol, "z")
    np.testing.assert_allclose(np.asarray(data), vol[::-1])


def test_proc3d_flip_hand_invalid_axis(vol):
    from helicon_tpu.utils import HeliconError

    with pytest.raises(HeliconError):
        p3_dispatch("flip_hand", vol, "w")


def test_proc3d_clip_centered_preserves_content(vol):
    data, *_ = p3_dispatch("clip", vol, "new_nx=8:new_ny=8:new_nz=8")
    np.testing.assert_allclose(
        np.asarray(data), vol[4:12, 2:10, 2:10], rtol=1e-6
    )


def test_proc3d_clip_full_size_identity(vol):
    data, *_ = p3_dispatch("clip", vol, "new_nx=12:new_ny=12:new_nz=16")
    np.testing.assert_allclose(np.asarray(data), vol)


def test_proc3d_clip_pad_grows(vol):
    data, *_ = p3_dispatch("clip", vol, "new_nx=16:new_ny=16:new_nz=20")
    assert data.shape == (20, 16, 16)
    np.testing.assert_allclose(np.asarray(data)[2:18, 2:14, 2:14], vol)


def test_proc3d_fft_resample_identity(vol):
    data, apix, *_ = p3_dispatch(
        "fft_resample", vol, "new_nx=12:new_ny=12:new_nz=16"
    )
    np.testing.assert_allclose(np.asarray(data), vol, atol=1e-4)
    assert apix == pytest.approx(2.0)


def test_proc3d_fft_resample_upsample(vol):
    data, apix, *_ = p3_dispatch(
        "fft_resample", vol, "new_nx=24:new_ny=24:new_nz=32"
    )
    assert data.shape == (32, 24, 24)
    assert apix == pytest.approx(1.0)
    # mean is preserved by Fourier zero-padding resample
    assert float(np.mean(data)) == pytest.approx(float(vol.mean()), abs=1e-3)


def test_proc3d_z_moving_average_by_length(vol):
    data, *_ = p3_dispatch("z_moving_average", vol, "length=8")  # 4 px at 2 A
    expected_center = vol[3:7].mean(axis=0)
    np.testing.assert_allclose(data[4], expected_center, rtol=1e-5)


def test_proc3d_z_moving_average_validation(vol):
    from helicon_tpu.utils import HeliconError

    with pytest.raises(HeliconError):
        p3_dispatch("z_moving_average", vol, "length=0:n_pixel=0")
    with pytest.raises(HeliconError):
        p3_dispatch("z_moving_average", vol, "length=8:n_pixel=4")


def test_proc3d_helical_sym_validation(vol):
    from helicon_tpu.utils import HeliconError

    with pytest.raises(HeliconError):
        p3_dispatch("helical_sym", vol, "twist=30:rise=0:center_fraction=0.5")
    with pytest.raises(HeliconError):
        p3_dispatch("helical_sym", vol, "twist=30:rise=6:csym=0:center_fraction=0.5")
    with pytest.raises(HeliconError):  # none of the center_* options
        p3_dispatch("helical_sym", vol, "twist=30:rise=6")
    with pytest.raises(HeliconError):  # two center_* options
        p3_dispatch(
            "helical_sym", vol, "twist=30:rise=6:center_fraction=0.5:center_len=20"
        )


def test_proc3d_helical_sym_center_len_variants(vol):
    d1, *_ = p3_dispatch(
        "helical_sym", vol, "twist=30:rise=6:center_fraction=0.375"
    )
    d2, *_ = p3_dispatch(
        "helical_sym", vol, "twist=30:rise=6:center_len=12"
    )  # 12 A / (16 * 2 A) = 0.375
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    d3, *_ = p3_dispatch(
        "helical_sym", vol, "twist=30:rise=6:center_n_rise=2"
    )  # 2 * 6 / 32 = 0.375
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d3), atol=1e-5)


def test_proc3d_denoise_elbow(vol):
    data, *_ = p3_dispatch("denoiseCurvelet", vol, "threshold_sigma=0")
    assert np.isfinite(data).all()
    assert not np.allclose(np.asarray(data), vol, atol=1e-5)


# ---------------------------------------------------- cryosparc, extended


EPU_CS_MICROS = [
    "FoilHole_28788144_Data_28764755_46_20240328_192116_fractions.tiff",
    "FoilHole_28788144_Data_28764755_47_20240328_192117_fractions.tiff",
    "FoilHole_28788144_Data_28764755_48_20240328_192118_fractions.tiff",
]


def test_cs_beamshift_label(cs_df):
    df = cs_df.copy()
    df["location/micrograph_path"] = np.repeat(EPU_CS_MICROS, 4)
    out = cs_dispatch("assignExposureGroupByBeamShiftLabel", df, "EPU")
    assert out["ctf/exp_group_id"].nunique() == 3


def test_cs_beamshift_label_zero_is_identity(cs_df):
    # reference gate (assignexposuregroupbybeamshiftlabel.py): param is
    # None or "0" -> no-op; any other value triggers auto-detection
    out = cs_dispatch("assignExposureGroupByBeamShiftLabel", cs_df.copy(), "0")
    assert out["ctf/exp_group_id"].nunique() == 1
    out = cs_dispatch("assignExposureGroupByBeamShiftLabel", cs_df.copy(), None)
    assert out["ctf/exp_group_id"].nunique() == 1


def test_cs_by_time(cs_df):
    df = cs_df.copy()
    df["location/micrograph_path"] = np.repeat(EPU_CS_MICROS, 4)
    out = cs_dispatch("assignExposureGroupByTime", df.copy(), 1)
    assert out["ctf/exp_group_id"].nunique() == 3
    out2 = cs_dispatch("assignExposureGroupByTime", df.copy(), 3)
    assert out2["ctf/exp_group_id"].nunique() == 1


def test_cs_copy_assignments(tmp_path, cs_df):
    # reference copyexposuregroupassignments.py: a RELION star file maps
    # movie-name stems -> rlnOpticsGroup; micrographs match by substring
    from helicon_tpu.io.star import write_star

    star = pd.DataFrame(
        {
            "rlnMicrographMovieName": [
                "movies/m1.tiff", "movies/m2.tiff", "movies/m3.tiff"
            ],
            "rlnOpticsGroup": [5, 6, 7],
        }
    )
    write_star(tmp_path / "src.star", star)
    out = cs_dispatch(
        "copyExposureGroupAssignments", cs_df.copy(), str(tmp_path / "src.star")
    )
    # groups renumbered to start at 1 (reference normalizes min -> 1)
    assert sorted(out["ctf/exp_group_id"].unique()) == [1, 2, 3]


def test_cs_copy_assignments_unmatched_go_to_group_zero(tmp_path, cs_df):
    # reference: micrographs with no star-file match are assigned group 0
    # with a warning (copyexposuregroupassignments.py), not an error
    from helicon_tpu.io.star import write_star

    star = pd.DataFrame(
        {
            "rlnMicrographMovieName": ["movies/m1.tiff"],
            "rlnOpticsGroup": [4],
        }
    )
    write_star(tmp_path / "src.star", star)
    out = cs_dispatch(
        "copyExposureGroupAssignments", cs_df.copy(), str(tmp_path / "src.star")
    )
    got = out["ctf/exp_group_id"].values
    assert set(got[np.asarray(cs_df["location/micrograph_path"]) == "m1.mrc"]) == {1}
    assert set(got[np.asarray(cs_df["location/micrograph_path"]) != "m1.mrc"]) == {0}


def test_cs_copy_parameters(tmp_path, cs_df):
    # reference copyexposuregroupparameters.py: param mini-language with
    # source_cs_file=, re-assignment by micrograph uid, per-group medians
    # of ctf/tilt_A etc.
    from helicon_tpu.io.cs import write_cs

    src = np.zeros(
        6,
        dtype=[
            ("uid", "<u8"),
            ("location/micrograph_uid", "<u8"),
            ("ctf/exp_group_id", "<u4"),
            ("ctf/tilt_A", "<f4"),
        ],
    )
    src["uid"] = np.arange(6) + 900
    src["location/micrograph_uid"] = [1, 1, 2, 2, 3, 3]
    src["ctf/exp_group_id"] = [5, 5, 5, 5, 6, 6]
    src["ctf/tilt_A"] = [10.0, 20.0, 30.0, 40.0, 100.0, 200.0]
    write_cs(tmp_path / "src.cs", src)
    df = cs_df.copy()
    df["ctf/tilt_A"] = 0.0
    out = cs_dispatch(
        "copyExposureGroupParameters", df,
        f"source_cs_file={tmp_path / 'src.cs'}",
    )
    # micrographs 1+2 -> group 5 (median tilt 25), micrograph 3 -> group 6
    got = out["ctf/tilt_A"].values
    mids = np.asarray(cs_df["location/micrograph_uid"])
    assert np.allclose(got[mids != 3], 25.0)
    assert np.allclose(got[mids == 3], 150.0)
    assert sorted(out["ctf/exp_group_id"].unique()) == [5, 6]


def test_cs_copy_parameters_requires_source(cs_df):
    from helicon_tpu.utils import HeliconError

    with pytest.raises(HeliconError):
        cs_dispatch("copyExposureGroupParameters", cs_df.copy(), "beam_tilt=1")


def test_cs_change_pixel_size_requires_blob(cs_df):
    from helicon_tpu.utils import HeliconError

    df = cs_df.drop(columns=["blob/psize_A"])
    with pytest.raises(HeliconError):
        cs_dispatch("changePixelSize", df, 2.0)


def test_cs_reset_noop_when_zero(cs_df):
    df = cs_df.copy()
    df["ctf/exp_group_id"] = np.repeat([1, 2, 3], 4)
    out = cs_dispatch("resetExposureGroups", df, 0)
    assert out["ctf/exp_group_id"].nunique() == 3


class TestExtractReviewFixes:
    """Regression tests for the round-2 extractParticles review findings
    (reference extractparticles.py:165-249 semantics)."""

    def _mic_setup(self, tmp_path, cs_df):
        from helicon_tpu.io.mrc import write_mrc

        rng = np.random.default_rng(0)
        mic = rng.normal(0, 1, (64, 64)).astype(np.float32)
        for m in ("m1.mrc", "m2.mrc", "m3.mrc"):
            write_mrc(tmp_path / m, mic, apix=1.0)
        df = cs_df.copy()
        df["location/micrograph_psize_A"] = 1.0
        df["location/micrograph_shape"] = [(64, 64)] * len(df)
        df["location/center_x_frac"] = 0.5
        df["location/center_y_frac"] = 0.5
        return df

    def test_recenter_uses_alignments3D_and_zeroes_shifts(
        self, tmp_path, cs_df, monkeypatch
    ):
        monkeypatch.chdir(tmp_path)
        df = self._mic_setup(tmp_path, cs_df)
        df["alignments3D/shift"] = [np.array([4.0, -2.0], np.float32)] * len(df)
        df["alignments3D/psize_A"] = 1.0
        out = cs_dispatch(
            "extractParticles", df, "box_size=16:fp16=0:recenter=1"
        )
        # shift 4 px at 64 px width -> center_x 0.5 - 4/64
        assert out["location/center_x_frac"].iloc[0] == pytest.approx(0.5 - 4 / 64)
        assert out["location/center_y_frac"].iloc[0] == pytest.approx(0.5 + 2 / 64)
        # shifts zeroed so downstream jobs do not re-apply them
        assert np.allclose(np.stack(out["alignments3D/shift"].values), 0.0)

    def test_flip_y(self, tmp_path, cs_df, monkeypatch):
        monkeypatch.chdir(tmp_path)
        df = self._mic_setup(tmp_path, cs_df)
        df["location/center_y_frac"] = 0.25
        out = cs_dispatch(
            "extractParticles", df, "box_size=16:fp16=0:flip_y=1:recenter=0"
        )
        assert out["location/center_y_frac"].iloc[0] == pytest.approx(0.75)

    def test_missing_micrograph_uid_raises(self, tmp_path, cs_df, monkeypatch):
        from helicon_tpu.io.cs import write_cs
        from helicon_tpu.utils import HeliconError

        monkeypatch.chdir(tmp_path)
        df = self._mic_setup(tmp_path, cs_df)
        mics = np.zeros(
            2, dtype=[("uid", "<u8"), ("micrograph_blob/path", "S10")]
        )
        mics["uid"] = [1, 2]  # uid 3 missing
        mics["micrograph_blob/path"] = [b"m1.mrc", b"m2.mrc"]
        write_cs(tmp_path / "mics.cs", mics)
        with pytest.raises(HeliconError, match="not found in the micrographs"):
            cs_dispatch(
                "extractParticles", df,
                f"box_size=16:fp16=0:micrographs_cs_file={tmp_path}/mics.cs",
            )

    def test_replace_ctf_requires_micrographs(self, tmp_path, cs_df, monkeypatch):
        from helicon_tpu.utils import HeliconError

        monkeypatch.chdir(tmp_path)
        df = self._mic_setup(tmp_path, cs_df)
        with pytest.raises(HeliconError, match="replace_ctf"):
            cs_dispatch("extractParticles", df, "box_size=16:replace_ctf=1")

    def test_replace_ctf_copies_from_micrographs(self, tmp_path, cs_df, monkeypatch):
        from helicon_tpu.io.cs import write_cs

        monkeypatch.chdir(tmp_path)
        df = self._mic_setup(tmp_path, cs_df)
        mics = np.zeros(
            3,
            dtype=[
                ("uid", "<u8"), ("micrograph_blob/path", "S10"),
                ("micrograph_blob/psize_A", "<f4"), ("ctf/df1_A", "<f4"),
            ],
        )
        mics["uid"] = [1, 2, 3]
        mics["micrograph_blob/path"] = [b"m1.mrc", b"m2.mrc", b"m3.mrc"]
        mics["micrograph_blob/psize_A"] = 1.0
        mics["ctf/df1_A"] = 31000.0
        write_cs(tmp_path / "mics.cs", mics)
        out = cs_dispatch(
            "extractParticles", df,
            f"box_size=16:fp16=0:replace_ctf=1:"
            f"micrographs_cs_file={tmp_path}/mics.cs",
        )
        assert np.allclose(out["ctf/df1_A"].to_numpy(float), 31000.0)


def test_exposure_groups_combine_not_overwrite(cs_df):
    """Beam-shift label groups COMBINE with pre-existing groups
    (assignexposuregroupbybeamshiftlabel.py:104): equal labels from
    different source groups stay distinct."""
    df = cs_df.copy()
    df["location/micrograph_path"] = np.repeat(
        [
            "FoilHole_28788144_Data_28764755_46_20240328_192116_fractions.tiff",
            "FoilHole_28788145_Data_28764755_46_20240328_192117_fractions.tiff",
            "FoilHole_28788146_Data_28764755_47_20240328_192118_fractions.tiff",
        ],
        4,
    )
    df["ctf/exp_group_id"] = np.repeat([1, 2, 2], 4)  # two sessions
    out = cs_dispatch("assignExposureGroupByBeamShiftLabel", df, "EPU")
    # label 46 appears in source groups 1 AND 2 -> must stay 2 groups;
    # plus label 47 in group 2 -> 3 total
    assert out["ctf/exp_group_id"].nunique() == 3
