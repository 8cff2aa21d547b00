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
