"""Tests for the images2star plugin pipeline (reference test_images2star.py
pattern: drive handlers on fixture DataFrames)."""

import argparse

import numpy as np
import pandas as pd
import pytest

from helicon_tpu.ops import images2star as plug


def make_args(**kw):
    ns = argparse.Namespace(
        verbose=0, folder=[], ignoreBadParticlePath=2, ignoreBadMicrographPath=1,
        output_starFile="out.star", subset=0, input_imageFiles=["in.star"],
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def dispatch(option, data, param, **kw):
    import collections

    index_d = collections.defaultdict(int)
    return plug.dispatch(option, data, make_args(**kw), index_d, param)[0]


def test_registry_complete():
    expected = set(
        """addParm apix assignOpticGroupByBeamShiftLabel
        assignOpticGroupByBeamShiftXY assignOpticGroupByTime
        assignOpticGroupPerMicrograph breakFilaments calibratePixelSize
        copyCtf copyParm createStack delParm denoiseCurvelet duplicateParm
        estimateHelicalAngleVariance estimateHelicalTubeLength excludeFile
        extractHelices fullStack keepOneParticlePerHelicalTube
        keepOneParticlePerMicrograph keepParm maskGold minDuplicates
        minStack multParm normEulerDist path process psiPrior180
        randomSample recoverFullFilaments removeDuplicates renameParm
        replaceImageName replaceStr resetInterSegmentDistance
        resetOpticGroup rsortby select selectByParticleLocation
        selectCommonHelices selectFile selectRatioRange selectValueRange
        setBeamTiltClass setCTF setParm sets showTime sortby
        splitByMicrograph""".split()
    )
    assert expected <= set(plug._plugins), sorted(expected - set(plug._plugins))


def test_parm_family(relion_df):
    df = relion_df.copy()
    out = dispatch("addParm", df.copy(), ["rlnDefocusU", "100"])
    assert out["rlnDefocusU"].iloc[0] == pytest.approx(12100.0)
    out = dispatch("multParm", df.copy(), ["rlnDefocusU", "2"])
    assert out["rlnDefocusU"].iloc[0] == pytest.approx(24000.0)
    out = dispatch("setParm", df.copy(), ["rlnClassNumber", "3"])
    assert (out["rlnClassNumber"] == 3).all()
    out = dispatch("delParm", df.copy(), ["rlnDefocusU"])
    assert "rlnDefocusU" not in out
    out = dispatch("keepParm", df.copy(), ["rlnImageName", "rlnDefocusU"])
    assert set(out.columns) == {"rlnImageName", "rlnDefocusU"}
    out = dispatch("duplicateParm", df.copy(), [["rlnDefocusU", "copyU"]])
    assert (out["copyU"] == out["rlnDefocusU"]).all()
    out = dispatch("renameParm", df.copy(), [["rlnDefocusU", "newU"]])
    assert "newU" in out and "rlnDefocusU" not in out
    out = dispatch("replaceStr", df.copy(), ["rlnMicrographName", "mic", "MIC"])
    assert out["rlnMicrographName"].str.startswith("MIC").all()


def test_select_family(relion_df):
    df = relion_df.copy()
    out = dispatch("select", df.copy(), ["rlnHelicalTubeID", "1"])
    assert (out["rlnHelicalTubeID"] == 1).all() and len(out) == 8
    out = dispatch("selectValueRange", df.copy(), ["rlnCoordinateX", "300", "700"])
    assert out["rlnCoordinateX"].between(300, 700, inclusive="neither").all()
    out = dispatch("selectRatioRange", df.copy(), ["rlnCoordinateX", "0", "0.5"])
    assert len(out) == len(df) // 2
    out = dispatch("sets", df.copy(), 2)
    assert len(out) == len(df) // 2


def test_sort_and_dedup(relion_df):
    df = relion_df.copy()
    out = dispatch("sortby", df.copy(), ["rlnCoordinateX"])
    assert (np.diff(out["rlnCoordinateX"].values) >= 0).all()
    out = dispatch("rsortby", df.copy(), ["rlnCoordinateX"])
    assert (np.diff(out["rlnCoordinateX"].values) <= 0).all()
    out = dispatch("removeDuplicates", df.copy(), ["rlnMicrographName"])
    assert len(out) == 2
    out = dispatch("keepOneParticlePerHelicalTube", df.copy(), 1)
    assert len(out) == 4  # 2 micrographs x 2 tubes
    out = dispatch("keepOneParticlePerMicrograph", df.copy(), 1)
    assert len(out) == 2


def test_psi_prior_180(relion_df):
    df = relion_df.copy()
    df["rlnAnglePsiPrior"] = 10.0
    out = dispatch("psiPrior180", df, 1)
    assert len(out) == 2 * len(relion_df)
    assert set(out["rlnAnglePsiPrior"].unique()) == {10.0, 190.0}


def test_break_filaments(relion_df):
    df = relion_df.copy()
    out = dispatch("breakFilaments", df, "maxSegments=2")
    sizes = out.groupby(["rlnMicrographName", "rlnHelicalTubeID"]).size()
    assert (sizes <= 2).all()
    assert "rlnHelicalTubeIDOriginal" in out


def test_estimate_angle_variance(relion_df):
    df = relion_df.copy()
    df["rlnAngleRot"] = np.linspace(0, 150, len(df))
    df["rlnAngleTilt"] = 90.0
    out = dispatch("estimateHelicalAngleVariance", df, 1)
    assert "rlnAngleTiltSigma" in out and "rlnAngleRotSigma" in out
    assert (out["rlnAngleTiltSigma"] == 0).all()


def test_create_and_full_stack(tmp_path, relion_df, monkeypatch):
    from helicon_tpu.io.mrc import write_mrc

    monkeypatch.chdir(tmp_path)
    stack = np.random.default_rng(0).random((16, 8, 8)).astype(np.float32)
    write_mrc(tmp_path / "stack.mrcs", stack, apix=1.0)
    df = relion_df.copy()
    df["rlnImageName"] = [
        f"{i + 1:06d}@{tmp_path / 'stack.mrcs'}" for i in range(len(df))
    ]
    out = dispatch("createStack", df.copy(), f"{tmp_path}/new.mrcs:float16=0")
    assert (tmp_path / "new.mrcs").exists()
    assert out["rlnImageName"].iloc[0].endswith("new.mrcs")
    out = dispatch("fullStack", df.copy(), 1)
    assert len(out) == 16


def test_mask_gold(tmp_path, relion_df, monkeypatch):
    from helicon_tpu.io.mrc import read_mrc, write_mrc

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    imgs = rng.normal(0, 1, (4, 32, 32)).astype(np.float32)
    imgs[:, 10:14, 10:14] = 50.0  # gold blob
    write_mrc(tmp_path / "p.mrcs", imgs, apix=1.0)
    df = relion_df.head(4).copy()
    df["rlnImageName"] = [f"{i + 1:06d}@{tmp_path / 'p.mrcs'}" for i in range(4)]
    out = dispatch(
        "maskGold", df, f"value_sigma=4:min_area=4:outdir={tmp_path}/masked"
    )
    masked, _ = read_mrc(f"{tmp_path}/masked/p.mrcs")
    assert masked[:, 10:14, 10:14].max() < 25.0


def test_denoise_curvelet_plugin(tmp_path, relion_df, monkeypatch):
    from helicon_tpu.io.mrc import read_mrc, write_mrc

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    clean = np.zeros((2, 32, 32), np.float32)
    clean[:, 12:20, 4:28] = 1.0
    noisy = clean + 0.5 * rng.standard_normal((2, 32, 32)).astype(np.float32)
    write_mrc(tmp_path / "p.mrcs", noisy, apix=1.0)
    df = relion_df.head(2).copy()
    df["rlnImageName"] = [f"{i + 1:06d}@{tmp_path / 'p.mrcs'}" for i in range(2)]
    out = dispatch("denoiseCurvelet", df, f"transform=udct:outdir={tmp_path}/dn")
    den, _ = read_mrc(f"{tmp_path}/dn/p.mrcs")
    assert np.linalg.norm(den - clean) < np.linalg.norm(noisy - clean)
