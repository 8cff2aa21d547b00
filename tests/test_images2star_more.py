"""Per-plugin images2star tests for the options not covered by
tests/test_images2star.py — modeled on the reference's one-test-per-
behavior suite (reference tests/test_images2star.py: optics-group
assignment, CTF copy, file filters, path conversion, splitters).
"""

import argparse
import collections
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from helicon_tpu.ops import images2star as plug
from helicon_tpu.utils import HeliconError, HeliconExit


def make_args(**kw):
    ns = argparse.Namespace(
        verbose=0, folder=[], ignoreBadParticlePath=2, ignoreBadMicrographPath=1,
        output_starFile="out.star", subset=0, input_imageFiles=["in.star"],
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def dispatch(option, data, param, **kw):
    index_d = collections.defaultdict(int)
    return plug.dispatch(option, data, make_args(**kw), index_d, param)[0]


def make_optics(n_groups=1):
    return pd.DataFrame(
        [
            dict(
                rlnOpticsGroup=i,
                rlnOpticsGroupName=f"opticsGroup{i}",
                rlnVoltage=300.0,
                rlnSphericalAberration=2.7,
                rlnAmplitudeContrast=0.1,
                rlnImagePixelSize=1.0,
            )
            for i in range(1, n_groups + 1)
        ]
    )


def make_epu_df(micros, groups=1):
    if isinstance(groups, int):
        groups = [groups] * len(micros)
    df = pd.DataFrame({"rlnMicrographName": micros, "rlnOpticsGroup": groups})
    df.attrs["optics"] = make_optics(max(groups))
    df.attrs["convention"] = "relion"
    return df


EPU_MICROS = [
    "FoilHole_28788144_Data_28764755_46_20240328_192116_fractions.tiff",
    "FoilHole_28788144_Data_28764755_47_20240328_192117_fractions.tiff",
]


class TestOpticsGroupAssignment:
    def test_beamshift_label_splits(self):
        data = make_epu_df(EPU_MICROS, groups=1)
        out = dispatch("assignOpticGroupByBeamShiftLabel", data, "EPU")
        assert len(out["rlnOpticsGroup"].unique()) == 2
        assert len(out.attrs["optics"]) == 2

    def test_beamshift_label_same_shift_no_split(self):
        micros = ["250123_SF0431_01129_1-7.eer", "250123_SF0431_01130_1-7.eer"]
        data = make_epu_df(micros, groups=1)
        out = dispatch(
            "assignOpticGroupByBeamShiftLabel", data, "serialEM_embl_heidelberg"
        )
        assert len(out["rlnOpticsGroup"].unique()) == 1

    def test_beamshift_label_preserves_existing_groups(self):
        micros = [
            "FoilHole_28788144_Data_28764755_46_20240328_192116_fractions.tiff",
            "FoilHole_28788144_Data_28764755_47_20240328_192117_fractions.tiff",
            "FoilHole_28788144_Data_28764755_48_20240328_192118_fractions.tiff",
            "FoilHole_28788144_Data_28764755_49_20240328_192119_fractions.tiff",
        ]
        data = make_epu_df(micros, groups=[1, 1, 2, 2])
        out = dispatch("assignOpticGroupByBeamShiftLabel", data, "EPU")
        # (group, beamshift) combinations -> 4 distinct groups
        assert len(out["rlnOpticsGroup"].unique()) == 4
        assert len(out.attrs["optics"]) == 4
        for gid in out["rlnOpticsGroup"].unique():
            assert (
                f"opticsGroup{gid}"
                in out.attrs["optics"]["rlnOpticsGroupName"].values
            )

    def test_beamshift_label_no_is_identity(self):
        data = make_epu_df(EPU_MICROS, groups=1)
        out = dispatch("assignOpticGroupByBeamShiftLabel", data, "no")
        assert len(out["rlnOpticsGroup"].unique()) == 1

    def test_per_micrograph(self):
        data = make_epu_df(EPU_MICROS + EPU_MICROS, groups=1)
        out = dispatch("assignOpticGroupPerMicrograph", data, 1)
        assert len(out["rlnOpticsGroup"].unique()) == 2
        assert len(out.attrs["optics"]) == 2

    def test_by_time_groups(self):
        micros = [
            f"FoilHole_28788144_Data_28764755_{46 + i}_20240328_19{21 + i:02d}16_fractions.tiff"
            for i in range(4)
        ]
        data = make_epu_df(micros, groups=1)
        out = dispatch("assignOpticGroupByTime", data, 2)
        assert len(out["rlnOpticsGroup"].unique()) == 2
        assert "rlnMovieCollectionTime" in out

    def test_reset_optic_group(self):
        data = make_epu_df(EPU_MICROS, groups=[1, 2])
        data.attrs["optics"] = make_optics(2)
        out = dispatch("resetOpticGroup", data, 1)
        assert (out["rlnOpticsGroup"] == 1).all()
        assert len(out.attrs["optics"]) == 1

    def test_reset_requires_optics(self):
        data = pd.DataFrame(
            {"rlnMicrographName": EPU_MICROS, "rlnOpticsGroup": [1, 1]}
        )
        with pytest.raises(HeliconError):
            dispatch("resetOpticGroup", data, 1)

    def test_apix_updates_optics(self):
        data = make_epu_df(EPU_MICROS, groups=1)
        out = dispatch("apix", data, 2.5)
        from helicon_tpu.io.metadata import getPixelSize

        assert getPixelSize(out) == pytest.approx(2.5)


class TestCtf:
    def test_set_beam_tilt_class(self, relion_df):
        out = dispatch("setBeamTiltClass", relion_df.copy(), 1)
        assert "rlnBeamTiltClass" in out
        assert len(out["rlnBeamTiltClass"].unique()) == 2  # one per stack

    def test_set_ctf_from_ctfparm(self, tmp_path, relion_df):
        # EMAN1 ctfparm.txt: defocus dfdiff dfang bfactor ampcont ... voltage cs apix
        lines = []
        for stem in ["stack_mic1", "stack_mic2"]:
            lines.append(f"{stem}\t2.0,0.2,30.0,100.0,10.0,0,0,300.0,2.7,1.06")
        parm = tmp_path / "ctfparm.txt"
        parm.write_text("\n".join(lines))
        df = relion_df.copy()
        df["rlnImageName"] = df["rlnImageName"].str.replace(
            "stack_mic1.mrcs", "stack_mic1.mrcs", regex=False
        )
        out = dispatch("setCTF", df, str(parm))
        assert out["rlnVoltage"].iloc[0] == pytest.approx(300.0)
        # reference eman_astigmatism_to_relion (io.py:1955-1983): dfdiff
        # is the HALF-difference and dfang=30 (<90) puts U on the small
        # side: U = (2.0 - 0.2) um, V = (2.0 + 0.2) um
        assert out["rlnDefocusU"].iloc[0] == pytest.approx(1.8e4)
        assert out["rlnDefocusV"].iloc[0] == pytest.approx(2.2e4)
        assert out["rlnDefocusAngle"].iloc[0] == pytest.approx(30.0)
        assert out["rlnAmplitudeContrast"].iloc[0] == pytest.approx(0.1)

    def test_copy_ctf_micrograph_means(self, tmp_path, relion_df, monkeypatch):
        from helicon_tpu.io.metadata import dataframe2star

        monkeypatch.chdir(tmp_path)
        ref = relion_df.copy()
        ref["rlnDefocusU"] = 20000.0
        ref["rlnDefocusV"] = 18000.0
        ref["rlnDefocusAngle"] = 0.0
        dataframe2star(ref, tmp_path / "ref.star")
        out = dispatch("copyCtf", relion_df.copy(), str(tmp_path / "ref.star"))
        assert out["rlnDefocusU"].iloc[0] == pytest.approx(20000.0, rel=1e-3)
        assert out["rlnDefocusV"].iloc[0] == pytest.approx(18000.0, rel=1e-3)


class TestCopyParm:
    def test_copies_columns_by_image_name(self, tmp_path, relion_df, monkeypatch):
        from helicon_tpu.io.metadata import dataframe2star

        monkeypatch.chdir(tmp_path)
        ref = relion_df.copy()
        ref["rlnClassNumber"] = 7
        dataframe2star(ref, tmp_path / "ref.star")
        out = dispatch(
            "copyParm", relion_df.copy(), [str(tmp_path / "ref.star"), "rlnClassNumber"]
        )
        assert (out["rlnClassNumber"] == 7).all()

    def test_errors_when_reference_smaller(self, tmp_path, relion_df, monkeypatch):
        from helicon_tpu.io.metadata import dataframe2star

        monkeypatch.chdir(tmp_path)
        dataframe2star(relion_df.head(3), tmp_path / "small.star")
        with pytest.raises(HeliconError):
            dispatch(
                "copyParm", relion_df.copy(), [str(tmp_path / "small.star")]
            )


class TestFileFilters:
    def _write_subset_star(self, tmp_path, relion_df, n):
        from helicon_tpu.io.metadata import dataframe2star

        dataframe2star(relion_df.head(n), tmp_path / "subset.star")
        return tmp_path / "subset.star"

    def test_select_file(self, tmp_path, relion_df, monkeypatch):
        monkeypatch.chdir(tmp_path)
        sf = self._write_subset_star(tmp_path, relion_df, 5)
        out = dispatch("selectFile", relion_df.copy(), str(sf))
        assert len(out) == 5

    def test_exclude_file(self, tmp_path, relion_df, monkeypatch):
        monkeypatch.chdir(tmp_path)
        sf = self._write_subset_star(tmp_path, relion_df, 5)
        out = dispatch("excludeFile", relion_df.copy(), str(sf))
        assert len(out) == len(relion_df) - 5

    def test_select_file_missing_errors(self, relion_df):
        with pytest.raises(HeliconError):
            dispatch("selectFile", relion_df.copy(), "/nonexistent.star")

    def test_select_common_helices(self, tmp_path, relion_df, monkeypatch):
        from helicon_tpu.io.metadata import dataframe2star

        monkeypatch.chdir(tmp_path)
        ref = relion_df[relion_df["rlnHelicalTubeID"] == 1]
        dataframe2star(ref, tmp_path / "helices.star")
        out = dispatch(
            "selectCommonHelices", relion_df.copy(), str(tmp_path / "helices.star")
        )
        assert set(out["rlnHelicalTubeID"]) == {1}
        assert len(out) == 8

    def test_select_by_particle_location(self, tmp_path, relion_df, monkeypatch):
        from helicon_tpu.io.metadata import dataframe2star

        monkeypatch.chdir(tmp_path)
        ref = relion_df.head(4).copy()
        dataframe2star(ref, tmp_path / "loc.star")
        # strict path normalization (reference semantics) needs the
        # referenced stacks to exist next to the star
        for mic in ("mic1.mrc", "mic2.mrc"):
            (tmp_path / f"stack_{mic}s").touch()
        out = dispatch(
            "selectByParticleLocation",
            relion_df.copy(),
            f"{tmp_path}/loc.star:maxDist=1",
        )
        assert len(out) == 4


class TestSamplingAndSplitting:
    def test_random_sample(self, relion_df):
        out = dispatch("randomSample", relion_df.copy(), 6)
        assert len(out) == 6

    def test_random_sample_larger_than_data_is_identity(self, relion_df):
        out = dispatch("randomSample", relion_df.copy(), 1000)
        assert len(out) == len(relion_df)

    def test_sets_with_subset(self, relion_df):
        out = dispatch("sets", relion_df.copy(), 4, subset=1)
        assert len(out) == len(relion_df) // 4
        assert out.index[0] == 1

    def test_min_duplicates(self, relion_df):
        df = relion_df.copy()
        # micrograph-level duplicate counting on rlnImageName -> every
        # image unique; use a repeated-image frame
        df2 = pd.concat([df, df.head(4)]).reset_index(drop=True)
        out = dispatch("minDuplicates", df2, 2)
        assert len(out) == 4  # the 4 duplicated images, deduped

    def test_split_by_micrograph(self, tmp_path, relion_df, monkeypatch):
        monkeypatch.chdir(tmp_path)
        with pytest.raises(HeliconExit):
            dispatch(
                "splitByMicrograph", relion_df.copy(), 1,
                output_starFile=str(tmp_path / "out.star"),
            )
        written = sorted(Path(".").glob("out.*.star"))
        assert len(written) == 2


class TestHelixMetadata:
    def test_estimate_tube_length(self, relion_df):
        out = dispatch("estimateHelicalTubeLength", relion_df.copy(), 1)
        assert "rlnHelicalTubeLength" in out
        assert np.allclose(out["rlnHelicalTubeLength"], 47.5 * 3)

    def test_reset_inter_segment_distance(self, relion_df):
        df = relion_df.copy()
        optics = make_optics(1)
        optics["rlnMicrographPixelSize"] = 1.0
        df.attrs["optics"] = optics
        out = dispatch("resetInterSegmentDistance", df, 95.0)
        # doubling the spacing halves the per-tube segment count
        sizes = out.groupby(["rlnMicrographName", "rlnHelicalTubeID"]).size()
        assert (sizes <= 2).all()

    def test_reset_requires_pixel_size(self, relion_df):
        df = relion_df.copy()
        df.attrs["optics"] = make_optics(1)
        with pytest.raises(HeliconError):
            dispatch("resetInterSegmentDistance", df, 95.0)

    def test_recover_full_filaments(self, tmp_path, relion_df, monkeypatch):
        from helicon_tpu.io.metadata import dataframe2star

        monkeypatch.chdir(tmp_path)
        dataframe2star(relion_df, tmp_path / "full.star")
        # fragmented selection: only 3 of 4 segments of mic1 tube1, and
        # 1 of 4 segments of mic1 tube2
        frag = pd.concat(
            [relion_df.iloc[0:3], relion_df.iloc[4:5]]
        ).reset_index(drop=True)
        frag.attrs["convention"] = "relion"
        out = dispatch(
            "recoverFullFilaments", frag,
            f"fullStarFile={tmp_path}/full.star:minFraction=0.5",
        )
        # tube1 (3/4 >= 0.5) fully recovered; tube2 (1/4 < 0.5) dropped
        assert len(out) == 4
        assert set(out["rlnHelicalTubeID"]) == {1}

    def _relion_project(self, root, relion_df):
        """Fixture RELION project tree: Extract job holding the full
        particle set, Select job holding the fragmented subset whose
        note.txt records the Extract star as its --i input."""
        from helicon_tpu.io.metadata import dataframe2star

        extract = root / "Extract" / "job003"
        select = root / "Select" / "job005"
        extract.mkdir(parents=True)
        select.mkdir(parents=True)
        dataframe2star(relion_df, extract / "particles.star")
        (extract / "job_pipeline.star").write_text("data_pipeline_general\n")
        (extract / "note.txt").write_text(
            "++++ relion_preprocess --coord_list Pick/job002/coords.star "
            "--part_star Extract/job003/particles.star\n"
        )
        frag = pd.concat(
            [relion_df.iloc[0:3], relion_df.iloc[4:5]]
        ).reset_index(drop=True)
        frag.attrs["convention"] = "relion"
        dataframe2star(frag, select / "particles.star")
        (select / "job_pipeline.star").write_text("data_pipeline_general\n")
        (select / "note.txt").write_text(
            "++++ relion_star_handler --i Extract/job003/particles.star "
            "--o Select/job005/particles.star\n"
        )
        return select / "particles.star", frag

    def test_recover_full_filaments_auto_trace(
        self, tmp_path, relion_df, monkeypatch
    ):
        """No fullStarFile=: the Extract job is auto-traced from the
        RELION note.txt provenance (reference
        recoverfullfilaments.py:64-130)."""
        monkeypatch.chdir(tmp_path)
        select_star, frag = self._relion_project(tmp_path, relion_df)
        out = dispatch(
            "recoverFullFilaments", frag, "minFraction=0.5",
            input_imageFiles=[str(select_star)],
        )
        assert len(out) == 4
        assert set(out["rlnHelicalTubeID"]) == {1}

    def test_recover_auto_trace_outside_project_raises(
        self, tmp_path, relion_df, monkeypatch
    ):
        monkeypatch.chdir(tmp_path)
        from helicon_tpu.io.metadata import dataframe2star

        dataframe2star(relion_df, tmp_path / "bare.star")
        with pytest.raises(HeliconError, match="note.txt provenance"):
            dispatch(
                "recoverFullFilaments", relion_df.copy(), "minFraction=0.5",
                input_imageFiles=[str(tmp_path / "bare.star")],
            )

    def test_trace_back_follows_chain(self, tmp_path, relion_df):
        """A Class2D job chained onto the Select job still traces back to
        the Extract star through two note.txt hops."""
        from helicon_tpu.ops.images2star.heavy import trace_back_to_extract_job

        select_star, _ = self._relion_project(tmp_path, relion_df)
        cls = tmp_path / "Class2D" / "job008"
        cls.mkdir(parents=True)
        (cls / "job_pipeline.star").write_text("data_pipeline_general\n")
        (cls / "note.txt").write_text(
            "++++ relion_refine --i Select/job005/particles.star --o x\n"
        )
        (cls / "run_it020_data.star").write_text("data_\n")
        history = []
        got = trace_back_to_extract_job(
            str(cls / "run_it020_data.star"), history=history
        )
        assert got is not None and got.endswith(
            "Extract/job003/particles.star"
        )
        assert len(history) == 3


class TestPathAndTime:
    def test_path_abs(self, tmp_path, relion_df, monkeypatch):
        monkeypatch.chdir(tmp_path)
        # conversion keeps the original form for unresolvable paths, so
        # the files must exist
        (tmp_path / "mic1.mrc").write_bytes(b"x")
        (tmp_path / "mic2.mrc").write_bytes(b"x")
        (tmp_path / "stack_mic1.mrcs").write_bytes(b"x")
        (tmp_path / "stack_mic2.mrcs").write_bytes(b"x")
        out = dispatch(
            "path", relion_df.copy(), "abs",
            output_starFile=str(tmp_path / "out.star"),
        )
        assert out["rlnMicrographName"].str.startswith("/").all()

    def test_path_current_is_identity(self, relion_df):
        out = dispatch("path", relion_df.copy(), "current")
        assert (out["rlnMicrographName"] == relion_df["rlnMicrographName"]).all()

    def test_show_time_adds_column(self, tmp_path, relion_df, monkeypatch):
        monkeypatch.chdir(tmp_path)
        (tmp_path / "mic1.mrc").write_bytes(b"x")
        (tmp_path / "mic2.mrc").write_bytes(b"x")
        out = dispatch("showTime", relion_df.copy(), "rlnMicrographName")
        assert "rlnMicrographNameCreateTime" in out
        assert np.isfinite(out["rlnMicrographNameCreateTime"]).all()


class TestStacks:
    def test_min_stack(self, tmp_path, relion_df, monkeypatch):
        from helicon_tpu.io.mrc import get_image_number, write_mrc

        monkeypatch.chdir(tmp_path)
        stack = np.random.default_rng(0).random((16, 8, 8)).astype(np.float32)
        write_mrc(tmp_path / "stack.mrcs", stack, apix=1.0)
        df = relion_df.head(4).copy()
        df["rlnImageName"] = [
            f"{i + 1:06d}@{tmp_path / 'stack.mrcs'}" for i in range(4)
        ]
        out = dispatch(
            "minStack", df, 1, output_starFile=str(tmp_path / "sub.star")
        )
        new_stack = tmp_path / "sub" / "stack.mrcs"
        assert new_stack.exists()
        assert get_image_number(new_stack) == 4
        assert out["rlnImageName"].str.endswith(str(new_stack)).all()

    def test_replace_image_name(self, tmp_path, relion_df, monkeypatch):
        from helicon_tpu.io.mrc import write_mrc

        monkeypatch.chdir(tmp_path)
        stack = np.zeros((len(relion_df), 8, 8), np.float32)
        write_mrc(tmp_path / "new.mrcs", stack, apix=1.0)
        out = dispatch("replaceImageName", relion_df.copy(), str(tmp_path / "new.mrcs"))
        assert out["rlnImageName"].str.endswith("new.mrcs").all()
        assert out["rlnImageName"].iloc[0].startswith("000001@")

    def test_replace_image_name_count_mismatch(self, tmp_path, relion_df):
        from helicon_tpu.io.mrc import write_mrc

        write_mrc(tmp_path / "short.mrcs", np.zeros((2, 8, 8), np.float32), apix=1.0)
        with pytest.raises(HeliconError):
            dispatch(
                "replaceImageName", relion_df.copy(), str(tmp_path / "short.mrcs")
            )


class TestMisc:
    def test_norm_euler_dist(self, relion_df):
        df = relion_df.copy()
        df["rlnAngleRot"] = [0.0] * 12 + [90.0] * 4
        df["rlnAngleTilt"] = 90.0
        out = dispatch("normEulerDist", df, [10.0, 4])
        counts = out.groupby("rlnAngleRot").size()
        assert (counts <= 4).all()
        assert len(out) == 8

    def test_process_vestigial_errors(self, relion_df):
        with pytest.raises(HeliconError):
            dispatch("process", relion_df.copy(), ["anything"])


class TestHeavyPlugins:
    def test_extract_helices(self, tmp_path, monkeypatch):
        from helicon_tpu.io.mrc import read_mrc, write_mrc
        from helicon_tpu.io.star import write_star

        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(0)
        mic = rng.normal(0, 1, (64, 64)).astype(np.float32)
        mic[30:34, 8:56] = 5.0  # horizontal filament
        write_mrc(tmp_path / "mic.mrc", mic, apix=2.0)
        coords = pd.DataFrame(
            {"rlnCoordinateX": [8.0, 56.0], "rlnCoordinateY": [32.0, 32.0]}
        )
        write_star(tmp_path / "mic.star", coords)
        df = pd.DataFrame(
            {
                "rlnMicrographName": [str(tmp_path / "mic.mrc")],
                "rlnCoordinateFileName": [str(tmp_path / "mic.star")],
            }
        )
        out = dispatch(
            "extractHelices", df,
            f"width=16:outPath={tmp_path}/helices",
        )
        assert len(out) == 1
        strip_file = Path(out["rlnImageName"].iloc[0].split("@")[1])
        assert strip_file.exists()
        strip, apix = read_mrc(strip_file)
        strip = np.squeeze(strip)
        assert apix == pytest.approx(2.0)
        assert strip.shape[0] == 16  # requested width
        # the filament runs along the strip: bright center rows
        assert strip[strip.shape[0] // 2].mean() > strip[0].mean()

    def test_calibrate_pixel_size_standard_ring(self, tmp_path, relion_df,
                                                 monkeypatch):
        """Reference semantics (calibratepixelsize.py): find the standard
        sample's diffraction ring in the +/-5% annulus and rescale the
        pixel size so the ring lands at its known resolution; defocus is
        rescaled along (setPixelSize(update_defocus=True))."""
        from helicon_tpu.io.metadata import getPixelSize
        from helicon_tpu.io.mrc import write_mrc

        monkeypatch.chdir(tmp_path)
        # plant an ice-like ring: true apix 1.03, nominal header 1.0 ->
        # at nominal apix the ring appears at 3.661/1.03 = 3.554 A
        n = 256
        nominal, true_apix = 1.0, 1.03
        ring_res_apparent = 3.661 * nominal / true_apix
        f = 1.0 / ring_res_apparent  # cycles per (nominal) Angstrom
        y, x = np.mgrid[0:n, 0:n].astype(np.float64)
        rng = np.random.default_rng(0)
        img = sum(
            np.cos(2 * np.pi * f * (x * np.cos(t) + y * np.sin(t)))
            for t in np.linspace(0, np.pi, 6, endpoint=False)
        ) + 0.1 * rng.normal(0, 1, (n, n))
        write_mrc(tmp_path / "data.mrcs",
                  np.stack([img, img]).astype(np.float32), apix=nominal)
        df = relion_df.head(2).copy()
        df["rlnImageName"] = [f"{i + 1:06d}@{tmp_path}/data.mrcs"
                              for i in range(2)]
        df["rlnImagePixelSize"] = nominal
        df["rlnDefocusU"] = 10000.0
        df["rlnDefocusV"] = 10000.0
        out = dispatch("calibratePixelSize", df, "ice")
        apix_new = getPixelSize(out)
        assert apix_new == pytest.approx(true_apix, abs=0.005)
        # defocus rescaled by (new/old)^2
        assert out["rlnDefocusU"].iloc[0] == pytest.approx(
            10000.0 * (apix_new / nominal) ** 2, rel=1e-3
        )

    def test_calibrate_pixel_size_rejects_unknown_standard(self, relion_df):
        from helicon_tpu.utils.exceptions import HeliconError

        with pytest.raises(HeliconError, match="unknown standard"):
            dispatch("calibratePixelSize", relion_df.copy(), "diamond")


class TestBeamShiftXY:
    def _xml(self, x, y):
        return f"""<?xml version="1.0"?>
<MicroscopeImage xmlns:a="http://schemas.datacontract.org/2004/07/Fei.Types">
  <microscopeData><optics><BeamShift>
    <a:_x>{x}</a:_x><a:_y>{y}</a:_y>
  </BeamShift></optics></microscopeData>
</MicroscopeImage>"""

    def test_clusters_beam_shifts_from_xmls(self, tmp_path, monkeypatch):
        from helicon_tpu.io import epu

        monkeypatch.chdir(tmp_path)
        # clear the per-folder xml cache between tests
        if hasattr(epu.EPU_micrograph_path_2_movie_xml_path, "xml_files"):
            epu.EPU_micrograph_path_2_movie_xml_path.xml_files = {}
        # EPU-old style movies: 21-digit prefix + FoilHole id; 2 shift
        # clusters of 2 micrographs each
        shifts = [(0.01, 0.01), (0.011, 0.009), (-0.02, -0.02), (-0.021, -0.019)]
        micros = []
        for i, (sx, sy) in enumerate(shifts):
            mid = (
                f"FoilHole_2878814{i}_Data_2876475{i}_48576{i}_"
                f"20240328_19211{i}"
            )
            (tmp_path / f"{mid}.xml").write_text(self._xml(sx, sy))
            micros.append(f"{10**20 + i:021d}_{mid}_fractions.tiff")
        df = make_epu_df(micros, groups=1)
        out = dispatch(
            "assignOpticGroupByBeamShiftXY", df,
            f"nClusters=2:xmlFolder={tmp_path}",
        )
        assert len(out["rlnOpticsGroup"].unique()) == 2
        g = out.groupby("rlnOpticsGroup")["rlnMicrographName"].apply(list)
        # the two near-identical shifts must cluster together
        for members in g.values:
            assert len(members) == 2

    def test_missing_xmls_error(self, tmp_path):
        from helicon_tpu.io import epu
        from helicon_tpu.utils import HeliconError

        if hasattr(epu.EPU_micrograph_path_2_movie_xml_path, "xml_files"):
            epu.EPU_micrograph_path_2_movie_xml_path.xml_files = {}
        df = make_epu_df(EPU_MICROS, groups=1)
        with pytest.raises(Exception):
            dispatch(
                "assignOpticGroupByBeamShiftXY", df,
                f"nClusters=2:xmlFolder={tmp_path}",
            )


class TestDenoiseCurveletFallback:
    def test_micrograph_fallback_denoises_once(self, tmp_path, monkeypatch):
        from helicon_tpu.io.mrc import read_mrc, write_mrc

        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(0)
        mic = rng.normal(0, 1, (32, 32)).astype(np.float32)
        write_mrc(tmp_path / "m1.mrc", mic, apix=1.0)
        # 4 rows referencing the SAME micrograph, no rlnImageName
        df = pd.DataFrame({"rlnMicrographName": [str(tmp_path / "m1.mrc")] * 4})
        out = dispatch(
            "denoiseCurvelet", df, f"transform=udct:outdir={tmp_path}/dn"
        )
        den, apix = read_mrc(tmp_path / "dn" / "m1.mrc")
        assert np.squeeze(den).shape == (32, 32)  # ONE image, not 4 copies
        assert (out["rlnMicrographName"] == str(tmp_path / "dn" / "m1.mrc")).all()

    def test_micrograph_fallback_rejects_3d(self, tmp_path, monkeypatch):
        from helicon_tpu.io.mrc import write_mrc

        monkeypatch.chdir(tmp_path)
        vol = np.zeros((8, 16, 16), np.float32)
        write_mrc(tmp_path / "vol.mrc", vol, apix=1.0)
        df = pd.DataFrame({"rlnMicrographName": [str(tmp_path / "vol.mrc")]})
        with pytest.raises(HeliconError):
            dispatch(
                "denoiseCurvelet", df, f"transform=udct:outdir={tmp_path}/dn"
            )

    def test_mct_transform_accepted(self, tmp_path, monkeypatch):
        from helicon_tpu.io.mrc import read_mrc, write_mrc

        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(1)
        stack = rng.normal(0, 1, (2, 32, 32)).astype(np.float32)
        write_mrc(tmp_path / "p.mrcs", stack, apix=1.0)
        df = pd.DataFrame(
            {"rlnImageName": [f"{i + 1:06d}@{tmp_path}/p.mrcs" for i in range(2)]}
        )
        out = dispatch(
            "denoiseCurvelet", df, f"transform=mct:outdir={tmp_path}/dn"
        )
        den, _ = read_mrc(tmp_path / "dn" / "p.mrcs")
        assert den.shape == (2, 32, 32) and np.isfinite(den).all()


class TestReviewFixes2:
    """Round-2 plugin review regressions: minStack ordering, maskGold
    overwrite guard, selectRatioRange index."""

    def test_minstack_row_order_preserved_after_sort(self, tmp_path, relion_df,
                                                     monkeypatch):
        """Slot i of the re-packed stack must be the particle renamed to
        i+1 even when rows are not pid-ascending (the reference writes
        sorted-pid order while renaming row order — silent image/metadata
        cross-matching)."""
        from helicon_tpu.io.mrc import read_mrc, write_mrc

        monkeypatch.chdir(tmp_path)
        n = 4
        imgs = np.stack(
            [np.full((8, 8), float(i + 1), np.float32) for i in range(n)]
        )
        write_mrc(tmp_path / "stack.mrcs", imgs, apix=1.0)
        df = relion_df.head(n).copy()
        df["rlnImageName"] = [f"{i + 1:06d}@stack.mrcs" for i in range(n)]
        df["rlnSortKey"] = [3.0, 1.0, 4.0, 2.0]
        df = df.sort_values("rlnSortKey").reset_index(drop=True)
        out = dispatch("minStack", df, 1, output_starFile="repacked.star")
        stack, _ = read_mrc(tmp_path / "repacked" / "stack.mrcs")
        for _, row in out.iterrows():
            slot = int(row["rlnImageName"].split("@")[0]) - 1
            orig = int(row["rlnSortKey"] * 0 + stack[slot][0, 0])
            # the slot's pixel value encodes the ORIGINAL pid it came from
            expected_pid = {3.0: 1, 1.0: 2, 4.0: 3, 2.0: 4}[row["rlnSortKey"]]
            assert orig == expected_pid, (slot, orig, row["rlnSortKey"])

    def test_maskgold_refuses_overwriting_input(self, tmp_path, relion_df,
                                                monkeypatch):
        from helicon_tpu.io.mrc import write_mrc

        monkeypatch.chdir(tmp_path)
        img = np.random.default_rng(0).normal(0, 1, (2, 16, 16)).astype(np.float32)
        write_mrc(tmp_path / "stack_mic1.mrcs", img, apix=1.0)
        write_mrc(tmp_path / "stack_mic2.mrcs", img, apix=1.0)
        df = relion_df.copy()
        with pytest.raises(HeliconError, match="overwrite original"):
            dispatch("maskGold", df, f"outdir={tmp_path}")

    def test_select_ratio_range_index(self, relion_df):
        out = dispatch("selectRatioRange", relion_df.copy(),
                       ["index", "0.25", "0.75"])
        assert len(out) == len(relion_df) // 2
        pd.testing.assert_frame_equal(
            out, relion_df.iloc[len(relion_df) // 4: 3 * len(relion_df) // 4]
        )


class TestReviewFixes3:
    """Round-2 batch-six regressions: sortby semantics, copyCtf zeros,
    breakFilaments IDs."""

    def test_sortby_unknown_column_raises(self, relion_df):
        with pytest.raises(HeliconError, match="does not exist"):
            dispatch("sortby", relion_df.copy(), ["rlnDefocusV_typo"])

    def test_sortby_imagename_groups_stacks(self):
        """rlnImageName sorts as filename@index (reference sortby.py
        tmpCol): stacks stay contiguous instead of interleaving by the
        per-stack particle index."""
        df = pd.DataFrame(
            dict(
                rlnImageName=[
                    "000010@a.mrcs", "000002@b.mrcs", "000001@a.mrcs",
                    "000001@b.mrcs",
                ]
            )
        )
        out = dispatch("sortby", df, ["rlnImageName"])
        assert list(out["rlnImageName"]) == [
            "000001@a.mrcs", "000010@a.mrcs", "000001@b.mrcs",
            "000002@b.mrcs",
        ]

    def test_copyctf_missing_source_columns_keep_target_values(
        self, tmp_path, relion_df, monkeypatch
    ):
        """A defocus-only source star must not zero the target's
        rlnCtfScalefactor (0 multiplies the CTF away in RELION)."""
        from helicon_tpu.io.metadata import dataframe2star

        monkeypatch.chdir(tmp_path)
        ref = relion_df.copy()
        ref["rlnDefocusU"] = 21000.0
        ref["rlnDefocusV"] = 19000.0
        ref["rlnDefocusAngle"] = 0.0
        # deliberately NO rlnCtfScalefactor / rlnCtfBfactor in the source
        dataframe2star(ref, tmp_path / "ref.star")
        df = relion_df.copy()
        df["rlnCtfScalefactor"] = 1.0
        out = dispatch("copyCtf", df, str(tmp_path / "ref.star"))
        assert (out["rlnCtfScalefactor"] == 1.0).all()
        assert out["rlnDefocusU"].iloc[0] == pytest.approx(21000.0, rel=1e-3)

    def test_breakfilaments_ids_reference_zero_based(self, relion_df):
        # reference breakfilaments.py enumerates new tube IDs from 0;
        # the pre-break IDs survive in rlnHelicalTubeIDOriginal
        out = dispatch("breakFilaments", relion_df.copy(), "maxSegments=2")
        assert int(out["rlnHelicalTubeID"].min()) == 0
        assert "rlnHelicalTubeIDOriginal" in out
        assert int(out["rlnHelicalTubeIDOriginal"].min()) >= 1



    def test_breakfilaments_vectorized_matches_loop_oracle(self):
        """The vectorized chunking must reproduce the reference loop
        exactly: encounter-order IDs, track-length sort only for
        oversized filaments, original order within small ones."""
        rng = np.random.default_rng(7)
        rows = []
        for m in ("m2.mrc", "m1.mrc"):          # encounter order != sorted
            for tube in (3, 1, 2):
                n = int(rng.integers(1, 9))
                trks = rng.permutation(n) * 10.0
                for t in trks:
                    rows.append((m, tube, float(t)))
        df = pd.DataFrame(
            rows,
            columns=[
                "rlnMicrographName", "rlnHelicalTubeID",
                "rlnHelicalTrackLengthAngst",
            ],
        )
        df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
        max_segments = 3

        # oracle: the reference's own loop (breakfilaments.py)
        oracle = df.copy()
        new_filaments = []
        for _, group in oracle.groupby(
            ["rlnMicrographName", "rlnHelicalTubeID"], sort=False
        ):
            idx = list(group.index)
            if len(idx) > max_segments:
                idx = (
                    oracle.loc[idx]
                    .sort_values("rlnHelicalTrackLengthAngst", kind="stable")
                    .index.tolist()
                )
            for i in range(0, len(idx), max_segments):
                new_filaments.append(idx[i : i + max_segments])
        expected = pd.Series(0, index=oracle.index)
        for new_id, idx in enumerate(new_filaments):
            expected.loc[idx] = new_id

        out = dispatch(
            "breakFilaments", df.copy(), f"maxSegments={max_segments}"
        )
        assert list(out["rlnHelicalTubeID"]) == list(expected)


class TestReviewFixes4:
    """Batch-seven regressions: proc3d flag crash, streaming createStack,
    minStack collisions, selectRatioRange guards."""

    def test_create_stack_streams_to_memmap(self, tmp_path, relion_df,
                                            monkeypatch):
        from helicon_tpu.io.mrc import read_mrc, write_mrc

        monkeypatch.chdir(tmp_path)
        imgs = np.stack(
            [np.full((8, 8), float(i + 1), np.float32) for i in range(4)]
        )
        write_mrc(tmp_path / "stack_mic1.mrcs", imgs, apix=1.0)
        write_mrc(tmp_path / "stack_mic2.mrcs", imgs, apix=1.0)
        df = relion_df.head(4).copy()
        df["rlnImageName"] = [f"{i + 1:06d}@stack_mic1.mrcs" for i in range(4)]
        out = dispatch("createStack", df, "combined.mrcs:float16=0")
        stack, apix = read_mrc(tmp_path / "combined.mrcs")
        assert stack.shape == (4, 8, 8)
        np.testing.assert_allclose(stack, imgs)
        assert out["rlnImageName"].iloc[2].startswith("3@")

    def test_minstack_same_basename_different_dirs(self, tmp_path, relion_df,
                                                   monkeypatch):
        """Two source stacks sharing a basename must not collide in the
        output dir (the second's metadata silently pointed at the
        first's images)."""
        from helicon_tpu.io.mrc import read_mrc, write_mrc

        monkeypatch.chdir(tmp_path)
        (tmp_path / "jobA").mkdir()
        (tmp_path / "jobB").mkdir()
        a = np.stack([np.full((8, 8), 1.0, np.float32)] * 2)
        b = np.stack([np.full((8, 8), 2.0, np.float32)] * 2)
        write_mrc(tmp_path / "jobA" / "mic.mrcs", a, apix=1.0)
        write_mrc(tmp_path / "jobB" / "mic.mrcs", b, apix=1.0)
        df = relion_df.head(4).copy()
        df["rlnImageName"] = [
            "000001@jobA/mic.mrcs", "000002@jobA/mic.mrcs",
            "000001@jobB/mic.mrcs", "000002@jobB/mic.mrcs",
        ]
        out = dispatch("minStack", df, 1, output_starFile="packed.star")
        names = out["rlnImageName"].str.split("@").str[-1].unique()
        assert len(names) == 2  # two distinct output stacks
        v0 = read_mrc(names[0])[0][0, 0, 0]
        v1 = read_mrc(names[1])[0][0, 0, 0]
        assert {float(v0), float(v1)} == {1.0, 2.0}

    def test_select_ratio_range_tiny_fraction(self, relion_df):
        out = dispatch(
            "selectRatioRange", relion_df.copy(),
            ["rlnCoordinateX", "0.001", "0.5"],
        )
        assert 0 < len(out) <= len(relion_df)

    def test_select_ratio_range_unknown_var_raises_quietly_too(self, relion_df):
        with pytest.raises(HeliconError, match="does NOT exist"):
            dispatch(
                "selectRatioRange", relion_df.copy(),
                ["rlnNope", "0.1", "0.5"],
            )

    def test_select_file_without_filename_clean_error(self, relion_df):
        with pytest.raises(HeliconError, match="filename must lead"):
            dispatch(
                "selectFile", relion_df.copy(), "col1=rlnImageName",
            )


def test_fft_resample_preserves_negative_density():
    """DEVIATION test: resampling a normalized (mean~0) map must keep
    negative solvent voxels (the reference's np.abs rectified them)."""
    from argparse import Namespace

    from helicon_tpu.ops.proc3d import dispatch as p3_dispatch

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    out, apix, nx, ny, nz = p3_dispatch(
        "fft_resample", vol, Namespace(verbose=0), {"fft_resample": 0},
        "new_nx=8:new_ny=8:new_nz=8", 1.0, 16, 16, 16,
    )
    assert out.shape == (8, 8, 8)
    assert out.min() < 0  # negatives survive


def test_rebuild_optics_rows_uses_source_group_parameters():
    """Regrouping merged multi-optics data must seed each new optics row
    from the ORIGINAL group of its particles, not clone row 0."""
    import pandas as pd

    from helicon_tpu.ops.images2star.optics import (
        _modal_source_groups,
        _rebuild_optics_rows,
    )

    optics = pd.DataFrame({
        "rlnOpticsGroup": [1, 2],
        "rlnOpticsGroupName": ["a", "b"],
        "rlnImagePixelSize": [1.0, 2.0],
        "rlnVoltage": [200.0, 300.0],
    })
    old = [1, 1, 2, 2]
    new = [1, 1, 2, 2]  # new group 2's particles came from old group 2
    src = _modal_source_groups(old, new, 2)
    rebuilt = _rebuild_optics_rows(optics, 2, src)
    assert rebuilt["rlnImagePixelSize"].tolist() == [1.0, 2.0]
    assert rebuilt["rlnVoltage"].tolist() == [200.0, 300.0]
    assert rebuilt["rlnOpticsGroup"].tolist() == [1, 2]


def test_maskgold_micrograph_fallback_writes_2d(tmp_path, monkeypatch):
    """rlnMicrographName-only data: each unique micrograph is masked
    ONCE into a 2D file (not an N-slice stack per referencing row)."""
    from argparse import Namespace

    from helicon_tpu.io.mrc import mrc_header, write_mrc
    from helicon_tpu.ops.images2star import dispatch

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    mic = rng.normal(0, 1, (32, 32)).astype(np.float32)
    mic[5, 5] = 100.0  # gold pixel
    write_mrc(tmp_path / "m1.mrc", mic, apix=1.0)
    df = pd.DataFrame({
        "rlnMicrographName": [str(tmp_path / "m1.mrc")] * 3,
        "rlnCoordinateX": [1.0, 2.0, 3.0],
    })
    args = Namespace(verbose=0, output_starFile="out.star")
    out, _ = dispatch("maskGold", df, args, {"maskGold": 0},
                      "value_sigma=6:min_area=0.5")
    written = Path(out["rlnMicrographName"].iloc[0])
    assert written.exists()
    h = mrc_header(written)
    assert h.nz == 1  # a 2D micrograph, not a 3-slice stack
    assert len(set(out["rlnMicrographName"])) == 1


def test_keep_one_per_tube_keeps_actual_rows():
    """groupby().first() blended non-NA fields across particles; the
    kept record must be an actual row of the group."""
    from argparse import Namespace

    from helicon_tpu.ops.images2star import dispatch

    df = pd.DataFrame({
        "rlnMicrographName": ["m1.mrc"] * 2,
        "rlnHelicalTubeID": [1, 1],
        "rlnCoordinateX": [10.0, 20.0],
        "rlnClassNumber": [np.nan, 7.0],  # first row has NaN
    })
    out, _ = dispatch(
        "keepOneParticlePerHelicalTube", df, Namespace(verbose=0),
        {"keepOneParticlePerHelicalTube": 0}, 1,
    )
    assert len(out) == 1
    # first actual row: coordinate 10 AND its own NaN class (no blend)
    assert out["rlnCoordinateX"].iloc[0] == 10.0
    assert np.isnan(out["rlnClassNumber"].iloc[0])


def test_copyctf_matches_by_basename(tmp_path, relion_df, monkeypatch):
    """copyCtf falls back to basename matching when path roots differ
    (relative target vs differently-rooted source spellings used to
    leave the NaN-backfilled defocus in the output)."""
    from helicon_tpu.io.metadata import dataframe2star

    monkeypatch.chdir(tmp_path)
    ref = relion_df.copy()
    ref["rlnMicrographName"] = [
        "/some/other/root/" + Path(str(m)).name
        for m in ref["rlnMicrographName"]
    ]
    ref["rlnDefocusU"] = 20000.0
    ref["rlnDefocusV"] = 18000.0
    ref["rlnDefocusAngle"] = 0.0
    dataframe2star(ref, tmp_path / "ref.star")
    out = dispatch("copyCtf", relion_df.copy(), str(tmp_path / "ref.star"))
    assert out["rlnDefocusU"].notna().all()
    assert out["rlnDefocusU"].iloc[0] == pytest.approx(20000.0, rel=1e-3)
