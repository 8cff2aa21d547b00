"""Tests for EPU/groups/EMDB-dataset io modules (mock-based, no network)."""

import gzip
import os
from unittest import mock

import numpy as np
import pandas as pd
import pytest

from helicon_tpu.io import epu, groups


EPU_NAME = "FoilHole_28788144_Data_28764755_46_20240328_192116_fractions.tiff"
EPU_OLD_NAME = "FoilHole_1464933_Data_427288_427290_20250502_213110_Fractions.mrc"


def test_guess_software():
    assert epu.guess_data_collection_software(EPU_NAME) == "EPU"
    assert epu.guess_data_collection_software(EPU_OLD_NAME) == "EPU_old"
    assert epu.guess_data_collection_software("random_name.mrc") is None


def test_extract_beamshift_and_time():
    assert epu.extract_beamshift(EPU_NAME) == "46"
    ts = epu.extract_data_collection_time(EPU_NAME)
    assert ts is not None and ts > 1.5e9
    assert epu.extract_data_collection_time(EPU_OLD_NAME) is not None


def test_assign_beamshift_groups():
    names = [
        f"FoilHole_28788144_Data_28764755_{bs}_20240328_192116_fractions.tiff"
        for bs in (3, 7, 3, 12)
    ]
    mapping = epu.assign_beamshift_groups(names, software="EPU")
    assert mapping[names[0]] == mapping[names[2]]
    assert len(set(mapping.values())) == 3


def test_epu_xml_beamshift(tmp_path):
    xml = tmp_path / "FoilHole_1.xml"
    xml.write_text(
        """<?xml version="1.0"?>
<MicroscopeImage xmlns:a="http://schemas.datacontract.org/2004/07/Fei.Types">
  <microscopeData><optics><BeamShift>
    <a:_x>0.012</a:_x><a:_y>-0.034</a:_y>
  </BeamShift></optics></microscopeData>
</MicroscopeImage>"""
    )
    x, y = epu.EPU_xml_2_beamshift(xml)
    assert x == pytest.approx(0.012) and y == pytest.approx(-0.034)


def test_groups_basics():
    assert list(groups.per_micrograph_ids(["b", "a", "b"])) == [2, 1, 2]
    np.testing.assert_array_equal(
        groups.combine_groups([1, 1, 2, 2], [1, 2, 1, 1]), [1, 2, 3, 3]
    )
    m = groups.per_micrograph_mapping(["x", "y"])
    assert m == {"x": 1, "y": 2}


def test_assign_time_groups():
    mics_unique = [
        f"FoilHole_28788144_Data_28764755_{i}_20240328_1921{i:02d}_fractions.tiff"
        for i in range(6)
    ]
    particles_mics = np.repeat(mics_unique, 2)
    group_lookup = np.ones(len(particles_mics), int)
    new_ids, t, ts = groups.assign_time_groups(
        particles_mics, np.array([1]), group_lookup, time_group_size=3
    )
    assert len(np.unique(new_ids)) == 2
    assert set(t) == set(mics_unique)


def test_emdb_mirror(tmp_path, monkeypatch):
    """Dataset layer with mocked network (reference test_emdb_mirror.py
    pattern): entries and map downloads are faked on disk."""
    import helicon_tpu.io.dataset as ds
    from helicon_tpu.io.mrc import write_mrc

    entries = pd.DataFrame(
        dict(
            emdb_id=["EMD-101", "EMD-102"],
            title=["a", "b"],
            method=["helical", "singleParticle"],
            resolution=[3.0, 4.0],
            pdb=["1abc", ""],
            rise=[4.75, None],
            twist=[-1.2, None],
            csym=["C1", None],
        )
    )
    entries["emd_id"] = entries["emdb_id"].str.split("-").str[-1]

    def fake_download(url, target_file_name=None, return_filename=False, **k):
        vol = np.zeros((4, 4, 4), np.float32)
        raw = tmp_path / "tmp.map"
        write_mrc(raw, vol, apix=1.1)
        with open(raw, "rb") as f_in, gzip.open(target_file_name, "wb") as f_out:
            f_out.write(f_in.read())
        return target_file_name if return_filename else None

    monkeypatch.setattr(ds, "get_emd_entries", lambda fields: entries)
    monkeypatch.setattr(
        ds, "update_helical_parameters_from_curated_table", lambda df: df
    )
    monkeypatch.setattr(ds, "download_file_from_url", fake_download)

    ds.EMDB._instance = None  # reset the singleton for this test
    emdb = ds.EMDB(cache_dir=tmp_path / "emdb")
    try:
        assert len(emdb) == 2
        assert emdb.helical_structure_ids() == ["101"]
        data, apix = emdb("EMD-101")
        assert data.shape == (4, 4, 4)
        assert apix == pytest.approx(1.1, abs=1e-5)
        info = emdb.get_info("101")
        assert info["method"] == "helical"
    finally:
        ds.EMDB._instance = None


class TestCombineGroupsReference:
    """Ported from reference tests/test_groups.py:14-61."""

    def test_basic_split(self):
        np.testing.assert_array_equal(
            groups.combine_groups([1, 1, 1, 1, 2, 2, 2, 2], [1, 1, 2, 2, 1, 1, 2, 2]),
            [1, 1, 2, 2, 3, 3, 4, 4],
        )

    def test_single_group_split(self):
        np.testing.assert_array_equal(
            groups.combine_groups([1, 1, 1], [1, 2, 3]), [1, 2, 3]
        )

    def test_no_split(self):
        np.testing.assert_array_equal(
            groups.combine_groups([1, 1, 2, 2], [1, 1, 1, 1]), [1, 1, 2, 2]
        )

    def test_1_indexed(self):
        result = groups.combine_groups([1, 1], [5, 10])
        assert result[0] == 1 and result[1] == 2

    def test_large_gap(self):
        result = groups.combine_groups([10, 10, 20, 20], [1, 2, 1, 2])
        assert len(set(result)) == 4

    def test_empty(self):
        assert len(groups.combine_groups(np.array([], int), np.array([], int))) == 0


class TestExtractTimestampsReference:
    """Ported from reference tests/test_groups.py:63-93."""

    def test_epu_timestamp(self):
        m = ["FoilHole_28788144_Data_28764755_46_20240328_192116_fractions.tiff"]
        r = groups.extract_timestamps(m, "EPU")
        assert r[m[0]] not in (None, float("inf"))

    def test_different_times_differ(self):
        m = [
            "FoilHole_28788144_Data_28764755_46_20240328_192116_fractions.tiff",
            "FoilHole_28788144_Data_28764755_47_20240328_192117_fractions.tiff",
        ]
        r = groups.extract_timestamps(m, "EPU")
        assert r[m[0]] != r[m[1]]

    def test_serialEM_serial_number_fallback(self):
        m = ["250123_SF0431_00592_1-14_patch_aligned_doseweighted.mrc"]
        r = groups.extract_timestamps(m, "serialEM_embl_heidelberg")
        assert abs(r[m[0]] - 592.0) < 1e-7

    def test_unknown_software(self):
        r = groups.extract_timestamps(["unknown_file.mrc"], "nonexistent")
        assert r["unknown_file.mrc"] == float("inf")


class TestPerMicrographMapping:
    def test_basic(self):
        from helicon_tpu.io.groups import per_micrograph_mapping

        m = per_micrograph_mapping(["a.mrc", "b.mrc", "c.mrc"])
        assert m == {"a.mrc": 1, "b.mrc": 2, "c.mrc": 3}

    def test_custom_start_id(self):
        from helicon_tpu.io.groups import per_micrograph_mapping

        m = per_micrograph_mapping(["a", "b"], start_id=7)
        assert m == {"a": 7, "b": 8}

    def test_preserves_order(self):
        from helicon_tpu.io.groups import per_micrograph_mapping

        m = per_micrograph_mapping(["c.mrc", "a.mrc", "b.mrc"])
        assert m["c.mrc"] == 1 and m["a.mrc"] == 2 and m["b.mrc"] == 3

    def test_empty(self):
        from helicon_tpu.io.groups import per_micrograph_mapping

        assert per_micrograph_mapping([]) == {}


class TestPerMicrographIds:
    def test_basic_sorted_unique(self):
        from helicon_tpu.io.groups import per_micrograph_ids

        ids = per_micrograph_ids(np.array(["a.mrc", "a.mrc", "b.mrc", "c.mrc"]))
        np.testing.assert_array_equal(ids, [1, 1, 2, 3])

    def test_custom_start_id(self):
        from helicon_tpu.io.groups import per_micrograph_ids

        ids = per_micrograph_ids(np.array(["x", "y", "y", "x"]), start_id=5)
        np.testing.assert_array_equal(ids, [5, 6, 6, 5])

    def test_single_unique(self):
        from helicon_tpu.io.groups import per_micrograph_ids

        assert (per_micrograph_ids(np.array(["a", "a", "a"])) == 1).all()

    def test_consistency_with_mapping(self):
        from helicon_tpu.io.groups import (
            per_micrograph_ids,
            per_micrograph_mapping,
        )

        names = np.array(["z", "y", "x", "z", "y", "w"])
        ids = per_micrograph_ids(names)
        mapping = per_micrograph_mapping(sorted(np.unique(names)))
        np.testing.assert_array_equal(ids, [mapping[n] for n in names])


class TestSyncGroupColumns:
    def _df(self):
        import pandas as pd

        return pd.DataFrame(
            {
                "ctf/exp_group_id": [1, 2, 3],
                "mscope_params/exp_group_id": [9, 9, 9],
                "other": [0, 0, 0],
            }
        )

    def test_syncs_all_matching_columns(self):
        from helicon_tpu.io.groups import sync_group_columns

        df = self._df()
        sync_group_columns(df, "ctf/exp_group_id")
        np.testing.assert_array_equal(
            df["mscope_params/exp_group_id"], df["ctf/exp_group_id"]
        )

    def test_keeps_primary_unchanged(self):
        from helicon_tpu.io.groups import sync_group_columns

        df = self._df()
        sync_group_columns(df, "ctf/exp_group_id")
        np.testing.assert_array_equal(df["ctf/exp_group_id"], [1, 2, 3])

    def test_untouched_unrelated_columns(self):
        from helicon_tpu.io.groups import sync_group_columns

        df = self._df()
        sync_group_columns(df, "ctf/exp_group_id")
        assert (df["other"] == 0).all()

    def test_single_column_does_nothing(self):
        import pandas as pd

        from helicon_tpu.io.groups import sync_group_columns

        df = pd.DataFrame({"ctf/exp_group_id": [1, 2]})
        sync_group_columns(df, "ctf/exp_group_id")
        np.testing.assert_array_equal(df["ctf/exp_group_id"], [1, 2])


class TestExtractTimestampsFallbacks:
    def test_mtime_fallback_returns_mtime(self, tmp_path):
        from helicon_tpu.io.groups import extract_timestamps

        f = tmp_path / "unknown_name_123.tif"
        f.write_bytes(b"x")
        out = extract_timestamps([str(f)], "EPU", use_mtime_fallback=True)
        assert out[str(f)] == pytest.approx(f.stat().st_mtime, abs=2)

    def test_no_fallback_defaults_to_inf(self):
        from helicon_tpu.io.groups import extract_timestamps

        out = extract_timestamps(
            ["no_pattern_here.tif"], "EPU", use_mtime_fallback=False
        )
        assert out["no_pattern_here.tif"] == float("inf")

    def test_path_with_directory(self):
        from helicon_tpu.io.groups import extract_timestamps

        name = (
            "/data/run1/FoilHole_28788144_Data_28764755_46_"
            "20240328_192116_fractions.tiff"
        )
        out = extract_timestamps([name], "EPU")
        assert out[name] != float("inf")


def test_emdb_singleton_and_amyloid_ids(tmp_path, monkeypatch):
    """EMDB is a singleton; amyloid_atlas_ids intersects the atlas with
    loaded entries (reference tests/test_dataset.py:51-75)."""
    import helicon_tpu.io.dataset as ds

    entries = pd.DataFrame(
        dict(
            emdb_id=["EMD-1234", "EMD-5678"],
            title=["Test Entry 1", "t2"],
            method=["helical", "singleParticle"],
            resolution=[3.0, 4.0],
        )
    )
    entries["emd_id"] = entries["emdb_id"].str.split("-").str[-1]
    monkeypatch.setattr(ds, "get_emd_entries", lambda fields: entries)
    monkeypatch.setattr(
        ds, "update_helical_parameters_from_curated_table", lambda df: df
    )
    monkeypatch.setattr(
        ds,
        "get_amyloid_atlas",
        lambda *a, **k: pd.DataFrame({"emd_id": ["EMD-1234", "EMD-9999"]}),
    )
    ds.EMDB._instance = None
    try:
        a = ds.EMDB(cache_dir=tmp_path / "emdb")
        b = ds.EMDB(cache_dir=tmp_path / "other")
        assert a is b  # singleton (__new__ caching, reference dataset.py:30-41)
        info = a.get_info("1234")
        assert info["title"] == "Test Entry 1"
        assert info["resolution"] == pytest.approx(3.0)
        assert a.amyloid_atlas_ids() == ["1234"]
    finally:
        ds.EMDB._instance = None


class TestCistemIngest:
    def _make_db(self, path, tables=("REFINEMENT_RESULT_1",)):
        import sqlite3

        con = sqlite3.connect(path)
        for t in tables:
            con.execute(
                f"CREATE TABLE {t} (POSITION_IN_STACK INTEGER, PSI REAL, "
                "THETA REAL, PHI REAL, XSHIFT REAL, YSHIFT REAL, "
                "DEFOCUS1 REAL, DEFOCUS2 REAL, DEFOCUS_ANGLE REAL, "
                "SCORE REAL)"
            )
            for i in range(4):
                con.execute(
                    f"INSERT INTO {t} VALUES (?,?,?,?,?,?,?,?,?,?)",
                    (i + 1, 10.0 * i, 90.0, 5.0 * i, 1.0, -1.0,
                     12000.0, 11000.0, 30.0, 0.5 + 0.01 * int(t[-1])),
                )
        con.commit()
        con.close()

    def test_reads_latest_refinement(self, tmp_path):
        from helicon_tpu.io.metadata import cistem2dataframe

        db = tmp_path / "proj.db"
        self._make_db(db, ("REFINEMENT_RESULT_1", "REFINEMENT_RESULT_2"))
        df = cistem2dataframe(str(db))
        assert len(df) == 4
        # latest table wins
        assert df["rlnParticleScore"].iloc[0] == pytest.approx(0.52)
        assert df["rlnAnglePsi"].iloc[1] == pytest.approx(10.0)
        assert df["rlnImageName"].iloc[0].startswith("000001@")

    def test_refinement_selector_prefix(self, tmp_path):
        from helicon_tpu.io.metadata import cistem2dataframe

        db = tmp_path / "proj.db"
        self._make_db(db, ("REFINEMENT_RESULT_1", "REFINEMENT_RESULT_2"))
        df = cistem2dataframe(f"1@{db}")
        assert df["rlnParticleScore"].iloc[0] == pytest.approx(0.51)

    def test_no_refinement_tables_raises(self, tmp_path):
        import sqlite3

        from helicon_tpu.io.metadata import cistem2dataframe
        from helicon_tpu.utils import HeliconIOError

        db = tmp_path / "empty.db"
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE OTHER (x INTEGER)")
        con.commit()
        con.close()
        with pytest.raises(HeliconIOError):
            cistem2dataframe(str(db))

    def test_images2dataframe_dispatches_db(self, tmp_path):
        from helicon_tpu.io.metadata import images2dataframe

        db = tmp_path / "proj.db"
        self._make_db(db)
        df = images2dataframe(str(db), target_convention="relion")
        assert "rlnAnglePsi" in df and len(df) == 4


def test_star_to_dataframe_pid_filename(tmp_path, relion_df):
    """star_to_dataframe adds 0-based pid + filename columns (reference
    io.py:1059-1096)."""
    import helicon_tpu as ht
    from helicon_tpu.io.metadata import dataframe2star

    # star_to_dataframe path-normalizes strictly (reference semantics):
    # the referenced stacks must exist next to the star file
    for mic in ("mic1.mrc", "mic2.mrc"):
        (tmp_path / f"stack_{mic}s").touch()
    dataframe2star(relion_df, tmp_path / "in.star")
    df = ht.star_to_dataframe(tmp_path / "in.star")
    assert "pid" in df and "filename" in df
    assert df["pid"].iloc[0] == 0
    assert df["filename"].iloc[0].endswith(".mrcs")

    bad = relion_df.drop(columns=["rlnImageName"])
    dataframe2star(bad, tmp_path / "bad.star")
    with pytest.raises(KeyError):
        ht.star_to_dataframe(tmp_path / "bad.star")


class TestMetadataConventionFixes:
    """Regression tests for the round-2 metadata review findings."""

    def test_astigmatism_roundtrip_reference_semantics(self):
        """io.py:1918-1983: dfdiff = |U-V|/2; dfang points along the
        smallest defocus; the inverse swaps U/V by angle quadrant and
        reduces the angle mod 90."""
        from helicon_tpu.io.metadata import (
            eman_astigmatism_to_relion,
            relion_astigmatism_to_eman,
        )

        d, dd, da = relion_astigmatism_to_eman(18000.0, 22000.0, 30.0)
        assert (d, dd, da) == pytest.approx((2.0, 0.2, 30.0))
        u, v, a = eman_astigmatism_to_relion(d, dd, da)
        assert (u, v, a) == pytest.approx((18000.0, 22000.0, 30.0))
        # U > V rotates the angle to the smallest-defocus direction
        d2, dd2, da2 = relion_astigmatism_to_eman(22000.0, 18000.0, 30.0)
        assert (d2, dd2, da2) == pytest.approx((2.0, 0.2, 120.0))
        u2, v2, a2 = eman_astigmatism_to_relion(d2, dd2, da2)
        # exact round trip: the quadrant-based U/V swap undoes the
        # 90-degree rotation applied on the way out
        assert (u2, v2, a2) == pytest.approx((22000.0, 18000.0, 30.0))

    def test_cistem_shift_sign_and_phase_shift_degrees(self, tmp_path):
        import sqlite3

        from helicon_tpu.io.metadata import cistem2dataframe

        db = tmp_path / "proj.db"
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE REFINEMENT_RESULT_1 (POSITION_IN_STACK INTEGER,"
            " XSHIFT REAL, YSHIFT REAL, PHASE_SHIFT REAL)"
        )
        con.execute(
            "INSERT INTO REFINEMENT_RESULT_1 VALUES (1, 10.0, -4.0, ?)",
            (np.pi / 2,),
        )
        con.commit()
        con.close()
        df = cistem2dataframe(str(db))
        # cisTEM shifts are the negative of RELION origins (io.py:1692)
        assert df["rlnOriginXAngst"].iloc[0] == pytest.approx(-10.0)
        assert df["rlnOriginYAngst"].iloc[0] == pytest.approx(4.0)
        # radians -> degrees (io.py:1695)
        assert df["rlnPhaseShift"].iloc[0] == pytest.approx(90.0, abs=0.1)

    def test_cistem_numeric_refinement_order(self, tmp_path):
        import sqlite3

        from helicon_tpu.io.metadata import cistem2dataframe

        db = tmp_path / "proj.db"
        con = sqlite3.connect(db)
        for rid, score in ((9, 0.9), (10, 0.95)):
            con.execute(
                f"CREATE TABLE REFINEMENT_RESULT_{rid} "
                "(POSITION_IN_STACK INTEGER, SCORE REAL)"
            )
            con.execute(
                f"INSERT INTO REFINEMENT_RESULT_{rid} VALUES (1, ?)", (score,)
            )
        con.commit()
        con.close()
        df = cistem2dataframe(str(db))
        # round 10 is the latest, even though '9' sorts after '10'
        assert df["rlnParticleScore"].iloc[0] == pytest.approx(0.95)

    def test_relion_to_cryosparc_nondefault_index(self):
        """A dropped-rows index (star2dataframe corrupted-row filter)
        must not misalign or NaN any converted column."""
        import pandas as pd

        from helicon_tpu.io.metadata import dataframe_relion_to_cryosparc

        df = pd.DataFrame(
            dict(
                rlnImageName=[f"{i:06d}@a.mrcs" for i in (1, 2, 3)],
                rlnDefocusU=[1.0, 2.0, 3.0],
                rlnDefocusV=[1.0, 2.0, 3.0],
                rlnDefocusAngle=[0.0, 10.0, 20.0],
            ),
            index=[0, 2, 3],  # row 1 dropped upstream
        )
        df.attrs["convention"] = "relion"
        out = dataframe_relion_to_cryosparc(df)
        assert not out.isnull().any().any()
        assert list(out["blob/idx"]) == [0, 1, 2]
        assert out["ctf/df1_A"].iloc[2] == pytest.approx(3.0)

    def test_cs2dataframe_drops_rows_missing_from_passthrough(self, tmp_path):
        """uids absent from the passthrough leave NaNs after the left
        merge; those rows are dropped with a warning (io.py:1515-1529)."""
        import numpy as np

        from helicon_tpu.io.cs import write_cs
        from helicon_tpu.io.metadata import cs2dataframe

        main = np.zeros(
            3, dtype=[("uid", "<u8"), ("blob/idx", "<u4"),
                      ("blob/path", "S20")]
        )
        main["uid"] = [1, 2, 3]
        main["blob/path"] = b"J1/stack.mrcs"
        write_cs(tmp_path / "p.cs", main)
        extra = np.zeros(2, dtype=[("uid", "<u8"), ("ctf/accel_kv", "<f4")])
        extra["uid"] = [1, 3]  # uid 2 missing
        extra["ctf/accel_kv"] = 300.0
        write_cs(tmp_path / "pass.cs", extra)
        df = cs2dataframe(
            tmp_path / "p.cs", passthrough_files=[tmp_path / "pass.cs"],
            ignore_bad_particle_path=2,
        )
        assert len(df) == 2
        assert sorted(df["uid"].tolist()) == [1, 3]

    def test_normalize_filename_resolves_and_raises(self, tmp_path):
        """Relative particle paths resolve to absolute against the source
        folder (written back!); unresolvable paths raise under the strict
        default and survive with ignore=1 / skip entirely with 2."""
        import pandas as pd

        from helicon_tpu.io.metadata import dataframe_normalize_filename
        from helicon_tpu.utils.exceptions import HeliconIOError

        (tmp_path / "stack.mrcs").touch()
        df = pd.DataFrame(dict(rlnImageName=["000001@stack.mrcs"]))
        df.attrs["source_path"] = str(tmp_path / "run_data.star")
        dataframe_normalize_filename(df)
        assert df["rlnImageName"].iloc[0] == f"000001@{tmp_path}/stack.mrcs"

        bad = pd.DataFrame(dict(rlnImageName=["000001@nope.mrcs"]))
        bad.attrs["source_path"] = str(tmp_path / "run_data.star")
        with pytest.raises(HeliconIOError, match="cannot find image"):
            dataframe_normalize_filename(bad.copy(deep=True))
        kept = bad.copy(deep=True)
        kept.attrs["source_path"] = str(tmp_path / "run_data.star")
        dataframe_normalize_filename(kept, ignore_bad_particle_path=1)
        assert kept["rlnImageName"].iloc[0] == "000001@nope.mrcs"
        skipped = bad.copy(deep=True)
        skipped.attrs["source_path"] = str(tmp_path / "run_data.star")
        dataframe_normalize_filename(skipped, ignore_bad_particle_path=2)
        assert skipped["rlnImageName"].iloc[0] == "000001@nope.mrcs"


def test_emdb_map_axis_order_normalized(tmp_path, monkeypatch):
    """EMDB maps stored with non-canonical mapc/mapr/maps are permuted to
    canonical axis order (reference read_emdb_map -> change_map_axes_order)."""
    import struct

    import helicon_tpu.io.dataset as ds
    from helicon_tpu.io.mrc import read_mrc, write_mrc

    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    f = tmp_path / "emd_999.map"
    write_mrc(f, vol, apix=1.0)
    # rewrite mapc/mapr/maps = (2, 1, 3): x and y swapped
    raw = bytearray(f.read_bytes())
    raw[64:76] = struct.pack("<3i", 2, 1, 3)
    f.write_bytes(bytes(raw))

    emdb = ds.EMDB.__new__(ds.EMDB)  # bypass singleton init
    monkeypatch.setattr(emdb, "get_emdb_map_file", lambda emd_id: str(f))
    monkeypatch.setattr(emdb, "_validate_emd_id", lambda emd_id: emd_id)
    data, apix = ds.EMDB.read_emdb_map(emdb, "999")
    raw_data, _ = read_mrc(f)
    assert data.shape != raw_data.shape  # axes were permuted
    # (mapc, mapr, maps) = (2, 1, 3): cols hold Y, rows hold X, sections
    # hold Z -> the stored [Z][X][Y] array canonicalizes to [Z][Y][X] by
    # swapping the last two axes. (The reference's own formula swaps the
    # FIRST two — a latent bug for non-self-inverse orders; documented
    # deviation in change_map_axes_order.)
    assert data.shape == (2, 4, 3)
    np.testing.assert_allclose(data, np.moveaxis(raw_data, [0, 1, 2], [0, 2, 1]))


def test_change_map_axes_order_non_self_inverse():
    """(1,3,2) and (2,1,3) are not their own inverse permutations — the
    reference formula scrambled them (documented deviation)."""
    from helicon_tpu.io.mrc import MrcHeader, change_map_axes_order

    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)  # Z,Y,X

    def hdr(mapc, mapr, maps):
        import dataclasses

        h = MrcHeader.__new__(MrcHeader)
        for f in dataclasses.fields(MrcHeader):
            object.__setattr__(h, f.name, 0)
        object.__setattr__(h, "mapc", mapc)
        object.__setattr__(h, "mapr", mapr)
        object.__setattr__(h, "maps", maps)
        return h

    # (2,1,3): stored [Z][X][Y]; feed the function that layout
    stored = np.swapaxes(vol, 1, 2)  # [Z][X][Y]
    out, h2 = change_map_axes_order(stored, hdr(2, 1, 3))
    np.testing.assert_array_equal(out, vol)
    assert (h2.mapc, h2.mapr, h2.maps) == (1, 2, 3)
    # (1,3,2): stored [Y][Z][X]
    stored = np.moveaxis(vol, [0, 1, 2], [1, 0, 2])  # [Y][Z][X]
    out, _ = change_map_axes_order(stored, hdr(1, 3, 2))
    np.testing.assert_array_equal(out, vol)
    # (3,2,1): self-inverse [X][Y][Z]
    stored = np.transpose(vol, (2, 1, 0))
    out, _ = change_map_axes_order(stored, hdr(3, 2, 1))
    np.testing.assert_array_equal(out, vol)


def test_propagate_ctf_median_vector_columns():
    """Vector-valued CTF fields (per-cell lists from cs2dataframe) used
    to crash the median propagation with a broadcast error."""
    import pandas as pd

    from helicon_tpu.io.groups import propagate_ctf_median

    df = pd.DataFrame(
        {
            "exp_group_id": [1, 1, 2],
            "ctf/cs_mm": [2.7, 2.6, 2.0],
            "ctf/shift_A": [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
        }
    )
    propagate_ctf_median(df, "exp_group_id")
    assert df["ctf/cs_mm"].tolist()[:2] == pytest.approx([2.65, 2.65])
    assert df["ctf/shift_A"].iloc[0] == pytest.approx([2.0, 3.0])
    assert df["ctf/shift_A"].iloc[1] == pytest.approx([2.0, 3.0])
    assert df["ctf/shift_A"].iloc[2] == pytest.approx([5.0, 6.0])


def test_set_pixel_size_from_image_header_source(tmp_path):
    """setPixelSize must NOT overwrite rlnImageName when the pixel size
    was sourced from the MRC header via the image-name column (a
    documented deviation: the reference destroys every path)."""
    import pandas as pd

    from helicon_tpu.io.metadata import getPixelSize, setPixelSize
    from helicon_tpu.io.mrc import write_mrc

    stack = tmp_path / "s.mrcs"
    write_mrc(stack, np.zeros((2, 8, 8), np.float32), apix=1.5)
    df = pd.DataFrame({"rlnImageName": [f"{i+1:06d}@{stack}" for i in range(2)]})
    df.attrs["source_path"] = str(tmp_path / "run.star")
    apix, src = getPixelSize(df, return_pixelSize_source=True)
    assert apix == pytest.approx(1.5) and src == "rlnImageName"
    setPixelSize(df, 2.0)
    assert df["rlnImageName"].iloc[0].startswith("000001@")  # intact
    assert df["rlnImagePixelSize"].iloc[0] == pytest.approx(2.0)


def test_mrc2mrcs_does_not_hijack_unrelated_mrcs(tmp_path, monkeypatch):
    """A pre-existing UNRELATED <stem>.mrcs must not be silently adopted
    as the particle stack; same-basename stacks from different read-only
    folders must not share one fallback symlink."""
    import pandas as pd

    from helicon_tpu.io.metadata import mrc2mrcs
    from helicon_tpu.io.mrc import write_mrc

    monkeypatch.chdir(tmp_path)
    d = tmp_path / "d"
    d.mkdir()
    write_mrc(d / "a.mrc", np.ones((2, 4, 4), np.float32), apix=1.0)
    write_mrc(d / "a.mrcs", np.zeros((3, 4, 4), np.float32), apix=1.0)  # unrelated
    df = pd.DataFrame({"rlnImageName": [f"000001@{d / 'a.mrc'}"]})
    out = mrc2mrcs(df)
    mapped = out["rlnImageName"].iloc[0].split("@")[-1]
    assert mapped != str(d / "a.mrcs")  # NOT the unrelated file
    assert os.path.realpath(mapped) == os.path.realpath(d / "a.mrc")

    # basename collision in the ./mrc2mrcs fallback
    e1, e2 = tmp_path / "ro1", tmp_path / "ro2"
    e1.mkdir(); e2.mkdir()
    write_mrc(e1 / "b.mrc", np.ones((1, 4, 4), np.float32), apix=1.0)
    write_mrc(e2 / "b.mrc", np.zeros((1, 4, 4), np.float32), apix=1.0)
    os.chmod(e1, 0o555); os.chmod(e2, 0o555)
    try:
        df2 = pd.DataFrame({
            "rlnImageName": [f"000001@{e1 / 'b.mrc'}", f"000001@{e2 / 'b.mrc'}"]
        })
        out2 = mrc2mrcs(df2)
        m1, m2 = [v.split("@")[-1] for v in out2["rlnImageName"]]
        assert m1 != m2
        assert os.path.realpath(m1) == os.path.realpath(e1 / "b.mrc")
        assert os.path.realpath(m2) == os.path.realpath(e2 / "b.mrc")
    finally:
        os.chmod(e1, 0o755); os.chmod(e2, 0o755)


def test_images2dataframe_renumbers_optics_groups(tmp_path):
    """Two star files each using optics group 1 with different pixel
    sizes: the merged frame must keep both parameter sets distinct."""
    import pandas as pd

    from helicon_tpu.io.metadata import dataframe2star, images2dataframe

    for i, apix in enumerate((1.0, 2.0)):
        df = pd.DataFrame({
            "rlnImageName": [f"{j+1:06d}@stk_{i}.mrcs" for j in range(2)],
            "rlnOpticsGroup": [1, 1],
            "rlnImagePixelSize": [apix, apix],
            "rlnVoltage": [300.0, 300.0],
        })
        dataframe2star(df, str(tmp_path / f"in{i}.star"), format="v3")
    merged = images2dataframe(
        [str(tmp_path / "in0.star"), str(tmp_path / "in1.star")],
        ignore_bad_particle_path=2,
    )
    optics = merged.attrs["optics"]
    groups = optics["rlnOpticsGroup"].astype(int).tolist()
    assert len(set(groups)) == len(groups)  # unique ids
    # each particle still resolves to its own file's pixel size
    per_particle = [
        float(optics.loc[optics["rlnOpticsGroup"].astype(int) == int(g),
                         "rlnImagePixelSize"].iloc[0])
        for g in merged["rlnOpticsGroup"]
    ]
    assert per_particle == [1.0, 1.0, 2.0, 2.0]


def test_epu_beamshift_nonconforming_name_raises():
    from helicon_tpu.io.epu import assign_beamshift_groups
    from helicon_tpu.utils.exceptions import HeliconValueError

    good = "FoilHole_123_Data_456_789_20240101_120000.mrc"
    with pytest.raises(HeliconValueError, match="do not match"):
        assign_beamshift_groups([good, "renamed_without_pattern.mrc"], "EPU")


def test_dataframe2star_micrograph_block_tag_and_rounding(tmp_path):
    """Block tag classifies on the CONVERTED frame; every float column
    (including the first) is rounded to 6 digits."""
    import pandas as pd

    from helicon_tpu.io.metadata import dataframe2star

    df = pd.DataFrame({
        "micrograph_blob/path": ["m1.mrc", "m2.mrc"],
        "mscope_params/accel_kv": [300.0, 300.0],
    })
    df.attrs["convention"] = "cryosparc"
    out = tmp_path / "mics.star"
    dataframe2star(df, str(out), format="v3")
    text = out.read_text()
    assert "data_micrographs" in text

    df2 = pd.DataFrame({
        "rlnDefocusU": [0.1 + 0.2],  # 0.30000000000000004 unrounded
        "rlnDefocusV": [0.3],
    })
    df2.attrs["convention"] = "relion"
    out2 = tmp_path / "p.star"
    dataframe2star(df2, str(out2), format="v3")
    assert "0.30000000000000004" not in out2.read_text()
