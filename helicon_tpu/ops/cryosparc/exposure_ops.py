"""cryosparc exposure-group + pixel-size options:
assignExposureGroupByBeamShiftLabel, assignExposureGroupByBeamShiftXY,
assignExposureGroupByTime, assignExposureGroupPerMicrograph,
changePixelSize, copyExposureGroupAssignments,
copyExposureGroupParameters, resetExposureGroups, splitByMicrograph.

Reference: plugins/cryosparc/*.py (sizes: 86-224 LoC each).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd

from ...utils.collections import split_array
from ...utils.exceptions import HeliconError
from ...utils.system import parse_param_str
from ..registry import Plugin

logger = logging.getLogger(__name__)


def _add_changePixelSize(parser):
    parser.add_argument(
        "--changePixelSize", type=float, metavar="<A/pixel>", default=0,
        help="set blob/psize_A and rescale defocus (^2) and cs (^4)",
    )


def _h_changePixelSize(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    if param > 0:
        col_apix = "blob/psize_A"
        if col_apix not in data:
            raise HeliconError(f"required parameter {col_apix} is not available")
        apix_orig = float(data[col_apix].iloc[0])
        data[col_apix] = param
        for col in ("ctf/df1_A", "ctf/df2_A"):
            if col in data:
                data[col] = data[col] * (param / apix_orig) ** 2
        if "ctf/cs_mm" in data:
            data["ctf/cs_mm"] = data["ctf/cs_mm"] * (param / apix_orig) ** 4
        output_slots.add("blob")
        output_slots.add("ctf")
        index_d["changePixelSize"] += 1
    return data, output_title, output_slots, index_d


def _add_resetExposureGroups(parser):
    parser.add_argument(
        "--resetExposureGroups", type=int, metavar="<0|1>", default=0,
        help="merge all exposure groups into one",
    )


def _h_resetExposureGroups(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    from ...io.groups import sync_group_columns

    if param:
        data[exp_group_id_name] = 1
        sync_group_columns(data, exp_group_id_name)
        output_slots.add(exp_group_id_name.split("/")[0])
        output_title += "->1 group"
        index_d["resetExposureGroups"] += 1
    return data, output_title, output_slots, index_d


def _add_assignPerMicrograph(parser):
    parser.add_argument(
        "--assignExposureGroupPerMicrograph", type=int, metavar="<0|1>", default=0,
        help="one exposure group per micrograph",
    )


def _h_assignPerMicrograph(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    from ...io.groups import per_micrograph_ids, sync_group_columns

    if param:
        data[exp_group_id_name] = per_micrograph_ids(data[micrograph_name].values)
        sync_group_columns(data, exp_group_id_name)
        n = data[exp_group_id_name].nunique()
        output_slots.add(exp_group_id_name.split("/")[0])
        output_title += f"->{n} per-micrograph groups"
        index_d["assignExposureGroupPerMicrograph"] += 1
    return data, output_title, output_slots, index_d


def _add_assignByBeamShiftLabel(parser):
    parser.add_argument(
        "--assignExposureGroupByBeamShiftLabel", type=str, default="no",
        metavar="<no|auto|EPU|serialEM_pncc|serialEM_embl_heidelberg|serialEM_cuhksz>",
        help="exposure groups from the beam-shift label in movie filenames",
    )


def _h_assignByBeamShiftLabel(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    from ...io.epu import assign_beamshift_groups, guess_data_collection_software
    from ...io.groups import sync_group_columns

    if param != "no":
        sample = str(data[micrograph_name].iloc[0])
        software = (
            guess_data_collection_software(sample) if param == "auto" else param
        )
        if software is None:
            raise HeliconError(f"cannot detect filename format: {sample}")
        names = data[micrograph_name].astype(str)
        mapping = assign_beamshift_groups(list(names.unique()), software)
        # COMBINE with the pre-existing groups instead of overwriting:
        # equal labels from different source groups (e.g. two merged
        # collection sessions) must stay distinct
        # (assignexposuregroupbybeamshiftlabel.py:104-109)
        from ...io.groups import combine_groups, propagate_ctf_median

        data[exp_group_id_name] = combine_groups(
            np.asarray(data[exp_group_id_name]), names.map(mapping).to_numpy()
        )
        sync_group_columns(data, exp_group_id_name)
        propagate_ctf_median(data, exp_group_id_name)
        n = data[exp_group_id_name].nunique()
        output_slots.add(exp_group_id_name.split("/")[0])
        output_title += f"->{n} beam-shift groups"
        index_d["assignExposureGroupByBeamShiftLabel"] += 1
    return data, output_title, output_slots, index_d


def _add_assignByBeamShiftXY(parser):
    parser.add_argument(
        "--assignExposureGroupByBeamShiftXY", type=str, default="",
        metavar="nClusters=<n>:xmlFolder=<path>",
        help="exposure groups by clustering EPU XML beam shifts",
    )


def _h_assignByBeamShiftXY(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    from ...io.epu import (
        EPU_micrograph_path_2_movie_xml_path,
        EPU_xml_2_beamshift,
        check_foilhole_xml_files,
    )
    from ...io.groups import sync_group_columns
    from ...io.metadata import assign_beamshifts_to_cluster

    if param:
        _, pd_ = parse_param_str(param)
        n_clusters = int(pd_["nClusters"]) if "nClusters" in pd_ else None
        xml_folder = str(pd_.get("xmlFolder", ""))
        names = data[micrograph_name].astype(str)
        unique_names = names.unique()
        check_foilhole_xml_files(list(unique_names), xml_folder)
        shifts = np.array(
            [
                EPU_xml_2_beamshift(
                    EPU_micrograph_path_2_movie_xml_path(m, xml_folder)
                )
                for m in unique_names
            ]
        )
        labels = assign_beamshifts_to_cluster(shifts, n_clusters=n_clusters)
        mapping = dict(zip(unique_names, labels))
        from ...io.groups import combine_groups, propagate_ctf_median

        # combine with pre-existing groups + per-group CTF medians
        # (assignexposuregroupbybeamshiftxy.py:167-172)
        data[exp_group_id_name] = combine_groups(
            np.asarray(data[exp_group_id_name]), names.map(mapping).to_numpy()
        )
        sync_group_columns(data, exp_group_id_name)
        propagate_ctf_median(data, exp_group_id_name)
        output_slots.add(exp_group_id_name.split("/")[0])
        output_title += f"->{int(labels.max())} beam-shift clusters"
        index_d["assignExposureGroupByBeamShiftXY"] += 1
    return data, output_title, output_slots, index_d


def _add_assignByTime(parser):
    parser.add_argument(
        "--assignExposureGroupByTime", type=int, metavar="<n per group>", default=0,
        help="split exposure groups into time-ordered groups of n movies",
    )


def _h_assignByTime(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    from ...io.groups import assign_time_groups, sync_group_columns

    if param > 0:
        movies = data[micrograph_name].values
        source_group_ids = np.sort(np.unique(data[exp_group_id_name]))
        new_ids, _, _ = assign_time_groups(
            micrographs=movies,
            source_group_ids=source_group_ids,
            group_id_lookup=data[exp_group_id_name].values,
            time_group_size=param,
            verbose=getattr(args, "verbose", 0),
        )
        data[exp_group_id_name] = new_ids
        sync_group_columns(data, exp_group_id_name)
        from ...io.groups import propagate_ctf_median

        propagate_ctf_median(data, exp_group_id_name)
        output_slots.add(exp_group_id_name.split("/")[0])
        output_title += f"->{len(np.unique(new_ids))} time groups"
        index_d["assignExposureGroupByTime"] += 1
    return data, output_title, output_slots, index_d


def _add_copyAssignments(parser):
    parser.add_argument(
        "--copyExposureGroupAssignments", type=str, metavar="<csFile>", default="",
        help="copy exposure-group assignments from another .cs file (by uid)",
    )


def _h_copyAssignments(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    from ...io.cs import read_cs
    from ...io.groups import sync_group_columns

    if param:
        src = read_cs(param)
        src_df = pd.DataFrame.from_records(src.tolist(), columns=src.dtype.names)
        src_col = next(
            (c for c in src_df.columns if c.endswith("exp_group_id")), None
        )
        if src_col is None or "uid" not in src_df:
            raise HeliconError(f"{param} lacks uid / exp_group_id columns")
        mapping = dict(zip(src_df["uid"], src_df[src_col]))
        if "uid" not in data:
            raise HeliconError("input lacks a uid column")
        missing = ~data["uid"].isin(mapping)
        if missing.any():
            raise HeliconError(
                f"{int(missing.sum())} particles have no match in {param}"
            )
        data[exp_group_id_name] = data["uid"].map(mapping)
        sync_group_columns(data, exp_group_id_name)
        output_slots.add(exp_group_id_name.split("/")[0])
        output_title += "->copied group assignments"
        index_d["copyExposureGroupAssignments"] += 1
    return data, output_title, output_slots, index_d


def _add_copyParameters(parser):
    parser.add_argument(
        "--copyExposureGroupParameters", type=str, metavar="<csFile>", default="",
        help="copy per-group CTF parameters (medians) from another .cs file",
    )


def _h_copyParameters(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    from ...io.cs import read_cs

    if param:
        src = read_cs(param)
        src_df = pd.DataFrame.from_records(src.tolist(), columns=src.dtype.names)
        src_col = next(
            (c for c in src_df.columns if c.endswith("exp_group_id")), None
        )
        if src_col is None:
            raise HeliconError(f"{param} lacks an exp_group_id column")
        ctf_cols = [
            c
            for c in src_df.columns
            if c.startswith("ctf/") and c in data.columns and c != src_col
        ]
        for gid, g in src_df.groupby(src_col):
            sel = data[exp_group_id_name] == gid
            if not sel.any():
                continue
            for c in ctf_cols:
                vals = np.stack(g[c].values) if g[c].dtype == object else g[c].values
                data.loc[sel, c] = [np.median(vals, axis=0)] * int(sel.sum()) if (
                    np.ndim(np.median(vals, axis=0)) > 0
                ) else np.median(vals)
        output_slots.add("ctf")
        output_title += "->copied group parameters"
        index_d["copyExposureGroupParameters"] += 1
    return data, output_title, output_slots, index_d


def _add_splitByMicrograph(parser):
    parser.add_argument(
        "--splitByMicrograph", type=int, metavar="<0|1>", default=0,
        help="assign alignments3D/split halves balanced by micrograph",
    )


def _h_splitByMicrograph(
    data, args, index_d, param, output_title, output_slots,
    exp_group_id_name, micrograph_name, original_exp_group_ids,
):
    if param:
        col_mid = (
            "location/micrograph_uid"
            if "location/micrograph_uid" in data
            else micrograph_name
        )
        mids = np.unique(data[col_mid])
        masks = [data[col_mid] == mid for mid in mids]
        counts = [int(np.sum(m)) for m in masks]
        group1, group2 = split_array(counts)
        col_split = "alignments3D/split"
        if col_split not in data:
            data[col_split] = 0
        for gi, g in enumerate([group1, group2]):
            for mid_index in g:
                data.loc[masks[mid_index], col_split] = gi
        output_slots.add("alignments3D")
        output_title += "->per-micrograph split"
        index_d["splitByMicrograph"] += 1
    return data, output_title, output_slots, index_d


PLUGINS = [
    Plugin("changePixelSize", _add_changePixelSize, _h_changePixelSize),
    Plugin("resetExposureGroups", _add_resetExposureGroups, _h_resetExposureGroups),
    Plugin(
        "assignExposureGroupPerMicrograph",
        _add_assignPerMicrograph,
        _h_assignPerMicrograph,
    ),
    Plugin(
        "assignExposureGroupByBeamShiftLabel",
        _add_assignByBeamShiftLabel,
        _h_assignByBeamShiftLabel,
    ),
    Plugin(
        "assignExposureGroupByBeamShiftXY",
        _add_assignByBeamShiftXY,
        _h_assignByBeamShiftXY,
    ),
    Plugin("assignExposureGroupByTime", _add_assignByTime, _h_assignByTime),
    Plugin(
        "copyExposureGroupAssignments", _add_copyAssignments, _h_copyAssignments
    ),
    Plugin(
        "copyExposureGroupParameters", _add_copyParameters, _h_copyParameters
    ),
    Plugin("splitByMicrograph", _add_splitByMicrograph, _h_splitByMicrograph),
]
