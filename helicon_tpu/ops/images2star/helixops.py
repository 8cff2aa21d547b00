"""Helix-aware options: breakFilaments, resetInterSegmentDistance,
estimateHelicalTubeLength, normEulerDist.

Reference: plugins/images2star/{breakfilaments,resetintersegmentdistance,
estimatehelicaltubelength,normeulerdist}.py.
"""

from __future__ import annotations

import logging
import math

import numpy as np
import pandas as pd

from ...core.analysis import (
    estimate_helicalTube_length,
    find_elbow_point,
    reset_inter_segment_distance,
)
from ...utils.exceptions import HeliconError
from ...utils.system import parse_param_str
from ..registry import Plugin

logger = logging.getLogger(__name__)


def _add_breakFilaments(parser):
    parser.add_argument(
        "--breakFilaments", type=str, metavar="maxSegments=<n>",
        action="append", default=[],
        help="break long filaments into pieces of at most maxSegments segments",
    )


def _h_breakFilaments(data, args, index_d, param):
    if len(param):
        _, pd_ = parse_param_str(param)
        max_segments = int(pd_.get("maxSegments", 50))
        if max_segments < 1:
            raise HeliconError("maxSegments must be >= 1")
        if "rlnHelicalTubeID" not in data:
            raise HeliconError("rlnHelicalTubeID is required for --breakFilaments")
        var = next(
            (v for v in ("rlnMicrographName", "rlnImageName") if v in data), ""
        )
        if not var:
            raise HeliconError("rlnMicrographName or rlnImageName must be available")
        if "@" in str(data[var].iloc[0]):
            tmp = data[var].str.split("@", expand=True)
            group_var = "filename"
            data[group_var] = tmp.iloc[:, 1]
        else:
            group_var = var
        if "rlnHelicalTubeIDOriginal" not in data:
            data["rlnHelicalTubeIDOriginal"] = data["rlnHelicalTubeID"]
        # reference breakfilaments.py semantics exactly: filaments within
        # the limit keep their original row order; oversized filaments
        # are ordered by track length before chunking; new tube IDs are
        # 0-based in group-encounter order (reference's enumerate)
        groups = data.groupby([group_var, "rlnHelicalTubeID"], sort=False)
        new_filaments = []
        for _, group in groups:
            n = len(group)
            if n <= max_segments:
                new_filaments.append(list(group.index))
                continue
            indices = list(group.index)
            if "rlnHelicalTrackLengthAngst" in data:
                indices = (
                    data.loc[indices]
                    .sort_values("rlnHelicalTrackLengthAngst")
                    .index.tolist()
                )
            for i in range(0, n, max_segments):
                new_filaments.append(indices[i : i + max_segments])
        for new_id, idx in enumerate(new_filaments):
            data.loc[idx, "rlnHelicalTubeID"] = new_id
        if group_var != var:
            data.drop(columns=[group_var], inplace=True)
        index_d["breakFilaments"] += 1
    return data, index_d


def _add_resetInterSegmentDistance(parser):
    parser.add_argument(
        "--resetInterSegmentDistance", type=float, metavar="<A>", default=0,
        help="resample filament segments at the new inter-segment distance",
    )


def _h_resetInterSegmentDistance(data, args, index_d, param):
    if param > 0:
        bad = [
            v
            for v in "rlnImageName rlnHelicalTubeID rlnCoordinateX rlnCoordinateY".split()
            if v not in data
        ]
        if bad:
            raise HeliconError(f"parameters {' '.join(bad)} do not exist")
        apix_micrograph = 0
        optics = data.attrs.get("optics")
        if optics is not None:
            for attr in ("rlnMicrographPixelSize", "rlnMicrographOriginalPixelSize"):
                if attr in optics:
                    apix_micrograph = optics[attr].iloc[0]
                    break
        if apix_micrograph <= 0:
            raise HeliconError(
                "neither rlnMicrographPixelSize nor "
                "rlnMicrographOriginalPixelSize is available"
            )
        data = reset_inter_segment_distance(
            data,
            new_inter_segment_distance=param,
            apix_micrograph=apix_micrograph,
            verbose=getattr(args, "verbose", 0),
        )
    return data, index_d


def _add_estimateHelicalTubeLength(parser):
    parser.add_argument(
        "--estimateHelicalTubeLength", type=int, metavar="<0|1>", default=0,
        help="add per-segment filament length/position columns",
    )


def _h_estimateHelicalTubeLength(data, args, index_d, param):
    if param:
        bad = [
            v
            for v in "rlnImageName rlnHelicalTubeID rlnCoordinateX rlnCoordinateY".split()
            if v not in data
        ]
        if bad:
            raise HeliconError(f"parameters {' '.join(bad)} do not exist")
        data = estimate_helicalTube_length(
            data, verbose=getattr(args, "verbose", 0)
        )
    return data, index_d


def _add_normEulerDist(parser):
    parser.add_argument(
        "--normEulerDist", type=float, nargs=2, metavar=("<bin>", "<nkeep>"),
        default=[], help="prune over-populated Euler angle bins",
    )


def _h_normEulerDist(data, args, index_d, param):
    if len(param) == 2:
        bin_, nkeep = param
        nkeep = int(nkeep)

        def assignEulerBins(rottilt):
            rot, tilt = rottilt
            tilt = int(tilt / bin_ + 0.5) * bin_
            if tilt == 0 or tilt == 180:
                rot = 0
            else:
                step = bin_ / math.sin(math.radians(tilt))
                rot = int(rot / step + 0.5) * step
            return (tilt, rot)

        binAngles = data[["rlnAngleRot", "rlnAngleTilt"]].apply(
            assignEulerBins, axis=1
        )
        binAssignments = binAngles.groupby(binAngles, sort=False)
        counts = binAssignments.size().sort_values(ascending=True)
        elbow = counts.iloc[find_elbow_point(counts.values)]
        if nkeep < 1:
            nkeep = int(elbow)
        indices = []
        for be, bm in dict(list(binAssignments)).items():
            binPtcls = data.loc[bm.index, :]
            if "rlnLogLikeliContribution" in binPtcls:
                binPtcls2 = binPtcls.sort_values(
                    "rlnLogLikeliContribution", ascending=True
                ).tail(n=nkeep)
            elif len(binPtcls) > nkeep:
                binPtcls2 = binPtcls.sample(n=nkeep)
            else:
                binPtcls2 = binPtcls
            indices.extend(binPtcls2.index)
        indices.sort()
        attrs = dict(data.attrs)
        data = data.loc[indices, :]
        data.attrs.update(attrs)
        index_d["normEulerDist"] += 1
    return data, index_d


PLUGINS = [
    Plugin("breakFilaments", _add_breakFilaments, _h_breakFilaments),
    Plugin(
        "resetInterSegmentDistance",
        _add_resetInterSegmentDistance,
        _h_resetInterSegmentDistance,
    ),
    Plugin(
        "estimateHelicalTubeLength",
        _add_estimateHelicalTubeLength,
        _h_estimateHelicalTubeLength,
    ),
    Plugin("normEulerDist", _add_normEulerDist, _h_normEulerDist),
]
