"""A command line tool that works with CryoSPARC .cs files / server jobs

Loads particles/exposures from local .cs files (with automatic
passthrough merging), applies the CLI-ordered exposure-group/extraction
pipeline, and saves the result as a local .cs file.

Reference: src/helicon/commands/cryosparc.py (317 LoC). Server-job IO
(projectID/jobID) requires cryosparc-tools and is rejected with a clear
message when absent; local-file mode is fully supported.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np
import pandas as pd

from helicon_tpu.utils.exceptions import HeliconError

logger = logging.getLogger(__name__)


def main(args: argparse.Namespace) -> None:
    from helicon_tpu.io.cs import read_cs
    from helicon_tpu.io.metadata import dataframe2cs
    from helicon_tpu.ops.cryosparc import dispatch
    from helicon_tpu.utils.collections import first_matched_attr
    from helicon_tpu.utils.logging import log_command_line

    log_command_line()
    logging.basicConfig(
        level=(
            logging.DEBUG
            if args.verbose > 2
            else logging.INFO if args.verbose > 0 else logging.ERROR
        ),
        format="%(message)s",
        stream=sys.stdout,
    )

    if not args.csFile:
        raise HeliconError(
            "CryoSPARC server mode (--projectID/--jobID) requires "
            "cryosparc-tools; provide local --csFile inputs instead"
        )

    frames = []
    input_types = []
    for f in args.csFile:
        cs = read_cs(f)
        df = pd.DataFrame.from_records(cs.tolist(), columns=cs.dtype.names)
        pts = sorted(Path(f).parent.glob("*_passthrough_particles.cs")) or sorted(
            Path(f).parent.glob("*_passthrough_exposures.cs")
        )
        if pts:
            p = read_cs(pts[0])
            pdf = pd.DataFrame.from_records(p.tolist(), columns=p.dtype.names)
            add = [c for c in pdf.columns if c not in df.columns or c == "uid"]
            if "uid" in pdf and "uid" in df:
                df = df.merge(pdf[add], on="uid", how="left")
        frames.append(df)
        input_types.append("particle" if "blob/path" in df else "exposure")
    if len(set(input_types)) > 1:
        raise HeliconError(f"mixed input types: {input_types}")
    data = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    if not len(data):
        raise HeliconError("no data in the input")
    data.attrs["convention"] = "cryosparc"

    attrs = (
        "movie_blob/path micrograph_blob/path location/micrograph_path blob/path"
    ).split()
    micrograph_name = first_matched_attr(data, attrs=attrs)
    if micrograph_name is None:
        raise HeliconError(f"one of {attrs} must be available")

    from helicon_tpu.utils.collections import all_matched_attrs

    exp_group_id_name = first_matched_attr(
        data,
        attrs="ctf/exp_group_id location/exp_group_id mscope_params/exp_group_id".split(),
    )
    if exp_group_id_name is None:
        exp_group_id_name = "mscope_params/exp_group_id"
        data[exp_group_id_name] = np.uint32(1)
    original_exp_group_ids = np.unique(data[exp_group_id_name])

    output_title = ""
    output_slots = set()
    index_d = {o: 0 for o in args.all_options}
    for option_name in args.all_options:
        if option_name in args.append_options:
            param = args.__dict__[option_name][index_d[option_name]]
            index_d[option_name] += 1
        else:
            param = args.__dict__[option_name]
        if args.verbose:
            logger.info("%s: %s", option_name, param)
        data, output_title, output_slots, index_d = dispatch(
            option_name, data, args, index_d, param, output_title, output_slots,
            exp_group_id_name, micrograph_name, original_exp_group_ids,
        )

    out = args.output_csFile or (
        Path(args.csFile[0]).stem + ".helicon.cs"
    )
    dataframe2cs(data, out)
    if args.verbose:
        logger.info("%d rows saved to %s (%s)", len(data), out, output_title)


def add_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--csFile", metavar="<file.cs>", type=str, nargs="+", default=[],
        help="local CryoSPARC .cs file(s)",
    )
    parser.add_argument(
        "--output_csFile", metavar="<file.cs>", type=str, default="",
        help="output .cs file (default: <input>.helicon.cs)",
    )
    parser.add_argument("--projectID", metavar="<PX>", type=str, default="",
                        help="CryoSPARC project (requires cryosparc-tools)")
    parser.add_argument("--jobID", metavar="<JX>", type=str, nargs="+",
                        default=[], help="CryoSPARC job(s)")
    parser.add_argument("--groupIndex", metavar="<n>", type=int, nargs="+",
                        default=[0], help="output group index per job")
    parser.add_argument("--saveLocal", type=int, metavar="<0|1>", default=1,
                        help="save outputs locally")
    parser.add_argument("--verbose", type=int, metavar="<0|1|2>", default=2,
                        help="verbose level")
    parser.add_argument("--cpu", type=int, metavar="<n>", default=-1,
                        help="accepted for compatibility (XLA owns threading)")

    from helicon_tpu.ops.cryosparc import add_plugin_args

    add_plugin_args(parser)
    return parser


def check_args(args, parser):
    from helicon_tpu.utils.system import get_option_list

    args.append_options = [
        a.dest for a in parser._actions if type(a) is argparse._AppendAction
    ]
    all_options = get_option_list(sys.argv[1:])
    skip = (
        "cpu csFile output_csFile projectID jobID groupIndex saveLocal verbose"
    ).split()
    args.all_options = [o for o in all_options if o not in skip]
    return args


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    add_args(parser)
    args = parser.parse_args()
    args = check_args(args, parser)
    main(args)
