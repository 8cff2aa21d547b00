#!/usr/bin/env python

"""A Web app for helical indexing using the 2D cylindrical projection of a 3D map"""

import argparse
import logging

from helicon_tpu.commands._launchers import run_remote_streamlit_app

logger = logging.getLogger(__name__)


def main(args):
    run_remote_streamlit_app("https://raw.githubusercontent.com/jianglab/HI3D/master/hi3d.py", "https://jianglab.science.psu.edu/hi3d")


def add_args(parser):
    """No additional CLI arguments for this web app launcher."""
    return parser


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    main(add_args(parser).parse_args())
