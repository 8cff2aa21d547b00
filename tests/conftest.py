"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/pjit paths are exercised on host CPU devices; the driver
separately compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def relion_df():
    """Tiny RELION-style particle dataframe (2 micrographs x 2 tubes)."""
    rows = []
    pid = 1
    for mic in ["mic1.mrc", "mic2.mrc"]:
        for tube in [1, 2]:
            for seg in range(4):
                rows.append(
                    dict(
                        rlnImageName=f"{pid:06d}@stack_{mic}s",
                        rlnMicrographName=mic,
                        rlnHelicalTubeID=tube,
                        rlnCoordinateX=100.0 + 47.5 * seg + 300 * tube,
                        rlnCoordinateY=200.0,
                        rlnHelicalTrackLengthAngst=47.5 * seg,
                        rlnAnglePsi=5.0 * seg,
                        rlnDefocusU=12000.0,
                        rlnDefocusV=11000.0,
                        rlnDefocusAngle=30.0,
                    )
                )
                pid += 1
    df = pd.DataFrame(rows)
    df.attrs["convention"] = "relion"
    return df
