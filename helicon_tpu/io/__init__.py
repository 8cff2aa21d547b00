"""Data & I/O layer: MRC, STAR, CS, cisTEM metadata, EMDB, EPU, groups.

Reference: lib/io.py, lib/io_mrc.py, lib/dataset.py, lib/epu.py,
lib/groups.py — rebuilt natively (mrcfile/starfile/cryosparc-tools are
not dependencies here).
"""

from .mrc import (  # noqa: F401
    MrcHeader,
    change_map_axes_order,
    display_map_orthoslices,
    get_image_number,
    get_image_size,
    mrc_header,
    read_image_2d,
    read_mrc,
    write_mrc,
)
from .star import read_star, write_star  # noqa: F401
from .cs import read_cs, write_cs  # noqa: F401
from .metadata import *  # noqa: F401,F403


def __getattr__(name):
    import importlib

    lazy = {
        "dataset": ".dataset",
        "EMDB": ".dataset",
        "epu": ".epu",
        "groups": ".groups",
    }
    if name in lazy:
        mod = importlib.import_module(lazy[name], __name__)
        return getattr(mod, name, mod)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
