"""helicon-tpu: a TPU-native (JAX/XLA) framework for cryo-EM analysis of
helical structures, with the capabilities of jianglab/helicon.

The flat ``helicon_tpu.*`` namespace mirrors the reference's public API
(/root/reference/src/helicon/__init__.py:16-228, ~170 names) so
downstream code can switch imports without changes.
"""

__version__ = "2026.08"

from .utils import *  # noqa: F401,F403
from .utils.cache import DummyMemory, cache, setup_cache_dir  # noqa: F401
from .core import *  # noqa: F401,F403
from .core.alignment import align_images, phase_cross_correlation  # noqa: F401
from .core.curvelet import (  # noqa: F401
    curvelet_denoise_3d_mct,
    curvelet_denoise_3d_mct_tiled,
    curvelet_denoise_3d_udct,
    curvelet_denoise_3d_udct_tiled,
    curvelet_denoise_batch_fdct,
    curvelet_denoise_batch_mct,
    curvelet_denoise_batch_udct,
    curvelet_denoise_fdct,
    curvelet_denoise_fdct_tiled,
    curvelet_denoise_mct,
    curvelet_denoise_mct_tiled,
    curvelet_denoise_udct,
    curvelet_denoise_udct_tiled,
)
from .angular import *  # noqa: F401,F403
from .gauss import (  # noqa: F401
    AnisotropicGaussian,
    AnisotropicGaussianSet,
    IsotropicGaussian,
    IsotropicGaussianSet,
)
from .io import (  # noqa: F401
    change_map_axes_order,
    display_map_orthoslices,
    get_image_number,
    get_image_size,
    read_image_2d,
    read_mrc,
    write_mrc,
)
from .io.metadata import (  # noqa: F401
    Relion_OpticsGroup_Parameters,
    assign_beamshifts_to_cluster,
    cistem2dataframe,
    clean_cs_micrograph_path,
    connect_cryosparc,
    cs2dataframe,
    csv2dataframe,
    dataframe2cs,
    dataframe2file,
    dataframe2star,
    dataframe_convert,
    dataframe_cryosparc_to_relion,
    dataframe_relion_to_cryosparc,
    dataframe_guess_data_type,
    dataframe_normalize_filename,
    eman_astigmatism_to_relion,
    getPixelSize,
    get_dataframe_convention,
    get_relion_project_folder,
    guess_data_type,
    image2dataframe,
    images2dataframe,
    mrc2mrcs,
    pixelSizeAttrForImageAttr,
    relion_astigmatism_to_eman,
    setPixelSize,
    star2dataframe,
    star_build_opticsgroup,
    star_dissolve_opticsgroup,
    star_to_dataframe,
)
from .io.epu import (  # noqa: F401
    EPU_micrograph_path_2_movie_xml_path,
    EPU_xml_2_beamshift,
    assign_beamshift_groups,
    check_foilhole_xml_files,
    extract_beamshift,
    extract_data_collection_time,
    guess_data_collection_software,
    movie_filename_patterns,
    verify_data_collection_software,
)
from .io.groups import (  # noqa: F401
    assign_time_groups,
    combine_groups,
    extract_timestamps,
    per_micrograph_ids,
    per_micrograph_mapping,
    propagate_ctf_median,
    sync_group_columns,
)
from .helix import *  # noqa: F401,F403
from .point_group import PointGroup  # noqa: F401
from .clustering import AgglomerativeClusteringWithMinSize  # noqa: F401

# module-level cache dir, created at import (reference __init__.py:216)
from .utils.cache import setup_cache_dir as _setup_cache_dir

cache_dir = _setup_cache_dir()

from .utils.cache import enable_jax_compilation_cache as _enable_jax_cache

_enable_jax_cache(cache_dir)

from . import angular  # noqa: F401
from . import core  # noqa: F401
from . import euler  # noqa: F401
from . import utils  # noqa: F401
from .core import curvelet  # noqa: F401
from .utils import shiny  # noqa: F401


def __getattr__(name):
    """Lazy access to heavier subsystems (io, helix, denovo3d, ...)."""
    import importlib

    lazy = {
        "io": ".io",
        "helix": ".helix",
        "denovo3d": ".denovo3d",
        "ops": ".ops",
        "commands": ".commands",
        "parallel": ".parallel",
        "apps": ".webApps",
        "webApps": ".webApps",
        "dataset": ".io.dataset",
        "EMDB": None,  # handled below
    }
    if name == "EMDB":
        return importlib.import_module(".io.dataset", __name__).EMDB
    if name in lazy:
        return importlib.import_module(lazy[name], __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
