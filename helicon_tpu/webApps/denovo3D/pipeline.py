"""Facade matching reference webApps/denovo3D/pipeline.py."""

from ...denovo3d.pipeline import (  # noqa: F401
    derive_task_geometry,
    prepare_data,
    process_one_task,
)
from ...utils.cache import cache, setup_cache_dir
from ...utils.path_utils import download_file_from_url

_cache_dir = setup_cache_dir()


def get_images_from_file(imageFile):
    """(stack, apix) from a local MRC file (reference pipeline.py:37-43).

    ``mrcfile.open`` is the load seam when that package is importable
    (the reference binds to it and its tests patch it); native MRC IO
    serves the same contract otherwise."""
    import numpy as np

    from ...utils.system import optional_loader

    mrcfile = optional_loader("mrcfile", "open")
    if mrcfile is not None:
        with mrcfile.open(imageFile) as mrc:
            apix = float(mrc.voxel_size.x)
            data = np.asarray(mrc.data)
        return data, round(apix, 4)
    from ...io.mrc import read_mrc

    data, apix = read_mrc(imageFile)
    return np.asarray(data), round(float(apix), 4)


@cache(cache_dir=str(_cache_dir / "denovo3D"), expires_after=7, verbose=0)
def get_images_from_url(url: str):
    """Download an image stack from a URL (reference pipeline.py:9-27)."""
    import tempfile
    from pathlib import Path

    import numpy as np

    from ...io.mrc import read_mrc

    tmp = Path(tempfile.mkdtemp()) / Path(url).name
    download_file_from_url(url, target_file_name=str(tmp))
    data, apix = read_mrc(tmp)
    return np.asarray(data), apix


@cache(cache_dir=str(_cache_dir / "denovo3D"), expires_after=7, verbose=0)
def get_images_from_emdb(emd_id: str):
    """EMDB map -> (map, apix) (reference pipeline.py:29-43)."""
    from ...io.dataset import EMDB

    return EMDB().read_emdb_map(emd_id)
