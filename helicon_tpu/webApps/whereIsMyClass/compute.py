"""whereIsMyClass compute layer.

Reference: webApps/whereIsMyClass/compute.py (526 LoC): micrograph
loading with local-mean resampling + band-pass (26-50), RELION/CryoSPARC
project-layout inference (16-64), class selection/grouping (76-88),
same-class same-polarity pair-distance computation (91-128), class
abundance (149-153), 3D-class XYZ projection sheets (156-185). The
plotly figure builders of the reference (285-526) are UI-side and live
with the app.
"""

from __future__ import annotations

import pathlib

import numpy as np

from ...core.filters import low_high_pass_filter
from ...io.mrc import mrc_header, read_mrc
from ...utils.cache import cache, setup_cache_dir

_cache_dir = setup_cache_dir()


def get_project_root_dir(param_file: str):
    """RELION (star: 3 levels up) / CryoSPARC (cs: 2 levels up) project
    root (compute.py:16-24)."""
    f = pathlib.Path(param_file)
    if param_file.endswith(".star"):
        return f.parent.parent.parent
    if param_file.endswith(".cs"):
        return f.parent.parent
    return None


def _resize_local_mean(data: np.ndarray, output_shape):
    """Anti-aliased local-mean resize (skimage resize_local_mean analog)
    via block-mean when downscaling, linear interp otherwise."""
    from scipy.ndimage import zoom

    ny, nx = data.shape
    oy, ox = output_shape
    if oy <= ny and ox <= nx:
        # integer-factor block averaging then fine zoom
        fy, fx = ny // oy, nx // ox
        if fy > 1 or fx > 1:
            data = data[: oy * fy, : ox * fx].reshape(oy, fy, ox, fx).mean(
                axis=(1, 3)
            )
            return data.astype(np.float32)
    return zoom(
        data, (oy / ny, ox / nx), order=1, grid_mode=True, mode="grid-constant"
    ).astype(np.float32)


def get_micrograph(
    filename, target_apix: float, low_pass_angstrom: float, high_pass_angstrom: float
):
    """Load + resample + band-pass one micrograph (compute.py:26-50).
    Returns (data, target_apix, original_apix)."""
    data, apix = read_mrc(filename)
    data = np.squeeze(np.asarray(data, np.float32))
    apix = round(float(apix), 4)
    ny, nx = data.shape
    new_ny = int(ny * apix / target_apix + 0.5) // 2 * 2
    new_nx = int(nx * apix / target_apix + 0.5) // 2 * 2
    data = _resize_local_mean(data, (new_ny, new_nx))
    if low_pass_angstrom > 0 or high_pass_angstrom > 0:
        data = np.asarray(
            low_high_pass_filter(
                data,
                low_pass_fraction=(
                    2 * target_apix / low_pass_angstrom if low_pass_angstrom > 0 else 0
                ),
                high_pass_fraction=(
                    2 * target_apix / high_pass_angstrom
                    if high_pass_angstrom > 0
                    else 0
                ),
            )
        )
    return data, target_apix, apix


def get_class_file(param_file: str):
    """Class-average stack path from the metadata file path
    (compute.py:53-64)."""
    f = pathlib.Path(param_file)
    if param_file.endswith(".star"):
        if "Class3D" in f.as_posix():
            return sorted(f.parent.glob(f.stem[:10] + "class*.mrc"))
        return f.parent / (f.stem[:10] + "classes.mrcs")
    if param_file.endswith(".cs"):
        return f.parent / (f.stem[:7] + "class_averages.mrc")
    return None


def get_filament_length(helices, particle_box_length: float = 0):
    """Per-filament length from track extents (compute.py:67-73)."""
    lengths = []
    for _, g in helices:
        t = g["rlnHelicalTrackLengthAngst"].astype(float).values
        lengths.append(t.max() - t.min() + particle_box_length)
    return lengths


def select_classes(params, class_indices):
    """(micrograph, tube) groups of particles in the 0-based classes
    (compute.py:76-82)."""
    mask = params["rlnClassNumber"].astype(int).isin(np.asarray(class_indices) + 1)
    particles = params.loc[mask, :]
    return list(particles.groupby(["rlnMicrographName", "rlnHelicalTubeID"]))


def select_helices_from_helixID(params, ids):
    mask = params["helixID"].astype(int).isin(ids)
    return list(
        params.loc[mask, :].groupby(["rlnMicrographName", "rlnHelicalTubeID"])
    )


def compute_pair_distances(helices, lengths=None, target_total_count: int = -1):
    """Same-class same-polarity segment pair distances, longest filaments
    first until the target count (compute.py:91-128).
    Returns (sorted distances, min filament length used)."""
    sorted_indices = (
        (np.argsort(lengths))[::-1] if lengths is not None else range(len(helices))
    )
    min_len = 0
    dists = []
    for i in sorted_indices:
        _, segments_all = helices[i]
        for ci in np.unique(segments_all["rlnClassNumber"]):
            segments = segments_all.loc[segments_all["rlnClassNumber"] == ci, :]
            pos = segments["rlnHelicalTrackLengthAngst"].values.astype(float)
            psi = segments["rlnAnglePsi"].values.astype(float)
            d = np.triu(np.abs(pos[:, None] - pos))
            same_polarity = np.abs((psi[:, None] - psi + 180) % 360 - 180) < 90
            d = d[same_polarity]
            dists.extend(d[d > 0])
        if (
            lengths is not None
            and target_total_count > 0
            and len(dists) > target_total_count
        ):
            min_len = lengths[i]
            break
    if not dists:
        return [], 0
    return np.sort(dists), min_len


def estimate_inter_segment_distance(data):
    """Median spacing between consecutive segments (compute.py:131-146)."""
    dists_all = []
    for _, particles in data.groupby(
        ["rlnMicrographName", "rlnHelicalTubeID"], sort=False
    ):
        if len(particles) < 2:
            continue
        d = np.sort(particles["rlnHelicalTrackLengthAngst"].astype(float).values)
        dists_all.append(d[1:] - d[:-1])
    return float(np.median(np.hstack(dists_all)))


def get_class_abundance(params, nClass: int):
    """Particle count per class (compute.py:149-153)."""
    abundance = np.zeros(nClass, dtype=int)
    for gn, g in params.groupby("rlnClassNumber"):
        abundance[int(gn) - 1] = len(g)
    return abundance


@cache(cache_dir=str(_cache_dir / "whereIsMyClass"), expires_after=7, verbose=0)
def get_one_map_xyz_projects(data, nx):
    """X/Y/Z projection sheet of one 3D class (compute.py:185-230)."""
    data = np.asarray(data)
    projs = [data.sum(axis=i) for i in (2, 1, 0)]
    sheet = np.zeros((nx, nx * 3), np.float32)
    for i, p in enumerate(projs):
        py, px = p.shape
        sheet[:py, i * nx : i * nx + px] = p
    return sheet


def get_class3d_projections_from_files(classFiles):
    """Projection sheets for a list of 3D class maps (compute.py:156-172)."""
    projections = []
    apix, nx = 1.0, 0
    for f in classFiles:
        data, apix = read_mrc(f)
        nx = int(mrc_header(f).nx)
        projections.append(get_one_map_xyz_projects(np.asarray(data), nx))
    return np.array(projections), apix, nx
