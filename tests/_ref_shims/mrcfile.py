"""Test-only ``mrcfile`` shim backed by the native MRC2014 codec.

Placed on PYTHONPATH ONLY for the reference-test-suite subprocess
(tests/test_reference_testsuite.py) so reference tests that build MRC
fixtures through ``mrcfile.new`` / read results through
``mrcfile.open`` / patch ``mrcfile.open`` run in this environment,
which does not ship the external package. Covers exactly the API
subset those tests use; it is NOT part of the library.
"""

import gzip
import shutil
import tempfile
from pathlib import Path

import numpy as np

from helicon_tpu.io.mrc import mrc_header, read_mrc, write_mrc


class _VoxelSize:
    def __init__(self, apix: float):
        self.x = self.y = self.z = float(apix)


class _MrcShim:
    def __init__(self, path, writable: bool = False, load: bool = True):
        self._path = str(path)
        self._writable = writable
        self._data = None
        self._apix = 1.0
        self.header = None
        if load:
            real = self._path
            if real.endswith(".gz"):  # mrcfile reads .map.gz transparently
                tmp = Path(tempfile.mkdtemp()) / Path(real).stem
                # NB: bare open() would hit this module's mrcfile.open
                with gzip.open(real, "rb") as src, tmp.open("wb") as dst:
                    shutil.copyfileobj(src, dst)
                real = str(tmp)
            self._data, self._apix = read_mrc(real)
            self.header = mrc_header(real)
            # mrcfile returns a 2-D array for single-section files;
            # the native reader always returns (nz, ny, nx)
            if (
                getattr(self._data, "ndim", 0) == 3
                and self._data.shape[0] == 1
            ):
                self._data = self._data[0]

    @property
    def data(self):
        return self._data

    def set_data(self, arr):
        self._data = np.asarray(arr)
        self._flush()

    @property
    def voxel_size(self):
        return _VoxelSize(self._apix)

    @voxel_size.setter
    def voxel_size(self, v):
        if hasattr(v, "x"):
            self._apix = float(v.x)
        elif isinstance(v, (tuple, list)):
            self._apix = float(v[0])
        else:
            self._apix = float(v)
        self._flush()

    def _flush(self):
        if self._writable and self._data is not None:
            write_mrc(self._path, self._data, apix=self._apix)

    def close(self):
        self._flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def open(name, mode: str = "r", permissive: bool = False, **kwargs):  # noqa: A001
    # r+ keeps the existing data and voxel size loaded AND writable;
    # w+ starts from an empty in-memory state like the real package
    return _MrcShim(name, writable=mode in ("r+", "w+"), load=mode != "w+")


def new(name, data=None, overwrite: bool = False, **kwargs):
    m = _MrcShim(name, writable=True, load=False)
    if data is not None:
        m.set_data(data)
    return m
