"""Test-only ``starfile`` shim backed by the native STAR codec.

Placed on PYTHONPATH ONLY for the reference-test-suite subprocess
(tests/test_reference_testsuite.py) so reference tests that write
fixtures through ``starfile.write`` / patch ``starfile.read`` run in
this environment, which does not ship the external package. The shim
reproduces the subset of the starfile API those tests exercise
(read(path, always_dict=...), write(data, path, overwrite=...)) on top
of helicon_tpu's native reader/writer; it is NOT part of the library.
"""

import pandas as pd

from helicon_tpu.io.star import read_star as _read_star
from helicon_tpu.io.star import write_star as _write_star


def read(path, always_dict: bool = False, **kwargs):
    blocks = _read_star(str(path))
    if not always_dict and len(blocks) == 1:
        return next(iter(blocks.values()))
    return dict(blocks)


def write(data, filename=None, overwrite: bool = False, **kwargs):
    if isinstance(data, pd.DataFrame):
        data = {"": data}
    _write_star(str(filename), data)
