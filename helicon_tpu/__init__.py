"""helicon-tpu: a TPU-native (JAX/XLA) framework for cryo-EM analysis of
helical structures, with the capabilities of jianglab/helicon.

The flat ``helicon_tpu.*`` namespace mirrors the reference's public API
(/root/reference/src/helicon/__init__.py:16-228) so downstream code can
switch imports without changes.
"""

__version__ = "2026.08"

from .utils import *  # noqa: F401,F403
from .utils import cache as _cache_mod  # noqa: F401
from .core import *  # noqa: F401,F403
from .angular import *  # noqa: F401,F403

# module-level cache dir, created at import (reference __init__.py:216)
from .utils.cache import setup_cache_dir as _setup_cache_dir

cache_dir = _setup_cache_dir()

from .utils.cache import enable_jax_compilation_cache as _enable_jax_cache

_enable_jax_cache(cache_dir)

from . import core  # noqa: F401
from . import utils  # noqa: F401
from . import angular  # noqa: F401
from . import euler  # noqa: F401


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
        "apps": ".apps",
        "dataset": ".io.dataset",
        "point_group": ".point_group",
    }
    if name in lazy:
        return importlib.import_module(lazy[name], __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
