"""``helicon`` — drop-in compatibility package for jianglab/helicon users.

This package mirrors the reference package layout (src/helicon/:
flat namespace + lib/ + plugins/ + commands/ + webApps/) on top of
``helicon_tpu``, the TPU-native implementation.  Code written against
the reference runs unchanged::

    import helicon
    helicon.calc_fsc(...)

    from helicon.lib.curvelet import curvelet_denoise_udct
    from helicon.plugins.images2star.select import handle
    from helicon.commands import proc3d

Every name resolves lazily to its ``helicon_tpu`` implementation; see
``helicon/_shim.py`` and ``docs/MIGRATION.md`` for the module map.
"""

from __future__ import annotations

import helicon_tpu as _impl

from ._shim import install_alias_finder, reexport

__version__ = getattr(_impl, "__version__", "2026.08")

# Sentinel for helicon_tpu's monkeypatch seams: production code resolves
# user-patchable symbols through ``sys.modules["helicon"]`` ONLY when
# that module is this compat package (a different distribution may own
# the name in the same process, e.g. side-by-side parity testing).
_HELICON_TPU_COMPAT = True

_flat_getattr, _flat_dir = reexport(__name__, "helicon_tpu")


def __getattr__(name: str):
    try:
        return _flat_getattr(name)
    except AttributeError:
        # Subpackage attribute access after a bare `import helicon` —
        # the reference binds `helicon.lib` as a star-import side effect
        # (reference __init__.py), so `helicon.lib.util.f(...)` must work
        # without an explicit `import helicon.lib`. Resolve any subtree
        # (lib, plugins, commands, webApps, core, io, ...) by importing it.
        import importlib

        try:
            return importlib.import_module(f"{__name__}.{name}")
        except ImportError:
            raise AttributeError(
                f"module {__name__!r} has no attribute {name!r}"
            ) from None


def __dir__():
    return sorted(set(_flat_dir()) | {"lib", "plugins", "commands", "webApps"})

# `import helicon.commands.proc3d`, `from helicon.webApps.denovo3D import
# app`, `helicon.denovo3d`, ... resolve to the very same module objects
# as their helicon_tpu counterparts.
install_alias_finder()

# The reference's __init__ eagerly exposes the dataset singleton module
# (reference __init__.py:218) — helicon_tpu's flat namespace already
# carries `dataset` and `cache_dir`, so attribute delegation covers both.
