"""Re-export machinery for the ``helicon`` compatibility package.

``helicon`` (this package) mirrors the reference package layout
(jianglab/helicon ``src/helicon/``: flat namespace + ``lib/`` +
``plugins/`` + ``commands/`` + ``webApps/``) on top of ``helicon_tpu``,
so user code written against the reference — including deep imports like
``from helicon.lib.curvelet import curvelet_denoise_udct`` or
``from helicon.plugins.images2star.select import handle`` — runs
unchanged.  Every shim module delegates at attribute-access time
(PEP 562), so importing ``helicon`` stays cheap and the real
implementation modules load lazily.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import importlib.util
import sys
from typing import Iterable

# Subtrees that exist physically inside helicon/ and must NOT be
# redirected to helicon_tpu by the alias finder.
_PHYSICAL = {"lib", "plugins", "helicon", "_shim"}


class _AliasLoader(importlib.abc.Loader):
    """Loader that returns the helicon_tpu module object itself, so
    ``helicon.X`` and ``helicon_tpu.X`` are the same module instance
    (relative imports, isinstance checks, and module state all agree).

    ``module_from_spec`` unconditionally rewrites ``__name__``/``__spec__``/
    ``__loader__``/``__package__``/``__path__`` on whatever ``create_module``
    returns; since that object is the *live* helicon_tpu module, we snapshot
    those attributes and restore them in ``exec_module`` so the real module
    keeps its identity (relative imports, reload, logging-by-__name__)."""

    _KEEP = ("__name__", "__spec__", "__loader__", "__package__", "__path__")

    def __init__(self, target_name: str):
        self._target = target_name
        self._saved: dict = {}

    def create_module(self, spec):
        mod = importlib.import_module(self._target)
        self._saved = {k: mod.__dict__[k] for k in self._KEEP if k in mod.__dict__}
        return mod

    def exec_module(self, module):
        module.__dict__.update(self._saved)


class _AliasFinder(importlib.abc.MetaPathFinder):
    """Meta-path finder mapping ``helicon.<sub>`` -> ``helicon_tpu.<sub>``
    for every subtree not physically present in the compat package
    (commands, webApps, denovo3d, helix, core, io, utils, ops, ...)."""

    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith("helicon."):
            return None
        rest = fullname[len("helicon.") :]
        if rest.split(".", 1)[0] in _PHYSICAL:
            return None
        target_name = f"helicon_tpu.{rest}"
        try:
            found = importlib.util.find_spec(target_name)
        except (ImportError, ValueError):
            return None
        if found is None:
            return None
        spec = importlib.machinery.ModuleSpec(
            fullname,
            _AliasLoader(target_name),
            is_package=found.submodule_search_locations is not None,
        )
        # module_from_spec rewrites the live target module's __path__ from
        # this spec before exec_module restores it; carrying the REAL
        # search locations makes that rewrite a no-op (an is_package spec
        # otherwise defaults to [], which would transiently break any
        # concurrent `helicon_tpu.<pkg>.<sub>` import).
        if found.submodule_search_locations is not None:
            spec.submodule_search_locations = found.submodule_search_locations
        return spec


def install_alias_finder() -> None:
    # Must PRECEDE PathFinder: for `import helicon.commands.proc3d` the
    # parent alias module carries helicon_tpu's real __path__, so PathFinder
    # would otherwise find the same file and execute it a second time under
    # the alias name (duplicate module state).
    if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _AliasFinder())


def reexport(shim_name: str, *targets: str, extra: dict | None = None):
    """Return ``(__getattr__, __dir__)`` for a shim module.

    Attribute lookups search the ``targets`` module paths in order;
    ``extra`` provides shim-local overrides (compat helpers that have no
    single upstream home).
    """
    extra = extra or {}

    def _iter_modules() -> Iterable:
        for t in targets:
            yield importlib.import_module(t)

    def __getattr__(name: str):
        if name in extra:
            return extra[name]
        for mod in _iter_modules():
            if hasattr(mod, name):
                return getattr(mod, name)
        raise AttributeError(
            f"module {shim_name!r} (compat shim for the reference package; "
            f"backed by {', '.join(targets)}) has no attribute {name!r}"
        )

    def __dir__():
        names = set(extra)
        for mod in _iter_modules():
            names.update(n for n in dir(mod) if not n.startswith("__"))
        return sorted(names)

    return __getattr__, __dir__
