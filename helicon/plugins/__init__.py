"""Compat shims for ``helicon.plugins.<family>.<plugin>``.

The reference ships one module per plugin (plugins/images2star/select.py
etc.), each exporting ``option_name`` / ``add_args`` / ``handle``.
helicon_tpu groups plugins into themed modules behind a registry
(helicon_tpu/ops/registry.py), so the family subpackages here
synthesize one alias module per registered plugin at import time —
``from helicon.plugins.images2star.select import handle`` resolves to
the registry's handle for the ``select`` option.
"""


def __getattr__(name: str):
    # `helicon.plugins.images2star` must resolve after a bare
    # `import helicon.plugins` (attribute access imports the family).
    import importlib

    try:
        return importlib.import_module(f"{__name__}.{name}")
    except ImportError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None


def register_family(pkg_name: str, plugins: dict) -> None:
    """Create ``sys.modules`` entries for each plugin under pkg_name.

    Each option is registered under both its verbatim option name and
    its lowercased form — the reference's file names use both styles
    (selectFile.py vs denoisecurvelet.py for option denoiseCurvelet).
    """
    import sys
    import types

    pkg = sys.modules[pkg_name]
    for opt, p in plugins.items():
        for modname in {opt, opt.lower()}:
            full = f"{pkg_name}.{modname}"
            mod = types.ModuleType(
                full, f"Compat shim for the reference plugin module {modname!r}"
            )
            mod.option_name = p.option_name
            mod.add_args = p.add_args
            mod.handle = p.handle
            sys.modules[full] = mod
            setattr(pkg, modname, mod)
