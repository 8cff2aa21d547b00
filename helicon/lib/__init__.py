"""Compat shims for ``helicon.lib.*`` (reference src/helicon/lib/).

Each module here is a lazy re-export of the helicon_tpu module(s) that
implement the same surface.  The reference's lib/__init__.py is empty,
but the reference's top-level __init__ star-imports the lib modules,
binding them as attributes — so ``helicon.lib.util`` must resolve after
a bare ``import helicon``.  PEP 562 below imports submodules on
attribute access.
"""


def __getattr__(name: str):
    import importlib

    try:
        return importlib.import_module(f"{__name__}.{name}")
    except ImportError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
