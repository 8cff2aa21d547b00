"""Compat shim: reference helicon.lib.ptycho -> helicon_tpu.core.ptycho."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.core.ptycho")
