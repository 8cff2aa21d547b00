"""Compat shim: reference helicon.lib.logging -> helicon_tpu.utils.logging."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.utils.logging")
