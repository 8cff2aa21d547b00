"""Compat shim: reference helicon.lib.euler -> helicon_tpu.euler."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.euler")
