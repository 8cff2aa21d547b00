"""Compat shim: reference helicon.lib.io_mrc -> helicon_tpu.io.mrc."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.io.mrc")
