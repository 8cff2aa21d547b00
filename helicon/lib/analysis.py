"""Compat shim: reference helicon.lib.analysis -> helicon_tpu.core.analysis, helicon_tpu."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.core.analysis", "helicon_tpu")
