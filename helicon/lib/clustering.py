"""Compat shim: reference helicon.lib.clustering -> helicon_tpu.clustering."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.clustering")
