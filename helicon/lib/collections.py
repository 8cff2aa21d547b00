"""Compat shim: reference helicon.lib.collections -> helicon_tpu.utils.collections."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.utils.collections")
