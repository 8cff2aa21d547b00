"""Compat shim: reference helicon.lib.angular -> helicon_tpu.angular."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.angular")
