"""Compat shim: reference helicon.lib.system -> helicon_tpu.utils.system."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.utils.system")
