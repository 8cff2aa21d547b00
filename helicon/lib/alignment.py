"""Compat shim: reference helicon.lib.alignment -> helicon_tpu.core.alignment, helicon_tpu."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.core.alignment", "helicon_tpu")
