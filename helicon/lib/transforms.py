"""Compat shim: reference helicon.lib.transforms -> helicon_tpu.core.transforms, helicon_tpu."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.core.transforms", "helicon_tpu")
