"""Compat shim: reference helicon.lib.filters -> helicon_tpu.core.filters, helicon_tpu."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.core.filters", "helicon_tpu")
