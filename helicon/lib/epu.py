"""Compat shim: reference helicon.lib.epu -> helicon_tpu.io.epu."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.io.epu")
