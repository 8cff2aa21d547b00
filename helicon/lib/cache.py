"""Compat shim: reference helicon.lib.cache -> helicon_tpu.utils.cache."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.utils.cache")
