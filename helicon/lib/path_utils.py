"""Compat shim: reference helicon.lib.path_utils -> helicon_tpu.utils.path_utils."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.utils.path_utils")
