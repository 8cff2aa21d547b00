"""Compat shim: reference helicon.lib.exceptions -> helicon_tpu.utils.exceptions."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.utils.exceptions")
