"""Compat shim: reference helicon.lib.dataset -> helicon_tpu.io.dataset."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.io.dataset")
