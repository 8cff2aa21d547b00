"""Compat shim: reference helicon.lib.shiny -> helicon_tpu.utils.shiny."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.utils.shiny")
