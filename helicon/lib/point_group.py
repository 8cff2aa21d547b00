"""Compat shim: reference helicon.lib.point_group -> helicon_tpu.point_group."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.point_group")
