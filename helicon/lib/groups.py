"""Compat shim: reference helicon.lib.groups -> helicon_tpu.io.groups."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.io.groups")
