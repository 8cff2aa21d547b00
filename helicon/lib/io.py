"""Compat shim: reference helicon.lib.io -> helicon_tpu.io.metadata, helicon_tpu.io.star, helicon_tpu.io.cs, helicon_tpu.io.mrc, helicon_tpu."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.io.metadata", "helicon_tpu.io.star", "helicon_tpu.io.cs", "helicon_tpu.io.mrc", "helicon_tpu")
