"""Compat shim: reference helicon.lib.util -> helicon_tpu.utils.cache, helicon_tpu.utils.logging, helicon_tpu.utils.collections, helicon_tpu.utils.path_utils, helicon_tpu.utils.system, helicon_tpu.angular, helicon_tpu."""

from helicon._shim import reexport

__getattr__, __dir__ = reexport(__name__, "helicon_tpu.utils.cache", "helicon_tpu.utils.logging", "helicon_tpu.utils.collections", "helicon_tpu.utils.path_utils", "helicon_tpu.utils.system", "helicon_tpu.angular", "helicon_tpu")
