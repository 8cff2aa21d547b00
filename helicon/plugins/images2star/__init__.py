"""Compat shims for reference plugins/images2star/* (one alias module per option)."""

from helicon_tpu.ops.images2star import _plugins

from helicon.plugins import register_family

register_family(__name__, _plugins)
