"""Compat shims for reference plugins/cryosparc/* (one alias module per option)."""

from helicon_tpu.ops.cryosparc import _plugins

from helicon.plugins import register_family

register_family(__name__, _plugins)
