"""Compat shims for reference plugins/proc3d/* (one alias module per option)."""

from helicon_tpu.ops.proc3d import _plugins

from helicon.plugins import register_family

register_family(__name__, _plugins)
