"""Batch-processing plugin registries (images2star / proc3d / cryosparc).

Reference: src/helicon/plugins/ — auto-discovered modules each exporting
(option_name, add_args, handle) (plugins/images2star/__init__.py:13-45).
Here related options are grouped into fewer modules; a module may export
either the single-plugin protocol or a PLUGINS list of Plugin records.
"""

from .registry import Plugin, discover_plugins  # noqa: F401
