"""Compat shim: reference helicon/helicon.py (the CLI dispatcher module,
console entry ``helicon.helicon:main``) -> helicon_tpu.commands.helicon."""

from helicon_tpu.commands.helicon import *  # noqa: F401,F403
from helicon_tpu.commands.helicon import main  # noqa: F401
