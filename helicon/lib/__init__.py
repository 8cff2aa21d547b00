"""Compat shims for ``helicon.lib.*`` (reference src/helicon/lib/).

Each module here is a lazy re-export of the helicon_tpu module(s) that
implement the same surface.  The reference's lib/__init__.py is empty;
so is this one (beyond this docstring).
"""
