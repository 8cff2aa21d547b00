"""Typed exceptions for clean CLI error handling.

Parity: /root/reference/src/helicon/lib/exceptions.py:14-54.
"""

__all__ = [
    "HeliconExit",
    "HeliconError",
    "HeliconValueError",
    "HeliconIOError",
    "HeliconTypeError",
    "HeliconValidationError",
    "HeliconFileExistsError",
    "HeliconConfigError",
    "HeliconDependencyError",
]


class HeliconExit(SystemExit):
    """Raised to request a clean, non-error program exit."""


class HeliconError(Exception):
    """Base class for all helicon-tpu errors."""


class HeliconValueError(HeliconError, ValueError):
    """Invalid value supplied by the user."""


class HeliconIOError(HeliconError, IOError):
    """File or network I/O failure."""


class HeliconTypeError(HeliconError, TypeError):
    """Value of an unexpected type."""


class HeliconValidationError(HeliconError):
    """Input data failed validation."""


class HeliconFileExistsError(HeliconError, FileExistsError):
    """Refusing to overwrite an existing file."""


class HeliconConfigError(HeliconError):
    """Invalid configuration or parameter string."""


class HeliconDependencyError(HeliconError, ImportError):
    """An optional dependency is required but unavailable."""
