"""whereIsMyClass: map 2D class members back to micrograph locations."""

from . import compute  # noqa: F401
