"""Operator modules — importing this package registers every declared query."""

from . import reference_surface  # noqa: F401
