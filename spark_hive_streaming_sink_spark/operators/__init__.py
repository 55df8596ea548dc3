"""Batch operator modules; importing this package registers their queries."""

from . import relational  # noqa: F401
