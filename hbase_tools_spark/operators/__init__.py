"""Operator modules — importing this package registers every query."""

from . import analyzer, tpch  # noqa: F401

__all__ = ["analyzer", "tpch"]
