"""Operator modules — importing this package registers every query."""

from . import analyzer, planners, reports, tpch  # noqa: F401

__all__ = ["analyzer", "planners", "reports", "tpch"]
