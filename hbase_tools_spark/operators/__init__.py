"""Operator modules — importing this package registers every query."""

from . import (  # noqa: F401
    analyzer,
    funnels,
    health,
    joins,
    keyspace,
    planners,
    reports,
    temporal,
    tpch,
    writepath,
)

__all__ = [
    "analyzer",
    "funnels",
    "health",
    "joins",
    "keyspace",
    "planners",
    "reports",
    "temporal",
    "tpch",
    "writepath",
]
