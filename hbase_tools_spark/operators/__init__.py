"""Operator modules — importing this package registers every query."""

from . import (  # noqa: F401
    analyzer,
    funnels,
    health,
    joins,
    keyspace,
    planners,
    reports,
    sketches,
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
    "sketches",
    "temporal",
    "tpch",
    "writepath",
]
