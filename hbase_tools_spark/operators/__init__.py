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
from ..sources import kv  # noqa: F401, E402 — registers the KV-ingest query

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
