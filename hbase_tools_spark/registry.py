"""Query registry: every implemented operator from SURVEY.md §2 registers
itself here with (a) a Spark DataFrame callable and (b) an equivalent
DuckDB oracle SQL string (or None for genuinely non-SQL-expressible ops,
which the driver checks rows-only).

The registry is what ``__spark_entry__.py`` exposes to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame

from .catalog import Model
from .model import oracle_with_views


@dataclass
class Query:
    name: str
    fn: Callable[[Model], DataFrame]
    oracle: Optional[str]  # full DuckDB SQL (views inlined) or None
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, views: list[str] | None = None):
    """Register an operator.  ``oracle`` is the DuckDB SQL *body*; derived
    model views are prepended as CTEs automatically (``views`` limits
    which, default: all — DuckDB prunes unreferenced CTEs at plan time).
    """

    def deco(fn: Callable[[Model], DataFrame]):
        sql = oracle_with_views(oracle, views) if oracle is not None else None
        QUERIES[name] = Query(name=name, fn=fn, oracle=sql, doc=fn.__doc__ or "")
        return fn

    return deco
