"""Query registry plumbing + determinism helpers.

Determinism discipline (the driver hash-compares cell values against
DuckDB, so floating-point noise is a correctness bug):

  - Sums over DOUBLE columns are computed in DECIMAL: cast the operand
    to an exact decimal, SUM exactly, cast the final result to DOUBLE.
    Both engines then produce bit-identical doubles regardless of
    partial-aggregation order. A raw double SUM is order-dependent and
    WILL drift between a 32-partition Spark agg and DuckDB.
  - Averages are SUM(decimal)/COUNT, never built-in AVG (whose
    intermediate types differ between engines).
  - Ratios divide doubles derived from exact integers/decimals and are
    rounded on both sides with the same digit count.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]
    tags: tuple


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None, tags: tuple = ()):  # decorator
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, sql, tuple(tags))
        return fn

    return deco


# --- determinism helpers -------------------------------------------------

def dec(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent exact sum of a double column, as DOUBLE."""
    return F.sum(dec(col, scale=scale)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact-sum/count mean (AVG intermediate types differ per engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(dec(c, scale=scale)).cast("double") / F.count(c)
    ).alias(alias)


# DuckDB-side SQL fragments mirroring the helpers above.
def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
